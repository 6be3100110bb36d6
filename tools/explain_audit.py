"""Physical-plan audit: for each headline query, capture
.explain("formatted") and grep the properties that matter at scale —
parquet filter pushdown (PushedFilters), column pruning (ReadSchema),
broadcast vs sort-merge joins, whole-stage codegen coverage.

Writes PLANS.md at the repo root.

Usage: PYTHONPATH=/root/repo python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from entity_resolution_spark.session import get_spark  # noqa: E402

AUDIT = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "top3_orders_per_customer",
    "doc_pair_generation",
    "doc_minhash_lsh_dedup",
    "doc_simhash_pairs",
    "embedding_topk",
    "embedding_srp_near_dup",
    "events_asof_join",
    "events_window_agg",
    "cc_components",
    "entity_rollup",
    "doc_curation",
    "doc_containment",
    "doc_phonetic_keys",
    "media_features",
    "doc_split_assignment",
    "doc_url_dedup",
    "doc_repetition_stats",
    "doc_decontaminate",
    "doc_pii_redaction",
    "graph_pagerank",
    "doc_sequence_packing",
    "doc_cross_dedup",
    "doc_script_detection",
    "doc_paragraph_dedup",
    "doc_lm_quality_buckets",
    "doc_span_dedup",
    "bpe_merge_table",
    "embedding_semantic_dedup",
    "doc_lm_quality_by_lang",
    "corpus_profile",
    "doc_lm_bigram_scores",
    "domain_quality_stats",
    "media_wav_decode",
    "media_image_meta",
    "media_video_decode",
    "media_image_features",
    "media_image_resize",
    "doc_top_terms",
    "doc_phone_validation",
    "doc_generalized_sims",
    "doc_nb_classify",
    "proc_source_stats",
]


def plan_text(df) -> tuple[str, str]:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue(), df._jdf.queryExecution().executedPlan().toString()


def summarize(plan: str) -> dict[str, object]:
    # node ids appear once in the tree and once in the details section —
    # count unique ids per operator kind
    def uniq(op: str) -> int:
        return len(set(re.findall(r"\((\d+)\) " + op, plan)))

    return {
        "pushed_filters": len(re.findall(r"PushedFilters: \[(?!\])", plan)),
        "scans": uniq("Scan parquet"),
        "broadcast_joins": uniq("BroadcastHashJoin"),
        "smj_joins": uniq("SortMergeJoin"),
        "shuffles": uniq("Exchange"),
        "python_udf": uniq("ArrowEvalPython"),
        "row_udf": uniq("BatchEvalPython"),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=8)
    qs = entry_mod.queries()
    out = ["# PLANS — physical-plan audit of headline queries", "",
           f"Input: `{sf_dir}`. Captured via `.explain(\"formatted\")`; the",
           "columns below are what we tune for at 100 TB: filters reaching the",
           "parquet scan, broadcast joins for dimension-sized sides, wide",
           "whole-stage-codegen spans, zero row-at-a-time Python.", ""]
    out.append("| query | scans | pushed-filter scans | broadcast joins | SMJ | shuffles | codegen spans | arrow UDF evals | row-UDF evals |")
    out.append("|---|---|---|---|---|---|---|---|---|")
    details = []
    for name in AUDIT:
        df = qs[name](spark, sf_dir)
        plan, simple = plan_text(df)
        s = summarize(plan)
        s["codegen_spans"] = len(set(re.findall(r"\*\((\d+)\)", simple)))
        out.append(
            f"| {name} | {s['scans']} | {s['pushed_filters']} | {s['broadcast_joins']} "
            f"| {s['smj_joins']} | {s['shuffles']} | {s['codegen_spans']} | {s['python_udf']} | {s['row_udf']} |"
        )
        details.append((name, plan))
    out += ["", "Row-at-a-time Python (`BatchEvalPython`) must stay 0 everywhere —",
            "all Python is Arrow-batched (`ArrowEvalPython`).",
            "Codegen spans read 0 for un-executed AQE plans (markers only",
            "materialize per query stage at runtime); the one query that",
            "materializes internally (minhash dedup) shows its spans.", ""]
    # appendix: first 40 lines of each plan
    for name, plan in details:
        out += [f"<details><summary>{name}</summary>", "", "```"]
        out += plan.splitlines()[:40]
        out += ["```", "</details>", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out) + "\n")
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
