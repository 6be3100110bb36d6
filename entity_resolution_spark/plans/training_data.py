"""End-to-end training-set construction — the full path from a raw
documents table to on-disk training shards, composed from this
engine's already-verified operators:

    curate (lang/quality gates, exact + transitive near-dup dedup)
      -> [paragraph_dedup / span_dedup — optional content rewrites]
      -> decontaminate (n-gram overlap vs the eval benchmark)
      -> assign_split (deterministic train/val/test)
      -> pack_sequences (concat-and-chunk token-budget layout)
      -> write_training_shards (hash-sharded parquet)

Stage ORDER is the cost design: the shuffle-free gates and the
dedup run first so decontamination's n-gram explode only sees
survivors; the split/packing columns are pure hash algebra appended
at the end; the only writes are the final shards. Every stage is a
pure function of (content, seed), so the whole artifact is
byte-identical across cluster sizes, reruns, and re-partitioning —
re-running the plan after appending new raw docs never moves an
existing doc's split, shard, or (within its shard prefix) sequence.

Each stage is individually value-checked by the driver's DuckDB gate
(doc_curation, doc_decontaminate, doc_split_assignment,
doc_sequence_packing) — this module adds the composition, its
metrics, and the filesystem artifact; tests/test_training_data.py
drives it end-to-end and checks determinism + leak-freedom.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import token_count
from entity_resolution_spark.operators.decontamination import flag_contamination
from entity_resolution_spark.operators.sampling import assign_split
from entity_resolution_spark.operators.sequence_packing import pack_sequences
from entity_resolution_spark.plans.curation import CurationConfig, curate
from entity_resolution_spark.sources.io import write_training_shards


@dataclass(frozen=True)
class TrainingSetConfig:
    curation: CurationConfig = field(default_factory=CurationConfig)
    # content REWRITE stages between curation and decontamination
    # (both off by default — they change doc text, not row counts):
    # paragraph_dedup removes cross-doc repeated paragraphs (C4
    # protocol, keeps the first occurrence); span_dedup_k removes
    # verbatim repeated runs of >= k tokens (Lee et al. 2022; note its
    # output text is normalized token space). Docs deduped to empty
    # text are KEPT with n_tokens=0 (accounted, never vanished).
    paragraph_dedup: bool = False
    span_dedup_k: int | None = None
    decontaminate_ngram: int = 13
    split_weights: tuple[tuple[str, float], ...] = (
        ("train", 0.98), ("val", 0.01), ("test", 0.01),
    )
    split_seed: int = 0
    sequence_budget: int = 2048
    pack_shards: int = 1024
    out_shards: int = 64
    hash_mode: str = "xxhash64"


def build_training_set(
    docs: DataFrame,
    benchmark: DataFrame,
    out_dir: str,
    cfg: TrainingSetConfig = TrainingSetConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, int]:
    """Run the full chain and write `out_dir/shard=K/` parquet with
    columns (id, text, n_tokens, split, shard[packing], seq_first,
    seq_last, seq_offset, spans_boundary). Returns audit metrics —
    every input row is accounted for (kept + per-reason drops +
    contaminated == input), the same no-silent-drops stance as
    curation and blocking."""
    # status feeds both the survivor semi-join and the metrics below —
    # materialize once instead of re-running the curation chain
    status = curate(docs, cfg.curation, id_col=id_col, text_col=text_col).localCheckpoint(
        eager=True
    )
    kept_ids = status.filter(F.col("status") == "kept").select(id_col)
    kept = docs.join(kept_ids, id_col, "left_semi")

    # optional content rewrites — each output feeds the onward chain
    # AND one metric aggregate, so it is materialized once
    rewrite_metrics: dict[str, int] = {}
    if cfg.paragraph_dedup:
        from entity_resolution_spark.operators.dedup import paragraph_dedup

        pd = paragraph_dedup(kept, id_col=id_col, text_col=text_col).localCheckpoint(
            eager=True
        )
        kept = kept.drop(text_col).join(
            pd.select(id_col, F.col("clean_text").alias(text_col)), id_col
        )
        rewrite_metrics["n_paras_removed"] = int(
            pd.agg(F.sum(F.col("n_paras") - F.col("n_kept"))).first()[0] or 0
        )
    if cfg.span_dedup_k:
        from entity_resolution_spark.operators.dedup import span_dedup

        sd = span_dedup(
            kept, id_col=id_col, text_col=text_col, k=cfg.span_dedup_k,
            hash_mode=cfg.hash_mode,
        ).localCheckpoint(eager=True)
        kept = kept.drop(text_col).join(
            sd.select(id_col, F.col("clean_text").alias(text_col)), id_col
        )
        rewrite_metrics["n_span_tokens_removed"] = int(
            sd.agg(F.sum("n_removed")).first()[0] or 0
        )

    # flagged feeds the clean-doc chain AND the contamination metric
    flagged_plan = flag_contamination(
        kept,
        benchmark,
        n=cfg.decontaminate_ngram,
        id_col=id_col,
        text_col=text_col,
        hash_mode=cfg.hash_mode,
    )
    flagged = flagged_plan.localCheckpoint(eager=True)
    clean = flagged.filter(~F.col("contaminated")).drop("n_contaminated", "contaminated")

    final = assign_split(
        clean.withColumn("n_tokens", token_count(F.col(text_col))),
        dict(cfg.split_weights),
        id_col=id_col,
        seed=cfg.split_seed,
        hash_mode=cfg.hash_mode,
    )
    # pack per split so a val sequence never mixes train tokens; the
    # packing shard column is renamed out of the way of the output
    # shard column write_training_shards appends
    packed = None
    for name, _ in cfg.split_weights:
        part = pack_sequences(
            final.filter(F.col("split") == name),
            budget=cfg.sequence_budget,
            id_col=id_col,
            tokens_col="n_tokens",
            n_shards=cfg.pack_shards,
            seed=cfg.split_seed,
            hash_mode=cfg.hash_mode,
        ).withColumnRenamed("shard", "pack_shard")
        packed = part if packed is None else packed.unionByName(part)

    write_training_shards(packed, out_dir, n_shards=cfg.out_shards, id_col=id_col)

    n_input = docs.count()
    by_status = {
        r["status"]: int(r["n"])
        for r in status.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    n_contaminated = int(flagged.filter(F.col("contaminated")).count())
    # count from the WRITTEN files, not the plan — packed.count() would
    # re-execute the whole chain a second time. Explicit schema: a
    # fully-filtered input writes ZERO part files, and schema
    # inference on the empty dir would crash the plan right after it
    # succeeded (the metrics must report n_written=0 instead).
    n_written = int(
        docs.sparkSession.read.schema(packed.schema).parquet(out_dir).count()
    )
    return {
        "n_input": int(n_input),
        **{f"drop_{k}": v for k, v in by_status.items() if k != "kept"},
        "n_kept": by_status.get("kept", 0),
        **rewrite_metrics,
        "n_contaminated": n_contaminated,
        "n_written": n_written,
    }
