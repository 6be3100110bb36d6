"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec}, "sf": ..., "pairs_per_sec": ...}.

--scaling: additionally runs the candidate-pair+scoring core at
local[8] and local[32] on the same input and reports throughput at
both plus scaling efficiency (the sandbox stand-in for N vs 4N
executors, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _fresh_spark(n_cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    from entity_resolution_spark.session import get_spark

    return get_spark(
        app_name=f"bench_local{n_cores}",
        master=f"local[{n_cores}]",
        shuffle_partitions=n_cores,
    )


def _er_core(spark, sf_dir: str):
    """The scale-bearing core: features -> blocking -> pairs -> scoring.
    Returns (n_pages, n_candidate_pairs)."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.datagen import pages_from_documents
    from entity_resolution_spark.operators.pairs import candidate_pairs
    from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = pages_from_documents(docs).drop("entity_gt")
    pipe = EntityResolutionPipeline()
    feats = pipe.featurize(pages)
    blocks, _stats = pipe.block(feats)
    pairs = candidate_pairs(blocks)
    scored = pipe.score(pairs, feats)
    agg = scored.agg(
        F.count("*").alias("n_pairs"),
        F.sum((F.col("score") >= pipe.config.scoring.threshold).cast("long")).alias("n_match"),
    ).first()
    n_pages = pages.count()
    return n_pages, int(agg["n_pairs"] or 0)


def _run_headline(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    import __spark_entry__ as em

    names = [
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q6_forecast_revenue",
        "top3_orders_per_customer",
        "doc_exact_dedup",
        "doc_minhash_lsh_dedup",
        "embedding_topk",
        "events_window_agg",
        "events_sessionization",
    ]
    qs = em.queries()
    times: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)

    extras: dict[str, float] = {}
    t0 = time.time()
    n_pages, n_pairs = _er_core(spark, sf_dir)
    er_sec = time.time() - t0
    times["er_pipeline_core"] = round(er_sec, 3)
    extras["n_pages"] = n_pages
    extras["n_candidate_pairs"] = n_pairs
    extras["pairs_per_sec"] = round(n_pairs / er_sec, 1) if er_sec > 0 else 0.0
    return times, extras


def _run_scaling(sf_dir: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for n in (8, 32):
        spark = _fresh_spark(n)
        t0 = time.time()
        _n_pages, n_pairs = _er_core(spark, sf_dir)
        sec = time.time() - t0
        out[f"local{n}_sec"] = round(sec, 3)
        out[f"local{n}_pairs_per_sec"] = round(n_pairs / sec, 1)
    # efficiency of 4x parallelism: T(N) / (4 * T(4N)) == thr(4N)/(4*thr(N))
    out["scaling_efficiency"] = round(
        out["local8_sec"] / (4.0 * out["local32_sec"]), 3
    )
    return out


def main() -> None:
    scaling = "--scaling" in sys.argv
    spark = _fresh_spark(CPUS)
    t0 = time.time()
    times, extras = _run_headline(spark, SF_DIR)
    total = round(time.time() - t0, 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        **extras,
    }
    if scaling:
        result["scaling"] = _run_scaling(SF_DIR)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
