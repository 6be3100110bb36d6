"""sf1-scale evidence for the training-data operators: paragraph
dedup, exact-substring span dedup, and unigram-LM quality bucketing
at ~100k docs (10x the sf0.1 documents table, per-copy character
translation so copies never collide except through the planted
boilerplate below), recording seconds and docs/sec per operator.

Cross-copy duplication is PLANTED deliberately: a shared footer
paragraph on every doc (paragraph dedup must pick one global winner
over a 100k-occurrence hot paragraph... which is exactly the hot-key
case the operator exempts only for BLANKS, so the footer exercises
the real skewed-window path) and a shared 12-token lead sentence on
every 10th doc for span dedup.

Results merge into SF1.json under "trainops"; summarized in
BASELINE.md.

Usage: PYTHONPATH=/root/repo python tools/sf1_trainops.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from bench import _replicate_docs, _warmup
    from entity_resolution_spark.operators.bpe import bpe_train
    from entity_resolution_spark.operators.dedup import paragraph_dedup, span_dedup
    from entity_resolution_spark.operators.text_analysis import unigram_logprob_buckets
    from entity_resolution_spark.session import get_spark

    mult = int(os.environ.get("SF1_MULT", "10"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="sf1_trainops",
        master="local[32]",
        shuffle_partitions=max(64, 8 * mult),
    )
    _warmup(spark, sf_dir)
    par = spark.sparkContext.defaultParallelism
    docs = _replicate_docs(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(par * 2, "doc_id"),
        mult,
    )
    boiler = "shared lead sentence planted across every tenth page for span dedup evidence"
    docs = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 10 == 0, F.lit(boiler + " ")).otherwise(F.lit("")),
            F.col("text"),
            F.lit("\n\nshared footer paragraph planted on every page"),
        ).alias("text"),
    )
    # one materialized input for all timed runs: operator time must
    # not include the datagen/replicate chain
    docs_dir = os.path.join(os.environ.get("SF1_TMP", "/tmp"), f"sf1_docs_mult{mult}")
    docs.write.mode("overwrite").parquet(docs_dir)
    docs = spark.read.parquet(docs_dir)
    n_docs = docs.count()

    def timed(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        return {"sec": round(sec, 1), "docs_per_sec": round(n_docs / sec, 1)}

    out = {
        "mult": mult,
        "n_docs": n_docs,
        "paragraph_dedup": timed("paragraph_dedup", paragraph_dedup(docs)),
        "span_dedup": timed("span_dedup", span_dedup(docs, k=8)),
        "unigram_logprob_buckets": timed(
            "lm_buckets", unigram_logprob_buckets(docs)
        ),
    }
    # BPE: the merge loop runs its own bounded driver actions, so time
    # the call (train 8 merges) rather than a noop write of a plan
    t0 = time.time()
    merges, _ = bpe_train(docs, n_merges=8)
    n_m = merges.count()
    sec = time.time() - t0
    out["bpe_train_8_merges"] = {
        "sec": round(sec, 1),
        "docs_per_sec": round(n_docs / sec, 1),
        "n_merges": int(n_m),
    }
    sf1_path = os.path.join(REPO, "SF1.json")
    doc: dict = {"measured_by": "tools/sf1_evidence.py", "runs": {}}
    if os.path.exists(sf1_path):
        with open(sf1_path) as f:
            doc = json.load(f)
    doc.setdefault("trainops", {})[str(mult)] = out
    with open(sf1_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
