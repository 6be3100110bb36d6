"""End-to-end training-set construction: accounting, leak-freedom,
determinism of the on-disk artifact."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.plans.curation import CurationConfig
from entity_resolution_spark.plans.training_data import TrainingSetConfig, build_training_set

SF = "/root/testdata/sf0.001"

CFG = TrainingSetConfig(
    curation=CurationConfig(min_tokens=5),
    decontaminate_ngram=8,
    sequence_budget=64,
    pack_shards=4,
    out_shards=4,
)


@pytest.fixture(scope="module")
def corpus_and_bench(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # benchmark = verbatim slices of 10 docs -> those docs MUST be
    # decontaminated away
    bench = docs.filter(F.col("doc_id") % 37 == 0).limit(10).select("text")
    return docs, bench.localCheckpoint(eager=True)


def test_build_training_set_accounts_for_every_row(spark, tmp_path, corpus_and_bench):
    docs, bench = corpus_and_bench
    out = str(tmp_path / "shards")
    m = build_training_set(docs, bench, out, CFG)
    drops = sum(v for k, v in m.items() if k.startswith("drop_"))
    assert m["n_input"] == m["n_kept"] + drops
    assert m["n_written"] == m["n_kept"] - m["n_contaminated"]
    assert m["n_contaminated"] >= 1  # the planted verbatim leaks

    written = spark.read.parquet(out)
    assert written.count() == m["n_written"]
    # layout columns present; splits only from the configured names
    for c in ("split", "pack_shard", "seq_first", "seq_offset", "n_tokens"):
        assert c in written.columns
    splits = {r["split"] for r in written.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"}
    # shard dirs on disk
    assert len(glob.glob(out + "/shard=*")) >= 1

    # leak-freedom: no written doc shares an 8-gram with the benchmark
    from entity_resolution_spark.operators.decontamination import flag_contamination

    leaked = flag_contamination(written, bench, n=8).filter(F.col("contaminated"))
    assert leaked.count() == 0


def test_build_training_set_deterministic(spark, tmp_path, corpus_and_bench):
    docs, bench = corpus_and_bench
    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    build_training_set(docs, bench, out_a, CFG)
    build_training_set(docs.orderBy(F.rand(3)).repartition(7), bench, out_b, CFG)
    cols = ["doc_id", "split", "pack_shard", "seq_first", "seq_last", "seq_offset"]
    a = {tuple(r) for r in spark.read.parquet(out_a).select(cols).collect()}
    b = {tuple(r) for r in spark.read.parquet(out_b).select(cols).collect()}
    assert a == b


def test_build_training_set_with_content_rewrites(spark, tmp_path, corpus_and_bench):
    import dataclasses

    docs, bench = corpus_and_bench
    # plant cross-doc boilerplate: a shared footer paragraph on every
    # doc and a shared 10-token lead on every 4th
    lead = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit(lead + " ")).otherwise(F.lit("")),
            F.col("text"),
            F.lit("\n\nshared footer paragraph for rewrite test"),
        ).alias("text"),
    )
    cfg = dataclasses.replace(CFG, paragraph_dedup=True, span_dedup_k=8)
    out = str(tmp_path / "shards_rw")
    m = build_training_set(planted, bench, out, cfg)
    # accounting unchanged by rewrites: rows are rewritten, not dropped
    drops = sum(v for k, v in m.items() if k.startswith("drop_"))
    assert m["n_input"] == m["n_kept"] + drops
    assert m["n_written"] == m["n_kept"] - m["n_contaminated"]
    # both rewrite stages did real work
    assert m["n_paras_removed"] > 0
    assert m["n_span_tokens_removed"] > 0
    # the planted boilerplate survives in at most one written doc each
    written = spark.read.parquet(out)
    assert written.filter(F.col("text").contains("shared footer paragraph")).count() <= 1
    assert written.filter(F.col("text").contains(lead)).count() <= 1
