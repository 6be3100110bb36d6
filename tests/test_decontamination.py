"""Benchmark-decontamination tests (operators/decontamination.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.decontamination import (
    decontaminate,
    flag_contamination,
)


@pytest.fixture(scope="module")
def corpus_and_bench(spark):
    docs = spark.createDataFrame(
        [
            # verbatim copy of benchmark question 1 inside a longer page
            (1, "intro words here what is the capital of france and why does it matter today"),
            # clean page, no 8-gram overlap
            (2, "totally unrelated content about spark shuffles and partition counts at scale"),
            # overlaps benchmark q2 but with ONE word changed mid-window -> no full 8-gram hit
            (3, "name the largest planet of our SUN system question answered here with detail"),
            # shorter than n tokens -> never flagged
            (4, "tiny doc"),
            # case/whitespace-mangled copy of q1 (normalization must still hit)
            (5, "WHAT   is THE capital OF france AND why does it matter"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (101, "what is the capital of france and why does it matter"),
            (102, "name the largest planet of our solar system question answered"),
        ],
        "qid long, text string",
    )
    return docs, bench


def test_flag_contamination(spark, corpus_and_bench):
    docs, bench = corpus_and_bench
    out = {r["doc_id"]: r for r in flag_contamination(docs, bench, n=8).collect()}
    assert out[1]["contaminated"] and out[1]["n_contaminated"] > 0
    assert not out[2]["contaminated"] and out[2]["n_contaminated"] == 0
    assert not out[3]["contaminated"]  # one-word edit breaks every 8-gram
    assert not out[4]["contaminated"]  # shorter than n
    assert out[5]["contaminated"]  # normalization-insensitive


def test_decontaminate_drops_only_hits(spark, corpus_and_bench):
    docs, bench = corpus_and_bench
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=8).select("doc_id").collect()}
    assert kept == {2, 3, 4}
    # schema untouched
    assert decontaminate(docs, bench, n=8).columns == docs.columns


def test_flag_contamination_counts_distinct_ngrams(spark):
    """A doc repeating one leaked n-gram 3 times counts it once
    (distinct n-grams), matching the oracle's DISTINCT semantics."""
    leak = "alpha beta gamma delta"
    docs = spark.createDataFrame([(1, f"{leak} x {leak} y {leak}")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, leak)], "qid long, text string")
    row = flag_contamination(docs, bench, n=4).first()
    assert row["n_contaminated"] == 1


def test_flag_contamination_validates_n(spark, corpus_and_bench):
    docs, bench = corpus_and_bench
    with pytest.raises(ValueError, match="n must be"):
        flag_contamination(docs, bench, n=0)


def test_hash_modes_agree_on_partition(spark, corpus_and_bench):
    """md5 oracle mode flags the same documents as production xxhash64."""
    docs, bench = corpus_and_bench
    a = {r["doc_id"]: r["contaminated"]
         for r in flag_contamination(docs, bench, n=8, hash_mode="xxhash64").collect()}
    b = {r["doc_id"]: r["contaminated"]
         for r in flag_contamination(docs, bench, n=8, hash_mode="md5").collect()}
    assert a == b


def test_broadcast_join_in_plan(spark, corpus_and_bench):
    """The benchmark side must ride a broadcast join — a sort-merge
    join against the corpus-sized n-gram explode is the scale bug this
    operator exists to avoid."""
    docs, bench = corpus_and_bench
    plan = flag_contamination(docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
