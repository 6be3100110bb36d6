"""Tests for deterministic splitting, stratified sampling, and
canonical-URL dedup (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.sampling import (
    BUCKETS,
    assign_split,
    canonical_url,
    split_bucket,
    stratified_sample,
    url_dedup,
)

WEIGHTS = {"train": 0.90, "val": 0.05, "test": 0.05}


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 5000).withColumnRenamed("id", "doc_id")


def test_assign_split_validates_weights(ids):
    with pytest.raises(ValueError, match="non-empty"):
        assign_split(ids, {})
    with pytest.raises(ValueError, match="sum"):
        assign_split(ids, {"train": 0.9, "val": 0.05})


def test_assign_split_proportions_and_total(ids):
    out = assign_split(ids, WEIGHTS)
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000
    assert set(counts) == set(WEIGHTS)
    # hash buckets are uniform: 3-sigma binomial bounds at n=5000
    assert 4300 <= counts["train"] <= 4700
    assert 150 <= counts["val"] <= 350
    assert 150 <= counts["test"] <= 350


def test_assign_split_partition_invariant(ids):
    """A doc's split is a pure function of (id, seed): any repartition /
    row order gives byte-identical assignments."""
    a = assign_split(ids, WEIGHTS).orderBy("doc_id").collect()
    b = assign_split(ids.repartition(17, "doc_id"), WEIGHTS).orderBy("doc_id").collect()
    assert a == b


def test_assign_split_seed_independence(ids):
    a = {r["doc_id"]: r["split"] for r in assign_split(ids, WEIGHTS, seed=0).collect()}
    b = {r["doc_id"]: r["split"] for r in assign_split(ids, WEIGHTS, seed=1).collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 100  # different seeds really re-deal the corpus


def test_assign_split_hash_modes_agree_on_shape(ids):
    md5 = assign_split(ids, WEIGHTS, hash_mode="md5")
    assert md5.filter(F.col("split").isNull()).count() == 0
    assert md5.count() == 5000


def test_split_bucket_range(ids):
    out = ids.select(split_bucket(F.col("doc_id")).alias("b"))
    lo, hi = out.agg(F.min("b"), F.max("b")).first()
    assert lo >= 0 and hi < BUCKETS


def test_stratified_sample_fractions_and_default(spark):
    docs = spark.range(0, 6000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 3 == 0, "en").when(F.col("id") % 3 == 1, "de").alias("lang"),
    )  # ~2000 en, ~2000 de, ~2000 NULL
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.1}, default_fraction=0.0, seed=7)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert 850 <= counts.get("en", 0) <= 1150
    assert 120 <= counts.get("de", 0) <= 280
    assert None not in counts  # default 0.0 drops the unlisted (NULL) stratum


def test_stratified_sample_nested(spark):
    """Raising a stratum's fraction keeps every previously sampled row."""
    docs = spark.range(0, 3000).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    small = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.2}, seed=3).collect()}
    big = {r["doc_id"] for r in stratified_sample(docs, "lang", {"en": 0.6}, seed=3).collect()}
    assert small <= big
    assert len(small) < len(big)


def test_stratified_sample_validates_fractions(spark):
    docs = spark.range(3).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 1.5})
    with pytest.raises(ValueError, match="fraction"):
        stratified_sample(docs, "lang", {"en": 0.5}, default_fraction=-0.1)


CANON_CASES = [
    # (raw, expected)
    ("https://Example.COM/Path/To?b=2&a=1", "https://example.com/Path/To?a=1&b=2"),
    ("HTTPS://EXAMPLE.com:443/x", "https://example.com/x"),
    ("http://example.com:80/x/", "http://example.com/x"),
    ("https://example.com/x#frag", "https://example.com/x"),
    ("https://example.com/x?utm_source=feed&a=1&fbclid=z&ref=tw", "https://example.com/x?a=1"),
    ("https://example.com/x?utm_source=feed", "https://example.com/x"),
    ("https://example.com/", "https://example.com"),
    ("https://example.com", "https://example.com"),
    ("https://example.com/x?a=1&&b=2", "https://example.com/x?a=1&b=2"),
    ("https://example.com/x?flag&a=1", "https://example.com/x?a=1&flag"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),  # non-default port kept
    ("https://example.com/CaseInPath?Q=UPPER", "https://example.com/CaseInPath?Q=UPPER"),
]


def test_canonical_url_golden(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in CANON_CASES], ["url"])
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [exp for _, exp in CANON_CASES]


def test_url_dedup_keeps_newest_then_url_asc(spark):
    rows = [
        # three spellings of one canonical url at ts 1..3 -> ts=3 wins
        ("https://a.com/x?b=2&a=1", 1),
        ("https://a.com/x/?a=1&b=2", 2),
        ("https://A.com/x?a=1&utm_source=s&b=2", 3),
        # tie on ts -> raw url ascending wins
        ("https://b.com/y?z=1#f1", 7),
        ("https://b.com/y?z=1#f0", 7),
        # singleton untouched
        ("https://c.com/z", 5),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts"])
    out = url_dedup(pages).orderBy("canonical_url").collect()
    assert [(r["canonical_url"], r["url"], r["warc_ts"]) for r in out] == [
        ("https://a.com/x?a=1&b=2", "https://A.com/x?a=1&utm_source=s&b=2", 3),
        ("https://b.com/y?z=1", "https://b.com/y?z=1#f0", 7),
        ("https://c.com/z", "https://c.com/z", 5),
    ]


def test_url_dedup_partition_invariant(spark):
    rows = [(f"https://d{i % 40}.com/p?b={i % 3}&utm_source=x", i) for i in range(400)]
    pages = spark.createDataFrame(rows, ["url", "warc_ts"])
    a = url_dedup(pages).orderBy("canonical_url").collect()
    b = url_dedup(pages.repartition(13)).orderBy("canonical_url").collect()
    assert a == b


def test_url_dedup_null_ts_and_rerun(spark):
    """De-skew regression pins (review catches): a canonical key whose
    timestamps are all NULL keeps one row (min raw url); re-running on
    an already-canonicalized frame overwrites the column instead of
    emitting an ambiguous duplicate."""
    from entity_resolution_spark.operators.sampling import url_dedup

    pages = spark.createDataFrame(
        [
            (1, "https://a.com/x?b=1", None),
            (2, "https://a.com/x", None),
            (3, "https://b.com/y", 5),
            (4, "https://b.com/y?utm_source=z", 9),
        ],
        "doc_id long, url string, warc_ts long",
    )
    out = url_dedup(pages, ts_col="warc_ts")
    rows = {r["canonical_url"]: r for r in out.collect()}
    assert set(rows) == {"https://a.com/x?b=1", "https://a.com/x", "https://b.com/y"}
    # all-NULL-ts group: https://a.com/x keeps doc 2 (min raw url)
    assert rows["https://a.com/x"]["doc_id"] == 2
    assert rows["https://b.com/y"]["doc_id"] == 4  # newest ts wins
    rerun = url_dedup(out, ts_col="warc_ts")
    assert rerun.columns.count("canonical_url") == 1
    assert rerun.count() == 3


def test_url_dedup_with_map_metadata_column(spark):
    """A MapType column is unorderable — the min-struct tie-break
    would fail analysis (round-4 advisory). The hash-keyed winner
    join must produce the SAME winners as the orderable path does on
    the same rows without the map."""
    rows = [
        ("https://a.com/x?b=2&a=1", 1, {"k": "v1"}),
        ("https://a.com/x/?a=1&b=2", 2, {"k": "v2"}),
        ("https://A.com/x?a=1&utm_source=s&b=2", 3, {"k": "v3"}),
        ("https://b.com/y?z=1#f1", 7, {"m": "1"}),
        ("https://b.com/y?z=1#f0", 7, {"m": "0"}),
        ("https://c.com/z", 5, None),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts long, meta map<string,string>")
    out = url_dedup(pages).orderBy("canonical_url").collect()
    assert [(r["canonical_url"], r["url"], r["warc_ts"], r["meta"]) for r in out] == [
        ("https://a.com/x?a=1&b=2", "https://A.com/x?a=1&utm_source=s&b=2", 3, {"k": "v3"}),
        ("https://b.com/y?z=1", "https://b.com/y?z=1#f0", 7, {"m": "0"}),
        ("https://c.com/z", "https://c.com/z", 5, None),
    ]
    # identical winners under a different partitioning
    again = url_dedup(pages.repartition(7)).orderBy("canonical_url").collect()
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
