"""Second-level clustering (household analog, reference generateHHIDs
mlir.py:2102-2557): transitivity, determinism, and the README.md:46-49
invariance properties at the super-entity level."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.rollup import multi_key, rollup_entities, rollup_pages


def _recs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, k1 string, k2 string")


def test_rollup_transitive_merge(spark):
    # A-B share k1, B-C share k2 -> one super cluster; D isolated
    recs = _recs(
        spark,
        [(1, "x", None), (2, "x", "y"), (3, None, "y"), (4, "z", "w")],
    )
    out = {r["doc_id"]: (r["super_key"], r["super_size"]) for r in
           rollup_entities(recs, "doc_id", ["k1", "k2"]).collect()}
    assert out[1] == (1, 3) and out[2] == (1, 3) and out[3] == (1, 3)
    assert out[4] == (4, 1)


def test_rollup_key_namespaces_do_not_collide(spark):
    # same VALUE in different key columns must not connect records
    recs = _recs(spark, [(1, "v", None), (2, None, "v")])
    out = {r["doc_id"]: r["super_key"] for r in
           rollup_entities(recs, "doc_id", ["k1", "k2"]).collect()}
    assert out[1] != out[2]


def test_rollup_deterministic_under_row_order(spark):
    rows = [(i, f"a{i % 7}", f"b{i % 5}") for i in range(60)]
    a = rollup_entities(_recs(spark, rows), "doc_id", ["k1", "k2"])
    b = rollup_entities(
        _recs(spark, list(reversed(rows))).repartition(7), "doc_id", ["k1", "k2"]
    )
    am = {r["doc_id"]: r["super_id"] for r in a.collect()}
    bm = {r["doc_id"]: r["super_id"] for r in b.collect()}
    assert am == bm


def test_rollup_invariant_to_new_higher_id_member(spark):
    """Adding a new record (higher id) to an existing super cluster
    must not change any existing super id (canonical = min member)."""
    base = _recs(spark, [(1, "x", None), (2, "x", None), (5, "q", None)])
    grown = _recs(spark, [(1, "x", None), (2, "x", None), (5, "q", None), (9, "x", None)])
    a = {r["doc_id"]: r["super_id"] for r in rollup_entities(base, "doc_id", ["k1", "k2"]).collect()}
    b = {r["doc_id"]: r["super_id"] for r in rollup_entities(grown, "doc_id", ["k1", "k2"]).collect()}
    assert all(a[i] == b[i] for i in a)
    assert b[9] == b[1]  # the new member adopted the existing super id


def test_multi_key_prefix(spark):
    df = spark.createDataFrame([("d.com", "Hello World")], "domain string, title string")
    got = df.select(multi_key("domain", prefix_col="title", prefix_len=5).alias("mk")).first()["mk"]
    assert got == "d.com␟Hello"


def test_rollup_pages_over_pipeline_output(spark, corpus):
    """Level-2 over the real pipeline output: every page gets exactly
    one super id, super clusters are a coarsening of level-1 entities
    (never split an entity), and same-domain near-title entities merge."""
    from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline

    pages, _, _ = corpus
    pipe = EntityResolutionPipeline()
    feats = pipe.featurize(pages)
    entities = pipe.run(pages)
    rolled = rollup_pages(entities, feats)
    assert rolled.count() == pages.count()
    # coarsening: a level-1 entity maps into exactly one super cluster
    split = (
        rolled.groupBy("entity_id")
        .agg(F.countDistinct("super_id").alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    assert split == 0
    n_super = rolled.select("super_id").distinct().count()
    n_l1 = rolled.select("entity_id").distinct().count()
    assert n_super <= n_l1


def test_multi_key_null_part_yields_null(spark):
    """concat_ws silently skips null parts — multi_key must not (a null
    title would degrade to a domain-only key and over-merge; round-2
    advisory)."""
    df = spark.createDataFrame(
        [("d.com", None), (None, "Hello"), ("d.com", "Hello")],
        "domain string, title string",
    )
    got = [
        r["mk"]
        for r in df.select(
            multi_key("domain", prefix_col="title", prefix_len=5).alias("mk")
        ).collect()
    ]
    assert got[0] is None and got[1] is None
    assert got[2] == "d.com␟Hello"


def test_rollup_null_title_does_not_merge_on_domain_alone(spark):
    """Two same-domain records with NULL titles must NOT merge through
    a degraded domain-only composite key."""
    df = spark.createDataFrame(
        [(1, "d.com", None), (2, "d.com", None)], "doc_id long, domain string, title string"
    )
    keyed = df.select("doc_id", multi_key("domain", prefix_col="title").alias("dt"))
    out = {
        r["doc_id"]: r["super_key"]
        for r in rollup_entities(keyed, "doc_id", ["dt"]).collect()
    }
    assert out[1] != out[2]
