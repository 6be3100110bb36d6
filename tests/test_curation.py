"""Curation plan: per-row decisions, stage precedence, near-dup
transitivity (chains collapse to one survivor), metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.plans.curation import (
    CurationConfig,
    curate,
    curation_metrics,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and it is a fine day "
    "for all of the animals in the big green forest near the old mill"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stage_precedence_and_statuses(spark):
    rows = [
        (1, GOOD),                                  # kept
        (2, GOOD),                                  # exact dup of 1
        (3, "der die das und ist ein nicht mit sich auf " * 3),  # de, kept
        (4, "zz yy xx ww vv"),                      # no stopwords -> und -> lang
        (5, "the and of"),                          # en but too short -> quality
        (6, GOOD + " extra trailing tokens here"),  # near-dup of 1
    ]
    out = {r["doc_id"]: r["status"] for r in curate(_docs(spark, rows), CurationConfig(min_tokens=5)).collect()}
    assert out[1] == "kept"
    assert out[2] == "exact_dup"
    assert out[3] == "kept"
    assert out[4] == "lang_filtered"
    assert out[5] == "quality_filtered"
    assert out[6] == "near_dup"


def test_near_dup_transitivity_chain(spark):
    """A ~ B ~ C by overlap but A and C more distant: transitive
    closure keeps exactly one of the three (the min id)."""
    base = GOOD.split()
    a = " ".join(base)
    b = " ".join(base[3:] + ["pad1", "pad2", "pad3"])
    c = " ".join(base[6:] + ["pad1", "pad2", "pad3", "pad4", "pad5", "pad6"])
    rows = [(10, a), (20, b), (30, c)]
    out = {r["doc_id"]: r["status"] for r in
           curate(_docs(spark, rows), CurationConfig(min_tokens=5, near_dup_threshold=0.5)).collect()}
    statuses = sorted(out.values())
    assert out[10] == "kept"
    # at least B collapses onto A; if C pairs with B it must collapse
    # too (transitivity), never survive as its own "kept" alongside B dropped
    assert out[20] == "near_dup"
    assert out[30] in ("near_dup", "kept")
    if out[30] == "kept":
        # only legitimate when C genuinely pairs with neither A nor B
        assert statuses.count("near_dup") == 1


def test_metrics_partition_input(spark):
    rows = [(i, GOOD + f" token{i}") for i in range(8)] + [(100, "xx yy")]
    res = curate(_docs(spark, rows), CurationConfig(min_tokens=5))
    m = curation_metrics(res)
    assert sum(m.values()) == 9
    assert m["lang_filtered"] >= 1
    assert m["kept"] >= 1


def test_kept_set_is_usable_corpus(spark, corpus):
    """Run over real synthetic docs: statuses partition the corpus and
    the kept set joins back to full rows."""
    pages, _, _ = corpus
    docs = pages.select(F.xxhash64("url").alias("doc_id"), F.col("text"))
    # synthetic page text is pseudo-token, so language-ID reads 'und' —
    # admit it here; the lang gate itself is covered above
    cfg = CurationConfig(allowed_langs=("en", "de", "es", "fr", "und"), min_tokens=2)
    res = curate(docs, cfg)
    assert res.count() == docs.count()
    kept = docs.join(res.filter(F.col("status") == "kept"), "doc_id")
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()  # dedup fires on planted duplicates
