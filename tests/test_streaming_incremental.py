"""Streaming incremental entity resolution: foreachBatch maintenance
of the durable entity table (reference mlir.py:2066-2095 semantics as
Structured Streaming). Checks exactly-once file consumption across
restarts, id stability for existing urls, and id adoption for new
pages joining existing clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.datagen import PAGES_SCHEMA
from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline
from entity_resolution_spark.streaming.incremental_er import start_incremental_er


def test_incremental_er_stream(spark, corpus, tmp_path):
    pages, _labels, _expected = corpus
    pages = pages.select([f.name for f in PAGES_SCHEMA.fields])
    feed = str(tmp_path / "feed")
    table = str(tmp_path / "entities")
    ckpt = str(tmp_path / "ckpt")

    b1 = pages.filter(F.pmod(F.xxhash64("url"), F.lit(5)) != 0)
    b2 = pages.join(b1.select("url"), "url", "left_anti").select(
        [f.name for f in PAGES_SCHEMA.fields]
    )
    lookup = lambda _b: spark.read.schema(PAGES_SCHEMA).parquet(feed)  # noqa: E731

    b1.write.mode("append").parquet(feed)
    q = start_incremental_er(spark, feed, table, ckpt, pages_lookup=lookup)
    q.awaitTermination(300)
    ids1 = {r["url"]: r["entity_id"] for r in spark.read.parquet(table).collect()}
    assert set(ids1) == {r["url"] for r in b1.select("url").collect()}

    b2.write.mode("append").parquet(feed)
    q2 = start_incremental_er(spark, feed, table, ckpt, pages_lookup=lookup)
    q2.awaitTermination(300)
    ids2 = {r["url"]: r["entity_id"] for r in spark.read.parquet(table).collect()}

    # every url present; existing urls kept their ids (stability wins
    # over cluster drift — README.md:46-49 analog)
    assert set(ids2) == {r["url"] for r in pages.select("url").collect()}
    assert all(ids2[u] == ids1[u] for u in ids1)

    # adoption: a new url whose cluster canonical lives in batch 1
    # must adopt that cluster's existing entity id
    full = EntityResolutionPipeline().run(pages)
    rows = full.select("url", "canonical_url").collect()
    canon = {r["url"]: r["canonical_url"] for r in rows}
    b1_urls = set(ids1)
    adopted = [
        u for u in canon
        if u not in b1_urls and canon[u] in b1_urls and canon[u] != u
    ]
    assert adopted, "corpus split produced no adoption case"
    for u in adopted:
        assert ids2[u] == ids1[canon[u]], u

    # third run with no new files: exactly-once — table unchanged
    q3 = start_incremental_er(spark, feed, table, ckpt, pages_lookup=lookup)
    q3.awaitTermination(300)
    ids3 = {r["url"]: r["entity_id"] for r in spark.read.parquet(table).collect()}
    assert ids3 == ids2
