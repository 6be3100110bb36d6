"""Structured Streaming jobs driven to completion with file source +
memory sink (synchronous via processAllAvailable)."""

import os

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.datagen import synth_corpus, PAGES_SCHEMA
from entity_resolution_spark.streaming.jobs import (
    sessionize_events,
    stream_ingest_pages,
    streaming_exact_dedup,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream"))
    pages, _, _ = synth_corpus(n_entities=40, seed=5)
    spark.createDataFrame(pages, schema=PAGES_SCHEMA).write.mode("overwrite").parquet(d)
    return d


def _run(stream_df, name, mode="append"):
    q = stream_df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable()
    q.stop()


def test_stream_ingest_extracts(spark, pages_dir):
    out = stream_ingest_pages(spark, pages_dir)
    assert out.isStreaming
    _run(out, "ingest")
    got = spark.sql("SELECT * FROM ingest")
    n = got.count()
    assert n > 0
    assert got.filter(F.length("fingerprint") != 32).count() == 0
    assert got.filter(F.col("extracted_text") == "").count() == 0


def test_streaming_dedup_emits_once(spark, pages_dir):
    stream = stream_ingest_pages(spark, pages_dir)
    _run(streaming_exact_dedup(stream), "dedup")
    got = spark.sql("SELECT fingerprint, count(*) AS n FROM dedup GROUP BY fingerprint")
    assert got.filter(F.col("n") > 1).count() == 0


def test_windowed_event_counts(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = spark.read.parquet(f"{SF}/events.parquet")
    events.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(events.schema).parquet(d)
    _run(windowed_event_counts(stream), "wincounts", mode="append")
    got = spark.sql("SELECT * FROM wincounts")
    # batch oracle: same aggregation, batch API
    batch = (
        events.groupBy(F.window("ts", "5 minutes").alias("win"), "event_type")
        .agg(F.count("*").alias("n"))
        .count()
    )
    # append mode only emits windows below the final watermark
    assert 0 < got.count() <= batch
    assert got.filter(F.col("n") <= 0).count() == 0


def test_sessionize_events(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_sess"))
    events = spark.read.parquet(f"{SF}/events.parquet")
    events.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(events.schema).parquet(d)
    _run(sessionize_events(stream, gap="30 minutes"), "sessions", mode="append")
    got = spark.sql("SELECT * FROM sessions")
    assert got.count() > 0
    assert got.filter(F.col("session_end") < F.col("session_start")).count() == 0


def test_stateful_running_key_stats(spark, pages_dir):
    """applyInPandasWithState: per-domain running stats accumulate
    across the stream and match a batch oracle."""
    from entity_resolution_spark.normalize import url_domain
    from entity_resolution_spark.streaming.jobs import stream_ingest_pages
    from entity_resolution_spark.streaming.stateful import running_key_stats

    stream = stream_ingest_pages(spark, pages_dir).select(
        url_domain(F.col("url")).alias("domain"),
        "fingerprint",
        F.col("warc_ts").cast("timestamp").cast("long").alias("ep"),
    )
    _run(running_key_stats(stream, "domain"), "keystats", mode="update")
    got = spark.sql(
        "SELECT key, max(n_pages) AS n_pages, max(n_distinct_fp) AS n_fp FROM keystats GROUP BY key"
    )
    batch = (
        spark.read.parquet(pages_dir)
        .select(url_domain(F.col("url")).alias("domain"), "url")
        .groupBy("domain")
        .count()
    )
    want = {r["domain"]: r["count"] for r in batch.collect()}
    have = {r["key"]: r["n_pages"] for r in got.collect()}
    assert have == want
    assert got.filter(F.col("n_fp") <= 0).count() == 0
