"""Structured Streaming jobs.

The reference is batch-only (SURVEY.md §2.9: "incremental" = batch
deltas via anti-join). This engine additionally expresses the
incremental ingest path as real Structured Streaming so a crawl feed
can be processed continuously:

- stream_ingest_pages : readStream over a pages directory -> extract +
  normalize + fingerprint -> append sink (the streaming analog of
  pipeline stages 1-3).
- windowed_event_counts : watermarked tumbling-window aggregation over
  an event stream (late data handled by the watermark).
- streaming_exact_dedup : dropDuplicatesWithinWatermark on the content
  fingerprint — exactly-once new-document emission.

All jobs are testable locally with a file source + memory sink +
processAllAvailable() (see tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entity_resolution_spark.datagen import PAGES_SCHEMA
from entity_resolution_spark.extract import html_to_text, html_to_title
from entity_resolution_spark.functions.text import fingerprint


def stream_ingest_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """readStream(pages parquet dir) -> extracted/normalized stream."""
    raw = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_dir)
    return raw.select(
        "url",
        "warc_ts",
        "lang",
        html_to_text(F.col("html")).alias("extracted_text"),
        html_to_title(F.col("html")).alias("title"),
        fingerprint(html_to_text(F.col("html"))).alias("fingerprint"),
        F.xxhash64("url").alias("url_id"),
    )


def _event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local tz); sources often carry
    TIMESTAMP_NTZ — cast up front so either works."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        return events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window count+sum per key (late rows beyond
    the watermark are dropped, the standard completeness/latency
    trade)."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def streaming_exact_dedup(pages_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Emit each content fingerprint once within the watermark window
    (streaming analog of exact_dedup; state is bounded by the
    watermark, which is what makes this viable on an infinite crawl)."""
    return pages_stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["fingerprint"]
    )


def sessionize_events(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session-window aggregation (streaming sessionization)."""
    events = _event_time(events, ts_col)
    return (
        events.withWatermark(ts_col, gap)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(user_col))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            user_col,
            "n_events",
            "total_value",
        )
    )
