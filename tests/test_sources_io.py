"""Table IO surface: read/write roundtrip, existence, freshness."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.sources.io import (
    freshness_ok,
    read_table,
    table_exists,
    write_table,
)


def test_write_read_roundtrip(spark, tmp_path):
    loc = str(tmp_path / "t1")
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    write_table(df, loc)
    back = read_table(spark, loc)
    assert back.count() == 10
    assert {r["x"] for r in back.collect()} == {2 * i for i in range(10)}


def test_append_mode(spark, tmp_path):
    loc = str(tmp_path / "t2")
    write_table(spark.range(5), loc)
    write_table(spark.range(5), loc, mode="append")
    assert read_table(spark, loc).count() == 10


def test_table_exists(spark, tmp_path):
    loc = str(tmp_path / "t3")
    assert not table_exists(spark, loc)
    write_table(spark.range(3), loc)
    assert table_exists(spark, loc)
    empty = str(tmp_path / "t4")
    write_table(spark.range(0), empty)
    assert not table_exists(spark, empty)  # exists but empty -> reference S5 semantics


def test_freshness(spark):
    fresh = spark.sql("SELECT current_timestamp() AS warc_ts")
    stale = spark.sql("SELECT timestamp'2001-01-01 00:00:00' AS warc_ts")
    assert freshness_ok(fresh)
    assert not freshness_ok(stale)
