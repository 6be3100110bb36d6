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


def test_run_ddl_guard_and_execute(spark):
    from entity_resolution_spark.sources.io import run_ddl
    import pytest

    run_ddl(spark, "CREATE OR REPLACE TEMP VIEW _ddl_v AS SELECT 7 AS x")
    assert spark.table("_ddl_v").first()["x"] == 7
    run_ddl(spark, "DROP VIEW _ddl_v")
    with pytest.raises(ValueError):
        run_ddl(spark, "SELECT 1")


def test_iceberg_merge_contract(spark, tmp_path):
    """MERGE INTO incremental-insert contract (reference
    mlir.py:2082-2095 as one atomic statement). Runs only where an
    Iceberg runtime exists; this sandbox ships none, so the test
    documents + type-checks the surface and asserts the graceful
    refusal path."""
    import pytest

    from entity_resolution_spark.sources.io import iceberg_available, merge_upsert

    batch = spark.range(3).withColumnRenamed("id", "url_id")
    if not iceberg_available(spark):
        with pytest.raises(RuntimeError, match="Iceberg"):
            merge_upsert(spark, "db.entities", batch, ["url_id"])
        pytest.skip("no Iceberg runtime jars in this image")
    # with a real catalog: seed a table, merge a batch that overlaps,
    # assert existing rows unchanged and only unseen keys appended
    spark.sql("CREATE TABLE IF NOT EXISTS local.db.ents (url_id BIGINT) USING iceberg")
    spark.range(2).withColumnRenamed("id", "url_id").writeTo("local.db.ents").append()
    merge_upsert(spark, "local.db.ents", batch, ["url_id"])
    assert spark.table("local.db.ents").count() == 3


def test_write_training_shards(spark, tmp_path):
    from pyspark.sql import functions as F

    from entity_resolution_spark.sources.io import write_training_shards

    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"),
                                     (F.col("id") * 7).alias("payload"))
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=8, id_col="doc_id")
    back = spark.read.parquet(out)
    # lossless and shard-complete
    assert back.count() == 1000
    assert back.select("shard").distinct().count() == 8
    # shard membership is a pure function of the id: invariant under
    # input repartitioning / rewrite
    out2 = str(tmp_path / "shards2")
    write_training_shards(df.repartition(13), out2, n_shards=8, id_col="doc_id")
    a = {(r["doc_id"], r["shard"]) for r in back.select("doc_id", "shard").collect()}
    b = {(r["doc_id"], r["shard"])
         for r in spark.read.parquet(out2).select("doc_id", "shard").collect()}
    assert a == b
    # one file per shard when max_records_per_file is unset
    import glob
    for k in range(8):
        files = glob.glob(f"{out}/shard={k}/*.parquet")
        assert len(files) == 1, (k, files)


def test_write_training_shards_validates(spark):
    from entity_resolution_spark.sources.io import write_training_shards

    df = spark.range(3).withColumnRenamed("id", "doc_id")
    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        write_training_shards(df, "/tmp/x", n_shards=0, id_col="doc_id")


def test_write_bucketed_join_is_shuffle_free(spark, tmp_path):
    from entity_resolution_spark.sources.io import write_bucketed

    ents = spark.range(2000).select(
        F.col("id").alias("url_id"), (F.col("id") % 97).alias("entity_id")
    )
    feats = spark.range(2000).select(
        F.col("id").alias("url_id"), (F.col("id") * 3).alias("feat")
    )
    write_bucketed(ents, "t_ents", ["url_id"], 8, sort_cols=["url_id"],
                   path=str(tmp_path / "ents"))
    write_bucketed(feats, "t_feats", ["url_id"], 8, sort_cols=["url_id"],
                   path=str(tmp_path / "feats"))
    try:
        # one file per bucket: the pre-write repartition bounds file count
        import glob
        assert len(glob.glob(str(tmp_path / "ents" / "*.parquet"))) == 8

        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("t_ents").join(spark.table("t_feats"), "url_id")
            # correct result
            assert joined.count() == 2000
            # and the plan reads both bucketed scans with NO Exchange:
            # the write-time distribution replaces the join shuffle
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_ents")
        spark.sql("DROP TABLE IF EXISTS t_feats")
