"""Table IO — parquet locally, Iceberg when the runtime has the jars.

Reference parity: replaces the Snowflake connector surface
(reference mlir.py:11-167 — read/write/DDL/table-exists/freshness)
with catalog- and parquet-backed equivalents. Iceberg is gated behind
a capability probe (the test image ships no Iceberg runtime jar).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, location: str) -> DataFrame:
    """Read a table by path (parquet dir) or catalog name (db.table)."""
    if "/" in location:
        return spark.read.parquet(location)
    return spark.table(location)


def write_table(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    """Write by path (parquet) or catalog name (Iceberg writeTo when
    available, saveAsTable otherwise). Reference S2, mlir.py:73-74."""
    if "/" in location:
        df.write.mode(mode).parquet(location)
        return
    spark = df.sparkSession
    if iceberg_available(spark):
        writer = df.writeTo(location)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
    else:
        df.write.mode(mode).saveAsTable(location)


def table_exists(spark: SparkSession, location: str) -> bool:
    """Reference S5 (mlir.py:128-141) — existence + non-emptiness."""
    if "/" in location:
        try:
            return len(spark.read.parquet(location).take(1)) > 0
        except Exception:
            return False
    return spark.catalog.tableExists(location)


def freshness_ok(df: DataFrame, ts_col: str = "warc_ts") -> bool:
    """Reference S6 (mlir.py:145-167): max(ts) >= today."""
    row = df.select(F.max(F.col(ts_col)).cast("date").alias("d")).first()
    if row is None or row["d"] is None:
        return False
    today = df.sparkSession.sql("SELECT current_date() AS d").first()["d"]
    return row["d"] >= today
