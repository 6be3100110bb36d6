"""asof_join_backward: hand-built cases + random-data oracle vs the
naive quadratic formulation."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from entity_resolution_spark.operators.joins import asof_join_backward


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_basic(spark):
    left = _mk(
        spark,
        [(1, 10, 100), (1, 20, 101), (2, 5, 102)],
        "k long, ts long, lid long",
    ).select(F.col("k"), F.col("ts"), F.col("lid"))
    right = _mk(
        spark,
        [(1, 8, 200), (1, 15, 201), (1, 20, 202), (3, 1, 203)],
        "k long, ts long, rid long",
    )
    out = asof_join_backward(
        left, right, on="k", left_ts="ts", right_ts="ts",
        right_cols=["rid"], tie_col="rid",
    ).collect()
    got = {r["lid"]: r["rid_asof"] for r in out}
    # lid 100 at ts=10 -> rid 200 (ts=8); lid 101 at ts=20 -> rid 202
    # (equality qualifies); lid 102 (k=2) -> no right rows -> NULL
    assert got == {100: 200, 101: 202, 102: None}
    assert len(out) == 3  # left row count preserved


def test_asof_tie_break(spark):
    """Two right rows at the same ts: the greatest tie_col wins."""
    left = _mk(spark, [(1, 10, 1)], "k long, ts long, lid long")
    right = _mk(spark, [(1, 10, 7), (1, 10, 9), (1, 9, 50)], "k long, ts long, rid long")
    out = asof_join_backward(
        left, right, on="k", right_cols=["rid"], tie_col="rid"
    ).collect()
    assert out[0]["rid_asof"] == 9


def test_asof_null_payload_not_backfilled(spark):
    """A NULL field in the latest qualifying right row must stay NULL —
    not be filled from an older right row (whole-row semantics)."""
    left = _mk(spark, [(1, 10, 100)], "k long, ts long, lid long")
    right = spark.createDataFrame(
        [(1, 5, 900, "old"), (1, 9, None, "new")],
        "k long, ts long, rid long, tag string",
    )
    out = asof_join_backward(
        left, right, on="k", right_cols=["rid", "tag"], tie_col="ts"
    ).collect()
    assert out[0]["tag_asof"] == "new"
    assert out[0]["rid_asof"] is None  # NOT 900 from the older row


def test_asof_null_keys_never_match(spark):
    """NULL-keyed left rows get NULL payload; NULL-keyed right rows are
    ignored (join NULL semantics, not window partition semantics)."""
    left = spark.createDataFrame([(None, 10, 100), (1, 10, 101)], "k long, ts long, lid long")
    right = spark.createDataFrame([(None, 5, 900), (1, 5, 901)], "k long, ts long, rid long")
    out = asof_join_backward(left, right, on="k", right_cols=["rid"], tie_col="rid")
    got = {r["lid"]: r["rid_asof"] for r in out.collect()}
    assert got == {100: None, 101: 901}


def test_asof_random_vs_quadratic_oracle(spark):
    rnd = random.Random(13)
    lrows = [(rnd.randrange(6), rnd.randrange(50), i) for i in range(120)]
    rrows = [(rnd.randrange(6), rnd.randrange(50), 1000 + i) for i in range(150)]
    left = _mk(spark, lrows, "k long, ts long, lid long")
    right = _mk(spark, rrows, "k long, ts long, rid long")
    out = asof_join_backward(
        left, right, on="k", right_cols=["ts", "rid"], tie_col="rid", suffix="_r"
    )
    got = {(r["lid"]): (r["ts_r"], r["rid_r"]) for r in out.collect()}

    naive = (
        left.alias("l")
        .join(right.alias("r"), (F.col("l.k") == F.col("r.k")) & (F.col("r.ts") <= F.col("l.ts")), "left")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("l.lid").orderBy(
                    F.col("r.ts").desc_nulls_last(), F.col("r.rid").desc_nulls_last()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(F.col("l.lid"), F.col("r.ts").alias("ts_r"), F.col("r.rid").alias("rid_r"))
    )
    want = {r["lid"]: (r["ts_r"], r["rid_r"]) for r in naive.collect()}
    assert got == want
    assert len(got) == 120
