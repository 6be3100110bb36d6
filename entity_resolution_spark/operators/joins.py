"""Join operators Spark lacks as builtins, expressed as compositions
of native DataFrame ops (no UDFs, no driver loops).

- asof_join_backward : event-time as-of join ("latest right row at or
  before each left row, per key"), the standard enrichment join for
  training-data pipelines (attach last-known state to each example).

The reference has only equi/anti joins (SURVEY.md §2.3); as-of is part
of the training-data operator set this engine adds on top.

Scale notes: the implementation is a union + one window — a single
shuffle on (key), no range-explosion, no per-key collect. Skewed keys
behave exactly like any window partition (AQE-splittable input, sorted
spill). This beats the naive `left join on key and r.ts <= l.ts` which
goes quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tie_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    right_ts <= left_ts for the same `on` key (NULLs if none).

    Ties on right_ts are broken by the greatest `tie_col` (required to
    be deterministic when right_ts is not unique per key).

    Plan: tag both sides, unionByName, one window
    partitionBy(on).orderBy(ts, is_right desc, tie) with last(ignorenulls)
    over unboundedPreceding — right rows at ts == left_ts sort before
    the left row, so equality qualifies (`>=` semantics, like ASOF).

    The right payload travels as ONE struct column, so last(ignorenulls)
    picks the whole latest qualifying right ROW — a NULL field inside it
    stays NULL instead of being backfilled from an older row (round-1
    advisory: per-column last() mixed fields across right rows).
    NULL-keyed right rows are dropped up front to preserve join NULL
    semantics (NULL never matches NULL); NULL-keyed left rows get NULL
    payload.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    out_cols = [f"{c}{suffix}" for c in right_cols]

    right = right.filter(F.col(on).isNotNull())
    r_struct = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r_struct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_cols
    ) + ">"

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_r"),
        F.lit(None).cast(right.schema[tie_col].dataType if tie_col else "long").alias("_tie"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_r"),
        (F.col(tie_col) if tie_col else F.lit(0)).alias("_tie"),
        F.lit(None).cast(l_tagged.schema["_l"].dataType).alias("_l"),
        r_struct.alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_is_r").desc(), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "_is_r",
        "_l",
        F.last(F.col("_r"), ignorenulls=True).over(w).alias("_r"),
    )
    return filled.filter(F.col("_is_r") == 0).select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_r.{c}").alias(o) for c, o in zip(right_cols, out_cols)],
    )
