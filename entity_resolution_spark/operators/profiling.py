"""One-pass table profiling — the data-quality probe a pipeline runs
before trusting an ingest: per-column row count, null count, distinct
count, min, max.

All metrics for all columns compute in ONE aggregation over one scan
(Spark plans the multiple DISTINCT aggregates via a single Expand —
input rows multiply by the number of profiled columns, the documented
cost of exact distincts in one pass). exact_distinct=False swaps in
approx_count_distinct (HLL, no Expand) — the 100-TB default; the
exact mode exists so the driver's DuckDB oracle can value-check the
operator bit-for-bit. min/max aggregate on the NATIVE column type and
cast to string afterwards, so numeric columns order numerically, not
lexicographically."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """-> (column, n_rows, n_nonnull, n_null, n_distinct, min_value,
    max_value) — one output row per profiled column, ordered by the
    column's position in `cols`."""
    cols = cols if cols is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_table: columns not in frame: {missing}")
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            distinct(F.col(c)).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    # unpivot the 1-row wide frame to one row per column — stack() is
    # a pure projection over the single aggregated row
    stack_args = ", ".join(
        f"'{c}', `{c}__nn`, `{c}__d`, `{c}__min`, `{c}__max`" for c in cols
    )
    return one.select(
        "__rows",
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nonnull, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column",
        F.col("__rows").alias("n_rows"),
        "n_nonnull",
        (F.col("__rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
        "min_value",
        "max_value",
    )
