"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical-plan node names whose presence means the frame already has
# shuffle-determined (or caller-chosen) width — fanning out again
# could only shrink it or add a useless exchange
_WIDE_NODES = (
    "Repartition",  # covers RepartitionByExpression (explicit caller width)
    "Join",
    "Aggregate",
    "Window",
    "Sort",
    "Deduplicate",
)


def fan_out(df: DataFrame, *key_cols: str, minimum: int = 8) -> DataFrame:
    """Repartition a narrow input to cluster width before CPU-bound
    map stages (shingling, MinHash folds, Arrow UDFs) WHEN the source
    has fewer input files than cores.

    A single-parquet-file table arrives as 1-2 partitions, and a
    map-side operator (deliberately shuffle-free at scale) then runs
    on 1-2 cores no matter the cluster size — measured 3x on the
    sf0.1 MinHash signature stage. At real scale (input files >>
    cores) the probe is a metadata call and NO shuffle is added; the
    probe uses inputFiles(), never .rdd (which would force RDD
    conversion of the plan). Hash repartition on key_cols keeps the
    layout deterministic; values of every downstream operator are
    partition-independent by design (SURVEY §7.3d).
    """
    sc = df.sparkSession.sparkContext
    target = max(sc.defaultParallelism, minimum)
    # The file probe describes the ROOT SCAN, not the frame's current
    # partitioning: a frame the caller already widened (explicit
    # repartition) or that passed through a shuffle (join/agg/window —
    # spark.sql.shuffle.partitions wide) would be SHRUNK back to
    # `target` by a second shuffle. Skip those — fan_out is for bare
    # narrow scans only. The analyzed-plan string is an analysis-time
    # probe (no physical planning, no .rdd conversion).
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:  # noqa: BLE001 — probe unavailable: assume bare scan
        plan = ""
    if any(tok in plan for tok in _WIDE_NODES):
        return df
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — conservative: unknown -> fan out
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
