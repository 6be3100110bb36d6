"""Small shared DataFrame utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
    try:
        n_files = len(df.inputFiles())
    except Exception:  # noqa: BLE001 — conservative: unknown -> fan out
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
