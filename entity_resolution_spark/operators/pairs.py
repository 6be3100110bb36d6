"""Stage 5 — candidate-pair generation (blocking self-join).

Reference parity: the reference's pair SQL (mlir.py:1166-1254) does a
key-equi self-join with `card_nbr_1 < card_nbr_2`, attaches all PII to
both sides, and dedupes on the concatenated pair id. Here the join is
one Spark self-join on block_key with id_1 < id_2 and a keyed
dropDuplicates — feature columns are attached AFTER pair dedup so the
wide payload never rides the (much larger) pre-dedup pair stream.

Scale: shuffle on block_key (both sides identically partitioned), AQE
skew-join splits residual hot keys; dedup shuffles on (id_1, id_2),
which is near-uniform by construction (hash ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(blocks: DataFrame, id_col: str = "url_id") -> DataFrame:
    """blocks(block_key, url_id) -> pairs(id_1, id_2) with id_1 < id_2,
    exactly once per pair (a pair sharing several keys appears once)."""
    left = blocks.select(F.col("block_key"), F.col(id_col).alias("id_1"))
    right = blocks.select(F.col("block_key"), F.col(id_col).alias("id_2"))
    return (
        left.join(right, "block_key")
        .filter(F.col("id_1") < F.col("id_2"))
        .select("id_1", "id_2")
        .dropDuplicates(["id_1", "id_2"])
    )


def attach_features(
    pairs: DataFrame,
    features: DataFrame,
    id_col: str = "url_id",
    cols: list[str] | None = None,
    broadcast: bool = False,
) -> DataFrame:
    """Two-sided feature attach (reference J3 pattern, mlir.py:1240-1254)
    without the string-concat pair id: join features once per side with
    _1/_2 suffixes.

    ``broadcast=True`` pins a broadcast-hash join (caller asserts the
    projected feature payload fits executor memory). Near the size
    threshold Catalyst's estimate can flip strategy run-to-run —
    broadcast one run, a double shuffle of the much larger pair stream
    the next — so callers that KNOW the side is small should pin it.
    At 10^9+-row feature tables leave it False (co-partitioned SMJ)."""
    cols = cols or [c for c in features.columns if c != id_col]
    f1 = features.select(
        F.col(id_col).alias("id_1"), *[F.col(c).alias(f"{c}_1") for c in cols]
    )
    f2 = features.select(
        F.col(id_col).alias("id_2"), *[F.col(c).alias(f"{c}_2") for c in cols]
    )
    if broadcast:
        f1, f2 = F.broadcast(f1), F.broadcast(f2)
    return pairs.join(f1, "id_1").join(f2, "id_2")
