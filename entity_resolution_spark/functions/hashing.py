"""Hashing & sketches: shingles, MinHash, LSH band keys, SimHash,
stable entity ids.

All JVM-native (xxhash64 + integer arithmetic inside whole-stage
codegen) — no Python in the hot path. Signatures are deterministic
functions of content, independent of partitioning/row order.

Reference parity: replaces get_hash_15 (reference mlir.py:218-220,
sha1 mod 1e15 in a per-row UDF) and blake2b entity hashes
(mlir.py:1938-1943) with xxhash64 / sha2.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: keeps a*h+b within signed-64 range even under
# ANSI arithmetic (Spark 4 default), since a,b,h' < 2^31.
MERSENNE_P = (1 << 31) - 1


def shingles(tokens: Column, k: int = 3) -> Column:
    """Distinct hashed k-token shingles (array<bigint>) from a token
    array. Hashed to 64-bit so downstream set ops compare longs, not
    strings — ~8 bytes/shingle instead of ~30."""
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(0)))
    sh = F.transform(idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, k))))
    # pages shorter than k tokens: fall back to hashing the whole text
    whole = F.array(F.xxhash64(F.concat_ws(" ", tokens)))
    return F.array_distinct(F.when(n >= k, sh).otherwise(whole))


def _perm_coeffs(num_perm: int, seed: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P)) for _ in range(num_perm)]


def minhash_signature(
    df: DataFrame,
    id_col: str,
    set_col: str,
    num_perm: int = 64,
    seed: int = 1729,
    out_col: str = "minhash_sig",
) -> DataFrame:
    """Append a MinHash signature (array<bigint>, length num_perm) of
    the element-set column ``set_col`` (array of longs or strings).

    Plan shape: explode -> one groupBy with num_perm min() aggregates
    (single shuffle on id_col, map-side partial aggregation) -> array.
    Empty sets get a sentinel signature of MERSENNE_P values.
    """
    coeffs = _perm_coeffs(num_perm, seed)
    exploded = df.select(id_col, F.explode_outer(set_col).alias("_el")).withColumn(
        "_h", F.pmod(F.xxhash64("_el"), F.lit(MERSENNE_P))
    )
    aggs = [
        F.min(F.pmod(F.col("_h") * a + b, F.lit(MERSENNE_P))).alias(f"_mh{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = exploded.groupBy(id_col).agg(*aggs).select(
        id_col,
        F.array(*[F.coalesce(F.col(f"_mh{i}"), F.lit(MERSENNE_P)) for i in range(num_perm)]).alias(
            out_col
        ),
    )
    return df.join(sig, id_col, "left")


def lsh_band_keys(sig: Column, bands: int, rows: int) -> Column:
    """LSH band keys (array<string>) from a MinHash signature: one key
    per band = 'b{i}:' + xxhash64 of that band's slice. Two sets share
    a key iff a full band of MinHash components agrees —
    P(candidate) = 1-(1-J^rows)^bands."""
    keys = [
        F.concat_ws(
            ":",
            F.lit(f"b{i}"),
            F.xxhash64(F.concat_ws(",", F.transform(F.slice(sig, i * rows + 1, rows), lambda x: x.cast("string")))).cast("string"),
        )
        for i in range(bands)
    ]
    return F.array(*keys)


def simhash64(df: DataFrame, id_col: str, set_col: str, out_col: str = "simhash") -> DataFrame:
    """Append a 64-bit SimHash of the element array ``set_col``.

    explode -> per-bit +/-1 sums in ONE groupBy (64 partial-aggregated
    sums, map-side combine) -> bit assembly with shiftleft/bitwise-or
    (no arithmetic overflow even under ANSI)."""
    exploded = df.select(id_col, F.explode_outer(set_col).alias("_el")).withColumn(
        "_h", F.xxhash64("_el")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"_b{i}")
        for i in range(64)
    ]
    agg = exploded.groupBy(id_col).agg(*bit_sums)
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"_b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = agg.select(id_col, sim.alias(out_col))
    return df.join(out, id_col, "left")


def simhash_hamming(a: Column, b: Column) -> Column:
    """Bit distance between two simhashes: popcount(a XOR b)."""
    return F.bit_count(a.bitwiseXOR(b))


def entity_hash(col: Column) -> Column:
    """Stable entity id: sha2-256 hex of the canonical key (reference
    used blake2b-20, mlir.py:1938-1943; sha2 is native + deterministic).
    Properties (reference README.md:46-49): unique per entity, time
    invariant, invariant to new duplicate pages and re-crawls as long
    as the canonical record is unchanged."""
    return F.sha2(col.cast("string"), 256)
