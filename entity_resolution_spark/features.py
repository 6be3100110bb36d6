"""Stage 3 — feature engineering: fingerprints, shingles, MinHash.

Everything JVM-native (hashing.py); one shuffle for the MinHash
signature aggregation. The feature table is the only wide payload the
pair join ever sees, so it stays compact: hashed shingles
(array<bigint>), 64-component signature, short text prefix.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.hashing import minhash_signature, shingles
from entity_resolution_spark.functions.text import fingerprint


@dataclass(frozen=True)
class FeatureConfig:
    shingle_k: int = 3
    num_perm: int = 64
    seed: int = 1729
    prefix_len: int = 128
    # 'md5' = oracle-reproducible hashing end-to-end (string shingles +
    # md5-derived MinHash; see hashing.py) — identical plan shape,
    # value-checkable in ANSI SQL. 'xxhash64' = production fast path.
    hash_mode: str = "xxhash64"


def build_features(normalized: DataFrame, cfg: FeatureConfig = FeatureConfig()) -> DataFrame:
    """normalized pages -> feature table:
    (url_id, url, warc_ts, domain, lang, fingerprint, shingles,
    minhash_sig, norm_title, text_prefix)
    """
    with_sets = normalized.select(
        "url_id",
        "url",
        "warc_ts",
        "domain",
        "lang",
        "norm_title",
        fingerprint(F.col("extracted_text")).alias("fingerprint"),
        shingles(
            F.col("text_tokens"), cfg.shingle_k, hashed=cfg.hash_mode != "md5"
        ).alias("shingles"),
        F.substring(F.col("extracted_text"), 1, cfg.prefix_len).alias("text_prefix"),
    )
    return minhash_signature(
        with_sets,
        id_col="url_id",
        set_col="shingles",
        num_perm=cfg.num_perm,
        seed=cfg.seed,
        hash_mode=cfg.hash_mode,
    )
