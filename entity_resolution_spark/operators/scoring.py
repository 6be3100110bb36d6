"""Stage 6 — pairwise scoring: cheap gates first, expensive similarity
only on survivors.

Reference parity: the reference featurizes every candidate pair with
~24 per-row-UDF similarity columns and thresholds an XGBoost
probability at 0.75 (mlir.py:1575-1808, Orchestrate_Demo.py:378). This
engine scores with a closed-form weighted similarity — exact-fingerprint
gate, then native token-set Jaccard + Levenshtein-ratio + Arrow-batched
Jaro-Winkler on the title — thresholded to edges. The cheap-first
gating mirrors the reference's either_null short-circuit
(mlir.py:1636-1642) and the NOT-EXISTS removal of already-matched
pairs (Orchestrate_Demo.py:360).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.similarity import (
    jaro_winkler,
    levenshtein_ratio,
    token_jaccard,
)


@dataclass(frozen=True)
class ScoringConfig:
    w_jaccard: float = 0.6
    w_title_jw: float = 0.25
    w_prefix_lev: float = 0.15
    prefix_len: int = 128
    threshold: float = 0.42
    cheap_gate: float = 0.10  # skip expensive sims below this Jaccard


def score_pairs(pairs_feat: DataFrame, cfg: ScoringConfig = ScoringConfig()) -> DataFrame:
    """pairs with *_1/*_2 feature columns -> + feature scores + score.

    Expects columns: fingerprint_{1,2}, shingles_{1,2} (array<bigint>),
    norm_title_{1,2}, text_prefix_{1,2}.
    """
    exact = (F.col("fingerprint_1") == F.col("fingerprint_2")).alias("exact_dup")
    jac = token_jaccard(F.col("shingles_1"), F.col("shingles_2")).alias("jaccard_shingles")
    gated = pairs_feat.select("*", exact, jac)

    # Cheap gate: exact dups score 1 immediately; pairs with
    # near-disjoint shingle sets never see JW/Levenshtein.
    survivors_cond = (~F.col("exact_dup")) & (F.col("jaccard_shingles") >= cfg.cheap_gate)

    jw = F.when(
        survivors_cond, jaro_winkler(F.col("norm_title_1"), F.col("norm_title_2"))
    ).otherwise(F.lit(0.0))
    lev = F.when(
        survivors_cond, levenshtein_ratio(F.col("text_prefix_1"), F.col("text_prefix_2"))
    ).otherwise(F.lit(0.0))

    scored = gated.select(
        "*",
        jw.alias("jw_title"),
        lev.alias("lev_ratio_prefix"),
    )
    score = (
        F.when(F.col("exact_dup"), F.lit(1.0))
        .otherwise(
            F.col("jaccard_shingles") * cfg.w_jaccard
            + F.col("jw_title") * cfg.w_title_jw
            + F.col("lev_ratio_prefix") * cfg.w_prefix_lev
        )
        .alias("score")
    )
    return scored.select("*", score)


def edges_from_scores(scored: DataFrame, threshold: float) -> DataFrame:
    """score >= threshold -> edges(src, dst). (Reference P6 pattern.)"""
    return scored.filter(F.col("score") >= threshold).select(
        F.col("id_1").alias("src"), F.col("id_2").alias("dst")
    )
