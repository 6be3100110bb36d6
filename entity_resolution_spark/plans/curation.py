"""Corpus curation plan — the end-to-end filter chain a large-scale
training-data pipeline runs over raw documents, composed from this
engine's operators with a per-row decision and per-stage metrics:

    language gate  ->  quality gates  ->  exact dedup  ->
    transitive near-dup dedup (MinHash-LSH + connected components)

Stage ORDER is the scale design: row-local column algebra first (lang,
quality — no shuffle), then the one-shuffle exact dedup, and the
expensive near-dup candidate generation only ever sees the survivors.
Every dropped row keeps a reason (`status`), so corpus ablations are
auditable instead of silent — the same observability stance as the
blocking key-stats (reference drops silently, mlir.py:1180).

The near-dup stage is TRANSITIVE: candidate pairs feed the
large-star/small-star components loop and each cluster keeps its
minimum id, so chains A~B~C collapse to one survivor even when A and C
never pair directly — plain pairwise dropping (most ad-hoc dedup
scripts) either over- or under-deletes on chains.

hash_mode='md5' makes the whole decision column replayable in ANSI SQL
(driver query `doc_curation` is hash-checked against a DuckDB replay
of all four stages, recursive closure included).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import (
    digit_ratio,
    fingerprint,
    language_id,
    punct_ratio,
    token_count,
)
from entity_resolution_spark.normalize import tokens
from entity_resolution_spark.operators.connected_components import connected_components
from entity_resolution_spark.operators.dedup import minhash_lsh_dedup


@dataclass(frozen=True)
class CurationConfig:
    allowed_langs: tuple[str, ...] = ("en", "de", "es", "fr")
    min_tokens: int = 20
    max_tokens: int = 100_000
    max_punct_ratio: float = 0.25
    max_digit_ratio: float = 0.30
    near_dup_threshold: float = 0.5
    shingle_k: int = 3
    num_perm: int = 64
    bands: int = 16
    rows_per_band: int = 4
    hash_mode: str = "xxhash64"
    # estimate-gate margin for the near-dup verify; None = exact verify
    # of every band candidate (no ~1e-3 boundary recall loss) — plumbed
    # so curation callers can opt out of the approximation (round-2
    # advisory).
    gate_sigmas: float | None = 3.0


STATUSES = ("kept", "lang_filtered", "quality_filtered", "exact_dup", "near_dup")


def curate(
    docs: DataFrame,
    cfg: CurationConfig = CurationConfig(),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id_col, status) for EVERY input row; keep the corpus with
    ``result.filter(status == 'kept')`` joined back on id. Statuses are
    assigned by first failing stage (a row that is both off-language
    and low-quality reads lang_filtered)."""
    toks = tokens(F.col(text_col))
    flags = docs.select(
        F.col(id_col),
        F.col(text_col),
        language_id(toks).isin(*cfg.allowed_langs).alias("_lang_ok"),
        (
            token_count(F.col(text_col)).between(cfg.min_tokens, cfg.max_tokens)
            & (punct_ratio(F.col(text_col)) <= cfg.max_punct_ratio)
            & (digit_ratio(F.col(text_col)) <= cfg.max_digit_ratio)
        ).alias("_quality_ok"),
        fingerprint(F.col(text_col)).alias("_fp"),
    ).localCheckpoint(eager=True)  # feeds 3 downstream consumers

    s12 = flags.filter(F.col("_lang_ok") & F.col("_quality_ok"))
    # exact-dup winner per fingerprint via partial-aggregatable
    # min(struct(id, text)) — ids are unique so text never decides the
    # min; no window, no join back (round-4 de-skew: a page mirrored
    # 10^8 times must not single-task)
    survivors = (
        s12.groupBy("_fp")
        .agg(F.min(F.struct(F.col(id_col), F.col(text_col))).alias("_w"))
        .select(F.col("_w")[id_col].alias(id_col), F.col("_w")[text_col].alias(text_col))
    )

    pairs = minhash_lsh_dedup(
        survivors,
        id_col=id_col,
        text_col=text_col,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.bands,
        rows_per_band=cfg.rows_per_band,
        threshold=cfg.near_dup_threshold,
        hash_mode=cfg.hash_mode,
        gate_sigmas=cfg.gate_sigmas,
    )
    comps = connected_components(
        pairs.select(F.col("id_1").alias("src"), F.col("id_2").alias("dst"))
    )

    # a gated row is an exact dup iff it is NOT its fingerprint's
    # winner (semi-join against the winner set replaces the old
    # window-column comparison)
    exact = s12.join(
        survivors.select(F.col(id_col), F.lit(False).alias("_exact_dup")),
        id_col,
        "left",
    ).select(id_col, F.coalesce("_exact_dup", F.lit(True)).alias("_exact_dup"))
    status = (
        flags.join(exact, id_col, "left")
        .join(comps, flags[id_col] == comps["id"], "left")
        .select(
            id_col,
            F.when(~F.col("_lang_ok"), F.lit("lang_filtered"))
            .when(~F.col("_quality_ok"), F.lit("quality_filtered"))
            .when(F.col("_exact_dup"), F.lit("exact_dup"))
            .when(
                F.col("component").isNotNull() & (F.col("component") != F.col(id_col)),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    return status


def curation_metrics(status: DataFrame) -> dict[str, int]:
    rows = status.groupBy("status").agg(F.count("*").alias("n")).collect()
    out = {s: 0 for s in STATUSES}
    out.update({r["status"]: int(r["n"]) for r in rows})
    return out
