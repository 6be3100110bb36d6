"""Benchmark decontamination — remove training documents that overlap
an evaluation set, the standard n-gram-overlap protocol (GPT-3 appx C /
Llama-style 13-gram matching).

Scale shape at 100 TB: the BENCHMARK side is eval-suite-sized (at most
a few million n-grams), so its fingerprint set is broadcast — the
corpus-side n-gram explode is map-side, the broadcast inner join keeps
only HITS (typically a vanishing fraction of the corpus), and every
shuffle after that is sized by the hits, not the corpus. No corpus-side
self-join exists anywhere in this protocol.

hash_mode='md5' swaps xxhash64 fingerprints for the ANSI-SQL 60-bit
md5 hash so a DuckDB oracle replays the windows bit-for-bit (same twin
pattern as blocking / minhash / containment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.functions.text import rolling_fingerprints
from entity_resolution_spark.normalize import tokens


def _ngram_fps(
    df: DataFrame, id_col: str | None, text_col: str, n: int, hash_mode: str
) -> DataFrame:
    """Distinct rolling n-gram fingerprints: (id?, fp). Normalization
    (lowercase, whitespace-collapse) rides inside tokens(), so cosmetic
    differences between a benchmark dump and a crawled page still hit."""
    fps = F.explode(rolling_fingerprints(tokens(F.col(text_col)), n, hash_mode)).alias("fp")
    cols = ([F.col(id_col)] if id_col else []) + [fps]
    return df.select(*cols).distinct()


def flag_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Append `n_contaminated` (count of distinct doc n-grams that
    appear in the benchmark) and `contaminated` (any hit) to docs.

    Docs shorter than n tokens have no n-grams and are never flagged
    (standard protocol: nothing to leak verbatim)."""
    if n < 1:
        raise ValueError(f"flag_contamination: n must be >= 1, got {n}")
    bench_fps = _ngram_fps(benchmark, None, bench_text_col, n, hash_mode)
    doc_fps = _ngram_fps(docs, id_col, text_col, n, hash_mode)
    hits = (
        doc_fps.join(F.broadcast(bench_fps), "fp")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)))
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Drop every document sharing at least one n-gram with the
    benchmark. One anti-join against the (small) contaminated-id set —
    AQE broadcasts it at runtime; the returned frame keeps docs'
    schema untouched."""
    bench_fps = _ngram_fps(benchmark, None, bench_text_col, n, hash_mode)
    contaminated_ids = (
        _ngram_fps(docs, id_col, text_col, n, hash_mode)
        .join(F.broadcast(bench_fps), "fp")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated_ids, id_col, "left_anti")
