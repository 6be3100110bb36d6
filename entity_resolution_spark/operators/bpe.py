"""Distributed BPE tokenizer training — the missing 'train the
tokenizer ON the corpus' step of a training-data pipeline.

Structure follows every practical BPE trainer (sentencepiece, GPT-2's
encoder build): the corpus is touched ONCE to build the word-frequency
table, and the merge loop then runs over that weighted vocabulary —
|distinct words| rows, orders of magnitude smaller than the corpus —
so n_merges iterations cost n_merges vocab-sized jobs, not corpus
scans. Same iterative-job discipline as connected components /
PageRank: one bounded driver action per round (the single argmax row),
lineage cut per round with an eager localCheckpoint.

No reference analog (the reference never tokenizes subword units);
this is a task-addendum training-data operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolution_spark.normalize import tokens

MERGES_SCHEMA = "rank int, left string, right string, merged string, pair_count long"
END_OF_WORD = "</w>"


def _adjacent_pairs(sym_col: str):
    """array<struct<l,r>> of adjacent symbol pairs; [] for 1-symbol words."""
    n = F.size(sym_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.get(sym_col, i - 1).alias("l"), F.get(sym_col, i).alias("r")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(sym_col: str, left: str, right: str, merged: str):
    """Greedy left-to-right single-pair merge as a pure array fold —
    identical semantics to the textbook BPE merge (overlapping runs
    like 'a a a' under (a,a) give [aa, a]). try_element_at: the first
    fold step sees an empty accumulator and ANSI element_at would
    throw instead of returning NULL."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Train BPE merges on the corpus. Returns (merges, segmentation):

    - merges(rank, left, right, merged, pair_count): the ordered merge
      table — rank r merged the globally most frequent adjacent symbol
      pair (weighted by word frequency) after merges 0..r-1; ties
      broken deterministically by (left, right) so the table is
      byte-identical under any partitioning/cluster size.
    - segmentation(word, subwords, cnt): every corpus word with its
      final subword split under all learned merges — the artifact a
      tokenizer applies by lookup (bpe_tokenize below).

    Words are split to characters plus a terminal '</w>' (the classic
    word-boundary symbol, so 'e n d </w>' merges differently from
    'e n d' mid-word). The loop stops early when the best remaining
    pair occurs fewer than min_pair_count times.

    Scale shape: ONE corpus-sized shuffle (the word count); every
    round after that is vocab-sized — adjacent-pair explode (< avg
    word length x |vocab| rows), partial-aggregated groupBy, argmax
    via TakeOrderedAndProject (never a full sort), one collected row,
    and a map-side fold to apply the merge. localCheckpoint per round
    keeps the plan flat (bounded lineage, blocks freed by the
    ContextCleaner)."""
    spark = docs.sparkSession
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.count("*").cast("long").alias("_cnt"))
    )
    vocab = words.select(
        "_w",
        F.concat(F.split("_w", ""), F.array(F.lit(END_OF_WORD))).alias("_sym"),
        "_cnt",
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        pairs = vocab.select(F.explode(_adjacent_pairs("_sym")).alias("_p"), "_cnt")
        best = (
            pairs.groupBy("_p")
            .agg(F.sum("_cnt").alias("_c"))
            .orderBy(F.col("_c").desc(), F.col("_p.l"), F.col("_p.r"))
            .limit(1)
            .collect()
        )
        if not best or int(best[0]["_c"]) < min_pair_count:
            break
        left, right = best[0]["_p"]["l"], best[0]["_p"]["r"]
        merged = left + right
        merges.append((rank, left, right, merged, int(best[0]["_c"])))
        vocab = vocab.select(
            "_w", _merge_fold("_sym", left, right, merged).alias("_sym"), "_cnt"
        ).localCheckpoint(eager=True)
    merges_df = spark.createDataFrame(merges, MERGES_SCHEMA)
    segmentation = vocab.select(
        F.col("_w").alias("word"), F.col("_sym").alias("subwords"), F.col("_cnt").alias("cnt")
    )
    return merges_df, segmentation


def bpe_tokenize(
    docs: DataFrame,
    segmentation: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply a trained segmentation: every token joins its subword
    split by lookup (one shuffle on the word — or a broadcast when the
    vocab is dim-sized), docs reassemble in token order. Words absent
    from the segmentation (tokenizing NEW text with an old vocab) fall
    back to character + '</w>' symbols — the zero-merge split, never
    a dropped token. Returns (id, subwords array, n_subwords) for
    EVERY input row — a token-less doc comes back with an empty
    array, not silently missing (the explode->groupBy would drop
    it)."""
    toks = docs.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("_pos", "_w")
    )
    seg = segmentation.select(F.col("word").alias("_w"), "subwords")
    joined = toks.join(seg, "_w", "left").select(
        id_col,
        "_pos",
        F.coalesce(
            "subwords", F.concat(F.split("_w", ""), F.array(F.lit(END_OF_WORD)))
        ).alias("_sub"),
    )
    rebuilt = joined.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_sub"))),
                lambda s: s["_sub"],
            )
        ).alias("subwords")
    )
    return (
        docs.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("subwords", F.array().cast("array<string>")).alias("subwords"),
            F.coalesce(F.size("subwords"), F.lit(0)).alias("n_subwords"),
        )
    )
