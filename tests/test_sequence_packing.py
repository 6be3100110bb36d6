"""Sequence packing: concat-and-chunk layout invariants + an exact
python replica of the md5-mode layout (hashlib md5 == Spark's md5, so
the golden covers the full hash->shard->order->prefix-sum chain)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.sequence_packing import pack_sequences, packing_stats


def md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_pack(rows, budget, n_shards, seed=0):
    """rows: [(doc_id, n_tokens)] -> {doc_id: layout tuple}."""
    keyed = [(md5_long(f"{i}:{seed}"), i, n) for i, n in rows]
    out = {}
    for shard in range(n_shards):
        cursor = 0
        for key, i, n in sorted(t for t in keyed if t[0] % n_shards == shard):
            first = cursor // budget
            last = (cursor + max(n, 1) - 1) // budget
            out[i] = (shard, first, last, cursor % budget, last > first)
            cursor += n
    return out


ROWS = [(i, (i * 37) % 23) for i in range(200)]  # includes zero-token docs


def _layout(df):
    return {
        r["doc_id"]: (r["shard"], r["seq_first"], r["seq_last"], r["seq_offset"],
                      r["spans_boundary"])
        for r in df.collect()
    }


def test_md5_layout_matches_python_golden(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "n_tokens"])
    got = _layout(pack_sequences(docs, budget=16, n_shards=4, hash_mode="md5"))
    assert got == py_pack(ROWS, budget=16, n_shards=4)


def test_layout_is_gapless_prefix_sum(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "n_tokens"])
    packed = pack_sequences(docs, budget=16, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in packed:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: (r["seq_first"], r["seq_offset"], r["doc_id"]))
        cursor = 0
        for r in sorted(rows, key=lambda r: r["seq_first"] * 16 + r["seq_offset"]):
            start = r["seq_first"] * 16 + r["seq_offset"]
            # starts are the prefix sums of token counts — no gaps, no overlap
            assert start == cursor or r["n_tokens"] == 0
            if r["n_tokens"] > 0:
                assert r["seq_last"] == (start + r["n_tokens"] - 1) // 16
                cursor = start + r["n_tokens"]
            else:
                assert r["seq_last"] == r["seq_first"]


def test_deterministic_under_repartition(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "n_tokens"])
    a = _layout(pack_sequences(docs.repartition(1), budget=16, n_shards=4))
    b = _layout(pack_sequences(docs.orderBy(F.rand(7)).repartition(13), budget=16, n_shards=4))
    assert a == b


def test_long_doc_straddles(spark):
    docs = spark.createDataFrame([(1, 100)], ["doc_id", "n_tokens"])
    r = pack_sequences(docs, budget=16, n_shards=1).collect()[0]
    assert r["seq_first"] == 0 and r["seq_last"] == 6 and r["spans_boundary"]


def test_packing_stats(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "n_tokens"])
    packed = pack_sequences(docs, budget=16, n_shards=4)
    stats = {r["shard"]: r for r in packing_stats(packed, budget=16).collect()}
    total_docs = sum(r["n_docs"] for r in stats.values())
    total_tokens = sum(r["n_tokens"] for r in stats.values())
    assert total_docs == len(ROWS)
    assert total_tokens == sum(n for _, n in ROWS)
    for r in stats.values():
        assert r["n_sequences"] == -(-r["n_tokens"] // 16)  # ceil


def test_validation(spark):
    docs = spark.createDataFrame(ROWS, ["doc_id", "n_tokens"])
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(docs, budget=0)
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(docs, budget=16, n_shards=0)
