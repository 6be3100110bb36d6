"""Blocking: frequency cap accounting + hot-key salting (north_rule:
"salted, repartitioned"). Reference cap semantics: mlir.py:1178-1181."""

from __future__ import annotations

from pyspark.sql import functions as F

from entity_resolution_spark.operators.blocking import (
    BlockingConfig,
    cap_key_frequency,
    salt_hot_keys,
)
from entity_resolution_spark.operators.pairs import candidate_pairs


def _planted_blocks(spark, hot_n=200, cold_n=10):
    rows = [(i, "hot") for i in range(hot_n)] + [(10_000 + i, "cold") for i in range(cold_n)]
    return spark.createDataFrame(rows, "url_id long, block_key string")


def test_salt_hot_keys_splits_only_hot(spark):
    blocks = _planted_blocks(spark)
    capped, stats = cap_key_frequency(blocks, cap=10_000)
    salted = salt_hot_keys(capped, stats, salt_threshold=50, n_salts=4)

    # every record keeps exactly one key row (salting renames, never drops)
    assert salted.count() == blocks.count()
    # cold key untouched
    cold = salted.filter(F.col("url_id") >= 10_000).select("block_key").distinct().collect()
    assert [r["block_key"] for r in cold] == ["cold"]
    # hot key split into <= n_salts sub-keys, each well below the original
    hot_keys = (
        salted.filter(F.col("url_id") < 10_000)
        .groupBy("block_key")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert 2 <= len(hot_keys) <= 4
    assert all(r["block_key"].startswith("hot#") for r in hot_keys)
    assert sum(r["n"] for r in hot_keys) == 200
    assert max(r["n"] for r in hot_keys) < 200  # partition-size bound: strictly split


def test_salt_hot_keys_deterministic_and_pair_recall(spark):
    blocks = _planted_blocks(spark)
    capped, stats = cap_key_frequency(blocks, cap=10_000)
    salted1 = salt_hot_keys(capped, stats, salt_threshold=50, n_salts=4)
    salted2 = salt_hot_keys(capped, stats, salt_threshold=50, n_salts=4)
    assert sorted(map(tuple, salted1.collect())) == sorted(map(tuple, salted2.collect()))

    # pairs after salting = exactly the within-salt pairs (subset of full)
    full_pairs = {(r["id_1"], r["id_2"]) for r in candidate_pairs(capped).collect()}
    salt_pairs = {(r["id_1"], r["id_2"]) for r in candidate_pairs(salted1).collect()}
    assert salt_pairs < full_pairs
    sizes = [
        r["n"]
        for r in salted1.filter(F.col("url_id") < 10_000)
        .groupBy("block_key")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    expected_in_salt = sum(n * (n - 1) // 2 for n in sizes)
    hot_salt_pairs = {(a, b) for (a, b) in salt_pairs if a < 10_000}
    assert len(hot_salt_pairs) == expected_in_salt
    # recall within the salted key ~ 1/n_salts of all pairs (binomial slack)
    frac = len(hot_salt_pairs) / (200 * 199 / 2)
    assert 0.15 < frac < 0.40


def test_pipeline_block_applies_salting(spark, corpus):
    """pipeline.block() salts by default for keys above salt_threshold."""
    from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline, PipelineConfig

    pages, _labels, _expected = corpus
    cfg = PipelineConfig(blocking=BlockingConfig(salt_threshold=5, n_salts=4))
    pipe = EntityResolutionPipeline(cfg)
    feats = pipe.featurize(pages)
    blocks, stats = pipe.block(feats)
    n_salted = blocks.filter(F.col("block_key").contains("#")).count()
    n_hot = stats.filter(
        (F.col("status") == "kept") & (F.col("n_records") > 5)
    ).count()
    assert n_hot > 0  # the corpus has keys above the tiny threshold
    assert n_salted > 0  # ...and they came out salted

    # off switch: salt_threshold=0 leaves keys untouched
    cfg_off = PipelineConfig(blocking=BlockingConfig(salt_threshold=0))
    blocks_off, _ = EntityResolutionPipeline(cfg_off).block(feats)
    assert blocks_off.filter(F.col("block_key").contains("#")).count() == 0


def test_salt_hot_keys_only_containing_and_md5_mode(spark):
    """Round-2 advisory: hot LSH band keys (possibly a pair's only
    shared key) must be saltable-out via only_containing, and md5 mode
    must derive the salt from md5(url_id) so an ANSI-SQL oracle can
    replay it."""
    import hashlib

    rows = [(i, "en|domain:hot.com") for i in range(100)] + [
        (1000 + i, "en|b3:deadbeef") for i in range(100)
    ]
    blocks = spark.createDataFrame(rows, "url_id long, block_key string")
    capped, stats = cap_key_frequency(blocks, cap=10_000)
    salted = salt_hot_keys(
        capped, stats, salt_threshold=50, n_salts=4, hash_mode="md5", only_containing="domain:"
    )
    band = salted.filter(F.col("url_id") >= 1000).select("block_key").distinct().collect()
    assert [r["block_key"] for r in band] == ["en|b3:deadbeef"]  # band key untouched
    got = {r["url_id"]: r["block_key"] for r in salted.filter(F.col("url_id") < 1000).collect()}
    assert len(got) == 100
    for uid, key in got.items():
        expected_salt = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 4
        assert key == f"en|domain:hot.com#{expected_salt}"
