"""Incremental entity-table maintenance (reference J7/mlir.py:2082-2095
analog) + checkpoint/resume (SURVEY.md §5.5)."""

import os
import shutil

from pyspark.sql import functions as F

from entity_resolution_spark.operators.incremental import merge_entities
from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline, PipelineConfig
from entity_resolution_spark.sources.checkpoint import StageCheckpointer


def test_merge_keeps_existing_ids(spark, corpus):
    pages, _, _ = corpus
    ents = EntityResolutionPipeline().run(pages).cache()
    # batch = same pages re-clustered (simulates a re-crawl batch)
    batch = EntityResolutionPipeline().run(pages)
    merged = merge_entities(ents, batch)
    assert merged.count() == ents.count()  # no new urls -> no growth
    diff = (
        merged.alias("m")
        .join(ents.alias("e"), "url")
        .filter(F.col("m.entity_id") != F.col("e.entity_id"))
        .count()
    )
    assert diff == 0


def test_merge_appends_only_new_urls(spark, corpus):
    pages, _, _ = corpus
    ents = EntityResolutionPipeline().run(pages).cache()
    half = pages.limit(pages.count() // 2)
    new_page = half.limit(1).select(
        F.concat(F.col("url"), F.lit("-v2")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    batch = EntityResolutionPipeline().run(pages.unionByName(new_page))
    merged = merge_entities(ents, batch)
    assert merged.count() == ents.count() + 1
    # the new url adopted the id of its existing cluster (same canonical)
    new_row = merged.filter(F.col("url").endswith("-v2")).first()
    old = {r["url"]: r["entity_id"] for r in ents.collect()}
    orig_url = new_row["url"][: -len("-v2")]
    assert new_row["entity_id"] == old[orig_url]


def test_resume_skips_completed_stages(spark, corpus, tmp_path):
    pages, _, _ = corpus
    ckpt = str(tmp_path / "ckpt")
    cfg = PipelineConfig()
    a = EntityResolutionPipeline(cfg).run(pages, checkpoint_dir=ckpt)
    rows_a = sorted((r["url"], r["entity_id"]) for r in a.collect())
    # kill-after-stage-k simulation: drop the last two stages, resume
    shutil.rmtree(os.path.join(ckpt, "09_entities"))
    shutil.rmtree(os.path.join(ckpt, "08_components"))
    b = EntityResolutionPipeline(cfg).run(pages, checkpoint_dir=ckpt)
    rows_b = sorted((r["url"], r["entity_id"]) for r in b.collect())
    assert rows_a == rows_b


def test_manifest_lineage(spark, corpus, tmp_path):
    pages, _, _ = corpus
    ckpt_dir = str(tmp_path / "ck2")
    pipe = EntityResolutionPipeline()
    pipe.run(pages, checkpoint_dir=ckpt_dir)
    m = StageCheckpointer(spark, ckpt_dir, pipe.config.fingerprint()).manifest("03_features")
    assert m["complete"] is True
    assert m["rows"] == pages.count()
    assert m["rows"] == sum(m["partition_lineage"].values())
    assert m["n_partitions"] >= 1


def test_stale_config_invalidates_checkpoint(spark, corpus, tmp_path):
    from entity_resolution_spark.operators.scoring import ScoringConfig

    pages, _, _ = corpus
    ckpt = str(tmp_path / "ck3")
    EntityResolutionPipeline(PipelineConfig()).run(pages, checkpoint_dir=ckpt)
    loose = PipelineConfig(scoring=ScoringConfig(threshold=0.9))
    ck = StageCheckpointer(spark, ckpt, loose.fingerprint())
    assert not ck.is_complete("03_features")


def test_delta_candidate_pairs_is_exact_set_difference(spark):
    """delta pairs == C(old+new) minus C(old) — no old-old pair ever
    emitted, every pair touching a new record emitted exactly once."""
    from entity_resolution_spark.operators.incremental import delta_candidate_pairs
    from entity_resolution_spark.operators.pairs import candidate_pairs

    rows = [("k1", i) for i in range(6)] + [("k2", 10 + i) for i in range(4)] + [("k2", 3)]
    all_blocks = spark.createDataFrame(rows, "block_key string, url_id long")
    new = spark.createDataFrame([(4,), (13,)], "url_id long")
    old_blocks = all_blocks.join(new, "url_id", "left_anti")

    want = {
        (r["id_1"], r["id_2"]) for r in candidate_pairs(all_blocks).collect()
    } - {(r["id_1"], r["id_2"]) for r in candidate_pairs(old_blocks).collect()}
    got = {(r["id_1"], r["id_2"]) for r in delta_candidate_pairs(all_blocks, new).collect()}
    assert got == want
    assert all(a < b for a, b in got)
    # sanity: both new-old and (if present) new-new pairs appear
    assert (3, 4) in got and (4, 5) in got
