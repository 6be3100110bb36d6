"""End-to-end pipeline: pairwise F1 >= 0.99 on labeled pairs
(BASELINE.json metric), blocking invariants, entity-ID properties
(reference README.md:46-49 analogs)."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.blocking import BlockingConfig, block_keys, cap_key_frequency
from entity_resolution_spark.operators.pairs import candidate_pairs
from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline, PipelineConfig


@pytest.fixture(scope="module")
def entities(spark, corpus):
    pages, _, _ = corpus
    pipe = EntityResolutionPipeline(PipelineConfig())
    ents = pipe.run(pages).cache()
    ents.count()
    return ents


def _pairwise_f1(entities, labels):
    e1 = entities.select(F.col("url").alias("url_1"), F.col("entity_id").alias("eid_1"))
    e2 = entities.select(F.col("url").alias("url_2"), F.col("entity_id").alias("eid_2"))
    joined = labels.join(e1, "url_1").join(e2, "url_2")
    agg = joined.select(
        (F.col("eid_1") == F.col("eid_2")).cast("int").alias("pred"), "is_match"
    ).groupBy().agg(
        F.sum(F.col("pred") * F.col("is_match")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("is_match"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("is_match")).alias("fn"),
    ).first()
    tp, fp, fn = agg["tp"] or 0, agg["fp"] or 0, agg["fn"] or 0
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-9)
    return prec, rec, f1


def test_pairwise_f1_gate(entities, corpus):
    _, labels, _ = corpus
    prec, rec, f1 = _pairwise_f1(entities, labels)
    print(f"precision={prec:.4f} recall={rec:.4f} f1={f1:.4f}")
    assert f1 >= 0.99, f"F1 {f1:.4f} below gate (p={prec:.4f}, r={rec:.4f})"


def test_cluster_assignment_matches_ground_truth(entities, corpus):
    # every page got exactly one entity id; entity count is close to
    # the planted entity count
    pages, _, expected = corpus
    assert entities.count() == pages.count()
    n_gt = expected.select("entity_gt").distinct().count()
    n_pred = entities.select("entity_id").distinct().count()
    assert abs(n_pred - n_gt) / n_gt < 0.05


def test_pair_generation_invariants(spark, corpus):
    pages, _, _ = corpus
    pipe = EntityResolutionPipeline()
    feats = pipe.featurize(pages)
    blocks, stats = pipe.block(feats)
    pairs = candidate_pairs(blocks)
    assert pairs.filter(F.col("id_1") >= F.col("id_2")).count() == 0
    assert pairs.count() == pairs.dropDuplicates(["id_1", "id_2"]).count()


def test_blocking_cnk_count(spark):
    # one key, n records -> exactly C(n,2) pairs (mlir.py:1186-1192 analog)
    n = 10
    blocks = spark.createDataFrame(
        [("k", i) for i in range(n)], "block_key string, url_id long"
    )
    assert candidate_pairs(blocks).count() == n * (n - 1) // 2


def test_frequency_cap_drops_hot_and_singleton(spark):
    rows = [("hot", i) for i in range(30)] + [("ok", 1), ("ok", 2), ("single", 99)]
    blocks = spark.createDataFrame(rows, "block_key string, url_id long")
    capped, stats = cap_key_frequency(blocks, cap=10)
    kept_keys = {r["block_key"] for r in capped.select("block_key").distinct().collect()}
    assert kept_keys == {"ok"}
    st = {r["block_key"]: r["status"] for r in stats.collect()}
    assert st == {"hot": "dropped_hot", "ok": "kept", "single": "singleton"}


def test_two_phase_equivalent_to_single_phase(spark, corpus):
    """score_pairs_two_phase must produce the same edge set as the
    single-phase score_pairs at the pipeline threshold (round-1
    advisory: the old hard-coded estimate gate silently dropped
    low-Jaccard/high-title matches; the gate is now derived from the
    minimum matchable Jaccard minus a 3-sigma MinHash margin)."""
    from entity_resolution_spark.operators.pairs import attach_features
    from entity_resolution_spark.operators.scoring import (
        ScoringConfig,
        edges_from_scores,
        score_pairs,
        score_pairs_two_phase,
    )
    from entity_resolution_spark.plans.pipeline import PAIR_FEATURE_COLS

    pages, _, _ = corpus
    pipe = EntityResolutionPipeline()
    cfg = ScoringConfig()
    feats = pipe.featurize(pages)
    blocks, _ = pipe.block(feats)
    pairs = candidate_pairs(blocks)

    wide = attach_features(pairs, feats, cols=PAIR_FEATURE_COLS, broadcast=True)
    one = edges_from_scores(score_pairs(wide, cfg), cfg.threshold)
    two = edges_from_scores(score_pairs_two_phase(pairs, feats, cfg), cfg.threshold)
    e1 = {(r["src"], r["dst"]) for r in one.collect()}
    e2 = {(r["src"], r["dst"]) for r in two.collect()}
    assert e1 == e2


def test_oracle_hash_mode_meets_f1_gate(spark, corpus):
    """The md5 oracle hash mode (used for the end-to-end DuckDB value
    check) is a faithful mode of the SAME pipeline: it must clear the
    same F1 >= 0.99 gate on the planted-duplicate corpus."""
    from entity_resolution_spark.plans.pipeline import oracle_mode_config

    pages, labels, _ = corpus
    ents = EntityResolutionPipeline(oracle_mode_config()).run(pages)
    prec, rec, f1 = _pairwise_f1(ents, labels)
    assert f1 >= 0.99, f"oracle-mode F1 {f1:.4f} (p={prec:.4f}, r={rec:.4f})"


def test_deterministic_prepass_equivalent_and_subtracts(spark, corpus):
    """The deterministic exact-match pre-pass (reference stage-6 shape,
    Orchestrate_Demo.py:360) must not change the final entities, and
    must shrink the candidate stream entering probabilistic scoring."""
    from entity_resolution_spark.operators.scoring import deterministic_match_pass

    pages, _, _ = corpus
    on = EntityResolutionPipeline(PipelineConfig(deterministic_prepass=True)).run(pages)
    off = EntityResolutionPipeline(PipelineConfig(deterministic_prepass=False)).run(pages)
    a = {r["url"]: r["entity_id"] for r in on.collect()}
    b = {r["url"]: r["entity_id"] for r in off.collect()}
    assert a == b

    pipe = EntityResolutionPipeline()
    feats = pipe.featurize(pages)
    blocks, _ = pipe.block(feats)
    pairs = candidate_pairs(blocks)
    det_edges, remaining = deterministic_match_pass(pairs, feats)
    n_pairs, n_det, n_rem = pairs.count(), det_edges.count(), remaining.count()
    assert n_det > 0  # the corpus plants exact dups
    assert n_rem == n_pairs - n_det  # NOT-EXISTS subtraction is exact


def test_entity_id_stability_across_reruns_and_row_order(spark, corpus):
    pages, _, _ = corpus
    a = EntityResolutionPipeline().run(pages)
    b = EntityResolutionPipeline().run(pages.orderBy(F.rand(seed=1)).repartition(13))
    am = {r["url"]: r["entity_id"] for r in a.collect()}
    bm = {r["url"]: r["entity_id"] for r in b.collect()}
    assert am == bm


def test_entity_id_invariant_to_new_recrawl(spark, entities, corpus):
    """Adding a later re-crawl of an existing page must not change any
    existing entity id (README.md:46-49 invariance analog)."""
    pages, _, _ = corpus
    # duplicate one page as a later re-crawl on a new url
    one = pages.orderBy("url").limit(1)
    recrawl = one.select(
        F.concat(F.col("url"), F.lit("-recrawl")).alias("url"),
        (F.col("warc_ts") + F.expr("INTERVAL 365 DAYS")).alias("warc_ts"),
        "html",
        "text",
        "lang",
    )
    ents2 = EntityResolutionPipeline().run(pages.unionByName(recrawl))
    base = {r["url"]: r["entity_id"] for r in entities.collect()}
    new = {r["url"]: r["entity_id"] for r in ents2.collect()}
    changed = {u for u in base if base[u] != new.get(u)}
    assert not changed, f"{len(changed)} entity ids changed after re-crawl insert"


def test_deterministic_pass_null_fingerprints_partition(spark):
    """Round-2 advisory: with a plain `==`, a null-fingerprint pair is
    NULL under both branches and silently vanishes; eqNullSafe keeps
    (det_edges, remaining) an exact partition of the input pairs."""
    from entity_resolution_spark.operators.scoring import deterministic_match_pass

    feats = spark.createDataFrame(
        [(1, None), (2, None), (3, "aa"), (4, "bb")], "url_id long, fingerprint string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3), (3, 4)], "id_1 long, id_2 long")
    det, rem = deterministic_match_pass(pairs, feats)
    det_s = {(r["src"], r["dst"]) for r in det.collect()}
    rem_s = {(r["id_1"], r["id_2"]) for r in rem.collect()}
    assert det_s == {(1, 2)}  # null-null = identical sentinel content
    assert rem_s == {(1, 3), (3, 4)}  # null-vs-value stays scoreable


def test_hash_mode_invariant_entity_partition(spark, corpus):
    """The md5 oracle mode must produce the IDENTICAL partition of
    urls into entities as the xxhash64 production mode on the same
    corpus (round-2 judge item: the only unoracled flagship entry is
    the xxhash64 twin — this pins 'same code path, different hash
    family' across the whole pipeline). canonical_url is a pure
    cluster function independent of the hash family, so equal
    canonical maps == equal partitions."""
    from entity_resolution_spark.plans.pipeline import (
        EntityResolutionPipeline,
        oracle_mode_config,
    )

    pages, _labels, _expected = corpus
    prod = EntityResolutionPipeline().run(pages)
    oracle = EntityResolutionPipeline(oracle_mode_config()).run(pages)
    mp = {r["url"]: r["canonical_url"] for r in prod.collect()}
    mo = {r["url"]: r["canonical_url"] for r in oracle.collect()}
    assert mp == mo


def test_deterministic_pass_skipped_on_full_resume(spark, corpus, tmp_path, monkeypatch):
    """deterministic_match_pass eagerly materializes its pair join at
    plan-construction, so a fully checkpoint-resumed run() — where its
    output is never consumed (components read from parquet) — must not
    invoke it at all. (A lazy localCheckpoint is NOT an alternative:
    under AQE it still materializes the exchanges at RDD conversion.)"""
    import entity_resolution_spark.plans.pipeline as pipeline_mod
    from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline

    pages, _labels, _expected = corpus
    ckpt = str(tmp_path / "ckpt")
    first = EntityResolutionPipeline().run(pages, checkpoint_dir=ckpt)
    expected = {(r["url"], r["canonical_url"]) for r in first.collect()}

    def _boom(*_a, **_k):  # the resume must never reach this
        raise AssertionError("deterministic_match_pass invoked on full resume")

    monkeypatch.setattr(pipeline_mod, "deterministic_match_pass", _boom)
    resumed = EntityResolutionPipeline().run(pages, checkpoint_dir=ckpt)
    got = {(r["url"], r["canonical_url"]) for r in resumed.collect()}
    assert got == expected


def test_stamping_rollup_curation_window_free(spark, corpus):
    """Round-4 de-skew pin for the ER-core operators: canonical
    stamping, level-2 rollup, and the curation chain must not carry a
    Window node (a mega-component/hot fingerprint would single-task
    it; the min-struct aggregations compute identical winners)."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.rollup import rollup_entities
    from entity_resolution_spark.operators.stamping import stamp_entities
    from entity_resolution_spark.plans.curation import curate

    pages, _labels, _expected = corpus
    pages = pages.withColumn("url_id", F.xxhash64("url"))
    comps = pages.select(
        F.col("url_id").alias("id"), (F.col("url_id") % 7).alias("component")
    )
    docs = pages.select(
        F.col("url_id").alias("doc_id"), F.col("text")
    )
    recs = pages.select(F.col("url_id"), F.col("lang"))
    plans = {
        "stamp_entities": stamp_entities(pages, comps),
        "rollup_entities": rollup_entities(recs, "url_id", ["lang"]),
        "curate": curate(docs),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan, f"{name} still contains a Window node"
