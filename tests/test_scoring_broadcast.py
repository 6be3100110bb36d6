"""Size-based broadcast resolution for the pair<->feature attach joins
(round-4 verdict: a fixed ``broadcast_features=True`` default is
wrong-by-default at 100 TB — a run that forgets the flag OOMs executors
broadcasting the projected shingle arrays; the strategy must be chosen
per run from a payload estimate)."""

from __future__ import annotations

import pytest

from entity_resolution_spark.operators.pairs import candidate_pairs
from entity_resolution_spark.operators.scoring import (
    ScoringConfig,
    estimate_attach_bytes,
    resolve_broadcast,
    score_pairs_two_phase,
)
from entity_resolution_spark.plans.pipeline import EntityResolutionPipeline


@pytest.fixture(scope="module")
def feats_and_pairs(spark, corpus):
    pages, _, _ = corpus
    pipe = EntityResolutionPipeline()
    feats = pipe.featurize(pages).localCheckpoint(eager=True)
    blocks, _ = pipe.block(feats)
    pairs = candidate_pairs(blocks).localCheckpoint(eager=True)
    return feats, pairs


def test_estimate_positive_and_monotone_in_width(feats_and_pairs):
    feats, _ = feats_and_pairs
    narrow = estimate_attach_bytes(feats, ["fingerprint"])
    wide = estimate_attach_bytes(feats, ["shingles", "norm_title", "text_prefix"])
    assert 0 < narrow < wide  # shingle arrays dominate the payload


def test_resolve_honors_pin_and_threshold(feats_and_pairs):
    feats, _ = feats_and_pairs
    cols = ["fingerprint", "minhash_sig"]
    assert resolve_broadcast(ScoringConfig(broadcast_features=True), feats, cols) is True
    assert resolve_broadcast(ScoringConfig(broadcast_features=False), feats, cols) is False
    auto_small = ScoringConfig(broadcast_threshold_bytes=1)
    auto_big = ScoringConfig(broadcast_threshold_bytes=1 << 40)
    assert resolve_broadcast(auto_small, feats, cols) is False
    assert resolve_broadcast(auto_big, feats, cols) is True


def test_auto_plan_is_smj_above_threshold_broadcast_below(spark, feats_and_pairs):
    """Plan inspection (same style as the bucketed-write Exchange-free
    assert): above the threshold auto must NOT hint broadcast — the
    static plan keeps shuffle joins; below, the hint pins
    BroadcastHashJoin. autoBroadcastJoinThreshold is disabled so
    Catalyst's own stats can't mask the decision under test."""
    feats, pairs = feats_and_pairs
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        over = score_pairs_two_phase(
            pairs, feats, ScoringConfig(broadcast_threshold_bytes=1)
        )
        plan_over = over._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan_over, plan_over

        under = score_pairs_two_phase(
            pairs, feats, ScoringConfig(broadcast_threshold_bytes=1 << 40)
        )
        plan_under = under._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_under, plan_under

        # strategy choice must not change results
        cols = ["id_1", "id_2", "score"]
        a = {tuple(r) for r in over.select(*cols).collect()}
        b = {tuple(r) for r in under.select(*cols).collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
