"""Driver-contract smoke: entry() + every queries() key importable and
runnable at sf0.001 (full oracle comparison lives in
tools/check_entry.py at sf0.01)."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as em  # noqa: E402

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = em.entry(spark)
    assert df.count() > 0
    assert set(df.columns) >= {"url", "entity_id", "canonical_url"}


def test_every_query_has_callable_and_runs(spark):
    qs = em.queries()
    oracles = em.oracle_sql()
    assert set(oracles) <= set(qs), "oracle without a query"
    # spot-run the cheap ones end-to-end at sf0.001
    for name in [
        "q1_pricing_summary",
        "doc_exact_dedup",
        "doc_token_stats",
        "embedding_topk",
        "events_sessionization",
        "cc_components",
        "entity_rollup",
        "media_meta",
    ]:
        df = qs[name](spark, SF)
        assert df.count() >= 0


def test_oracle_coverage_ratio():
    qs, oracles = em.queries(), em.oracle_sql()
    # nearly every operator must be oracle-checkable (round 2: 42/45 —
    # only phonetics, the xxhash64-mode flagship run, and the pseudo
    # feature vector remain rows-only)
    assert len(oracles) / len(qs) >= 0.9
