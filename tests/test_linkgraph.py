"""linkgraph: href extraction + integer-arithmetic PageRank.

The golden oracle is a pure-python replica of the EXACT integer update
rule (same truncating divisions on positive operands), so any drift in
the Spark arithmetic — not just gross breakage — fails the test.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from entity_resolution_spark.operators.linkgraph import (
    SCALE,
    domain_reputation,
    extract_links,
    pagerank,
)


def py_pagerank(edges, iterations=3, damping_pct=85):
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    deg = Counter(s for s, _ in edges)
    base = SCALE * (100 - damping_pct) // 100
    rank = {n: SCALE for n in nodes}
    for _ in range(iterations):
        contrib: dict[str, int] = defaultdict(int)
        for s, t in edges:
            contrib[t] += (rank[s] // deg[s]) * damping_pct // 100
        rank = {n: base + contrib.get(n, 0) for n in nodes}
    return rank


# hub (a -> everything), chain, dangling sink (d), self-loop (e)
GRAPH = [
    ("a", "b"), ("a", "c"), ("a", "d"), ("a", "e"),
    ("b", "c"), ("c", "a"), ("e", "e"),
]


def _pr_dict(df):
    return {r["node"]: r["rank_units"] for r in df.collect()}


def test_pagerank_matches_integer_golden(spark):
    edges = spark.createDataFrame(GRAPH, ["src_domain", "dst_domain"])
    for iters in (1, 3):
        got = _pr_dict(pagerank(edges, iterations=iters))
        assert got == py_pagerank(GRAPH, iterations=iters)


def test_pagerank_dedups_multi_edges(spark):
    # duplicate edge rows must not double a contribution
    edges = spark.createDataFrame(GRAPH + GRAPH, ["src_domain", "dst_domain"])
    assert _pr_dict(pagerank(edges)) == py_pagerank(GRAPH)


def test_pagerank_deterministic_under_repartition(spark):
    edges = spark.createDataFrame(GRAPH, ["src_domain", "dst_domain"])
    a = _pr_dict(pagerank(edges.repartition(1)))
    b = _pr_dict(pagerank(edges.repartition(13)))
    assert a == b  # exact integer equality, not approx


def test_pagerank_dangling_and_floor(spark):
    edges = spark.createDataFrame(GRAPH, ["src_domain", "dst_domain"])
    got = _pr_dict(pagerank(edges))
    base = SCALE * 15 // 100
    assert all(v >= base for v in got.values())
    # d is a pure sink: receives from the hub, sends nothing
    assert got["d"] > base


def test_pagerank_validation(spark):
    edges = spark.createDataFrame(GRAPH, ["src_domain", "dst_domain"])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, iterations=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(edges, damping_pct=100)


PAGES = [
    (
        "https://Hub.example/index",
        '<html><body><a href="https://b.example/x">b</a>'
        '<a href="http://c.example:8080/y?q=1">c</a>'
        '<a href="/relative/skip">rel</a>'
        '<a href="https://b.example/other">b again</a></body></html>',
    ),
    ("https://b.example/x", '<html><body>no links here</body></html>'),
    ("https://c.example/y", '<html><body><a href="https://hub.example/">back</a></body></html>'),
]


def _pages_df(spark):
    df = spark.createDataFrame(PAGES, ["url", "html_str"])
    return df.selectExpr("url", "encode(html_str, 'UTF-8') AS html")


def test_extract_links(spark):
    edges = {
        (r["src_domain"], r["dst_domain"]): r["n_links"]
        for r in extract_links(_pages_df(spark)).collect()
    }
    # hosts lowercased, ports stripped from the domain, relative hrefs skipped
    assert edges == {
        ("hub.example", "b.example"): 2,
        ("hub.example", "c.example"): 1,
        ("c.example", "hub.example"): 1,
    }


def test_domain_reputation_end_to_end(spark):
    got = {r["domain"]: r["rank_units"] for r in domain_reputation(_pages_df(spark)).collect()}
    expected = py_pagerank(
        [("hub.example", "b.example"), ("hub.example", "c.example"),
         ("c.example", "hub.example")]
    )
    assert got == expected
    # the hub is linked back — it must outrank the leaf that only receives
    assert got["hub.example"] > got["b.example"]
