"""Domain link graph — href extraction and integer-arithmetic PageRank.

Training-data curation at web scale weighs documents by the reputation
of the domain that published them (Common-Crawl-derived corpora filter
or up-sample by domain rank). This module builds the domain graph from
the pages' own html and ranks it:

- ``extract_links``: href="http(s)://..." extraction via one JVM-side
  ``regexp_extract_all`` over the decoded html (whole-stage codegen,
  no Python), exploded to (src_domain, dst_domain, n_links) edges.
  One scan + one hash aggregation — the explode fans out to the number
  of LINKS, never pages², and the aggregation key space is domain
  pairs, which is crawl-sized, not corpus-sized.
- ``pagerank``: the classic damped iteration r(v) = (1-d) + d *
  sum(r(u)/deg(u)) — but computed entirely in SCALED 64-BIT INTEGER
  arithmetic (rank units of 1e-9). Floating-point PageRank is
  order-dependent: a groupBy sum of doubles changes in the last ulp
  with partitioning, so two cluster sizes (or Spark vs an oracle
  engine) disagree bit-for-bit. Integer units make every iteration an
  exact function of the graph — byte-identical under any parallelism
  (the same determinism contract as entity ids, SURVEY §7.3d) and
  replayable in ANSI SQL as an unrolled CTE chain, so the driver's
  DuckDB gate value-checks the REAL operator, not a lookalike.

Scale shape per iteration: ONE join edges⋈ranks on src (edges carry
their precomputed out-degree and are repartitioned once by src, reused
every round — ranks, the small O(domains) side, moves to it), one hash
aggregation keyed by dst, one left join back to the node set. Lineage is cut per round with
localCheckpoint exactly like connected_components. Dangling nodes
(no out-links) leak their damped mass — the classic simplified
variant; ranks stay >= (1-d) so the leak never zeroes a score.

Overflow: ranks start at SCALE (1e9) and total system mass never
exceeds nodes * SCALE; per-edge contributions are divided BEFORE the
damping multiply, so every intermediate stays < nodes * SCALE * 85,
within int64 for any realistic domain count (< ~1e8).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# one rank unit = 1e-9 of the classic PageRank score (rank 1.0 == SCALE)
SCALE = 1_000_000_000

# absolute http(s) hrefs only; [^"]+ keeps the regex in the
# Java-regex/RE2 intersection (same constraint as the PII patterns)
HREF_RE = r'href="(https?://[^"]+)"'
_HOST_RE = r"^(?i)https?://([^/:?#]+)"


def link_domain(url: Column) -> Column:
    """Lowercased host of an absolute http(s) url — pure regex (no
    parse_url) so the same expression replays in any SQL engine."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def extract_links(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """(src_domain, dst_domain, n_links) edges from the pages' html.

    Self-links (a domain linking to itself) are kept — callers that
    want the cross-domain graph filter src != dst; PageRank handles
    self-edges natively. Pages whose html decodes to no absolute
    href produce no edges (never a null row)."""
    src = link_domain(F.col(url_col)).alias("src_domain")
    hrefs = F.regexp_extract_all(F.decode(F.col(html_col), "UTF-8"), F.lit(HREF_RE), 1)
    return (
        pages.select(src, F.explode(hrefs).alias("_href"))
        .select("src_domain", link_domain(F.col("_href")).alias("dst_domain"))
        .filter((F.length("src_domain") > 0) & (F.length("dst_domain") > 0))
        .groupBy("src_domain", "dst_domain")
        .agg(F.count("*").alias("n_links"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src_domain",
    dst: str = "dst_domain",
    iterations: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Rank every node of the (src, dst) edge list; returns
    (node, rank_units) with rank_units = round-trip-exact integer
    PageRank in units of 1/SCALE.

    Per-node update (all integer, both divisions truncating on
    positive operands, so floor == truncate in every engine):

        contrib(u->v) = ((rank(u) div out_deg(u)) * damping_pct) div 100
        rank'(v)      = (SCALE * (100-damping_pct)) div 100 + sum contrib

    ``iterations`` is fixed (not run-to-convergence) so the operator
    is a deterministic bounded plan — the form an oracle can replay
    and a production scheduler can cost. 3-5 iterations separate
    hub/leaf domains clearly; reputation filtering needs ordering
    stability, not fixed-point precision."""
    if iterations < 1:
        raise ValueError(f"pagerank: iterations must be >= 1, got {iterations}")
    if not 1 <= damping_pct <= 99:
        raise ValueError(f"pagerank: damping_pct must be in [1, 99], got {damping_pct}")
    e = edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst")).distinct()
    # repartition ONCE by the join key: every iteration's edges⋈ranks
    # reuses this layout, so only the O(nodes) rank table moves per round
    e = e.repartition("_src").localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("_src").alias("node"))
        .union(e.select(F.col("_dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # out-degree is iteration-invariant: attach it to the edge table
    # ONCE (a window over the already-src-partitioned edges — no extra
    # shuffle) instead of re-joining a degree table every round
    e = e.withColumn(
        "_out_deg", F.count("*").over(W.partitionBy("_src"))
    ).localCheckpoint(eager=True)
    base = SCALE * (100 - damping_pct) // 100
    ranks = nodes.withColumn("rank_units", F.lit(SCALE).cast("long"))
    for _ in range(iterations):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "_src"), "_src")
            .select(
                F.col("_dst").alias("node"),
                F.expr(f"(rank_units div _out_deg) * {int(damping_pct)} div 100").alias(
                    "_contrib"
                ),
            )
            .groupBy("node")
            .agg(F.sum("_contrib").alias("_contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce("_contrib", F.lit(0)))
                .cast("long")
                .alias("rank_units"),
            )
            .localCheckpoint(eager=True)  # cut lineage per round, like CC
        )
    return ranks


def domain_reputation(
    pages: DataFrame, iterations: int = 3, damping_pct: int = 85
) -> DataFrame:
    """(domain, rank_units) from the corpus's own link structure —
    extract_links + pagerank composed; join back to pages on domain to
    weight or filter documents by publisher reputation."""
    return pagerank(
        extract_links(pages),
        src="src_domain",
        dst="dst_domain",
        iterations=iterations,
        damping_pct=damping_pct,
    ).withColumnRenamed("node", "domain")
