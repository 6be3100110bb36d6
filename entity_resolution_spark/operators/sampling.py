"""Deterministic corpus splitting & sampling — the operations that sit
between dedup/curation and training-shard writing in an LLM data
pipeline: train/val/test assignment, per-stratum downsampling, and
canonical-URL deduplication.

Everything here is a pure hash function of (id, seed) — no RNG state,
no partition/order dependence, byte-identical across reruns and
cluster sizes (the same property SURVEY §7.3d demands of entity ids).
That is what makes a split TRUSTWORTHY at 10^12 documents: a val doc
can never drift into train when the corpus is re-sharded or a node
retries a task, and an incremental crawl batch lands in the same
splits as a full re-run.

hash_mode='md5' swaps xxhash64 for the ANSI-SQL-reproducible 60-bit
md5 hash (hashing.md5_long) so a DuckDB oracle replays assignments
bit-for-bit — same twin-mode pattern as blocking/minhash.

All column algebra (whole-stage codegen); the only shuffles in this
module are url_dedup's two partial-aggregated per-canonical-url
passes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# split buckets live in [0, 1_000_000): fine-grained enough for 1e-4
# fractions, small enough that int thresholds are exact (no float
# boundary ambiguity between Spark and any SQL replay).
BUCKETS = 1_000_000


def split_bucket(id_col: Column, seed: int = 0, hash_mode: str = "xxhash64") -> Column:
    """Deterministic bucket in [0, BUCKETS) from (id, seed).

    The seed is concatenated into the hashed string (not added to the
    hash) so different seeds give statistically independent
    assignments, and an id's bucket never depends on row order or
    partitioning."""
    keyed = F.concat(id_col.cast("string"), F.lit(f":{seed}"))
    if hash_mode == "md5":
        from entity_resolution_spark.functions.hashing import md5_long

        return F.pmod(md5_long(keyed), F.lit(BUCKETS))
    return F.pmod(F.xxhash64(keyed), F.lit(BUCKETS))


def assign_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
    hash_mode: str = "xxhash64",
    out_col: str = "split",
) -> DataFrame:
    """Append a train/val/test-style `out_col` assigning each row to a
    named split with the given weights (must sum to 1 within 1e-9).

    Contiguous integer bucket ranges, thresholds rounded to exact
    ints: e.g. {'train': .98, 'val': .01, 'test': .01} ->
    [0,980000) / [980000,990000) / [990000,1000000). Assignment is a
    pure function of (id, seed) — growing the corpus never reassigns
    an existing id, and a doc's split survives any repartition."""
    if not weights:
        raise ValueError("assign_split: weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"assign_split: weights sum to {total}, expected 1.0")
    bucket = split_bucket(F.col(id_col), seed, hash_mode)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        hi = int(round(cum * BUCKETS))
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return docs.withColumn(out_col, out)


def stratified_sample(
    docs: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Deterministic per-stratum downsample: keep a row iff its hash
    bucket < fraction*BUCKETS for its stratum's fraction (strata not
    listed use default_fraction; 0 drops them).

    This is the scale-correct form of df.sampleBy: sampleBy draws from
    a per-partition RNG, so its output changes with partitioning and
    reruns — useless for reproducible corpus construction. A hash
    sample is stable, and upsampling a stratum later (raising its
    fraction) keeps every previously sampled row (nested samples), so
    data mixes can be tuned without re-ingesting.

    The fractions map is config-sized (one entry per language/quality
    tier) and folds into a literal CASE chain — no join, stays in
    codegen."""
    for name, frac in {**fractions, "<default>": default_fraction}.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"stratified_sample: fraction for {name!r} is {frac}")
    bucket = split_bucket(F.col(id_col), seed, hash_mode)
    thr: Column | None = None
    for value, frac in fractions.items():
        hi = F.lit(int(round(frac * BUCKETS)))
        cond = F.col(stratum_col).eqNullSafe(F.lit(value))
        thr = F.when(cond, hi) if thr is None else thr.when(cond, hi)
    default_hi = F.lit(int(round(default_fraction * BUCKETS)))
    thr = default_hi if thr is None else thr.otherwise(default_hi)
    return docs.filter(bucket < thr)


# tracking params stripped by canonical_url: the standard analytics /
# click-id query keys that vary per referral without changing content.
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL for identity purposes:

    - scheme and host lowercased (path/query case preserved)
    - default ports stripped (:80 http, :443 https)
    - fragment stripped
    - tracking params (TRACKING_PARAM_RE) and empty params dropped
    - surviving query params sorted (order is presentation, not
      identity), '?' dropped when none survive
    - single trailing '/' on the path stripped (https://a.com/x/ ==
      https://a.com/x; a bare host keeps no slash)

    Pure regexp/array algebra — deliberately avoids parse_url so an
    ANSI-SQL oracle can replay it operator-for-operator."""
    no_frag = F.regexp_replace(url, r"#.*$", "")
    base = F.regexp_extract(no_frag, r"^([^?]*)", 1)
    query = F.regexp_extract(no_frag, r"^[^?]*\?(.*)$", 1)
    head = F.lower(F.regexp_extract(base, r"^((?i)https?://[^/]*)", 1))
    head = F.regexp_replace(head, r"^(http://[^/]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/]*):443$", r"$1")
    path = F.regexp_replace(base, r"^(?i)https?://[^/]*", "")
    path = F.regexp_replace(path, r"^(.*?)/$", r"$1")
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    q = F.when(F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))).otherwise(
        F.lit("")
    )
    return F.concat(head, path, q)


def url_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    out_col: str = "canonical_url",
) -> DataFrame:
    """Keep ONE row per canonical URL: the newest ts_col, ties broken
    by the raw url ascending (total order -> deterministic winner
    under any partitioning). The cheap first-pass dedup every crawl
    pipeline runs before content-based dedup — recrawls and
    tracking-param duplicates never reach the shingle/MinHash stages.

    Two partial-aggregatable passes, no window (round-4 de-skew: the
    former row_number window put every recrawl of a viral URL in ONE
    task — AQE splits skewed joins, never window partitions): pass 1
    takes max(ts) per canonical key map-side; the join keeps only
    rows at that ts (usually one per key); pass 2 breaks remaining
    ties with min(struct(raw url, full row)) — lexicographic struct
    ordering reproduces the (ts desc, url asc) winner exactly, and
    remaining fields only compare between fully tied (url, ts) rows,
    where any choice is the same row content.

    Frames carrying UNORDERABLE columns (MapType anywhere in the
    type, e.g. a metadata map) can't ride the min-struct — Spark
    rejects ordering on maps at analysis (round-4 advisory: the old
    row_number window happened to accept them). Those take an
    equivalent path: the tie-break struct holds (url, xxhash64 of the
    row's JSON) — orderable, deterministic, content-derived — and the
    winner keys join back to recover the full row, so only 16-byte
    keys ride the aggregation shuffle."""
    # out_col excluded if the input already carries it (withColumn
    # overwrite semantics — re-running on an already-canonicalized
    # frame must not emit an ambiguous duplicate column)
    cols = [c for c in pages.columns if c != out_col]
    keyed = pages.drop(out_col).withColumn(out_col, canonical_url(F.col(url_col)))
    best_ts = keyed.groupBy(out_col).agg(F.max(F.col(ts_col)).alias("_mx"))
    # both comparisons are NULL-SAFE: a canonical key whose ts values
    # are all NULL has _mx NULL (ts == NULL would drop the whole key —
    # the old window's NULLS LAST kept one row), and a NULL canonical
    # key (NULL url) must still match its own group
    at_max = keyed.join(
        best_ts.withColumnRenamed(out_col, "_k"),
        F.col(out_col).eqNullSafe(F.col("_k")),
    ).filter(F.col(ts_col).eqNullSafe(F.col("_mx")))

    def _unorderable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return True
        if isinstance(dt, ArrayType):
            return _unorderable(dt.elementType)
        if isinstance(dt, StructType):
            return any(_unorderable(f.dataType) for f in dt.fields)
        return False

    if any(_unorderable(f.dataType) for f in pages.schema.fields if f.name in cols):
        hashed = at_max.withColumn(
            "_h", F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in cols])))
        )
        winners = hashed.groupBy(out_col).agg(
            F.min(F.struct(F.col(url_col).alias("_u"), F.col("_h").alias("_wh"))).alias(
                "_w"
            )
        )
        # equal hashes within a winner key are byte-identical JSON ->
        # identical rows; keep one (any is the same content)
        return (
            hashed.join(
                winners.select(
                    F.col(out_col).alias("_k2"),
                    F.col("_w._u").alias("_wu"),
                    F.col("_w._wh").alias("_wh"),
                ),
                F.col(out_col).eqNullSafe(F.col("_k2"))
                & F.col(url_col).eqNullSafe(F.col("_wu"))
                & (F.col("_h") == F.col("_wh")),
                "inner",
            )
            .dropDuplicates([out_col])
            .select(*[F.col(c) for c in cols], F.col(out_col))
        )
    return (
        at_max.groupBy(out_col)
        .agg(
            F.min(
                F.struct(
                    F.col(url_col).alias("_u"),
                    F.struct(*[F.col(c) for c in cols]).alias("_r"),
                )
            ).alias("_w")
        )
        .select(*[F.col(f"_w._r.{c}").alias(c) for c in cols], F.col(out_col))
    )
