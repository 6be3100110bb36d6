"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk : exact cosine top-k via a (queries x corpus)
  broadcast crossJoin + per-query window — the correctness baseline.
- srp_bucket / lsh_topk : random-hyperplane (sign) LSH buckets; top-k
  within bucket (+ multiprobe) — the scale path: the corpus is hashed
  once, queries only meet their bucket.
- ivf_topk : IVF-style — k-means-ish centroids picked deterministically
  (seeded sample), vectors assigned to nearest centroid, queries probe
  the nearest n_probe cells.

All dot products are native column algebra (zip_with/aggregate) —
JVM-side, no Python in the scoring loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from entity_resolution_spark.functions.similarity import cosine_similarity


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast the (small) query set against
    the corpus; rank per query. Returns
    (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(
        F.col(query_id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("c_vec"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def srp_bucket(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 8,
    seed: int = 7,
    dim: int | None = None,
    out_col: str = "srp_bucket",
) -> DataFrame:
    """Sign-random-projection bucket id (string of n_planes sign bits).
    Hyperplanes are a seeded numpy matrix folded into the plan as
    literals — identical on every executor, no broadcast needed."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    v = _as_double(F.col(vec_col))
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.array(*[F.lit(float(x)) for x in planes[i]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for i in range(n_planes)
    ]
    return df.withColumn(out_col, F.concat(*bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: n_tables independent SRP hashes; candidates = union of
    bucket collisions; exact cosine re-rank of candidates only."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cand = None
    for t in range(n_tables):
        cb = srp_bucket(c, "neighbor_id", "c_vec", n_planes, seed + t, out_col="b").select(
            "neighbor_id", F.concat(F.lit(f"t{t}:"), F.col("b")).alias("bucket")
        )
        qb = srp_bucket(q, "query_id", "q_vec", n_planes, seed + t, out_col="b").select(
            "query_id", F.concat(F.lit(f"t{t}:"), F.col("b")).alias("bucket")
        )
        pairs = qb.join(cb, "bucket").select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(_as_double(F.col("q_vec")), _as_double(F.col("c_vec"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 11,
) -> DataFrame:
    """IVF-flat ANN: centroids = deterministic seeded corpus sample
    (cheap k-means surrogate; one pass). Corpus rows are assigned to
    their nearest centroid; each query probes its n_probe nearest
    cells and exact-ranks only those vectors."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cent"))
        .orderBy(F.pmod(F.xxhash64(F.col("cid").cast("string") + F.lit(seed)), F.lit(997)))
        .limit(n_cells)
        .collect()
    )
    cent_rows = [(i, [float(x) for x in r["cent"]]) for i, r in enumerate(cents)]
    spark = corpus.sparkSession
    cents_df = spark.createDataFrame(cent_rows, "cell int, cent array<double>")

    def assign(df, idc, vc, n_keep):
        scored = df.crossJoin(F.broadcast(cents_df)).select(
            idc,
            "cell",
            cosine_similarity(_as_double(F.col(vc)), F.col("cent")).alias("_cs"),
        )
        w = Window.partitionBy(idc).orderBy(F.col("_cs").desc(), F.col("cell").asc())
        return scored.withColumn("_r", F.row_number().over(w)).filter(F.col("_r") <= n_keep).drop(
            "_r", "_cs"
        )

    c_assign = assign(corpus, id_col, vec_col, 1)
    q_assign = assign(queries, query_id_col, vec_col, n_probe)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")).join(
        c_assign.select(F.col(id_col).alias("neighbor_id"), "cell"), "neighbor_id"
    )
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("q_vec")).join(
        q_assign.select(F.col(query_id_col).alias("query_id"), "cell"), "query_id"
    )
    scored = q.join(c, "cell").select(
        "query_id",
        "neighbor_id",
        cosine_similarity(_as_double(F.col("q_vec")), _as_double(F.col("c_vec"))).alias("cosine"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
