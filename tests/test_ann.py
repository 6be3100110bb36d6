"""ANN: brute-force oracle vs LSH / IVF recall."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.ann import brute_force_topk, ivf_topk, lsh_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    out = brute_force_topk(emb, queries, k=10)
    return {
        (r["query_id"], r["neighbor_id"]) for r in out.collect()
    }


def test_brute_force_self_is_top1(emb, queries):
    out = brute_force_topk(emb, queries, k=1)
    rows = out.collect()
    assert all(r["query_id"] == r["neighbor_id"] for r in rows)
    assert all(abs(r["cosine"] - 1.0) < 1e-9 for r in rows)


def test_brute_force_k_rows_per_query(emb, queries):
    out = brute_force_topk(emb, queries, k=10)
    counts = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 10 for r in counts)


def test_lsh_topk_recall(emb, queries, exact):
    # these embeddings are weakly clustered (true top-10 cosine ~0.4),
    # so use shallow planes + many tables: p_collide ≈ 1-(1-(1-θ/π)^4)^16
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=10, n_planes=4, n_tables=16).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"LSH recall {recall:.2f}"
    # self-match must always survive (identical vector, every table collides)
    assert all((q, q) in got for q in range(8))


def test_ivf_topk_recall(emb, queries, exact):
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=10, n_cells=8, n_probe=4).collect()
    }
    recall = len(got & exact) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f}"
