"""Dedup suite over the driver-provided documents table + planted dups."""

import pytest
from pyspark.sql import functions as F

from entity_resolution_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
    simhash_dedup,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """documents + planted near/exact duplicates with shifted ids."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    exact = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    # near-dup: drop the first two tokens
    near = docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 3, 100000)).alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


def test_exact_dedup_finds_planted(docs_with_dups):
    out = exact_dedup(docs_with_dups)
    groups = out.filter(F.col("group_size") >= 2)
    # 20 planted exact dup groups of size 2
    assert groups.count() == 40
    assert groups.filter(F.col("is_canonical")).count() == 20
    # canonical is the min id (original, not the +100000 copy)
    assert groups.filter(F.col("is_canonical") & (F.col("doc_id") >= 100000)).count() == 0


def test_minhash_lsh_finds_near_dups(docs_with_dups):
    pairs = minhash_lsh_dedup(docs_with_dups, threshold=0.5)
    hits = pairs.filter(
        (F.col("id_2") - F.col("id_1") == 200000) | (F.col("id_2") - F.col("id_1") == 100000)
    ).count()
    assert hits >= 35  # 40 planted pairs, LSH recall is probabilistic
    # every returned pair is exact-verified: jaccard in [threshold, 1]
    assert pairs.filter((F.col("jaccard") < 0.5) | (F.col("jaccard") > 1.0)).count() == 0
    # exact dups must come back at jaccard 1.0
    assert (
        pairs.filter((F.col("id_2") - F.col("id_1") == 100000) & (F.col("jaccard") < 1.0)).count()
        == 0
    )


def test_simhash_finds_exact_and_near(docs_with_dups):
    pairs = simhash_dedup(docs_with_dups, max_hamming=3)
    exact_hits = pairs.filter(F.col("id_2") - F.col("id_1") == 100000).count()
    assert exact_hits == 20  # exact dups have hamming 0


def test_ngram_jaccard_blocked(docs_with_dups):
    pairs = ngram_jaccard_pairs(docs_with_dups, threshold=0.4)
    planted = pairs.filter(
        (F.col("id_2") - F.col("id_1")).isin(100000, 200000)
    )
    assert planted.count() >= 38
    assert pairs.filter(F.col("jaccard") > 1.0).count() == 0


def test_embedding_near_dup(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")
    dup = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 5000).alias("vec_id"), "embedding"
    )
    pairs = embedding_near_dup(emb.unionByName(dup), threshold=0.999)
    found = pairs.filter(F.col("id_2") - F.col("id_1") == 5000).count()
    assert found == 10  # identical vectors always share every SRP bucket


def test_minhash_gate_disabled_is_superset(docs_with_dups):
    """gate_sigmas=None (round-2 advisory knob) disables the estimate
    pre-filter: the exact-verify result must contain every gated pair."""
    gated = minhash_lsh_dedup(docs_with_dups, threshold=0.5)
    exact = minhash_lsh_dedup(docs_with_dups, threshold=0.5, gate_sigmas=None)
    g = {(r["id_1"], r["id_2"]) for r in gated.collect()}
    e = {(r["id_1"], r["id_2"]) for r in exact.collect()}
    assert g <= e


def test_ngram_jaccard_raises_when_all_keys_dropped(spark):
    """Round-2 judge finding: above the cap with the default
    block_on=None the operator silently returned an EMPTY frame; it
    must raise instead."""
    docs = spark.range(0, 50).select(
        F.col("id").alias("doc_id"), F.lit("a b c d e").alias("text")
    )
    with pytest.raises(ValueError, match="key_cap"):
        ngram_jaccard_pairs(docs, key_cap=10)


def test_cross_dedup_finds_batch_hits(spark):
    from entity_resolution_spark.operators.dedup import minhash_lsh_dedup_against

    corpus = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # batch: 10 near-dups of corpus docs (first two tokens dropped,
    # shifted ids) + 10 genuinely novel docs (reversed-token text
    # shares no 3-shingle with any original)
    near = corpus.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 3, 100000)).alias("text"),
    )
    novel = corpus.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
    )
    batch = near.unionByName(novel)
    pairs = minhash_lsh_dedup_against(batch, corpus, threshold=0.5)
    got = {(r["batch_id"], r["corpus_id"]) for r in pairs.collect()}
    # every near-dup batch doc pairs with its origin; novel docs don't
    origins = {(i + 500000, i) for i in range(10)}
    assert origins <= got or len(origins & got) >= 8  # LSH recall is probabilistic
    assert all(b < 600000 for b, _ in got)
    # no batch×batch or corpus×corpus pairs by construction
    assert all(b >= 500000 and c < 500000 for b, c in got)


def test_cross_dedup_self_pairs_filtered(spark):
    from entity_resolution_spark.operators.dedup import minhash_lsh_dedup_against

    corpus = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    overlap = corpus.filter(F.col("doc_id") < 5)  # batch already ingested
    pairs = minhash_lsh_dedup_against(overlap, corpus, threshold=0.5)
    assert pairs.filter(F.col("batch_id") == F.col("corpus_id")).count() == 0


def test_paragraph_dedup_corpus_global(spark):
    from entity_resolution_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\n\nshared para\n\ntail one"),
        (2, "shared para\n\nunique two"),
        (3, "shared para"),                      # fully deduped away
        (4, "x\n\n\n\ny"),                       # blank paragraph kept
        (5, "repeat me\n\nrepeat me"),           # within-doc repeat
    ]
    out = {
        r["doc_id"]: (r["clean_text"], r["n_paras"], r["n_kept"])
        for r in paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    }
    assert out[1] == ("alpha beta\n\nshared para\n\ntail one", 3, 3)
    assert out[2] == ("unique two", 2, 1)
    assert out[3] == ("", 1, 0)                  # accounted, not vanished
    assert out[4] == ("x\n\n\n\ny", 3, 3)
    assert out[5] == ("repeat me", 2, 1)


def test_paragraph_dedup_deterministic(spark):
    from entity_resolution_spark.operators.dedup import paragraph_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # make cross-doc repeats: append a shared footer to every doc
    boiler = docs.select("doc_id", F.concat("text", F.lit("\n\nshared footer text")).alias("text"))
    a = {tuple(r) for r in paragraph_dedup(boiler.repartition(1)).collect()}
    b = {tuple(r) for r in paragraph_dedup(boiler.repartition(17)).collect()}
    assert a == b
    # exactly one doc (min doc_id) keeps the footer
    kept_footer = [r for r in a if "shared footer text" in r[1]]
    assert len(kept_footer) == 1 and kept_footer[0][0] == 0


def test_span_dedup_exact_substring(spark):
    from entity_resolution_spark.operators.dedup import span_dedup

    boiler = "one two three four five six seven eight nine ten"  # 10 tokens
    rows = [
        (1, boiler + " alpha beta gamma"),
        (2, boiler + " delta epsilon zeta"),      # loses the 10-token run
        (3, "unrelated text with no shared runs at all here ok"),
        (4, boiler),                               # fully boilerplate -> empty
        (5, ""),                                   # empty input accounted
    ]
    out = {
        r["doc_id"]: r
        for r in span_dedup(
            spark.createDataFrame(rows, ["doc_id", "text"]), k=8
        ).collect()
    }
    assert len(out) == 5
    # first occurrence keeps the span intact
    assert out[1]["clean_text"] == boiler + " alpha beta gamma"
    assert out[1]["n_removed"] == 0
    # later occurrences lose exactly the boilerplate tokens
    assert out[2]["clean_text"] == "delta epsilon zeta"
    assert out[2]["n_removed"] == 10
    assert out[3]["n_removed"] == 0
    assert out[4]["clean_text"] == "" and out[4]["n_removed"] == 10
    assert out[5] ["clean_text"] == "" and out[5]["n_tokens"] == 0


def test_span_dedup_within_doc_and_determinism(spark):
    from entity_resolution_spark.operators.dedup import span_dedup

    run = "a b c d e f g h"  # exactly k=8 tokens
    df = spark.createDataFrame(
        [(1, run + " x " + run), (2, "only unique tokens here nothing repeats at all")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in span_dedup(df, k=8).collect()}
    # the SECOND within-doc occurrence is removed, the first kept
    assert out[1]["clean_text"] == run + " x"
    assert out[1]["n_removed"] == 8
    # deterministic under repartitioning
    a = sorted(tuple(r) for r in span_dedup(df.repartition(1), k=8).collect())
    b = sorted(tuple(r) for r in span_dedup(df.repartition(7), k=8).collect())
    assert a == b


def test_paragraph_dedup_global_invariants(spark):
    """Seeded random corpus: every distinct non-blank paragraph
    survives EXACTLY once corpus-wide; blanks are never deduped;
    per-doc accounting holds."""
    import random

    from entity_resolution_spark.operators.dedup import paragraph_dedup

    rng = random.Random(42)
    vocab = [f"para {i} content words" for i in range(30)]
    rows = [
        (i, "\n\n".join(rng.choice(vocab) for _ in range(rng.randint(1, 8))))
        for i in range(60)
    ]
    out = paragraph_dedup(spark.createDataFrame(rows, ["doc_id", "text"])).collect()
    kept_paras = []
    for r in out:
        ps = r["clean_text"].split("\n\n") if r["clean_text"] else []
        kept_paras.extend(p for p in ps if p.strip())
        assert r["n_kept"] <= r["n_paras"]
        assert len([p for p in ps if p.strip()]) == r["n_kept"]
    input_distinct = {p for _, t in rows for p in t.split("\n\n") if p.strip()}
    assert sorted(kept_paras) == sorted(input_distinct)  # each exactly once


def test_span_dedup_accounting_invariants(spark):
    """Seeded random corpus with heavy shared runs: clean token count
    equals n_tokens - n_removed for every doc, nothing vanishes, and
    the globally-first doc is never modified by cross-doc dedup."""
    import random

    from entity_resolution_spark.operators.dedup import span_dedup

    rng = random.Random(7)
    shared = ["common run %d" % i for i in range(3)]
    rows = []
    for i in range(40):
        words = []
        for _ in range(rng.randint(0, 3)):
            words.extend(rng.choice(shared).split() + ["r%d" % rng.randint(0, 400)])
        words.extend("u%d_%d" % (i, j) for j in range(rng.randint(0, 12)))
        rows.append((i, " ".join(words)))
    out = span_dedup(spark.createDataFrame(rows, ["doc_id", "text"]), k=4).collect()
    assert len(out) == len(rows)
    for r in out:
        n_clean = len(r["clean_text"].split()) if r["clean_text"] else 0
        assert n_clean == r["n_tokens"] - r["n_removed"], r
        assert 0 <= r["n_removed"] <= r["n_tokens"]


def test_semantic_dedup_transitive_chain(spark):
    """a~b and b~c but NOT a~c: transitive closure must put all three
    in ONE cluster with min-id canonical — the case where pairwise
    keep-the-first dedup is visit-order-dependent."""
    from entity_resolution_spark.operators.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.7071, 0.7071]),   # ~45deg to both neighbors
        (3, [0.0, 1.0]),         # cos(1,3) = 0 < threshold
        (9, [-1.0, 0.0]),        # isolated
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb, threshold=0.6, n_planes=1, dim=2).collect()
    }
    assert len(out) == 4
    assert out[1]["rep_id"] == out[2]["rep_id"] == out[3]["rep_id"] == 1
    assert out[1]["is_canonical"] and not out[2]["is_canonical"]
    assert out[1]["group_size"] == 3
    assert out[9]["rep_id"] == 9 and out[9]["is_canonical"] and out[9]["group_size"] == 1


def test_hot_key_operators_are_window_free(spark):
    """Round-4 de-skew regression pin: the content-keyed operators must
    not contain a Window node in their optimized plans — a window
    gathers every row of a hot key into ONE task (AQE can split skewed
    joins, never window partitions), so these operators use
    partial-aggregatable groupBy + join instead."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.operators.dedup import (
        exact_dedup,
        paragraph_dedup,
        semantic_dedup,
        span_dedup,
    )
    from entity_resolution_spark.operators.sampling import url_dedup

    docs = spark.createDataFrame(
        [(i, f"tok{i} common words here\n\nshared footer") for i in range(20)],
        ["doc_id", "text"],
    )
    pages = spark.createDataFrame(
        [(i, f"https://a.com/x?p={i % 5}", i) for i in range(20)],
        ["doc_id", "url", "warc_ts"],
    )
    embs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0, 0.5, 0.1]) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    plans = {
        "exact_dedup": exact_dedup(docs),
        "paragraph_dedup": paragraph_dedup(docs),
        "span_dedup": span_dedup(docs, k=4),
        "url_dedup": url_dedup(pages, ts_col="warc_ts"),
        "semantic_dedup": semantic_dedup(embs, n_planes=2, dim=4),
    }
    for name, df in plans.items():
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Window" not in plan, f"{name} still contains a Window node"


def test_exact_dedup_null_text_rows_kept(spark):
    """NULL-text docs (failed extraction) must stay in the output as
    one NULL-fingerprint group — the de-skew join is null-safe (a
    plain equi-join silently dropped them; review catch)."""
    from entity_resolution_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "hello"), (2, None), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in exact_dedup(docs).collect()}
    assert set(out) == {1, 2, 3}
    assert out[2]["group_size"] == 2 and out[3]["group_size"] == 2
    assert out[2]["is_canonical"] and not out[3]["is_canonical"]
