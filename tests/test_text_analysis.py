"""Text analysis + multimodal plumbing tests."""

from pyspark.sql import functions as F

from entity_resolution_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample_stub,
)
from entity_resolution_spark.operators.text_analysis import (
    analyze_documents,
    containment_candidates,
    quality_filter,
)

SF = "/root/testdata/sf0.001"


def test_analyze_documents(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = analyze_documents(docs).cache()
    assert out.count() == docs.count()
    row = out.filter(F.col("doc_id") == 0).first()
    assert row["n_tokens"] == len(row["text"].split())
    assert 0.0 <= row["quality"] <= 1.0
    assert len(row["fingerprint"]) == 32  # md5 hex
    assert out.filter(F.col("n_subtokens") < F.col("n_tokens")).count() == 0


def test_quality_filter_keeps_reasonable_docs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept = quality_filter(docs, min_quality=0.5)
    assert 0 < kept.count() <= docs.count()


def test_containment_candidates(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "prefix words then alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "completely unrelated text with nothing shared at all here now"),
        ],
        "doc_id long, text string",
    )
    pairs = containment_candidates(docs, window=8).collect()
    assert {(r["id_1"], r["id_2"]) for r in pairs} == {(1, 2)}


def _media_df(spark):
    rows = [
        (1, "image", b"\x89PNGfakebytes" * 50, "image/png", 100, 80, None),
        (2, "audio", b"RIFFfakewav" * 30, "audio/wav", None, None, 2000),
        (3, "video", b"\x00\x00ftypfakemp4" * 80, "video/mp4", 640, 480, 3000),
        (4, "image", b"", "image/png", 1, 1, None),  # corrupt/empty
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_media_feature_extraction_drops_corrupt(spark):
    media = _media_df(spark)
    out = extract_media_features(media, dim=16).cache()
    assert out.count() == 3  # corrupt row dropped
    r = out.filter(F.col("media_id") == 1).first()
    assert len(r["feature"]) == 16
    assert r["byte_len"] == len(b"\x89PNGfakebytes" * 50)
    # determinism: same payload -> same feature
    again = extract_media_features(media, dim=16).filter(F.col("media_id") == 1).first()
    assert again["feature"] == r["feature"]


def test_frame_sampling(spark):
    media = _media_df(spark)
    frames = frame_sample_stub(media, every_ms=1000)
    assert frames.count() == 4  # 0,1000,2000,3000 for the 3000ms video


def test_containment_cap_bounds_boilerplate_join(spark):
    """Round-2 judge finding: a hot boilerplate window shared by n docs
    produced n² join rows — the frequency cap must bound it."""
    from entity_resolution_spark.operators.text_analysis import containment_candidates

    boiler = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (i, f"{boiler} u{i}a u{i}b u{i}c u{i}d u{i}e u{i}f u{i}g u{i}h")
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped: the shared 8-token run pairs every doc with every other
    assert containment_candidates(docs, key_cap=10_000).count() == 30 * 29 // 2
    # capped: the hot fingerprint (30 > 10 members) drops -> no pairs
    assert containment_candidates(docs, key_cap=10).count() == 0


def test_rolling_fingerprints_short_doc_yields_empty(spark):
    """Docs shorter than the window crashed with slice(start=0)
    (sequence(1,0) is descending in Spark) — must yield [] instead."""
    from pyspark.sql import functions as F

    from entity_resolution_spark.functions.text import rolling_fingerprints
    from entity_resolution_spark.normalize import tokens

    df = spark.createDataFrame([("a b c",), ("",), ("one two three four five six seven eight",)],
                               "text string")
    out = df.select(rolling_fingerprints(tokens(F.col("text")), 8).alias("f")).collect()
    assert sorted(len(r["f"]) for r in out) == [0, 0, 1]


def test_repetition_stats_planted(spark):
    """Gopher repetition metrics against hand-computed truth."""
    from entity_resolution_spark.operators.text_analysis import repetition_stats

    docs = spark.createDataFrame(
        [
            # 4 non-blank lines, 2 identical -> dup_line_frac 0.25;
            # 2 paragraphs, distinct -> dup_para_frac 0.0
            (1, "buy now\nlimited offer\n\nbuy now\nact fast"),
            # bigram "spam spam" dominates: tokens s s s s a ->
            # bigrams [ss, ss, ss, sa]: top 3 of 4
            (2, "spam spam spam spam alpha"),
            # all three paragraphs identical -> dup_para_frac 2/3
            (3, "same para here\n\nsame para here\n\nsame para here"),
            (4, ""),  # empty -> all zeros, never null
            (5, "one"),  # single token -> no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert out[1]["dup_line_frac"] == 0.25
    assert out[1]["dup_para_frac"] == 0.0
    assert out[2]["top_bigram_count"] == 3
    assert out[2]["n_bigrams"] == 4
    assert out[2]["top_bigram_frac"] == 0.75
    assert abs(out[3]["dup_para_frac"] - 2 / 3) < 1e-9
    assert abs(out[3]["dup_line_frac"] - 2 / 3) < 1e-9  # lines == paras here
    for c in ("dup_line_frac", "dup_para_frac", "top_bigram_frac"):
        assert out[4][c] == 0.0
    assert out[4]["top_bigram_count"] == 0 and out[4]["n_bigrams"] == 0
    assert out[5]["top_bigram_count"] == 0 and out[5]["top_bigram_frac"] == 0.0
    # no nulls anywhere: downstream threshold filters must see numbers
    n_null = repetition_stats(docs).filter(
        F.col("dup_line_frac").isNull()
        | F.col("dup_para_frac").isNull()
        | F.col("top_bigram_frac").isNull()
    ).count()
    assert n_null == 0


def test_redact_pii_golden(spark):
    from entity_resolution_spark.functions.text import pii_counts, redact_pii

    cases = [
        ("mail me at jane.doe+x@sub.example.co.uk thanks",
         "mail me at <EMAIL> thanks", (1, 0, 0)),
        ("server at 192.168.0.1 and 10.0.255.7 replied",
         "server at <IP> and <IP> replied", (0, 2, 0)),
        ("call 555-123-4567 or +1 555 987 6543 now",
         "call <PHONE> or +1 <PHONE> now", (0, 0, 2)),
        ("no pii here at all", "no pii here at all", (0, 0, 0)),
        ("a@b.io then 1.2.3.4 then 555.123.4567",
         "<EMAIL> then <IP> then <PHONE>", (1, 1, 1)),
    ]
    df = spark.createDataFrame([(t,) for t, _, _ in cases], ["text"])
    got = df.select(
        redact_pii(F.col("text")).alias("red"), *pii_counts(F.col("text"))
    ).collect()
    for (raw, want_red, want_counts), r in zip(cases, got):
        assert r["red"] == want_red, raw
        assert (r["n_emails"], r["n_ips"], r["n_phones"]) == want_counts, raw


def test_script_detection_golden(spark):
    from entity_resolution_spark.functions.text import dominant_script, script_count

    rows = [
        (0, "plain english text"),
        (1, "привет мир"),
        (2, "你好世界"),
        (3, "γειά σου κόσμε"),
        (4, "ひらがな テスト"),          # hiragana + katakana mix
        (5, "mixed текст with more latin chars"),
        (6, "12345 !!!"),               # no recognized script
        (7, ""),
    ]
    df = spark.createDataFrame(rows, ["i", "t"])
    got = {
        r["i"]: (r["script"], r["n_latin"], r["n_cyrillic"])
        for r in df.select(
            "i",
            dominant_script(F.col("t")).alias("script"),
            script_count(F.col("t"), "Latin"),
            script_count(F.col("t"), "Cyrillic"),
        ).collect()
    }
    assert got[0] == ("latin", 16, 0)
    assert got[1] == ("cyrillic", 0, 9)
    assert got[2][0] == "han"
    assert got[3][0] == "greek"
    assert got[4][0] == "hiragana"
    assert got[5][0] == "latin"  # more latin than cyrillic
    assert got[6] == ("und", 0, 0)
    assert got[7] == ("und", 0, 0)


def test_script_priority_tiebreak(spark):
    from entity_resolution_spark.functions.text import dominant_script

    # equal latin and cyrillic counts -> priority order wins
    df = spark.createDataFrame([("abвг",)], ["t"])
    assert df.select(dominant_script(F.col("t")).alias("s")).first()["s"] == "latin"


def test_unigram_logprob_buckets_semantics(spark):
    from entity_resolution_spark.operators.text_analysis import unigram_logprob_buckets

    common = "the cat sat on the mat and the dog sat too"
    rows = [
        (1, common),
        (2, common),
        (3, common + " extra"),
        (4, "zyzzyva qoph xylyl vexing quark jumble"),  # rare vocab -> tail
        (5, ""),                                        # empty -> accounted
    ]
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_buckets(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert len(out) == 5
    # empty doc is accounted, not dropped
    assert out[5]["bucket"] == "empty" and out[5]["n_tokens"] == 0
    assert out[5]["avg_nll"] is None
    # the all-rare-vocab doc has the highest NLL -> tail bucket
    assert out[4]["bucket"] == "tail"
    scored = [out[i]["avg_nll"] for i in (1, 2, 3, 4)]
    assert max(scored) == out[4]["avg_nll"]
    # identical docs score identically and land in the same bucket
    assert out[1]["avg_nll"] == out[2]["avg_nll"]
    assert out[1]["bucket"] == out[2]["bucket"] == "head"


def test_unigram_logprob_buckets_deterministic(spark):
    from entity_resolution_spark.operators.text_analysis import unigram_logprob_buckets

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = {(r["doc_id"], r["n_tokens"], r["bucket"])
         for r in unigram_logprob_buckets(docs.repartition(1)).collect()}
    b = {(r["doc_id"], r["n_tokens"], r["bucket"])
         for r in unigram_logprob_buckets(docs.repartition(17)).collect()}
    assert a == b
    # every doc bucketed; roughly a third in each bucket at the exact quantiles
    buckets = [t[2] for t in a]
    n = len(buckets)
    for name in ("head", "middle", "tail"):
        assert abs(buckets.count(name) - n / 3) <= n * 0.1 + 2, name


def test_profile_table(spark):
    import pytest

    from entity_resolution_spark.operators.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], ["k", "v"]
    )
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 4 and out["k"]["n_nonnull"] == 3
    assert out["k"]["n_null"] == 1 and out["k"]["n_distinct"] == 3
    # min/max aggregate on the native type (numeric order), then cast
    assert (out["k"]["min_value"], out["k"]["max_value"]) == ("1", "3")
    assert out["v"]["n_distinct"] == 2 and out["v"]["n_null"] == 1
    # approx mode runs and is sane on tiny input
    approx = {r["column"]: r for r in profile_table(df, exact_distinct=False).collect()}
    assert approx["v"]["n_distinct"] >= 1
    with pytest.raises(ValueError, match="not in frame"):
        profile_table(df, ["nope"])


def test_unigram_logprob_buckets_per_group(spark):
    from entity_resolution_spark.operators.text_analysis import unigram_logprob_buckets

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the cat sat on the mat"),
        (3, "en", "zyzzyva qoph xylyl vexing"),   # rare in en -> en tail
        (4, "de", "der hund lief im park"),       # 1-doc... no, give de 3 docs
        (5, "de", "der hund lief im park"),
        (6, "de", "qxv zzz kkk www"),             # rare in de -> de tail
        (7, None, "orphan group text"),           # NULL group = own group
    ]
    out = {
        r["doc_id"]: r
        for r in unigram_logprob_buckets(
            spark.createDataFrame(rows, ["doc_id", "lang", "text"]), group_col="lang"
        ).collect()
    }
    assert len(out) == 7
    # per-group extremes: the rare-vocab doc is tail WITHIN its language
    assert out[3]["bucket"] == "tail"
    assert out[6]["bucket"] == "tail"
    # common docs rank head within their group
    assert out[1]["bucket"] == "head" and out[4]["bucket"] == "head"
    # a single-doc group ranks 0.0 -> head, not dropped
    assert out[7]["bucket"] == "head"


def test_bigram_logprob_scores_semantics(spark):
    """Hand-computed interpolated bigram NLL on a 2-doc corpus, plus
    the empty/1-token accounting path and repartition invariance."""
    import math

    from entity_resolution_spark.operators.text_analysis import bigram_logprob_scores

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, ""), (3, "solo")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bigram_logprob_scores(docs, lam=0.8).collect()}
    # corpus bigrams: doc0 (a,b)(b,a)(a,b); doc1 (a,b)(b,c)
    # cb: (a,b)=3 (b,a)=1 (b,c)=1 ; c1: a=3 b=2
    # unigrams: a=3 b=3 c=1 solo=1 -> T=8
    lam, om = 0.8, 1.0 - 0.8
    p_ab = lam * 3 / 3 + om * 3 / 8
    p_ba = lam * 1 / 2 + om * 3 / 8
    p_bc = lam * 1 / 2 + om * 1 / 8
    exp0 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    exp1 = round(-(math.log(p_ab) + math.log(p_bc)) / 2, 4)
    assert (out[0]["n_bigrams"], out[0]["avg_nll"]) == (3, exp0)
    assert (out[1]["n_bigrams"], out[1]["avg_nll"]) == (2, exp1)
    assert (out[2]["n_bigrams"], out[2]["avg_nll"]) == (0, None)
    assert (out[3]["n_bigrams"], out[3]["avg_nll"]) == (0, None)
    b = {tuple(r) for r in bigram_logprob_scores(docs.repartition(7), lam=0.8).collect()}
    assert b == {tuple(r) for r in out.values()}


def test_domain_quality_stats_and_filter(spark):
    """Per-domain aggregates + the site-level gate: a content-farm
    domain (all-duplicate pages) reads dup_frac ~1 and is dropped
    wholesale; a healthy domain survives with every document."""
    from entity_resolution_spark.operators.text_analysis import (
        domain_quality_stats,
        filter_domains,
    )

    rows = [(i, "farm.com", "same spam page content here") for i in range(6)] + [
        (10 + i, "good.org", f"unique article number {i} with plenty of words")
        for i in range(4)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    stats = {r["domain"]: r for r in domain_quality_stats(docs).collect()}
    assert stats["farm.com"]["n_docs"] == 6
    assert stats["farm.com"]["dup_frac"] == round(1.0 - 1 / 6, 6)
    assert stats["good.org"]["dup_frac"] == 0.0
    kept = filter_domains(docs, max_dup_frac=0.5)
    assert {r["source"] for r in kept.collect()} == {"good.org"}
    assert kept.count() == 4
    # repartition invariance
    assert filter_domains(docs.repartition(9), max_dup_frac=0.5).count() == 4


def test_filter_domains_null_domain_kept(spark):
    """A NULL domain group that passes the gates must survive the
    semi-join (null-safe; a plain equi-semi-join dropped every
    source-less doc — review catch)."""
    from entity_resolution_spark.operators.text_analysis import filter_domains

    docs = spark.createDataFrame(
        [(1, None, "text one here"), (2, "a.com", "text two here")],
        "doc_id long, source string, text string",
    )
    kept = filter_domains(docs)  # identity gates
    assert kept.count() == 2
