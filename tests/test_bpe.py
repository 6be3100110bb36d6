"""BPE trainer: golden equivalence against a pure-Python reference
implementation of the textbook algorithm, determinism, and the
tokenize-by-lookup apply path."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from entity_resolution_spark.operators.bpe import END_OF_WORD, bpe_tokenize, bpe_train

SF = "/root/testdata/sf0.001"


def _reference_bpe(word_counts: dict[str, int], n_merges: int, min_pair_count: int = 2):
    """Textbook BPE on a word-frequency dict (Sennrich et al. 2016
    learn_bpe structure), with the engine's deterministic tie-break."""
    vocab = {w: tuple(list(w) + [END_OF_WORD]) for w in word_counts}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, sym in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += word_counts[w]
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merged = left + right
        merges.append((rank, left, right, merged, cnt))
        new_vocab = {}
        for w, sym in vocab.items():
            out: list[str] = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            new_vocab[w] = tuple(out)
        vocab = new_vocab
    return merges, {w: list(s) for w, s in vocab.items()}


def test_bpe_train_matches_reference(spark):
    corpus = [
        (0, "low low low low low"),
        (1, "lower lower newest newest"),
        (2, "newest newest newest newest"),
        (3, "widest widest widest"),
        (4, "low lower newest widest"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    merges_df, seg_df = bpe_train(docs, n_merges=8)

    wc: Counter = Counter(w for _, t in corpus for w in t.split())
    ref_merges, ref_vocab = _reference_bpe(dict(wc), 8)

    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"])
        for r in merges_df.orderBy("rank").collect()
    ]
    assert got == ref_merges
    got_seg = {r["word"]: list(r["subwords"]) for r in seg_df.collect()}
    assert got_seg == ref_vocab


def test_bpe_train_deterministic_and_overlap(spark):
    # 'aaa' under merge (a,a): greedy left-to-right gives [aa, a</w>-ish]
    docs = spark.createDataFrame(
        [(0, "aaa aaa aa"), (1, "aaa b b b b")], ["doc_id", "text"]
    )
    m1, s1 = bpe_train(docs.repartition(1), n_merges=4)
    m2, s2 = bpe_train(docs.repartition(9), n_merges=4)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    assert sorted(map(str, s1.collect())) == sorted(map(str, s2.collect()))
    wc = {"aaa": 3, "aa": 1, "b": 4}
    ref_merges, _ = _reference_bpe(wc, 4)
    assert sorted(map(tuple, m1.collect())) == sorted(ref_merges)


def _apply_merges_sequentially(word_counts, merges):
    """Greedy fold of each recorded merge IN RANK ORDER over a char
    vocab — the sequential semantics a batch must be equivalent to."""
    vocab = {w: list(w) + [END_OF_WORD] for w in word_counts}
    for _rank, left, right, merged, _cnt in merges:
        for w, sym in vocab.items():
            out: list[str] = []
            for s in sym:
                if out and out[-1] == left and s == right:
                    out[-1] = merged
                else:
                    out.append(s)
            vocab[w] = out
    return vocab


def test_bpe_batched_selects_non_interacting_merges(spark):
    # 'ab'x3, 'xy'x2: pairs (a,b)=3, (b,</w>)=3, (x,y)=2, (y,</w>)=2.
    # A batch of 2 takes the argmax (a,b), skips (b,</w>) (shares b),
    # and takes (x,y) — the next-best non-interacting pair.
    docs = spark.createDataFrame([(0, "ab ab ab xy xy")], ["doc_id", "text"])
    merges_df, seg_df = bpe_train(docs, n_merges=2, merges_per_round=2)
    got = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    assert got == [(0, "a", "b", "ab", 3), (1, "x", "y", "xy", 2)]
    seg = {r["word"]: list(r["subwords"]) for r in seg_df.collect()}
    assert seg == {"ab": ["ab", END_OF_WORD], "xy": ["xy", END_OF_WORD]}


def test_bpe_batched_equals_sequential_application(spark, monkeypatch):
    # Batched training: (1) round 1's first merge is the exact global
    # argmax, (2) applying the recorded merge table SEQUENTIALLY (rank
    # order, one merge at a time) reproduces the trainer's own
    # segmentation — the non-interacting-batch invariant — and (3) the
    # lineage-cut count (1 init + 1 per round) is far below 1/merge.
    # the CONCRETE class: Spark 4's classic DataFrame overrides
    # localCheckpoint, so patching pyspark.sql.DataFrame is a no-op
    from pyspark.sql.classic.dataframe import DataFrame

    calls = {"n": 0}
    orig = DataFrame.localCheckpoint

    def counting(self, eager=True):
        calls["n"] += 1
        return orig(self, eager=eager)

    monkeypatch.setattr(DataFrame, "localCheckpoint", counting)
    corpus = [(0, "ab ab ab ab ab cd cd cd cd ef ef ef gh gh")]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    merges_df, seg_df = bpe_train(docs, n_merges=8, merges_per_round=8)
    merges = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    wc = Counter(w for _, t in corpus for w in t.split())
    exact_first = _reference_bpe(dict(wc), 1)[0][0]
    assert merges[0] == exact_first
    assert [m[0] for m in merges] == list(range(len(merges)))
    seg = {r["word"]: list(r["subwords"]) for r in seg_df.collect()}
    assert seg == _apply_merges_sequentially(dict(wc), merges)
    # 8 merges: round 1 batches (a,b),(c,d),(e,f),(g,h); the (x,</w>)
    # merges all share </w> so later rounds take 1 each -> 5 rounds.
    # Cuts: 2 init (vocab + pair-count table) + 2 per round (folded
    # vocab + incremental count update).
    assert calls["n"] <= 2 + 2 * 5


def test_incremental_counts_match_recount(spark):
    """The maintained pair-count table must stay equal to a full
    recount across MANY rounds — a single stale count would steer
    merge selection off the textbook path, so a deep sequential run
    against the pure-Python reference pins the invariant end-to-end
    (the incremental delta only touches words whose symbol array
    changed; any missed word diverges within a round or two)."""
    corpus = [
        (0, "the quick brown fox jumps over the lazy dog the fox"),
        (1, "she sells sea shells by the sea shore she sells shells"),
        (2, "peter piper picked a peck of pickled peppers a peck"),
        (3, "how much wood would a woodchuck chuck if a woodchuck could"),
        (4, "the shells the peppers the wood the dog the quick quick"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    wc = Counter(w for _, t in corpus for w in t.split())

    # driver_vocab_limit=0 pins the DISTRIBUTED incremental path (the
    # default would collect this tiny vocab and train in-process)
    merges_df, seg_df = bpe_train(docs, n_merges=40, min_pair_count=1, driver_vocab_limit=0)
    ref_merges, ref_vocab = _reference_bpe(dict(wc), 40, min_pair_count=1)
    got = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    assert got == ref_merges
    got_seg = {r["word"]: list(r["subwords"]) for r in seg_df.collect()}
    assert got_seg == ref_vocab


def test_driver_and_distributed_paths_agree(spark):
    """The in-process trainer (vocab fits driver memory) and the
    distributed incremental rounds must emit IDENTICAL merge tables
    and segmentations — same batch selection, fold semantics, and
    tie-breaks — including under batching, where both paths must make
    the same non-interacting approximation."""
    corpus = [
        (0, "the quick brown fox jumps over the lazy dog the fox"),
        (1, "she sells sea shells by the sea shore she sells shells"),
        (2, "ab ab ab xy xy aaa aaa aa the the quick"),
    ]
    docs = spark.createDataFrame(corpus, ["doc_id", "text"])
    for mpr in (1, 4):
        m_drv, s_drv = bpe_train(docs, n_merges=20, min_pair_count=1, merges_per_round=mpr)
        m_dst, s_dst = bpe_train(
            docs, n_merges=20, min_pair_count=1, merges_per_round=mpr, driver_vocab_limit=0
        )
        assert [tuple(r) for r in m_drv.orderBy("rank").collect()] == [
            tuple(r) for r in m_dst.orderBy("rank").collect()
        ]
        seg_a = {r["word"]: (list(r["subwords"]), r["cnt"]) for r in s_drv.collect()}
        seg_b = {r["word"]: (list(r["subwords"]), r["cnt"]) for r in s_dst.collect()}
        assert seg_a == seg_b


def test_bpe_tokenize_roundtrip_and_oov(spark):
    train = spark.createDataFrame(
        [(0, "hello hello world world world")], ["doc_id", "text"]
    )
    _, seg = bpe_train(train, n_merges=6)
    apply_docs = spark.createDataFrame(
        [(0, "hello world"), (1, "hello unseen"), (2, "")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in bpe_tokenize(apply_docs, seg).collect()}
    # joining subwords and stripping </w> reconstructs the text
    def detok(subs):
        return "".join(subs).replace(END_OF_WORD, " ").strip()

    assert detok(out[0]["subwords"]) == "hello world"
    # OOV word falls back to chars + </w>, never dropped
    assert detok(out[1]["subwords"]) == "hello unseen"
    assert "u" in out[1]["subwords"]  # unseen -> char fallback
    assert out[2]["subwords"] == [] and out[2]["n_subwords"] == 0


def test_bpe_symbols_with_embedded_nul(spark):
    """Symbols may contain ANY byte — tokens split on whitespace only,
    so a corpus with embedded NULs yields NUL-bearing symbols; the
    batch fold compares pairs directly (an encoded lookup key was
    ambiguous — review catch) and training must stay correct."""
    docs = spark.createDataFrame([(0, "a\x00b a\x00b a\x00b xy xy")], ["doc_id", "text"])
    merges_df, seg_df = bpe_train(docs, n_merges=3, merges_per_round=3)
    merges = [tuple(r) for r in merges_df.orderBy("rank").collect()]
    wc = {"a\x00b": 3, "xy": 2}
    # NUL sorts below every letter, so the (l, r) tie-break picks
    # ('\x00', 'b') among the count-3 pairs — matching the reference
    assert merges[0] == _reference_bpe(wc, 1)[0][0]
    assert merges[0][1:] == ("\x00", "b", "\x00b", 3)
    seg = {r["word"]: list(r["subwords"]) for r in seg_df.collect()}
    assert seg == _apply_merges_sequentially(wc, merges)
