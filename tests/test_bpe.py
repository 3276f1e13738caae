"""BPE training tests: greedy-merge semantics, round trip, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bpe_train_greedy_merge_semantics(spark):
    """Hand-checkable corpus: merges come out in exact frequency order
    with (cnt DESC, a, b) tie-breaks, and overlapping runs merge
    left-to-right greedily like reference BPE."""
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    # 'aaab' x3, 'ab' x2.  Round 0 counts OVERLAPPING adjacent pairs
    # (reference BPE tallies zip(word, word[1:])): 'aaab' has (a,a)
    # twice -> (a,a)=6, (a,b)=3+2=5 -> merge (a,a).
    docs = spark.createDataFrame(
        [(0, "aaab aaab aaab ab ab")], "id long, text string")
    m = bpe_train_merges(docs, "text", n_merges=3).collect()
    assert [(r.round, r.left_sym, r.right_sym, r.pair_count)
            for r in m[:1]] == [(0, "a", "a", 6)]
    # the MERGE is greedy left-to-right though: 'aaab' -> [aa, a, b]
    # (NOT [a, aa, b]), so round 1 pairs are (aa,a)=3, (a,b)=3+2=5
    r1 = m[1]
    assert (r1.left_sym, r1.right_sym, r1.pair_count) == ("a", "b", 5)
    # round 2: 'aaab' = [aa, ab], 'ab' = [ab]: (aa,ab)=3 is all that's left
    r2 = m[2]
    assert (r2.left_sym, r2.right_sym, r2.pair_count) == ("aa", "ab", 3)


def test_bpe_apply_round_trip(spark):
    """train -> apply -> detokenize reproduces the lowercased text, and
    learned merges actually compress the token count."""
    from vector_db_at_home_spark.operators.bpe import (
        bpe_apply,
        bpe_train_merges,
    )

    texts = [
        (0, "the cat sat on the mat"),
        (1, "the catalog the cathode the cat"),
        (2, "Mixed CASE words The THE the"),
    ]
    docs = spark.createDataFrame(texts, "id long, text string")
    merges = [(r.left_sym, r.right_sym)
              for r in bpe_train_merges(docs, "text", n_merges=6)
              .orderBy("round").collect()]
    assert len(merges) == 6

    toks = bpe_apply(docs, "text", "id", merges)
    rebuilt = (
        toks.select("id", "word_pos",
                    F.concat_ws("", F.col("tokens")).alias("w"))
        .groupBy("id")
        .agg(F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("word_pos", "w")))
            .getField("w")).alias("text"))
        .collect()
    )
    want = {i: t.lower() for i, t in texts}
    for r in rebuilt:
        assert r.text == want[r.id]
    # compression: 'the' appears 7 times; with 6 merges it must have
    # fused below 3 single-char tokens
    n_the = (
        toks.join(docs, "id")
        .filter(F.split(F.lower("text"), " ")[F.col("word_pos")] == "the")
        .select(F.size("tokens").alias("n")).agg(F.max("n")).first()[0]
    )
    assert n_the is not None and n_the <= 2


def test_bpe_train_deterministic(spark):
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [(i, f"repeat repeat repeat unique{i} words words")
         for i in range(20)],
        "id long, text string")
    a = [tuple(r) for r in bpe_train_merges(docs, "text", 5).collect()]
    b = [tuple(r) for r in bpe_train_merges(docs, "text", 5).collect()]
    assert a == b and len(a) == 5


def test_bpe_hybrid_local_equals_distributed(spark):
    """r8: the driver-side finisher must be BYTE-identical to the
    distributed rounds — same pair counts, same greedy apply, same
    (cnt DESC, a ASC, b ASC) tie-break — on a corpus exercising
    overlaps ('aaa'), ties, and multi-round interactions."""
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [
            (1, "aaa abab low lower lowest"),
            (2, "low low low newer newest"),
            (3, "wider wide widest abab aaa"),
            (4, "zz zz yy zzyy aaa b"),
        ],
        "id long, text string",
    )
    local = [tuple(r) for r in
             bpe_train_merges(docs, "text", n_merges=12).collect()]
    dist = [tuple(r) for r in
            bpe_train_merges(docs, "text", n_merges=12,
                             local_vocab_ceiling=0).collect()]
    assert local == dist
    assert len(local) == 12


def test_bpe_hybrid_equivalence_on_testdata(spark):
    """Same equivalence on the real documents table (the registered
    query's input) — first 8 merges, both paths."""
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    local = [tuple(r) for r in
             bpe_train_merges(docs, "text", n_merges=8).collect()]
    dist = [tuple(r) for r in
            bpe_train_merges(docs, "text", n_merges=8,
                             local_vocab_ceiling=0).collect()]
    assert local == dist and len(local) == 8


def test_bpe_batched_equals_sequential_tie_free(spark):
    """r9 (VERDICT r8 task 3): the batched distributed rounds must be
    provably identical to sequential greedy.  Tie-free Zipf-ish corpus
    (distinct pair counts, many symbol-disjoint winners) — the batch
    path must take >1 merge per round AND match the pinned local
    greedy byte-for-byte."""
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    words = ["ab", "cd", "ef", "gh", "ij", "kl", "mn", "op",
             "qr", "st", "uv", "wx", "yz", "01", "23", "45"]
    rows = [(i, (w + " ") * (100 - 3 * i)) for i, w in enumerate(words)]
    docs = spark.createDataFrame(rows, "id long, text string")
    local = [tuple(r) for r in
             bpe_train_merges(docs, "text", n_merges=16).collect()]
    stats: dict = {}
    dist = [tuple(r) for r in
            bpe_train_merges(docs, "text", n_merges=16,
                             local_vocab_ceiling=0,
                             stats=stats).collect()]
    assert local == dist and len(local) == 16
    assert stats["path"] == "distributed"
    # the whole point: multiple merges per distributed round — these 16
    # symbol-disjoint distinct-count pairs batch into a single round
    assert stats["rounds"] < 16
    assert len(dist) / stats["rounds"] > 2


def test_bpe_batched_equals_sequential_tie_heavy(spark):
    """Adversarially tie-heavy corpus (every pair count equal, shared
    symbols everywhere, self-pair runs): the batch trim must fall back
    toward single merges and STILL match sequential greedy exactly."""
    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    docs = spark.createDataFrame(
        [
            (0, "aaaa aaaa bbbb bbbb"),          # self-pair runs, tied
            (1, "abab baba abba baab"),          # shared symbols, tied
            (2, "xy yx xy yx zz zz"),
        ],
        "id long, text string",
    )
    local = [tuple(r) for r in
             bpe_train_merges(docs, "text", n_merges=10).collect()]
    dist = [tuple(r) for r in
            bpe_train_merges(docs, "text", n_merges=10,
                             local_vocab_ceiling=0).collect()]
    assert local == dist and len(local) == 10


def test_bpe_batched_truncated_scan_equals_sequential(spark):
    """batch_scan smaller than the pair table: the conservative
    boundary (c_rest = last collected count) must keep the batch
    sequential-identical."""
    from vector_db_at_home_spark.operators.bpe import (
        _train_merges_distributed,
        _word_freqs,
        bpe_train_merges,
    )

    docs = spark.createDataFrame(
        [(i, f"word{i} " * (30 - i) + "shared shared") for i in range(12)],
        "id long, text string")
    local = [tuple(r) for r in
             bpe_train_merges(docs, "text", n_merges=12).collect()]
    wf = _word_freqs(docs, "text")
    dist = _train_merges_distributed(wf, 12, batch_scan=3)
    got = [(int(a), b, c, int(d)) for a, b, c, d in dist]
    want = [(int(a), b, c, int(d)) for a, b, c, d in local]
    assert got == want


def test_bpe_batched_randomized_equivalence(spark):
    """Fixed-seed randomized corpora (mixed alphabet sizes, repeated
    substrings, runs): batched distributed == local sequential on all
    of them."""
    import random

    from vector_db_at_home_spark.operators.bpe import bpe_train_merges

    for seed in (3, 17):
        rng = random.Random(seed)
        alpha = "abcdef"
        rows = []
        for i in range(40):
            w = "".join(rng.choice(alpha)
                        for _ in range(rng.randint(2, 7)))
            rows.append((i, (w + " ") * rng.randint(1, 9)))
        docs = spark.createDataFrame(rows, "id long, text string")
        local = [tuple(r) for r in
                 bpe_train_merges(docs, "text", n_merges=10).collect()]
        dist = [tuple(r) for r in
                bpe_train_merges(docs, "text", n_merges=10,
                                 local_vocab_ceiling=0).collect()]
        assert local == dist, f"seed {seed} diverged"
