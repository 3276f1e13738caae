"""End-to-end cleaning pipeline invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.dedup import ngram_jaccard_pairs
from vector_db_at_home_spark.operators.pipeline import (
    clean_corpus,
    clean_corpus_summary,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def cleaned(spark):
    return clean_corpus(spark, SF).collect()


def test_pipeline_attrition_is_real(spark, cleaned):
    n_in = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert 0 < len(cleaned) < n_in  # something survives, something drops


def test_near_dup_pairs_keep_exactly_lower_id(spark, cleaned):
    kept = {r.doc_id for r in cleaned}
    pairs = ngram_jaccard_pairs(
        spark.read.parquet(f"{SF}/documents.parquet"), "text", "doc_id",
        threshold=0.5,
    ).collect()
    for p in pairs:
        assert p.id_b not in kept  # higher id of every pair dropped


def test_language_allowlist_enforced(cleaned):
    assert {r.lang for r in cleaned} <= {"en", "de", "es", "fr"}


def test_summary_consistent_with_docs(spark, cleaned):
    rows = clean_corpus_summary(spark, SF).collect()
    by_lang = {r.lang: r for r in rows}
    assert by_lang["ALL"].n_docs == len(cleaned)
    assert by_lang["ALL"].total_tokens == sum(r.n_tokens for r in cleaned)
    assert sum(r.n_docs for r in rows if r.lang != "ALL") == len(cleaned)


def test_clean_corpus_with_decontamination(spark):
    """The optional decontamination stage removes docs overlapping a
    benchmark table; with no bench the cascade is unchanged."""
    from vector_db_at_home_spark.operators.pipeline import clean_corpus
    from vector_db_at_home_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    base = clean_corpus(spark, sf)
    base_ids = {r.doc_id for r in base.collect()}
    # benchmark = the raw text of one surviving doc → that doc (and any doc
    # fully containing it) must drop; everything else survives
    victim = sorted(base_ids)[0]
    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") == victim).select("doc_id", "text")
    cleaned = clean_corpus(spark, sf, decontam_bench=bench, decontam_n=5)
    got = {r.doc_id for r in cleaned.collect()}
    assert victim not in got
    assert got < base_ids
    assert len(base_ids) - len(got) <= 3  # only genuine overlaps drop


def test_clean_corpus_v2_stage_counts_monotone(spark):
    """r8 capstone (+r9 auto-cells row): 7 stages with monotonically
    non-increasing survivor counts, semantic stage drops nothing on the
    natural corpus (max embedding cosine 0.60 << 0.8 — the
    semantic_dedup_map invariant), plus the 7_semantic_cells row
    carrying the auto-derived SemDeDup cell count (clamped to the floor
    of 8 at this scale)."""
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_v2_stage_counts,
    )

    rows = clean_corpus_v2_stage_counts(
        spark, "/root/testdata/sf0.001").collect()
    stages = [r.stage for r in rows]
    counts = [r.n_docs for r in rows]
    assert stages == ["0_input", "1_exact", "2_neardup", "3_substring",
                      "4_quality", "5_lang", "6_semantic",
                      "7_semantic_cells"]
    assert all(a >= b for a, b in zip(counts[:7], counts[1:7]))
    assert counts[6] > 0
    assert counts[6] == counts[5]  # semantic no-op on natural corpus
    assert counts[7] == 8          # clamp floor at sf0.001


def test_cosine_admit_blocked_hand_case(spark):
    """r9 kernel: exact two-relation cosine admit — threshold hits,
    zero-norm convention (scores 0 vs everything), distinct output,
    and block-count invariance (the grid decomposition cannot change
    the answer)."""
    from vector_db_at_home_spark.operators.dedup import (
        cosine_admit_blocked,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (10, [2.0, 0.0]),    # cos 1.0 with corpus 1 → drop
            (11, [1.0, 1.0]),    # cos 0.7071 with both → drop at 0.7
            (12, [-1.0, 0.0]),   # max cos 0.0 → keep
            (13, [0.0, 0.0]),    # zero norm → scores 0 → keep
        ],
        "vec_id long, embedding array<double>",
    )
    for nb in (1, 3):
        got = {r.id for r in cosine_admit_blocked(
            batch, corpus, "embedding", "vec_id", 0.7, n_blocks=nb
        ).collect()}
        assert got == {10, 11}, (nb, got)
    # raise the threshold above 0.71: only the exact duplicate drops
    got = {r.id for r in cosine_admit_blocked(
        batch, corpus, "embedding", "vec_id", 0.99).collect()}
    assert got == {10}


def test_clean_corpus_incremental_stage_counts(spark):
    """r9 ingest capstone: 7 monotonically non-increasing batch
    stage counts; the semantic admit stage drops a real vs-corpus
    near-dup count (>0 at every scale by the τ=0.4 measurement); the
    exact stage respects both the vs-corpus digest check and the
    within-batch min-id rule."""
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_incremental_stage_counts,
    )

    rows = clean_corpus_incremental_stage_counts(
        spark, "/root/testdata/sf0.001").collect()
    stages = [r.stage for r in rows]
    counts = [r.n_docs for r in rows]
    assert stages == ["0_batch", "1_exact", "2_neardup", "3_substring",
                      "4_quality", "5_lang", "6_semantic"]
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] == 100          # doc_id % 5 == 0 slice at sf0.001
    assert counts[6] > 0             # survivors remain
    # real vs-corpus semantic drops at τ=0.4 (17 of the 68 stage-5
    # survivors at sf0.001 — the whole-batch measurement is 23; the
    # difference is upstream-dropped docs)
    assert counts[5] - counts[6] == 17


def test_clean_corpus_admit_batch_loop(spark, tmp_path):
    """r9: the full production ingest loop — screen a shard against
    the persisted cascade state, append survivors, and the NEXT shard
    is screened against corpus ∪ survivors: an exact dup, a near-dup,
    and an embedding near-dup of a batch-1 SURVIVOR are all rejected
    in batch 2 (proof the write-back half works for every family)."""
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )

    base = "w%d " * 20
    long_a = (" ".join(f"a{i}" for i in range(20)))
    long_b = (" ".join(f"b{i}" for i in range(20)))
    long_c = (" ".join(f"c{i}" for i in range(20)))
    corpus = spark.createDataFrame(
        [(1, long_a, "en"), (2, "corpus second doc entirely", "en")],
        "doc_id long, text string, lang string",
    )
    cemb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    root = str(tmp_path / "states")
    clean_corpus_states_build(spark, corpus, cemb, root)

    batch1 = spark.createDataFrame(
        [
            (10, long_a, "en"),            # exact dup of corpus → 1_exact
            (11, long_a + " extra", "en"),  # near-dup of corpus → 2_neardup
            (12, long_b, "en"),             # novel survivor
            (13, "x " * 9 + "x", "en"),     # distinct ratio 0.1 → 4_quality
            (14, long_c, "xx"),             # lang → 5_lang
            (15, "semantic twin doc here", "en"),  # emb near corpus → 6
        ],
        "doc_id long, text string, lang string",
    )
    b1emb = spark.createDataFrame(
        [(12, [0.0, 1.0, 0.0]), (15, [0.99, 0.1, 0.0])],
        "vec_id long, embedding array<double>",
    )
    k1, counts1 = clean_corpus_admit_batch(spark, root, batch1, b1emb)
    survivors1 = {r.doc_id for r in k1.collect()}
    assert survivors1 == {12}
    d = dict(counts1)
    assert d["0_batch"] == 6 and d["1_exact"] == 5
    assert d["2_neardup"] == 4          # 11 dropped
    assert d["4_quality"] == 3          # 13 dropped (3_substring no-op)
    assert d["5_lang"] == 2             # 14 dropped
    assert d["6_semantic"] == 1         # 15 dropped (cos≈0.995 vs corpus)

    # batch 2 collides with the ADMITTED batch-1 survivor (doc 12)
    batch2 = spark.createDataFrame(
        [
            (20, long_b, "en"),             # exact dup of survivor 12
            (21, long_b + " tail", "en"),   # near-dup of survivor 12
            (22, "genuinely new content words", "en"),  # survivor
            (23, "vector twin of twelve", "en"),        # emb near 12
        ],
        "doc_id long, text string, lang string",
    )
    # 22 must clear τ=0.4 against ALL stored vectors ([1,0,0], [0,0,1],
    # and survivor 12's [0,1,0] — an orthonormal basis, so any vector
    # with non-negative coords has max cos ≥ 1/√3): negative coords
    # give cos = −0.577 everywhere
    b2emb = spark.createDataFrame(
        [(22, [-1.0, -1.0, -1.0]), (23, [0.05, 0.999, 0.0])],
        "vec_id long, embedding array<double>",
    )
    k2, counts2 = clean_corpus_admit_batch(spark, root, batch2, b2emb)
    survivors2 = {r.doc_id for r in k2.collect()}
    assert survivors2 == {22}
    d2 = dict(counts2)
    assert d2["0_batch"] == 4 and d2["1_exact"] == 3   # 20 vs survivor
    assert d2["2_neardup"] == 2                        # 21 vs survivor
    assert d2["6_semantic"] == 1                       # 23 vs survivor emb

    # replayed shard converges: every row is now its own stored copy
    k2r, counts2r = clean_corpus_admit_batch(spark, root, batch2, b2emb)
    assert {r.doc_id for r in k2r.collect()} == set()
    # 20 still dups survivor 12 AND the replayed 22 dups its own stored
    # copy — the self-rejection that makes at-least-once converge
    assert dict(counts2r)["1_exact"] == 2

    # marker-keyed replay (the at-least-once contract for callers that
    # persist the RETURNED ids): first run writes {root}/_admitted/<id>
    # as the commit point, the replay returns the RECORDED survivors
    # and counts without touching any state
    batch3 = spark.createDataFrame(
        [(30, "a third shard with fresh words", "en")],
        "doc_id long, text string, lang string",
    )
    k3a, c3a = clean_corpus_admit_batch(spark, root, batch3,
                                        batch_id="shard-3")
    assert {r.doc_id for r in k3a.collect()} == {30}
    n_dig = spark.read.parquet(f"{root}/digests").count()
    k3b, c3b = clean_corpus_admit_batch(spark, root, batch3,
                                        batch_id="shard-3")
    assert {r.doc_id for r in k3b.collect()} == {30}  # NOT self-rejected
    assert c3b == c3a
    assert spark.read.parquet(f"{root}/digests").count() == n_dig


def test_clean_corpus_admit_batch_ivf_screen(spark, tmp_path):
    """r9: the semantic screen's IVF tier inside the loop — with
    exhaustive probes the decisions equal the exact screen's, and the
    write-back syncs admitted vectors into the saved index so the next
    shard's near-dups are caught THROUGH the index."""
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )

    long_a = " ".join(f"a{i}" for i in range(20))
    long_b = " ".join(f"b{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, long_a, "en"), (2, "another corpus document here", "en")],
        "doc_id long, text string, lang string")
    cemb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    root = str(tmp_path / "states_ivf")
    clean_corpus_states_build(spark, corpus, cemb, root,
                              semantic_index_cells=2)

    batch1 = spark.createDataFrame(
        [(12, long_b, "en"), (15, "semantic twin doc here", "en")],
        "doc_id long, text string, lang string",
    )
    b1emb = spark.createDataFrame(
        [(12, [0.0, 1.0, 0.0]), (15, [0.99, 0.1, 0.0])],
        "vec_id long, embedding array<double>",
    )
    k1, c1 = clean_corpus_admit_batch(
        spark, root, batch1, b1emb,
        semantic_screen="ivf", n_probes=2)  # exhaustive at 2 cells
    assert {r.doc_id for r in k1.collect()} == {12}  # 15 near corpus 1
    # write-back synced 12's vector into the saved index
    assigned = spark.read.parquet(f"{root}/ivf/assigned")
    assert {r.id for r in assigned.collect()} == {1, 2, 12}

    # next shard: an embedding near-dup of ADMITTED 12, caught through
    # the index
    batch2 = spark.createDataFrame(
        [(23, "vector twin of twelve", "en"),
         (24, "actually novel content here", "en")],
        "doc_id long, text string, lang string",
    )
    b2emb = spark.createDataFrame(
        [(23, [0.05, 0.999, 0.0]), (24, [-1.0, -1.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    k2, c2 = clean_corpus_admit_batch(
        spark, root, batch2, b2emb,
        semantic_screen="ivf", n_probes=2)
    assert {r.doc_id for r in k2.collect()} == {24}
    assert dict(c2)["6_semantic"] == 1  # 23 dropped by the indexed screen


def test_admit_batch_crash_replay_per_family(spark, tmp_path):
    """r10 (VERDICT r9 task 6 + ADVICE r9): crash injection at every
    inter-append gap of the admit write-back.  After a crash that
    leaves some families appended and others not, a marker-keyed
    replay must (a) return the RECORDED survivors and counts without
    re-screening, (b) complete the missing family appends, and (c)
    leave every state table byte-equal to a run that never crashed —
    no duplicate state rows, no state rebuild."""
    import pytest

    import vector_db_at_home_spark.operators.dedup as dd
    import vector_db_at_home_spark.operators.pipeline as pl
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )

    long_a = " ".join(f"a{i}" for i in range(20))
    long_b = " ".join(f"b{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, long_a, "en"), (2, "corpus second doc entirely", "en")],
        "doc_id long, text string, lang string",
    )
    cemb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(10, long_a, "en"),          # exact dup → rejected
         (12, long_b, "en"),          # survivor
         (15, "semantic twin doc here", "en")],   # emb near corpus
        "doc_id long, text string, lang string",
    )
    bemb = spark.createDataFrame(
        [(12, [0.0, 1.0, 0.0]), (15, [0.99, 0.1, 0.0])],
        "vec_id long, embedding array<double>",
    )

    def fingerprint(root):
        out = {}
        for tbl in ("digests", "embeddings", "minhash/bands",
                    "minhash/shingles", "minhash/sizes",
                    "substring/spans"):
            try:
                df = spark.read.parquet(f"{root}/{tbl}")
            except Exception:
                continue
            out[tbl] = sorted(tuple(r) for r in df.collect())
        return out

    # control: the same admit with no crash
    control = str(tmp_path / "control")
    clean_corpus_states_build(spark, corpus, cemb, control)
    kc, cc = clean_corpus_admit_batch(spark, control, batch, bemb,
                                      batch_id="s1")
    assert {r.doc_id for r in kc.collect()} == {12}
    want = fingerprint(control)

    class Boom(RuntimeError):
        pass

    crash_points = [
        (dd, "minhash_corpus_state_delta"),
        (dd, "substring_state_delta"),
        (pl, "_digests_delta"),
        (pl, "_embeddings_delta"),
    ]
    from vector_db_at_home_spark.functions.fsutil import fs_exists

    for i, (mod, fname) in enumerate(crash_points):
        root = str(tmp_path / f"crash{i}")
        clean_corpus_states_build(spark, corpus, cemb, root)
        orig = getattr(mod, fname)

        def boom(*a, **kw):
            raise Boom(fname)

        setattr(mod, fname, boom)
        try:
            with pytest.raises(Boom):
                clean_corpus_admit_batch(spark, root, batch, bemb,
                                         batch_id="s1")
        finally:
            setattr(mod, fname, orig)
        # decision recorded, commit absent, earlier families applied
        marker = f"{root}/_admitted/s1"
        assert fs_exists(spark, f"{marker}/_DECIDED")
        assert not fs_exists(spark, f"{marker}/_COMMITTED")
        # replay completes the write-back and returns the recorded result
        kr, cr = clean_corpus_admit_batch(spark, root, batch, bemb,
                                          batch_id="s1")
        assert {r.doc_id for r in kr.collect()} == {12}
        assert cr == cc
        assert fs_exists(spark, f"{marker}/_COMMITTED")
        assert fingerprint(root) == want, fname
        # second replay is a pure read of the commit record
        kr2, cr2 = clean_corpus_admit_batch(spark, root, batch, bemb,
                                            batch_id="s1")
        assert {r.doc_id for r in kr2.collect()} == {12} and cr2 == cc

    # the ADVICE r9 wedge: a crash BETWEEN the two decision artifacts
    # (ids written, counts.json missing, _DECIDED absent) must NOT
    # enter the marker branch — the screens replay in full against the
    # untouched state and overwrite the partial marker
    root = str(tmp_path / "wedge")
    clean_corpus_states_build(spark, corpus, cemb, root)
    spark.createDataFrame([(999,)], "doc_id long").write.parquet(
        f"{root}/_admitted/s1/ids")
    kw_, cw = clean_corpus_admit_batch(spark, root, batch, bemb,
                                       batch_id="s1")
    assert {r.doc_id for r in kw_.collect()} == {12} and cw == cc
    assert fingerprint(root) == want


def test_admit_batch_drift_stats_and_auto_refit(spark, tmp_path):
    """r10: the admit loop surfaces the IVF drift measurement per batch
    and, with auto_refit_drift set, rebuilds the semantic tier in place
    when the admitted distribution shifts — the monitor made actionable
    INSIDE the production loop.  The tier indexes NORMALIZED vectors,
    so drift is DIRECTIONAL; the fixture places rows deterministically
    on the sphere: four corpus clusters spread ±0.5 rad along the e5
    tangent, the in-distribution shard rotated 0.30 rad along the
    ORTHOGONAL e6 tangent (inside the cluster's angular envelope —
    ratio well under the refit threshold — but ≥0.30 rad from every
    corpus row, so cos ≤ ~0.955 clears the τ=0.96 screen), and the drifted shard at e4, orthogonal
    to everything (dist ~1.4, ratio >3)."""
    import math

    import numpy as np

    from vector_db_at_home_spark.operators.ann import ivf_drift_status
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )

    rng = np.random.default_rng(5)
    eye = np.eye(8)

    def mk(rows_spec):
        rows, erows = [], []
        for i, v in rows_spec:
            rows.append((i, " ".join(f"w{i}x{t}" for t in range(12)), "en"))
            v = np.asarray(v, float) + rng.normal(0, 0.005, 8)  # tie-break
            erows.append((i, [float(x) for x in v]))
        return (
            spark.createDataFrame(rows,
                                  "doc_id long, text string, lang string"),
            spark.createDataFrame(erows,
                                  "vec_id long, embedding array<double>"),
        )

    def ring(center, tangent, ang):
        return math.cos(ang) * center + math.sin(ang) * tangent

    tau = 0.96
    corpus_spec = [
        (10 * k + j, ring(eye[k], eye[5], -0.5 + j / 9.0))
        for k in range(4) for j in range(10)
    ]
    corpus, cemb = mk(corpus_spec)
    root = str(tmp_path / "drift_loop")
    clean_corpus_states_build(spark, corpus, cemb, root,
                              semantic_index_cells=5)

    # in-distribution shard: drift ~1, no refit, survivors flow
    b1, e1 = mk([(100 + j, ring(eye[j % 4], eye[6], 0.30))
                 for j in range(10)])
    s1: dict = {}
    k1, _ = clean_corpus_admit_batch(
        spark, root, b1, e1, semantic_screen="ivf",
        semantic_min_cosine=tau, n_probes=5, stats=s1,
        auto_refit_drift=1.5)
    assert k1.count() == 10         # cos ≤ ~0.94 vs every corpus row
    assert "ivf_drift" in s1 and s1["ivf_drift"]["drift_ratio"] < 1.5
    assert "ivf_refit" not in s1

    # shifted shard: a TIGHT cluster in a novel direction — far from
    # every centroid on the sphere → ratio spikes → auto-refit
    b2, e2 = mk([(200 + j, eye[4]) for j in range(15)])
    s2: dict = {}
    k2, _ = clean_corpus_admit_batch(
        spark, root, b2, e2, semantic_screen="ivf",
        semantic_min_cosine=tau, n_probes=5, stats=s2,
        auto_refit_drift=1.5)
    assert k2.count() == 15         # orthogonal to the corpus: all admit
    assert s2["ivf_drift"]["drift_ratio"] > 1.5
    assert s2["ivf_drift"]["refit_recommended"]
    assert s2.get("ivf_refit") is True
    # the refit reset the baseline: status shows a fresh log…
    st = ivf_drift_status(spark, root + "/ivf")
    assert st["n_batches"] == 0
    # …and the next shard rotated off the NEW cluster is measured
    # against the refit baseline (monitor-only this time)
    b3, e3 = mk([(300 + j, ring(eye[4], eye[7], 0.35))
                 for j in range(10)])
    s3: dict = {}
    k3, _ = clean_corpus_admit_batch(
        spark, root, b3, e3, semantic_screen="ivf",
        semantic_min_cosine=tau, n_probes=5, stats=s3,
        auto_refit_drift=None)
    assert "ivf_drift" in s3 and "ivf_refit" not in s3


def test_admit_batch_crash_replay_ivf_family(spark, tmp_path):
    """r10 follow-up: the crash-injection coverage extended to the IVF
    family's gap (states built with the semantic tier) — a crash before
    the ivf sync leaves every other family applied; the replay
    completes ONLY the sync (idempotent anti-join), returns the
    recorded result, and the index ends identical to a never-crashed
    run."""
    import pytest

    import vector_db_at_home_spark.operators.ann as ann
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )
    from vector_db_at_home_spark.functions.fsutil import fs_exists

    long_b = " ".join(f"b{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, "first corpus doc body", "en"),
         (2, "second corpus doc body", "en")],
        "doc_id long, text string, lang string",
    )
    cemb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(12, long_b, "en")], "doc_id long, text string, lang string")
    bemb = spark.createDataFrame(
        [(12, [0.0, 1.0, 0.0])], "vec_id long, embedding array<double>")

    def run_root(name, crash_first):
        root = str(tmp_path / name)
        clean_corpus_states_build(spark, corpus, cemb, root,
                                  semantic_index_cells=2)
        if crash_first:
            orig = ann.ivf_append_saved

            def boom(*a, **kw):
                raise RuntimeError("ivf-crash")

            ann.ivf_append_saved = boom
            try:
                with pytest.raises(RuntimeError, match="ivf-crash"):
                    clean_corpus_admit_batch(
                        spark, root, batch, bemb, semantic_screen="ivf",
                        n_probes=2, batch_id="s1")
            finally:
                ann.ivf_append_saved = orig
            marker = f"{root}/_admitted/s1"
            # every earlier family applied, ivf + commit absent
            for fam in ("minhash", "substring", "digests", "embeddings"):
                assert fs_exists(spark, f"{marker}/_applied_{fam}"), fam
            assert not fs_exists(spark, f"{marker}/_applied_ivf")
            assert not fs_exists(spark, f"{marker}/_COMMITTED")
        k, c = clean_corpus_admit_batch(
            spark, root, batch, bemb, semantic_screen="ivf",
            n_probes=2, batch_id="s1")
        assert fs_exists(spark, f"{root}/_admitted/s1/_COMMITTED")
        rows = sorted(
            tuple(r) for r in spark.read.parquet(f"{root}/ivf/assigned")
            .select("id", "cell").collect())
        return {r.doc_id for r in k.collect()}, c, rows

    k_ok, c_ok, idx_ok = run_root("ctl", crash_first=False)
    k_cr, c_cr, idx_cr = run_root("crash", crash_first=True)
    assert k_cr == k_ok == {12}
    assert c_cr == c_ok
    assert idx_cr == idx_ok  # survivor synced exactly once, same cells


def test_admit_batch_crash_before_marker_touch_no_duplicates(spark,
                                                             tmp_path):
    """r11 (VERDICT r10 task 6): crash AFTER a family's delta fully
    landed (staged write + idempotent per-file moves) but BEFORE its
    ``_applied_<family>`` touch — the r10 residual double-append
    window.  The replay must leave every state table byte-equal to a
    run that never crashed WITHOUT any compaction: re-running the
    family finds its staged files already moved and appends nothing,
    where the r10 protocol re-appended byte-identical duplicates for
    the delta-aggregating readers to absorb."""
    import pytest

    import vector_db_at_home_spark.functions.fsutil as fsu
    from vector_db_at_home_spark.functions.fsutil import fs_exists
    from vector_db_at_home_spark.operators.pipeline import (
        clean_corpus_admit_batch,
        clean_corpus_states_build,
    )

    long_a = " ".join(f"a{i}" for i in range(20))
    long_b = " ".join(f"b{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, long_a, "en"), (2, "corpus second doc entirely", "en")],
        "doc_id long, text string, lang string",
    )
    cemb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [(10, long_a, "en"), (12, long_b, "en"),
         (15, "semantic twin doc here", "en")],
        "doc_id long, text string, lang string",
    )
    bemb = spark.createDataFrame(
        [(12, [0.0, 1.0, 0.0]), (15, [0.99, 0.1, 0.0])],
        "vec_id long, embedding array<double>",
    )

    def fingerprint(root):
        out = {}
        for tbl in ("digests", "embeddings", "minhash/bands",
                    "minhash/shingles", "minhash/sizes",
                    "substring/spans"):
            try:
                df = spark.read.parquet(f"{root}/{tbl}")
            except Exception:
                continue
            out[tbl] = sorted(tuple(r) for r in df.collect())
        return out

    control = str(tmp_path / "control")
    clean_corpus_states_build(spark, corpus, cemb, control)
    kc, cc = clean_corpus_admit_batch(spark, control, batch, bemb,
                                      batch_id="s1")
    assert {r.doc_id for r in kc.collect()} == {12}
    want = fingerprint(control)

    class Boom(RuntimeError):
        pass

    for i, fam in enumerate(("minhash", "substring", "digests",
                             "embeddings")):
        root = str(tmp_path / f"touchcrash{i}")
        clean_corpus_states_build(spark, corpus, cemb, root)
        orig = fsu.fs_touch

        def boom_touch(spark_, path, _fam=fam, _orig=orig):
            if path.endswith(f"_applied_{_fam}"):
                raise Boom(_fam)
            return _orig(spark_, path)

        fsu.fs_touch = boom_touch
        try:
            with pytest.raises(Boom):
                clean_corpus_admit_batch(spark, root, batch, bemb,
                                         batch_id="s1")
        finally:
            fsu.fs_touch = orig
        marker = f"{root}/_admitted/s1"
        # the window: delta landed, marker absent, commit absent
        assert not fs_exists(spark, f"{marker}/_applied_{fam}")
        assert not fs_exists(spark, f"{marker}/_COMMITTED")
        # replay: recorded result, tables byte-equal, NO compaction run
        kr, cr = clean_corpus_admit_batch(spark, root, batch, bemb,
                                          batch_id="s1")
        assert {r.doc_id for r in kr.collect()} == {12} and cr == cc
        assert fs_exists(spark, f"{marker}/_COMMITTED")
        assert fingerprint(root) == want, fam
        # the staging tree is gone after the completed replay
        assert not fs_exists(spark, f"{marker}/_staging_{fam}")
