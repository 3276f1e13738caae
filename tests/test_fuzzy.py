"""Fuzzy-scorer goldens (reference tests.py:545-617, FIXTURES.md §1).

These pin the InDel-ratio semantics — Spark's levenshtein() would NOT pass.
"""

from __future__ import annotations

import pytest

from vector_db_at_home_spark.functions.fuzzy import indel_ratio


@pytest.mark.parametrize(
    "query,doc,expected_distance",
    [
        # tests.py:561: fuzz.ratio('{"1": "1"}', '{"k1": "v1"}') = 100*(1-2/22)
        ('{"1": "1"}', '{"k1": "v1"}', 100 * 2 / 22),
        # tests.py:565-ish: non-matching docs at 27.2727...
        ('{"1": "1"}', '{"k0": "v0"}', 100 * 6 / 22),
        # tests.py:595: 'v4' vs '{"k4": "v4"}' = 100*(1-10/14) → dist 71.428...
        ("v4", '{"k4": "v4"}', 100 * 10 / 14),
        # tests.py:587-ish
        ('{"k1": ""}', '{"k1": "v1"}', 100 * 2 / 22),
    ],
)
def test_indel_goldens(query, doc, expected_distance):
    assert 100.0 - indel_ratio(query, doc) == pytest.approx(expected_distance, abs=1e-9)


def test_empty_strings():
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("a", "") == 0.0


def test_identity():
    assert indel_ratio("hello world", "hello world") == 100.0


def test_prefilter_matches_unfiltered(spark):
    """The length-band prefilter is exact: identical top-k (values AND
    tie-resolution) to scoring every pair, on a corpus with heavy length
    variation and score ties."""
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc

    docs = [(i, ("word%d " % (i % 7)) * (1 + i % 40)) for i in range(120)]
    docs += [(200, ""), (201, None), (202, "word1 word2 word3")]
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["word1 word2 word3", "word4 " * 10, ""]
    on = fuzzy_search_by_doc(df, qs, k=7, prefilter=True).collect()
    off = fuzzy_search_by_doc(df, qs, k=7, prefilter=False).collect()
    assert [(r.query_id, r.id, r.distance) for r in on] == \
        [(r.query_id, r.id, r.distance) for r in off]


def test_prefilter_scores_candidate_subset(spark):
    """On a length-varied corpus the banded candidate set is a strict
    subset of the N·m cross product — the scorer UDF work actually drops."""
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_candidates

    docs = [(i, "x" * (5 + 13 * i)) for i in range(80)]  # lengths 5..1032
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["x" * 10, "x" * 500]
    n_cand = fuzzy_candidates(df, qs, k=5).count()
    assert n_cand < 80 * 2 * 0.5  # less than half the cross product
    assert n_cand >= 2 * 5        # at least k per query survives

def test_multiset_bound_matches_unfiltered(spark):
    """bound="multiset" stays exact: same top-k (values and ties) as
    scoring every pair, on a corpus with same-length docs over different
    alphabets (where the length bound alone is blind)."""
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc

    docs = [(i, ("abc%d " % (i % 5)) * (1 + i % 20)) for i in range(60)]
    docs += [(100 + i, ("zqw%d " % (i % 5)) * (1 + i % 20)) for i in range(60)]
    docs += [(300, ""), (301, None)]
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["abc1 abc2 abc3", "zqw0 " * 8, ""]
    on = fuzzy_search_by_doc(df, qs, k=6, prefilter=True,
                             bound="multiset").collect()
    off = fuzzy_search_by_doc(df, qs, k=6, prefilter=False).collect()
    assert [(r.query_id, r.id, r.distance) for r in on] == \
        [(r.query_id, r.id, r.distance) for r in off]


def test_multiset_band_is_tighter_than_length_band(spark):
    """Same-length docs, disjoint alphabets: the character-multiset bound
    excludes the wrong-alphabet half that the length bound cannot."""
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_candidates

    # 40 docs of identical length: half 'a'-alphabet, half 'z'-alphabet
    docs = [(i, "a" * 50) for i in range(20)]
    docs += [(100 + i, "z" * 50) for i in range(20)]
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["a" * 50]
    n_len = fuzzy_candidates(df, qs, k=3, bound="length").count()
    n_multi = fuzzy_candidates(df, qs, k=3, bound="multiset").count()
    assert n_len == 40        # length bound can't separate anything
    assert n_multi == 20      # multiset bound drops the 'z' half
    # and the surviving band still contains the true top-k ids
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc

    exact = fuzzy_search_by_doc(df, qs, k=3, prefilter=False).collect()
    cand_ids = {r.id for r in
                fuzzy_candidates(df, qs, k=3, bound="multiset").collect()}
    assert {r.id for r in exact} <= cand_ids


def test_bound_arg_validated(spark):
    from vector_db_at_home_spark.operators.fuzzysearch import fuzzy_search_by_doc
    import pytest as _pytest

    df = spark.createDataFrame([(1, "abc")], "id long, doc string")
    with _pytest.raises(ValueError, match="bound"):
        fuzzy_search_by_doc(df, ["ab"], k=1, bound="nope").collect()


def test_large_batch_uses_broadcast_band(spark, monkeypatch):
    """Above _MAX_INLINE_LITERALS provisional rows the band switches from
    literal OR-chain predicates to broadcast joins: results stay identical
    to the literal path AND the analyzed plan no longer grows with the
    query-batch size (VERDICT r4 #1 — thousand-query screening batches)."""
    import vector_db_at_home_spark.operators.fuzzysearch as fz

    docs = [(i, ("tok%d " % (i % 9)) * (1 + i % 15)) for i in range(50)]
    docs += [(100, ""), (101, None)]
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["tok%d tok%d" % (i % 9, (i + 1) % 9) for i in range(40)]
    k = 4

    # force the join path (40*4 = 160 rows > 8) vs the literal path
    monkeypatch.setattr(fz, "_MAX_INLINE_LITERALS", 8)
    join_df = fz.fuzzy_search_by_doc(df, qs, k=k)
    join_res = [(r.query_id, r.id, r.distance) for r in join_df.collect()]
    monkeypatch.setattr(fz, "_MAX_INLINE_LITERALS", 10**9)
    lit_df = fz.fuzzy_search_by_doc(df, qs, k=k)
    lit_res = [(r.query_id, r.id, r.distance) for r in lit_df.collect()]
    assert join_res == lit_res
    assert len({r[0] for r in join_res}) == len(qs)

    # plan-size bound: the join-path condition tree carries no OR-chain of
    # per-query literals — its analyzed plan is ~flat in m, the literal
    # path's grows linearly
    join_plan = join_df._jdf.queryExecution().analyzed().toString()
    lit_plan = lit_df._jdf.queryExecution().analyzed().toString()
    assert join_plan.count("query_id#") < lit_plan.count("query_id#")


def test_large_batch_candidates_match(spark, monkeypatch):
    """fuzzy_candidates takes the same broadcast switch and returns the
    same (superset) band either way."""
    import vector_db_at_home_spark.operators.fuzzysearch as fz

    docs = [(i, "y" * (3 + 7 * (i % 30))) for i in range(60)]
    df = spark.createDataFrame(docs, "id long, doc string")
    qs = ["y" * (5 + j) for j in range(12)]
    monkeypatch.setattr(fz, "_MAX_INLINE_LITERALS", 4)
    via_join = {(r.query_id, r.id)
                for r in fz.fuzzy_candidates(df, qs, k=3).collect()}
    monkeypatch.setattr(fz, "_MAX_INLINE_LITERALS", 10**9)
    via_lit = {(r.query_id, r.id)
               for r in fz.fuzzy_candidates(df, qs, k=3).collect()}
    assert via_join == via_lit


def test_provisional_ceiling_guard(spark, monkeypatch):
    """Query batches whose k*m provisional set exceeds the driver-side
    ceiling fail loudly with guidance (split the batch / prefilter=False);
    prefilter=False stays available at any batch size."""
    import vector_db_at_home_spark.operators.fuzzysearch as fz

    df = spark.createDataFrame(
        [(i, "w%d" % i) for i in range(6)], "id long, doc string")
    monkeypatch.setattr(fz, "_MAX_PROVISIONAL_ROWS", 5)
    with pytest.raises(ValueError, match="driver-side ceiling"):
        fz.fuzzy_search_by_doc(df, ["a", "b", "c"], k=2)
    out = fz.fuzzy_search_by_doc(df, ["a", "b", "c"], k=2,
                                 prefilter=False).collect()
    assert len(out) == 6


def test_antidiagonal_duckdb_oracle_matches_bitparallel_lcs():
    """r8: the full-corpus search_by_doc oracle's anti-diagonal
    recursive-CTE LCS (registry._search_by_doc_oracle_sql) must agree
    with the engine's bit-parallel kernel on adversarial strings —
    repeats, overlaps, empty-ish, unicode, and length extremes."""
    import duckdb

    from vector_db_at_home_spark.functions.fuzzy import _lcs_length
    from vector_db_at_home_spark.registry import _search_by_doc_oracle_sql

    docs = [
        (0, "aaaa"), (1, "ababab"), (2, "the fast key order sort table"),
        (3, "x"), (4, "zz yy zz yy zz"), (5, "sortspark window"),
        (6, "completely unrelated words here"),
        (7, "spark window merge sort"),          # exact probe match
        (8, "a" * 200), (9, ("spark " * 40).strip()),
    ]
    queries = ["spark window merge sort", "aab"]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    sql = _search_by_doc_oracle_sql(queries, k=len(docs))
    got = {(q, d): dist for q, d, dist in con.sql(sql).fetchall()}
    assert len(got) == len(queries) * len(docs)
    for qid, q in enumerate(queries):
        for did, text in docs:
            lcs = _lcs_length(q, text)
            total = len(q) + len(text)
            expect = round(
                100.0 - 100.0 * (1.0 - (total - 2 * lcs) / total), 6)
            assert abs(got[(qid, did)] - expect) < 1e-9, (qid, did)
