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
