"""Positional inverted index / phrase search: hand-checkable counts,
overlap semantics, multi-term joins, edge cases."""

from __future__ import annotations

import pytest


def test_phrase_search_hand_counts(spark):
    from vector_db_at_home_spark.operators.invindex import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the cat mat"),
            (2, "the cat the cat the cat"),      # 3 matches, overlapping ok
            (3, "cat the"),                       # reversed — no match
            (4, "THE CAT"),                       # case-folded match
            (5, "completely unrelated text"),
        ],
        "doc_id long, text string",
    )
    got = {r.id: r.n_matches
           for r in phrase_search(docs, "the cat", "text", "doc_id")
           .collect()}
    assert got == {1: 2, 2: 3, 4: 1}

    # 3-term phrase: two positional joins
    got3 = {r.id: r.n_matches
            for r in phrase_search(docs, "the cat sat", "text", "doc_id")
            .collect()}
    assert got3 == {1: 1}

    # overlapping self-phrase: 'a a a a' contains 'a a' three times
    ov = spark.createDataFrame([(9, "a a a a")], "doc_id long, text string")
    assert phrase_search(ov, "a a", "text", "doc_id").first().n_matches == 3

    # single term degenerates to postings count
    one = {r.id: r.n_matches
           for r in phrase_search(docs, "cat", "text", "doc_id").collect()}
    assert one == {1: 2, 2: 3, 3: 1, 4: 1}

    with pytest.raises(ValueError):
        phrase_search(docs, "   ", "text", "doc_id")
