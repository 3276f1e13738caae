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
