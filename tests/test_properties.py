"""Property-based tests (Hypothesis) for the pure-Python kernels.

These run without Spark, so they explore thousands of cases cheaply:
- InDel ratio: metric properties + exact agreement with a reference DP LCS
(The rolling-fingerprint and Jaccard formulas are validated against the
ACTUAL Spark expressions in test_textstats.py and test_dedup.py — a pure-
Python restatement here would be a tautology.)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_at_home_spark.functions.fuzzy import _lcs_length, indel_ratio

text = st.text(alphabet="abcdef {}:\"',", max_size=60)


def lcs_dp(a: str, b: str) -> int:
    prev = [0] * (len(b) + 1)
    for ca in a:
        curr = [0]
        for j, cb in enumerate(b):
            curr.append(prev[j] + 1 if ca == cb else max(prev[j + 1], curr[-1]))
        prev = curr
    return prev[-1]


@settings(max_examples=300, deadline=None)
@given(text, text)
def test_bitparallel_lcs_equals_dp(a, b):
    assert _lcs_length(a, b) == lcs_dp(a, b)


@settings(max_examples=300, deadline=None)
@given(text, text)
def test_indel_ratio_bounds_and_symmetry(a, b):
    r = indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert indel_ratio(b, a) == r  # symmetric


@settings(max_examples=100, deadline=None)
@given(text)
def test_indel_ratio_identity(a):
    assert indel_ratio(a, a) == 100.0


@settings(max_examples=200, deadline=None)
@given(text, text)
def test_indel_ratio_formula(a, b):
    # ratio = 100 * (1 - (len1+len2-2*LCS)/(len1+len2))
    total = len(a) + len(b)
    if total == 0:
        assert indel_ratio(a, b) == 100.0
    else:
        expected = 100.0 * (1.0 - (total - 2 * lcs_dp(a, b)) / total)
        assert abs(indel_ratio(a, b) - expected) < 1e-9
