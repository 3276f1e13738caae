"""Vector-distance column expressions.

The reference computes exact L2 distance with a NumPy broadcast subtract +
row-wise norm (``vector_store.py:291``).  Here the kernel is expressed with
Spark's built-in higher-order functions ``zip_with`` + ``aggregate`` so it
stays JVM-side inside whole-stage codegen — no Python in the hot path
(SURVEY.md §2.2).  Accumulation is in double; the reference's float32 results
differ by < 1e-6 relative (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sum_elements(col: Column) -> Column:
    """Sequential left-to-right fold — deterministic, matches a scalar loop."""
    return F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v)


def squared_l2_distance(a: Column | str, b: Column | str) -> Column:
    diff_sq = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return _sum_elements(diff_sq)


def l2_distance(a: Column | str, b: Column | str) -> Column:
    """Exact Euclidean distance between two float-array columns."""
    return F.sqrt(squared_l2_distance(a, b))


def dot_product(a: Column | str, b: Column | str) -> Column:
    return _sum_elements(F.zip_with(a, b, lambda x, y: x * y))


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(_sum_elements(F.zip_with(a, a, lambda x, y: x * y)))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_product(a, b) / denom)
