"""InDel-ratio fuzzy string similarity (the reference's fuzzy scorer).

The reference scores with ``rapidfuzz.fuzz.ratio`` (``vector_store.py:377-382``)
— the normalized InDel similarity: Levenshtein restricted to insert/delete,
``sim = 100 * (1 - (len1 + len2 - 2*LCS) / (len1 + len2))``.  Spark's built-in
``levenshtein()`` allows substitutions, so it is NOT equivalent (SURVEY.md
§2.3); golden values ``tests.py:561,595`` would break.

Implementation: rapidfuzz when importable (C++), else a bit-parallel LCS
(Hyyrö/Crochemore — one big-int per pattern, O(len1 * len2 / wordsize)), which
is exact and fast enough for document-length strings.  Exposed as an
Arrow-batched pandas UDF so executors score whole partitions per call.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

try:  # fast path — C++ scorer, bit-identical semantics to the reference
    from rapidfuzz import fuzz as _rf_fuzz
except ImportError:  # pragma: no cover - environment dependent
    _rf_fuzz = None


def _lcs_length(a: str, b: str) -> int:
    """Bit-parallel LCS length (Crochemore et al.); exact."""
    if not a or not b:
        return 0
    # position bitmask per character of `a`
    pm: dict[str, int] = {}
    bit = 1
    for ch in a:
        pm[ch] = pm.get(ch, 0) | bit
        bit <<= 1
    mask = (1 << len(a)) - 1
    v = mask
    for ch in b:
        p = pm.get(ch, 0)
        u = v & p
        v = (v + u) | (v - u)
        v &= mask
    # LCS = number of zero bits of V within the mask
    return len(a) - bin(v & mask).count("1")


def indel_ratio(s1: str, s2: str) -> float:
    """Normalized InDel similarity in [0, 100], == rapidfuzz.fuzz.ratio."""
    if _rf_fuzz is not None:
        return float(_rf_fuzz.ratio(s1, s2))
    total = len(s1) + len(s2)
    if total == 0:
        return 100.0
    dist = total - 2 * _lcs_length(s1, s2)
    return 100.0 * (1.0 - dist / total)


def indel_distance_udf(query: str) -> Column:
    """Column fn: InDel *distance* (= 100 - similarity, vector_store.py:387)
    of a fixed query string against a string column."""

    @pandas_udf(DoubleType())
    def _score(docs: pd.Series) -> pd.Series:
        if _rf_fuzz is not None:
            return docs.map(lambda d: 100.0 - float(_rf_fuzz.ratio(query, d if d is not None else "")))
        return docs.map(lambda d: 100.0 - indel_ratio(query, d if d is not None else ""))

    def fn(col: Column | str) -> Column:
        return _score(F.col(col) if isinstance(col, str) else col)

    return fn


@pandas_udf(DoubleType())
def indel_similarity_pair_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Pairwise InDel similarity of two string columns (0-100)."""
    if _rf_fuzz is not None:
        return pd.Series(
            [float(_rf_fuzz.ratio(x or "", y or "")) for x, y in zip(a, b)]
        )
    return pd.Series([indel_ratio(x or "", y or "") for x, y in zip(a, b)])
