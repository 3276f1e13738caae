"""Fuzzy top-k document search (reference ``search_by_doc``).

Reference (``vector_store.py:358-401``): for each query string, score every
stored doc's RAW JSON serialization with rapidfuzz ``fuzz.ratio`` (InDel
similarity), distance = 100 - similarity, keep top-k (score-descending;
silently truncates when k > N).

Spark shape: a two-phase exact plan so the O(len·len) scorer UDF runs on a
candidate subset, not the whole corpus:

1. **Provisional top-k by length bound.**  InDel distance
   ``100·(len_d + len_q − 2·LCS) / (len_d + len_q)`` is bounded below by
   ``100·|len_d − len_q| / (len_d + len_q)`` (``LCS ≤ min length``).  The k
   docs with the smallest bound per query are scored exactly; the k-th
   actual distance is a per-query threshold T_q.
2. **Banded exact pass.**  Only docs whose bound ≤ T_q can beat the
   provisional top-k (bound ≤ distance), so the scorer runs on that band
   alone — typically a small fraction of the corpus when doc lengths vary.
   Results are exactly the unfiltered top-k (the band is a proven superset;
   ties at T_q are kept by the inclusive filter and resolved by id as
   before).

``bound="multiset"`` tightens phase 2 with the character-multiset bound:
``LCS ≤ Σ_c min(count_d(c), count_q(c))`` (a common subsequence is in
particular a common multiset of characters), which dominates the length
bound and shreds length-similar-but-alphabet-different docs from the band.
Per-doc counts for the union of query characters are precomputed ONCE as an
int-array projection (one ``len − len(replace)`` scan per char per doc, no
UDF); the per-pair intersection is then ~|distinct(q)| integer ops.
Measured at sf0.1 (5k docs × 2 queries, pure-Python LCS scorer): the extra
JVM evaluation (~0.4 s) exceeds the scorer savings, so the DEFAULT stays
"length"; flip to "multiset" when the scorer dominates — long docs, many
length-similar candidates, or a large query batch.

Double-scoring note: the k·m provisional rows are scored again inside the
band (their bound ≤ T_q by construction).  The alternative — persist the
provisional scores, anti-join them out of the band, union them back —
was measured STRICTLY slower at sf0.1 (+0.5-0.8 s: a persist barrier, an
extra join, an extra union stage) and saves only k·m of the band's UDF
calls at any scale, so the simple re-scoring plan is kept deliberately.

Both phases are lazy subplans of one returned DataFrame — no job fires at
build time.  Phase-1 shuffles only ``(query_id, id, len)`` triples; the
full-width payload join happens after the final top-k, on k·m rows.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..functions.fuzzy import _rf_fuzz, indel_ratio
from .topk import top_k_per_group

# double-rounding guard when comparing the length bound against the scored
# threshold (both are the same rational computed via different IEEE op
# orders); InDel distances are quantized far coarser than this
_BOUND_EPS = 1e-9

# expression-size guard for the multiset bound: beyond this many
# (query × distinct-char) when-chain terms, fall back to the length bound
# (correctness unaffected; the band just widens)
_MAX_MULTISET_TERMS = 4096


def _distance_udf() -> Column:
    @F.pandas_udf(DoubleType())
    def score(q: pd.Series, docs: pd.Series) -> pd.Series:
        if _rf_fuzz is not None:
            return pd.Series(
                [100.0 - float(_rf_fuzz.ratio(a or "", b or ""))
                 for a, b in zip(q, docs)]
            )
        return pd.Series(
            [100.0 - indel_ratio(a or "", b or "") for a, b in zip(q, docs)]
        )

    return score


def _length_bound() -> Column:
    """Lower bound on InDel distance from lengths alone."""
    tot = F.col("__dlen") + F.col("__qlen")
    return F.when(tot == 0, F.lit(0.0)).otherwise(
        100.0 * F.abs(F.col("__dlen") - F.col("__qlen")) / tot
    )


def _charcount_col(queries: list[str]) -> Column:
    """Per-DOC counts of every character appearing in any query, as one
    int array — computed once per doc row, below the doc × query join."""
    all_chars = sorted(set("".join(queries)))
    return F.array(*[
        F.length("__doc")
        - F.length(F.replace(F.col("__doc"), F.lit(ch), F.lit("")))
        for ch in all_chars
    ])


def _multiset_bound(queries: list[str]) -> Column:
    """Character-multiset lower bound on InDel distance; expects the
    ``__cc`` per-doc count array from ``_charcount_col`` to be in scope.
    ``Σ_c min ≤ min(len_d, len_q)`` makes this ≥ the length bound
    pointwise, so the band it defines is a subset — still a superset of
    the true top-k because it underestimates true distance."""
    all_chars = sorted(set("".join(queries)))
    pos = {ch: j for j, ch in enumerate(all_chars)}
    inter: Column | None = None
    for i, q in enumerate(queries):
        terms: Column | None = None
        for ch, qc in sorted(Counter(q).items()):
            t = F.least(F.lit(qc), F.col("__cc")[pos[ch]])
            terms = t if terms is None else terms + t
        if terms is None:
            terms = F.lit(0)
        cond = F.col("query_id") == i
        inter = (
            F.when(cond, terms) if inter is None else inter.when(cond, terms)
        )
    tot = F.col("__dlen") + F.col("__qlen")
    return F.when(tot == 0, F.lit(0.0)).otherwise(
        100.0 * (tot - 2.0 * inter.cast("double")) / tot
    )


def _use_multiset(queries: list[str], bound: str) -> bool:
    if bound == "length":
        return False
    if bound != "multiset":
        raise ValueError(f"bound must be 'length' or 'multiset', got {bound!r}")
    n_terms = sum(len(set(q)) for q in queries)
    return 0 < n_terms <= _MAX_MULTISET_TERMS


def _query_df(store: DataFrame, queries: list[str]) -> DataFrame:
    spark = store.sparkSession
    return spark.createDataFrame(
        [(i, q, len(q)) for i, q in enumerate(queries)],
        "query_id int, __q string, __qlen int",
    )


def fuzzy_candidates(store: DataFrame, queries: list[str], k: int,
                     doc_col: str = "doc",
                     id_col: str = "id",
                     bound: str = "length") -> DataFrame:
    """The banded candidate set ``(query_id, id)`` phase 2 will score —
    exposed for candidate-volume and band-superset assertions;
    ``fuzzy_search_by_doc`` embeds the same subplan."""
    qdf = _query_df(store, queries)
    multiset = _use_multiset(queries, bound)
    lens = store.select(
        F.col(id_col).alias("id"),
        F.length(F.coalesce(F.col(doc_col), F.lit(""))).alias("__dlen"),
        F.coalesce(F.col(doc_col), F.lit("")).alias("__doc"),
    )
    if multiset:
        lens = lens.withColumn("__cc", _charcount_col(queries))
    banded = lens.join(F.broadcast(qdf)).withColumn("__lb", _length_bound())

    provisional = top_k_per_group(
        banded.select("query_id", "id", "__q", "__doc", "__lb"),
        ["query_id"],
        [F.col("__lb").asc(), F.col("id").asc()],
        k,
    )
    score = _distance_udf()
    thresh = (
        provisional.withColumn(
            "__dist", score(F.col("__q"), F.col("__doc"))
        )
        .groupBy("query_id")
        .agg(F.max("__dist").alias("__thresh"))
    )
    band_lb = _multiset_bound(queries) if multiset else F.col("__lb")
    return (
        banded.join(F.broadcast(thresh), "query_id")
        .filter(band_lb <= F.col("__thresh") + F.lit(_BOUND_EPS))
        .select("query_id", "id")
    )


def fuzzy_search_by_doc(store: DataFrame, queries: list[str], k: int,
                        doc_col: str = "doc", id_col: str = "id",
                        prefilter: bool = True,
                        bound: str = "length") -> DataFrame:
    """Top-k fuzzy matches per query; returns
    ``(query_id, id, vec, doc, distance)`` — all store columns plus
    query_id/distance, exactly the unfiltered result.

    ``prefilter=False`` disables the length band (scores every (query, doc)
    pair) — the small-N baseline the banded plan is tested against.
    ``bound`` picks the phase-2 band predicate (module docstring).

    ``k > N`` truncates silently (parity: tests.py:609-617); ``k <= 0``
    raises (vector_store.py:361-364).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    qdf = _query_df(store, queries)
    score = _distance_udf()
    multiset = prefilter and _use_multiset(queries, bound)

    narrow = store.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(doc_col), F.lit("")).alias("__doc"),
        F.length(F.coalesce(F.col(doc_col), F.lit(""))).alias("__dlen"),
    )
    if multiset:
        narrow = narrow.withColumn("__cc", _charcount_col(queries))
    banded = narrow.join(F.broadcast(qdf)).withColumn("__lb", _length_bound())

    if prefilter:
        # provisional selection ranks by the CHEAP length bound (any k
        # candidates are valid — they only set the threshold); the tight
        # multiset bound, when enabled, is evaluated exactly once, in the
        # band filter, where it pays by shrinking the scored set
        provisional = top_k_per_group(
            banded.select("query_id", "id", "__q", "__doc", "__lb"),
            ["query_id"],
            [F.col("__lb").asc(), F.col("id").asc()],
            k,
        )
        thresh = (
            provisional.withColumn(
                "__dist", score(F.col("__q"), F.col("__doc"))
            )
            .groupBy("query_id")
            .agg(F.max("__dist").alias("__thresh"))
        )
        band_lb = _multiset_bound(queries) if multiset else F.col("__lb")
        banded = banded.join(F.broadcast(thresh), "query_id").filter(
            band_lb <= F.col("__thresh") + F.lit(_BOUND_EPS)
        )

    scored = banded.select(
        "query_id", "id", score(F.col("__q"), F.col("__doc")).alias("distance")
    )
    topk = top_k_per_group(
        scored,
        ["query_id"],
        [F.col("distance").asc(), F.col("id").asc()],
        k,
    )
    # payload join after the top-k: k·m wide rows, not N·m; the id column
    # keeps its original name (callers select e.g. ``doc_id`` by name)
    return (
        topk.withColumnRenamed("id", id_col)
        .join(store, id_col)
        .select(
            "query_id",
            id_col,
            *[c for c in store.columns if c != id_col],
            "distance",
        )
        .orderBy("query_id", "distance", id_col)
    )
