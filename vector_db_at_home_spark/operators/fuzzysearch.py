"""Fuzzy top-k document search (reference ``search_by_doc``).

Reference (``vector_store.py:358-401``): for each query string, score every
stored doc's RAW JSON serialization with rapidfuzz ``fuzz.ratio`` (InDel
similarity), distance = 100 - similarity, keep top-k (score-descending;
silently truncates when k > N).

Spark shape: a two-phase exact plan so the O(len·len) scorer UDF runs on a
candidate subset, not the whole corpus:

1. **Provisional top-k by length bound.**  InDel distance is bounded below
   by the pure-length term ``100·|len_d − len_q| / (len_d + len_q)`` (LCS ≤
   min length).  The k docs with the smallest bound per query are scored
   exactly; the k-th actual distance is a per-query threshold T_q.
2. **Banded exact pass.**  Only docs whose length bound ≤ T_q can beat the
   provisional top-k (bound ≤ distance), so the scorer runs on that band
   alone — typically a small fraction of the corpus when doc lengths vary.
   Results are exactly the unfiltered top-k (the band is a proven superset;
   ties at T_q are kept by the inclusive filter and resolved by id as
   before).

Both phases are lazy subplans of one returned DataFrame — no job fires at
build time.  Phase-1 shuffles only ``(query_id, id, len)`` triples; the
full-width payload join happens after the final top-k, on k·m rows.
"""

from __future__ import annotations

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


def _query_df(store: DataFrame, queries: list[str]) -> DataFrame:
    spark = store.sparkSession
    return spark.createDataFrame(
        [(i, q, len(q)) for i, q in enumerate(queries)],
        "query_id int, __q string, __qlen int",
    )


def fuzzy_candidates(store: DataFrame, queries: list[str], k: int,
                     doc_col: str = "doc",
                     id_col: str = "id") -> DataFrame:
    """The banded candidate set ``(query_id, id)`` phase 2 will score —
    exposed for candidate-volume assertions; ``fuzzy_search_by_doc`` embeds
    the same subplan."""
    qdf = _query_df(store, queries)
    lens = store.select(
        F.col(id_col).alias("id"),
        F.length(F.coalesce(F.col(doc_col), F.lit(""))).alias("__dlen"),
        F.coalesce(F.col(doc_col), F.lit("")).alias("__doc"),
    )
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
    return (
        banded.join(F.broadcast(thresh), "query_id")
        .filter(F.col("__lb") <= F.col("__thresh") + F.lit(_BOUND_EPS))
        .select("query_id", "id")
    )


def fuzzy_search_by_doc(store: DataFrame, queries: list[str], k: int,
                        doc_col: str = "doc", id_col: str = "id",
                        prefilter: bool = True) -> DataFrame:
    """Top-k fuzzy matches per query; returns
    ``(query_id, id, vec, doc, distance)`` — all store columns plus
    query_id/distance, exactly the unfiltered result.

    ``prefilter=False`` disables the length band (scores every (query, doc)
    pair) — the small-N baseline the banded plan is tested against.

    ``k > N`` truncates silently (parity: tests.py:609-617); ``k <= 0``
    raises (vector_store.py:361-364).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    qdf = _query_df(store, queries)
    score = _distance_udf()

    narrow = store.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(doc_col), F.lit("")).alias("__doc"),
        F.length(F.coalesce(F.col(doc_col), F.lit(""))).alias("__dlen"),
    )
    banded = narrow.join(F.broadcast(qdf)).withColumn("__lb", _length_bound())

    if prefilter:
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
        banded = banded.join(F.broadcast(thresh), "query_id").filter(
            F.col("__lb") <= F.col("__thresh") + F.lit(_BOUND_EPS)
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
