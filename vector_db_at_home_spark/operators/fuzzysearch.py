"""Fuzzy top-k document search (reference ``search_by_doc``).

Reference (``vector_store.py:358-401``): for each query string, score every
stored doc's RAW JSON serialization with rapidfuzz ``fuzz.ratio`` (InDel
similarity), distance = 100 - similarity, keep top-k (score-descending;
silently truncates when k > N).

Spark shape: one scan of the store, queries shipped as a broadcast list into
an Arrow-batched pandas UDF (one score column per scan would re-scan per
query; instead the UDF emits (query_id, distance) pairs per row via explode),
then the same window top-k as kNN.  O(m·N) scorer work partition-parallel,
one shuffle of O(N·m) scored rows — at scale, prefer pre-filtering by length
band or token overlap before the exact scorer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..functions.fuzzy import _rf_fuzz, indel_ratio
from .topk import top_k_per_group


def fuzzy_search_by_doc(store: DataFrame, queries: list[str], k: int,
                        doc_col: str = "doc", id_col: str = "id") -> DataFrame:
    """Top-k fuzzy matches per query; returns
    ``(query_id, id, vec, doc, distance)``.

    ``k > N`` truncates silently (parity: tests.py:609-617); ``k <= 0``
    raises (vector_store.py:361-364).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    spark = store.sparkSession
    bc = spark.sparkContext.broadcast(list(queries))

    @F.pandas_udf(ArrayType(DoubleType()))
    def score_all(docs: pd.Series) -> pd.Series:
        qs = bc.value
        if _rf_fuzz is not None:
            return docs.map(
                lambda d: [100.0 - float(_rf_fuzz.ratio(q, d or "")) for q in qs]
            )
        return docs.map(lambda d: [100.0 - indel_ratio(q, d or "") for q in qs])

    scored = store.withColumn("__dists", score_all(F.col(doc_col))).select(
        "*", F.posexplode("__dists").alias("query_id", "distance")
    ).drop("__dists")
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.col("distance").asc(), F.col(id_col).asc()],
        k,
    ).orderBy("query_id", "distance", id_col)
