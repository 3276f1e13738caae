"""Per-group top-k.

The reference does top-k with a full ``np.argsort`` then slice
(``vector_store.py:292-298``) — O(N log N).  Spark-side, per-group top-k is a
``row_number`` window, which AQE executes with partial top-k pushed into the
shuffle (rank-limit pushdown in Spark 3.5+/4.x: ``WindowGroupLimit`` inserts a
per-map-task top-k before the exchange, so only ``k`` rows per group per
partition shuffle — the scalable form of the reference's sort-slice).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group_cols: Sequence[str],
                    order_cols: Sequence[Column], k: int,
                    rank_col: str | None = None) -> DataFrame:
    """Keep the top ``k`` rows per group under the given ordering.

    Ordering must be deterministic (pass an explicit tie-break, e.g.
    ``[F.col("distance").asc(), F.col("id").asc()]`` — SURVEY.md §7.4.4).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    if rank_col is None:
        return out.drop("__rn")
    return out.withColumnRenamed("__rn", rank_col)
