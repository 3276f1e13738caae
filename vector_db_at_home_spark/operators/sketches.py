"""Approximate sketches for cardinality and frequency at scale.

At 100 TB exact ``count(DISTINCT x)`` is a full shuffle of the distinct
values; sketches bound the state:

- ``user_cardinality_sketch`` — per-group HLL (Spark 4's Datasketches-backed
  ``hll_sketch_agg``); sketches MERGE (``hll_union_agg``), so daily partial
  sketches roll up into monthly cardinality without re-scanning.
- ``approx_event_quantiles`` — ``approx_percentile`` (t-digest-style) vs
  the exact percentile for error measurement.
- ``frequent_items`` — exact top-n frequency via partial count + top-k
  (the streaming-sketch version would be SpaceSaving; the batch plan is
  already one map-combined shuffle).

Accuracy is asserted in tests against exact answers; no DuckDB oracle since
sketch internals are engine-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .topk import top_k_per_group


def user_cardinality_sketch(events: DataFrame,
                            lg_k: int = 12) -> DataFrame:
    """(event_type, approx_users, exact_users) — HLL vs exact per group."""
    return (
        events.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(lg_k))
            ).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .orderBy("event_type")
    )


def mergeable_daily_sketches(events: DataFrame, lg_k: int = 12) -> DataFrame:
    """Build per-day HLL sketches, then MERGE them to a total — the rollup
    pattern that makes sketches worth it: partial sketches persist per
    partition/day and combine without rescanning raw data."""
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch")
    )
    return daily.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_total_users")
    )


def approx_event_quantiles(events: DataFrame,
                           accuracy: int = 10000) -> DataFrame:
    return (
        events.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(accuracy)).alias(
                "p50_approx"
            ),
            F.expr("percentile(value, 0.5)").alias("p50_exact"),
        )
        .orderBy("event_type")
    )


def frequent_items(df: DataFrame, col: str, n: int = 10) -> DataFrame:
    """Exact top-n heavy hitters: map-combined counts then global top-n."""
    counts = df.groupBy(F.col(col).alias("item")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("item").asc()).limit(n)
