"""Skew-handling utilities for hot keys.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled``, on by default in ``session.py``);
these helpers cover the two shapes AQE doesn't:

- ``salted_aggregate`` — two-phase aggregation for hot GROUP BY keys: a
  random-salt pre-aggregation fans a hot key across ``n_salts`` reducers,
  then a final merge re-aggregates per true key.  Works for any algebraic
  aggregate (sum/count/min/max); the test proves result-equality with the
  direct aggregation.
- ``salted_broadcast_left`` — replicate-the-small-side join for a skewed
  join key when the small side is too big to broadcast whole but fine ×
  ``n_salts``.

Salts use a deterministic hash of a uniqueness column rather than rand() so
results are reproducible (and testable) — at scale swap in ``F.rand`` if
reproducibility doesn't matter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(df: DataFrame, group_cols: Sequence[str],
                     agg_exprs: dict[str, tuple[str, str]],
                     salt_col: str, n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``agg_exprs`` maps output name → (function, input column) with function
    in {sum, count, min, max}.  ``salt_col`` is any column whose hash spreads
    rows (e.g. the row's unique id).

    Phase 1 groups by (key, salt) — map-side combine already shrinks hot
    keys; the shuffle spreads each hot key over ``n_salts`` reducers.
    Phase 2 merges the ≤ ``n_salts`` partials per key (sum→sum, count→sum,
    min→min, max→max).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_aggs = []
    for out, (fn, col) in agg_exprs.items():
        if fn not in merge_fn:
            raise ValueError(f"unsupported aggregate {fn!r}")
        base = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[fn]
        phase1_aggs.append(base(F.col(col)).alias(out))
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts))
    )
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1_aggs)
    final_aggs = [
        merge_fn[fn](F.col(out)).alias(out) for out, (fn, _) in agg_exprs.items()
    ]
    return partial.groupBy(*group_cols).agg(*final_aggs)


def salted_broadcast_left(big: DataFrame, small: DataFrame,
                          key: str, row_salt_col: str,
                          n_salts: int = 8) -> DataFrame:
    """Join a skewed big side to a small side by replicating the small side
    ``n_salts`` times.  Each big row picks a salt from a PER-ROW column
    (``row_salt_col``, e.g. its unique id) — salting by the join key itself
    would send every row of a hot key to the same reducer and change
    nothing.  Each small row matches all salts, so the output equals a
    plain inner join."""
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(n_salts)])
    ).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(row_salt_col)), F.lit(n_salts)).cast("int")
    )
    return big_salted.join(F.broadcast(small_rep), [key, "__salt"]).drop("__salt")
