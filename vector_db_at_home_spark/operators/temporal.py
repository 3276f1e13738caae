"""Temporal join operators Spark lacks natively: as-of join and range join.

The reference has no time-series features at all (SURVEY.md §1.1); these are
north-star operators for event/feature pipelines, built as compositions of
existing DataFrame ops (the preferred strategy for custom operators —
no UDFs, fully codegen'd):

- ``asof_join``     — for each left row, the latest right row with
  ``right_time <= left_time`` (per key).  Implemented with the union+window
  trick: tag both sides, union on (key, time), ``last(right-val, ignorenulls)
  over (partition by key order by time, tag)`` carries the most recent right
  row forward onto each left row.  ONE shuffle on the key — no inequality
  join, no cross product, no skew blowup beyond the key distribution.
  Oracle: DuckDB's native ``ASOF JOIN``.

- ``range_join_binned`` — inner join on ``left_time ∈ [right_start,
  right_end)`` with an equi-join on overlapping time bins before the exact
  filter.  Turns Spark's nested-loop inequality join into a hash join on
  ``(bin)`` with per-bin fanout bounded by interval length / bin width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_time: str, right_time: str,
              right_cols: list[str] | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the latest right row at-or-before its
    timestamp (per ``key``).  Left rows with no prior right row keep NULLs
    (LEFT OUTER asof semantics, matching DuckDB ``ASOF LEFT JOIN``).

    right_cols: columns of ``right`` to carry (default: all but key/time).
    """
    if right_cols is None:
        # carry everything incl. the matched right timestamp — callers
        # usually need to know WHICH right row matched
        right_cols = [c for c in right.columns if c != key]
    if not right_cols:
        return left  # nothing to attach — no-op
    lt = F.col(left_time)
    # The matched right row is carried as ONE struct with a single
    # last(ignorenulls) — carrying columns independently would let a NULL
    # field inside the matched row be back-filled from an OLDER right row,
    # mixing fields of different rows (diverges from ASOF JOIN semantics).
    # StructType is built from the actual schema objects, not a DDL string,
    # so arbitrary column names need no escaping.
    from pyspark.sql.types import StructType

    rfields = {f.name: f for f in right.schema.fields}
    struct_type = StructType([rfields[c] for c in right_cols])
    l_tagged = left.withColumn("__t", lt).withColumn("__tag", F.lit(1)) \
        .withColumn("__r", F.lit(None).cast(struct_type))
    r_tagged = right.select(
        F.col(key),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    )
    # align schemas: left carries its own columns; right side gets NULLs —
    # ONE select with every null-cast (a per-column withColumn loop nests
    # O(cols) projections into the plan on wide tables)
    l_cols = [c for c in left.columns]
    lfields = {f.name: f for f in left.schema.fields}
    r_full = r_tagged.select(
        "*",
        *[
            F.lit(None).cast(lfields[c].dataType).alias(c)
            for c in l_cols
            if c != key
        ],
    )
    cols = [key, "__t", "__tag", *[c for c in l_cols if c != key], "__r"]
    unioned = l_tagged.select(*cols).unionByName(r_full.select(*cols))
    # right rows (tag 0) sort before left rows (tag 1) at equal timestamps →
    # a right row AT the left timestamp is visible (<= semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__t").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__r", F.last(F.col("__r"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__tag") == 1).drop("__tag", "__t")
    return out.select(
        *[c for c in out.columns if c != "__r"],
        *[F.col("__r")[c].alias(f"{c}{suffix}") for c in right_cols],
    )


def range_join_binned(left: DataFrame, right: DataFrame,
                      left_time: str, right_start: str, right_end: str,
                      bin_seconds: int = 86400) -> DataFrame:
    """Inner join on ``right_start <= left_time < right_end`` via time-bin
    equi-join + exact filter.

    Each right interval explodes into the bins it overlaps (fanout =
    ceil(interval / bin) + 1); each left row maps to exactly one bin; the
    join is then a plain hash join on bin — shuffle volume O(rows × fanout)
    instead of a nested-loop cross product.  Pick ``bin_seconds`` near the
    median interval length.
    """
    lbin = (F.unix_timestamp(F.col(left_time)) / bin_seconds).cast("long")
    sbin = (F.unix_timestamp(F.col(right_start)) / bin_seconds).cast("long")
    ebin = (F.unix_timestamp(F.col(right_end)) / bin_seconds).cast("long")
    l_binned = left.withColumn("__bin", lbin)
    r_binned = right.withColumn(
        "__bin", F.explode(F.sequence(sbin, ebin))
    )
    return (
        l_binned.join(r_binned, "__bin")
        .filter(
            (F.col(right_start) <= F.col(left_time))
            & (F.col(left_time) < F.col(right_end))
        )
        .drop("__bin")
    )
