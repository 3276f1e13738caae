"""Data-layout helpers: Z-order clustered parquet writes.

A 100 TB table is pruned or scanned at the granularity of parquet
row-group/file min-max statistics.  Sorting by ONE column makes filters
on that column cheap and filters on every other column useless; Z-order
(Morton-curve) clustering interleaves the bit-planes of several columns'
rank buckets so that every clustered column's values are locally
concentrated — a selective filter on ANY of them skips most files (the
public technique behind Delta Lake's ``OPTIMIZE ... ZORDER BY``).

Everything here is pure column expressions: per-column bucket ids come
from driver-side ``approxQuantile`` boundaries (a sketch pass, no sort),
the Morton code from shift/mask arithmetic, and the clustering itself
from ``repartitionByRange`` on the code — one range shuffle, no global
sort of the payload.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per column in the Morton code (16 rank buckets per column)
_BITS = 4


def _bucket_expr(col: str, boundaries: list[float]) -> Column:
    """Rank bucket of ``col`` against precomputed quantile boundaries:
    ``Σ (col >= bᵢ)`` — a fold of comparisons, no UDF.  NULLs land in
    bucket 0 (comparisons are false), keeping them clustered together."""
    return reduce(
        lambda acc, b: acc + F.when(F.col(col) >= b, 1).otherwise(0),
        boundaries,
        F.lit(0),
    )


def zorder_code(df: DataFrame, cols: list[str],
                rel_err: float = 0.01) -> Column:
    """Morton (Z-order) code column over ``cols``: each column is rank-
    bucketed into 2^4 quantile buckets (``approxQuantile`` boundaries —
    one sketch pass per column, driver gets ≤ 15 doubles), then the
    bucket ids' bits are interleaved so nearby codes are nearby in EVERY
    clustered dimension."""
    if not cols:
        raise ValueError("zorder_code needs at least one column")
    n = len(cols)
    qs = [i / (1 << _BITS) for i in range(1, 1 << _BITS)]
    code = F.lit(0)
    for ci, c in enumerate(cols):
        bounds = df.approxQuantile(c, qs, rel_err)
        # dedupe (constant/low-cardinality columns repeat boundaries —
        # the bucket fold handles fewer than 15 fine)
        uniq: list[float] = []
        for b in bounds:
            if not uniq or b > uniq[-1]:
                uniq.append(b)
        bucket = _bucket_expr(c, uniq)
        for bit in range(_BITS):
            code = code.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, bit).bitwiseAND(F.lit(1)),
                    bit * n + ci,
                )
            )
    return code


def zorder_write(df: DataFrame, path: str, cols: list[str],
                 n_files: int = 16, rel_err: float = 0.01) -> None:
    """Write ``df`` as parquet clustered on the Z-order code of ``cols``:
    ``repartitionByRange`` on the code (one range shuffle; the range
    sampler keeps file sizes balanced) + a within-partition sort so
    row-group min-max stats are tight.  Filters on any clustered column
    then skip most files at scan time — asserted by
    ``test_zorder_write_prunes_on_every_clustered_column``."""
    code = zorder_code(df, cols, rel_err=rel_err)
    (
        df.withColumn("__zorder", code)
        .repartitionByRange(n_files, F.col("__zorder"))
        .sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8,
                   sort_col: str | None = None) -> None:
    """Persist ``df`` as a BUCKETED parquet table (Spark-native
    bucketing): rows hash-partition into ``n_buckets`` files per write
    task by ``bucket_col``, and the bucket spec lands in the session
    catalog so later scans expose ``outputPartitioning``.

    This is the co-location primitive for repeated big-big joins: two
    tables bucketed the same way on the join key join with ZERO
    exchanges — at 100 TB, pre-bucketing fact tables on the join key
    turns every downstream join/aggregate on that key from a full
    shuffle into a local merge.  (Z-order, above, is the SCAN-side
    layout lever; bucketing is the JOIN-side one.)

    Uses ``saveAsTable`` because bucket metadata lives in the catalog —
    the plain path-based writer cannot record it.  The default
    in-memory catalog works; no Hive required."""
    w = df.write.format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.mode("overwrite").saveAsTable(table)
