"""Bucketed tables: shuffle-free co-located joins.

The classic 100 TB lever: two fact tables bucketed by the same key into the
same bucket count join WITHOUT a shuffle — each task reads matching buckets
from both sides.  Plain Parquet paths can't carry bucket metadata; bucketed
tables live in the session catalog (``saveAsTable``), so callers provide a
warehouse-backed table name.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 8, sort_col: str | None = None) -> None:
    """Persist as a bucketed (optionally sorted) managed table."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key.  With matching
    bucket specs Catalyst plans a SortMergeJoin with NO Exchange on either
    side — assert via ``plans.explain.shuffle_exchange_count == 0``."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
