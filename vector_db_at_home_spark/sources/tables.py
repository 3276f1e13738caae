"""Parquet table loaders for the driver's test data.

The reference's only source is a SQLite file scan
(``vector_store.py:93-102``); here every source is a Parquet scan, which gives
Catalyst column pruning, predicate pushdown, and partition-parallel reads for
free (SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schema import TESTDATA_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver parquet table, e.g. ``lineitem``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str,
                   names: tuple[str, ...] = TESTDATA_TABLES) -> None:
    """Register each table as a temp view so ``spark.sql`` can reference it."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
