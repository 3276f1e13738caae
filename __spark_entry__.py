"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship exact-kNN query at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB oracles (see ``vector_db_at_home_spark/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may import this file from any CWD — make the package resolvable
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vector_db_at_home_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: exact L2 kNN (k=5) of the
    first 4 embedding vectors against the whole embeddings table."""
    return registry.queries()["knn_l2"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
