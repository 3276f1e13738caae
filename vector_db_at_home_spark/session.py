"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the configs below are chosen so the
same plans scale to a multi-executor cluster: AQE for runtime re-planning and
skew-join splitting, Arrow for any pandas-UDF exchange, and a shuffle
partition count sized for the test scale factors (override
``spark.sql.shuffle.partitions`` for real clusters).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "vector_db_at_home_spark",
              master: str | None = None,
              shuffle_partitions: int = 32,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults favor the 100 TB design brief: AQE enabled (coalesce small
    shuffle partitions, split skewed ones), broadcast threshold left at the
    Spark default so small dimension tables broadcast automatically, Arrow on
    for vectorized Python exchange.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    elif "SPARK_GRAFT_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_GRAFT_MASTER"])
    else:
        builder = builder.master(f"local[{DEFAULT_CPUS}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
