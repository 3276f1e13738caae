"""Sketch accuracy and bucketed shuffle-free join tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.sketches import (
    approx_event_quantiles,
    frequent_items,
    mergeable_daily_sketches,
    user_cardinality_sketch,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def test_hll_within_error(events):
    rows = user_cardinality_sketch(events).collect()
    assert rows
    for r in rows:
        rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
        assert rel_err < 0.05, (r.event_type, r.approx_users, r.exact_users)


def test_hll_sketches_merge(events):
    total = mergeable_daily_sketches(events).first().approx_total_users
    exact = events.select("user_id").distinct().count()
    assert abs(total - exact) / exact < 0.05


def test_approx_quantiles_close_to_exact(events):
    for r in approx_event_quantiles(events).collect():
        assert r.p50_approx == pytest.approx(r.p50_exact, rel=0.02)


def test_frequent_items_exact(events):
    top = frequent_items(events, "event_type", n=3).collect()
    exact = sorted(
        ((r.event_type, r.cnt) for r in
         events.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [(r.item, r.cnt) for r in top] == exact


def test_bucketed_join_no_shuffle(spark, tmp_path):
    from vector_db_at_home_spark.plans.explain import shuffle_exchange_count
    from vector_db_at_home_spark.sources.bucketing import (
        bucketed_join,
        write_bucketed,
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
            .withColumnRenamed("l_orderkey", "o_orderkey")
        write_bucketed(orders, "b_orders", "o_orderkey", 4)
        write_bucketed(lineitem.select("o_orderkey", "l_quantity"),
                       "b_lineitem", "o_orderkey", 4)
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        # co-located buckets: SortMergeJoin with zero Exchange operators
        assert shuffle_exchange_count(joined) == 0
        # and the join is still correct
        plain = orders.join(lineitem.select("o_orderkey", "l_quantity"),
                            "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
