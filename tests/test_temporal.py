"""As-of join and binned range join tests (oracle: DuckDB native ASOF JOIN
at the registry level; here: hand-built fixtures + nested-loop equivalence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vector_db_at_home_spark.operators.temporal import asof_join, range_join_binned


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", "2024-01-01 10:00:05"),
            (2, "A", "2024-01-01 10:00:10"),
            (3, "B", "2024-01-01 10:00:03"),
            (4, "B", "2024-01-01 09:59:00"),  # before any quote
        ],
        "trade_id long, sym string, t string",
    ).withColumn("t", F.to_timestamp("t"))
    quotes = spark.createDataFrame(
        [
            ("A", "2024-01-01 10:00:00", 100.0),
            ("A", "2024-01-01 10:00:07", 101.0),
            ("A", "2024-01-01 10:00:10", 102.0),  # equal-ts: visible (<=)
            ("B", "2024-01-01 10:00:01", 50.0),
        ],
        "sym string, qt string, price double",
    ).withColumn("qt", F.to_timestamp("qt"))
    return trades, quotes


def test_asof_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = {
        r.trade_id: r.price_asof
        for r in asof_join(trades, quotes, key="sym", left_time="t",
                           right_time="qt").collect()
    }
    assert out[1] == 100.0   # latest quote at or before 10:00:05
    assert out[2] == 102.0   # equal timestamp counts (<=)
    assert out[3] == 50.0
    assert out[4] is None    # no quote before 09:59 → LEFT semantics


def test_asof_matches_duckdb_native(spark):
    import duckdb

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    upd = (
        ev.filter(F.col("event_id") % 7 == 0)
        .select("user_id", F.col("ts").alias("upd_ts"),
                F.col("value").alias("upd_value"))
    )
    res = asof_join(ev.select("event_id", "user_id", "ts"), upd,
                    key="user_id", left_time="ts", right_time="upd_ts")
    got = {r.event_id: r.upd_ts_asof for r in res.collect()}
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    )
    exp = con.sql("""
        WITH upd AS (SELECT user_id, ts AS upd_ts FROM events
                     WHERE event_id % 7 = 0)
        SELECT e.event_id, u.upd_ts
        FROM (SELECT event_id, user_id, ts FROM events) e
        ASOF LEFT JOIN upd u ON e.user_id = u.user_id AND e.ts >= u.upd_ts
    """).fetchall()
    assert len(exp) == len(got)
    for eid, uts in exp:
        assert got[eid] == uts


def test_range_join_equals_nested_loop(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    # windows derived from the same stream → guaranteed overlap
    windows = (
        ev.filter(F.col("event_id") % 50 == 0)
        .select(
            F.col("event_id").alias("win_id"),
            F.col("ts").alias("start"),
            (F.col("ts") + F.expr("INTERVAL 6 HOURS")).alias("end"),
        )
    )
    left = ev.select("event_id", "ts")
    binned = range_join_binned(left, windows, "ts", "start", "end",
                               bin_seconds=3600)
    plain = left.crossJoin(windows).filter(
        (F.col("start") <= F.col("ts")) & (F.col("ts") < F.col("end"))
    )
    b = sorted((r.event_id, r.win_id) for r in binned.collect())
    p = sorted((r.event_id, r.win_id) for r in plain.collect())
    assert b == p
    assert len(b) > 0  # non-trivial overlap actually exercised


def test_range_join_bin_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 23:59:59"),
         (3, "2024-01-02 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "win long, s string, e string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = sorted(
        r.id for r in range_join_binned(left, right, "ts", "s", "e").collect()
    )
    assert out == [1, 2]  # end bound exclusive, start inclusive


def test_asof_null_right_value_not_backfilled(spark):
    """Regression: a NULL field in the MATCHED right row must stay NULL —
    carrying columns independently would backfill it from an older row,
    mixing fields of different rows (code-review finding)."""
    trades = spark.createDataFrame(
        [(1, "A", "2024-01-01 10:00:09")], "trade_id long, sym string, t string"
    ).withColumn("t", F.to_timestamp("t"))
    quotes = spark.createDataFrame(
        [("A", "2024-01-01 10:00:01", 100.0),
         ("A", "2024-01-01 10:00:05", None)],
        "sym string, qt string, price double",
    ).withColumn("qt", F.to_timestamp("qt"))
    row = asof_join(trades, quotes, key="sym", left_time="t",
                    right_time="qt").first()
    # matched row is the 10:00:05 one; its NULL price must NOT become 100.0
    assert row.qt_asof.second == 5
    assert row.price_asof is None
