"""Relational bench queries over the TPC-H-ish test tables.

The reference has no multi-table features (SURVEY.md §1.1) — these queries
exist to (a) cover the standard operator taxonomy (§2.5: joins, aggregations,
windows, sorts, set ops, grouping sets, date/math functions) as first-class,
oracle-checked operators, and (b) populate BENCH with shuffle-heavy plans
whose physical strategy matters at 100 TB.

Cross-engine float determinism: double SUMs depend on partition order (a
``repartition(7)`` changes the 15th digit), so every oracle-checked aggregate
is computed as ``SUM(CAST(expr AS DECIMAL(25,6)))`` — exact, associative,
identical in Spark and DuckDB — then cast back to double and rounded.  The
per-row ``expr`` itself is IEEE-deterministic in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table

DEC = "decimal(25,6)"


def dsum(col: Column, digits: int = 4) -> Column:
    """Deterministic cross-engine sum: exact decimal accumulate → double."""
    return F.round(F.sum(col.cast(DEC)).cast("double"), digits)


def davg(col: Column, digits: int = 6) -> Column:
    """Deterministic cross-engine mean: exact decimal sum / count(*)."""
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(F.lit(1)), digits)


def _sql_dsum(expr: str, digits: int = 4) -> str:
    return f"round(CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE), {digits})"


def _sql_davg(expr: str, digits: int = 6) -> str:
    return (
        f"round(CAST(sum(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / count(*), {digits})"
    )


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy partial aggregation.

    One wide scan of lineitem with a date filter pushed to Parquet, partial
    (map-side) aggregation into a handful of groups → the shuffle carries
    only |groups| × partitions rows.  No join, no skew risk; the plan shape
    that dominates at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {_sql_dsum('l_quantity')} AS sum_qty,
       {_sql_dsum('l_extendedprice')} AS sum_base_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {_sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {_sql_davg('l_quantity')} AS avg_qty,
       {_sql_davg('l_extendedprice')} AS avg_price,
       {_sql_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective filters + two joins + agg + top-k.

    customer is a dim → broadcast into orders; orders⋈lineitem shuffles on
    the natural orderkey.  The final top-10 (ordered by the rounded revenue
    so both engines rank identical values) is TakeOrderedAndProject.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                 "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join.

    region/nation/supplier/customer are dims → all broadcast; the only big
    shuffle is orders⋈lineitem.  At 100 TB this plan touches the fact table
    once and ships no dim rows across the network beyond the broadcasts.
    """
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(sup),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
SELECT n_name, {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem, orders, customer, supplier, nation, region
WHERE l_orderkey = o_orderkey
  AND o_custkey = c_custkey
  AND l_suppkey = s_suppkey
  AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group: rank orders by totalprice within customer.

    WindowGroupLimit (rank-limit pushdown, Spark 3.5+/4.x) keeps only 3 rows
    per customer per map task before the shuffle — the scalable per-key
    top-k (same shape the kNN merge uses).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "rank",
        )
        .orderBy("o_custkey", "rank")
    )


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
)
WHERE rank <= 3
ORDER BY o_custkey, rank
"""


def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation over events (batch form of the
    Structured Streaming windowed agg in ``streaming/``)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_WINDOWED_AGG_SQL = f"""
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events,
       {_sql_dsum('value')} AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


def order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join shape (TPC-H Q4): EXISTS via left_semi — no row blowup."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = li.filter(F.col("l_shipdate") > F.lit("1999-06-01").cast("timestamp"))
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORDER_PRIORITY_COUNTS_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1999-06-01'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer-join + two-level aggregation (TPC-H Q13 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


CUSTOMER_DISTRIBUTION_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def nation_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: customer vs supplier nation keys, tagged — covers the
    §2.5 set-ops row (intersect/except/union)."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    c_n = cust.select(F.col("c_nationkey").alias("nationkey")).distinct()
    s_n = sup.select(F.col("s_nationkey").alias("nationkey")).distinct()
    both = c_n.intersect(s_n).withColumn("tag", F.lit("both"))
    cust_only = c_n.exceptAll(s_n).withColumn("tag", F.lit("customer_only"))
    sup_only = s_n.exceptAll(c_n).withColumn("tag", F.lit("supplier_only"))
    return both.unionByName(cust_only).unionByName(sup_only).orderBy(
        "tag", "nationkey"
    )


NATION_SETOPS_SQL = """
WITH c_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
     s_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
SELECT nationkey, 'both' AS tag FROM (SELECT nationkey FROM c_n INTERSECT SELECT nationkey FROM s_n)
UNION ALL
SELECT nationkey, 'customer_only' AS tag FROM (SELECT nationkey FROM c_n EXCEPT SELECT nationkey FROM s_n)
UNION ALL
SELECT nationkey, 'supplier_only' AS tag FROM (SELECT nationkey FROM s_n EXCEPT SELECT nationkey FROM c_n)
ORDER BY tag, nationkey
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: ROLLUP over (returnflag, linestatus) — §2.5 row.
    NULL group markers coalesced to 'ALL' for stable cross-engine output."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice")).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
        )
        .orderBy("returnflag", "linestatus")
    )


REVENUE_ROLLUP_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_sql_dsum('l_extendedprice')} AS revenue
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive range filters + single-row
    agg.  Everything pushes to the Parquet scan; the agg is one partial+final
    pair — the cheapest possible 100 TB plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


FORECAST_REVENUE_SQL = f"""
SELECT {_sql_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


def returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact filter + 2 joins + agg + top-k by measure."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


RETURNED_ITEMS_SQL = f"""
SELECT c_custkey, c_name, n_name,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-then-semi-join (HAVING subquery).  The
    qualifying-keys side is tiny after the HAVING filter -> broadcast
    semi-join back onto orders; no row blowup."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        orders.join(
            F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey",
                 F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
                 "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 4).alias("totalprice"),
            "sum_qty",
        )
    )


LARGE_ORDERS_SQL = f"""
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, round(o_totalprice, 4) AS totalprice,
       {_sql_dsum('l_quantity')} AS sum_qty
FROM orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    HAVING sum(l_quantity) > 150
)
  AND o_orderkey = l_orderkey
GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


def rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window breadth: per-customer running revenue + lag/lead over
    order dates (RANGE/ROWS frames, lag, dense ranking in one pass over one
    shuffle on custkey)."""
    orders = load_table(spark, sf_dir, "orders")
    w_order = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_running = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w_running)
                    .cast("double"), 4).alias("running_total"),
            F.coalesce(
                F.round(F.lag("o_totalprice", 1).over(w_order), 4), F.lit(-1.0)
            ).alias("prev_price"),
            F.dense_rank().over(w_order).cast("long").alias("order_seq"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


ROLLING_REVENUE_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(25,6)))
                  OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE), 4) AS running_total,
       coalesce(round(lag(o_totalprice, 1)
                      OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey),
                      4), -1.0) AS prev_price,
       CAST(dense_rank()
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
         AS BIGINT) AS order_seq
FROM orders
ORDER BY o_custkey, o_orderkey
"""


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) -
    decorrelated into an aggregate + broadcast join; the fact table is
    touched once, the per-part averages are a tiny broadcast side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    avg_qty = (
        li.groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.8).alias("qty_bar"))
    )
    return (
        li.join(F.broadcast(brand_parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_bar"))
        .agg(
            F.round(
                (F.sum(F.col("l_extendedprice").cast(DEC)) / F.lit(7.0))
                .cast("double"),
                4,
            ).alias("avg_yearly")
        )
    )


SMALL_QUANTITY_REVENUE_SQL = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0,
             4) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.8 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: revenue over all subsets of
    (returnflag, linestatus) - completes the grouping-sets row next to
    ROLLUP; NULL markers coalesced for stable cross-engine output."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum(F.col("l_extendedprice")).alias("revenue"),
             F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


REVENUE_CUBE_SQL = f"""
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       {_sql_dsum('l_extendedprice')} AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill (hypertable-style): every (day, event_type)
    slot in the observed range, zero-filled where no events occurred.
    Dense dimension = exploded day sequence x distinct types (both tiny,
    broadcast); sparse counts left-joined on - the standard dense-calendar
    pattern that stays cheap at any fact-table size."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    types = ev.select("event_type").distinct()
    dense = days.crossJoin(types)
    counts = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        dense.join(counts, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


EVENTS_GAPFILL_SQL = """
WITH bounds AS (
  SELECT date_trunc('day', min(ts)) AS d0, date_trunc('day', max(ts)) AS d1
  FROM events
),
days AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day FROM bounds
),
types AS (SELECT DISTINCT event_type FROM events),
counts AS (
  SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(days.day, '%Y-%m-%d') AS day, types.event_type AS event_type,
       CAST(coalesce(counts.n, 0) AS BIGINT) AS n_events
FROM days CROSS JOIN types
LEFT JOIN counts ON counts.day = days.day AND counts.event_type = types.event_type
ORDER BY day, types.event_type
"""


def extreme_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argument aggregates (min_by/max_by): per event type, which event had
    the extreme value - one partial-aggregating pass, no window needed.

    Tie-break: among events tied at the extreme value, the LOWEST event_id
    wins (struct ordering) - bare min_by/max_by is partition-order
    nondeterministic, and the test data really does have tied minima at
    sf0.1 (code-review finding)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by(
                "event_id",
                F.struct(F.col("value"), (-F.col("event_id")).alias("nid")),
            ).alias("max_value_event"),
            F.min_by(
                "event_id", F.struct(F.col("value"), F.col("event_id"))
            ).alias("min_value_event"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.min("value"), 6).alias("min_value"),
        )
        .orderBy("event_type")
    )


EXTREME_EVENTS_SQL = """
WITH r AS (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id) AS rn_max,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id) AS rn_min
  FROM events
)
SELECT event_type,
       max(CASE WHEN rn_max = 1 THEN event_id END) AS max_value_event,
       max(CASE WHEN rn_min = 1 THEN event_id END) AS min_value_event,
       round(max(value), 6) AS max_value,
       round(min(value), 6) AS min_value
FROM r GROUP BY event_type ORDER BY event_type
"""


def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per user, the sum of event values in the
    trailing 7-day event-time window (frame = RANGE over epoch
    MICROseconds — `unix_timestamp` truncates to seconds, which shifts
    the frame boundary for sub-second timestamps and diverged from the
    oracle's `epoch()` at sf0.1; exact integer microseconds agree on
    every row at every scale)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-7 * 86400 * 1_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(
                F.sum(F.col("value").cast(DEC)).over(w).cast("double"), 4
            ).alias("value_7d"),
        )
        .orderBy("event_id")
    )


ROLLING_7D_USER_VALUE_SQL = """
SELECT event_id, user_id,
       round(CAST(sum(CAST(value AS DECIMAL(25,6)))
                  OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                        RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
             AS DOUBLE), 4) AS value_7d
FROM events
ORDER BY event_id
"""


def user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel: users who did view -> click -> purchase in
    strict temporal order (greedy earliest-match semantics: t1 = first view,
    t2 = first click after t1, t3 = first purchase after t2 - deterministic
    and equivalent to EXISTS for the reached-stage question).  Three
    broadcast-joined conditional aggregations; no self-cross-product."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    hour = F.expr("INTERVAL 24 HOUR")
    t2 = (ev.filter(F.col("event_type") == "click")
          .join(F.broadcast(t1), "user_id")
          .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + hour))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    t3 = (ev.filter(F.col("event_type") == "purchase")
          .join(F.broadcast(t2), "user_id")
          .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + hour))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    # total_users is a lazy aggregate subplan like the other three legs —
    # no Spark job fires until the caller's own action
    return ev.agg(
        F.countDistinct("user_id").alias("total_users")
    ).crossJoin(
        t1.agg(F.count(F.lit(1)).alias("reached_view"))
    ).crossJoin(
        t2.agg(F.count(F.lit(1)).alias("reached_click"))
    ).crossJoin(
        t3.agg(F.count(F.lit(1)).alias("reached_purchase"))
    )


USER_FUNNEL_SQL = """
WITH t1 AS (
  SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
t2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN t1 ON e.user_id = t1.user_id
  WHERE e.event_type = 'click' AND e.ts > t1.t1 AND e.ts <= t1.t1 + INTERVAL 24 HOUR
  GROUP BY e.user_id
),
t3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN t2 ON e.user_id = t2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > t2.t2 AND e.ts <= t2.t2 + INTERVAL 24 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT count(DISTINCT user_id) FROM events) AS total_users,
       (SELECT count(*) FROM t1) AS reached_view,
       (SELECT count(*) FROM t2) AS reached_click,
       (SELECT count(*) FROM t3) AS reached_purchase
"""


def neardup_cosine_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal consistency: for every text near-dup pair (n-gram
    Jaccard >= 0.5), the cosine similarity of the corresponding embeddings
    (doc_id == vec_id join).  Composes the dedup and vector subsystems in
    one plan; at sf0.01 the planted text near-dups turn out to be
    embedding-independent - exactly the kind of fact this query surfaces."""
    from .dedup import ngram_jaccard_pairs
    from ..functions.distance import cosine_similarity

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
    ea = emb.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    eb = emb.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        pairs.join(ea, "id_a").join(eb, "id_b")
        .select(
            "id_a", "id_b", "jaccard",
            F.round(cosine_similarity("va", "vb"), 6).alias("emb_cosine"),
        )
        .orderBy("id_a", "id_b")
    )


NEARDUP_COSINE_CHECK_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
       FROM toks, unnest(range(1, len(t) - 1)) AS r(i)),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b,
         round(CAST(c AS DOUBLE) / (sa.sz + sb.sz - c), 6) AS jaccard
  FROM inter JOIN sizes sa ON sa.doc_id = id_a
             JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= 0.5
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT p.id_a, p.id_b, p.jaccard,
       round(CASE WHEN na.n * nb.n = 0 THEN 0.0 ELSE d.dot / (na.n * nb.n) END,
             6) AS emb_cosine
FROM pairs p
JOIN v a ON a.vec_id = p.id_a
JOIN v b ON b.vec_id = p.id_b,
LATERAL (SELECT sum(x.xa * x.xb) AS dot
         FROM (SELECT unnest(a.v) AS xa, unnest(b.v) AS xb) x) d,
LATERAL (SELECT sqrt(sum(x.xa * x.xa)) AS n
         FROM (SELECT unnest(a.v) AS xa) x) na,
LATERAL (SELECT sqrt(sum(x.xb * x.xb)) AS n
         FROM (SELECT unnest(b.v) AS xb) x) nb
ORDER BY id_a, id_b
"""


def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical functions: z-score outliers per event type.

    Variance is derived from decimal-exact sums (sum, sum of squares) so
    both engines compute identical doubles - built-in stddev() accumulates
    in engine-specific order and would drift in the last bits.  Outlier =
    |value - mean| > 3 * sample stddev."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("s"),
        F.sum((F.col("value") * F.col("value")).cast(DEC)).cast("double").alias("s2"),
    ).select(
        "event_type",
        (F.col("s") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s") * F.col("s") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("std"),
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(F.col("value") - F.col("mean")) > 3.0 * F.col("std"))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round((F.col("value") - F.col("mean")) / F.col("std"), 4).alias(
                "zscore"
            ),
        )
        .orderBy("event_id")
    )


VALUE_OUTLIERS_SQL = """
WITH stats AS (
  SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*) AS mean,
         sqrt((CAST(sum(CAST(value * value AS DECIMAL(25,6))) AS DOUBLE)
               - CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
                 * CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*))
              / (count(*) - 1)) AS std
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, round(e.value, 6) AS value,
       round((e.value - s.mean) / s.std, 4) AS zscore
FROM events e JOIN stats s ON e.event_type = s.event_type
WHERE abs(e.value - s.mean) > 3.0 * s.std
ORDER BY e.event_id
"""


def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated multi-condition EXISTS + NOT EXISTS —
    the hardest decorrelation a user hits (anti-join with an inequality
    correlation on a second scan of the fact table).

    Semantics (returnflag plays the "late" role; this schema has no
    receipt/commit dates): count, per supplier, the returned ('R') lines of
    finalized ('F') orders where at least one OTHER supplier shipped on the
    same order (EXISTS l2: same order, different supplier) but NO other
    supplier's line was returned (NOT EXISTS l3: same order, different
    supplier, returned).

    100 TB plan: instead of two correlated self semi/anti-joins of lineitem
    (two extra fact-fact shuffles), BOTH subqueries decorrelate into ONE
    per-order aggregate — EXISTS(other supplier) ⟺ the order has ≥2
    distinct suppliers; NOT EXISTS(other late supplier) ⟺ the order has
    exactly 1 distinct returned-supplier (l1 itself is returned, so the
    single returned supplier must be l1's).  The aggregate shuffles
    (orderkey → 2 counts) once and joins back on the same key; supplier is
    a broadcast dim.
    """
    sup = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    per_order = li.groupBy(F.col("l_orderkey").alias("agg_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    return (
        l1.join(
            per_order,
            (F.col("l_orderkey") == F.col("agg_orderkey"))
            & (F.col("n_supp") >= 2)
            & (F.col("n_ret_supp") == 1),
        )
        .join(
            orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(sup.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(25)
    )


SUPPLIERS_KEPT_WAITING_SQL = """
SELECT s.s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 25
"""


def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: NOT EXISTS + correlated-free scalar-avg subquery.

    Customers whose balance exceeds the positive-balance average but who
    never placed an urgent order, grouped by nation.  The scalar average is
    a one-row broadcast; the NOT EXISTS decorrelates to a LEFT ANTI join
    against the (pre-filtered, pre-projected) urgent order keys — customer
    never shuffles against the full orders table.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")

    # deterministic cross-engine mean (decimal-exact sum / count)
    avgbal = cust.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(F.col("c_acctbal").cast(DEC)).cast("double")
         / F.count(F.lit(1))).alias("avg_bal")
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    return (
        cust.join(F.broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, "c_custkey", "left_anti")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("n_name")
    )


DORMANT_RICH_CUSTOMERS_SQL = f"""
WITH avgbal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE) / count(*)
         AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n.n_name, count(*) AS numcust,
       {_sql_dsum('c_acctbal')} AS totacctbal
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey, avgbal
WHERE c.c_acctbal > avgbal.avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n.n_name
ORDER BY n.n_name
"""


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-nation bidirectional trade volume by year.

    Five-way join where THREE sides are broadcastable dims (supplier,
    customer, nation×2) — only lineitem⋈orders shuffles (on orderkey);
    the nation-pair disjunction prunes rows before the fact join.  The
    100 TB shape: one fact-fact shuffle, everything else map-side.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("s_nk"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nk"),
                       F.col("n_name").alias("cust_nation"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    joined = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


VOLUME_SHIPPING_SQL = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a nation's share of regional PROMO-part revenue by
    year — conditional-numerator ratio over a six-table join.  Share =
    decimal-exact conditional sum / decimal-exact total (both summed
    exactly, ONE double division at the end — cross-engine stable)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    cust_region = (
        customer.select("c_custkey", "c_nationkey")
        .join(F.broadcast(nation.select("n_nationkey", "n_regionkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "EUROPE")
                          .select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = supplier.select("s_suppkey", "s_nationkey").join(
        F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                  F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")
                            .select("p_partkey")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate")
              .filter((F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                      & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_5", volume)
                .otherwise(F.lit(0.0)).cast(DEC)).cast("double")
    den = F.sum(volume.cast(DEC)).cast("double")
    return (
        joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(num / den, 6).alias("mkt_share"),
             F.round(den, 4).alias("total_volume"))
        .orderBy("o_year")
    )


MARKET_SHARE_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(CAST(sum(CAST(CASE WHEN n1.n_name = 'NATION_5'
                                THEN l_extendedprice * (1 - l_discount)
                                ELSE 0.0 END AS DECIMAL(25,6))) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE), 6) AS mkt_share,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) AS DOUBLE), 4) AS total_volume
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
JOIN region ON n2.n_regionkey = r_regionkey AND r_name = 'EUROPE'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
WHERE o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY o_year ORDER BY o_year
"""


def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo-revenue percentage for one month — a
    broadcast part join and a conditional-sum ratio (decimal-exact legs,
    one double division)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    ).join(F.broadcast(part.select("p_partkey", "p_type")),
           F.col("l_partkey") == F.col("p_partkey"))
    num = F.sum(F.when(F.col("p_type") == "PROMO", volume)
                .otherwise(F.lit(0.0)).cast(DEC)).cast("double")
    den = F.sum(volume.cast(DEC)).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * num / den, 6).alias("promo_pct"),
        F.round(den, 4).alias("total_revenue"),
    )


PROMO_REVENUE_SQL = """
SELECT round(100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                        THEN l_extendedprice * (1 - l_discount)
                                        ELSE 0.0 END AS DECIMAL(25,6)))
                          AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(25,6))) AS DOUBLE), 6) AS promo_pct,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(25,6))) AS DOUBLE), 4) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate < TIMESTAMP '1996-10-01'
"""


def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with maximum quarterly revenue — an
    aggregate-defined view joined against its own scalar max (broadcast
    one-row subquery), ties kept deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(DEC)).alias("__rev_dec"))
    )
    max_rev = rev.agg(F.max("__rev_dec").alias("__max_dec"))
    return (
        rev.join(F.broadcast(max_rev), F.col("__rev_dec") == F.col("__max_dec"))
        .join(F.broadcast(supplier.select("s_suppkey", "s_name")),
              F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            F.col("supplier_no").alias("s_suppkey"),
            "s_name",
            F.round(F.col("__rev_dec").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


TOP_SUPPLIER_SQL = """
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)))
           AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT supplier_no AS s_suppkey, s_name,
       round(CAST(rev_dec AS DOUBLE), 4) AS total_revenue
FROM rev JOIN supplier ON supplier_no = s_suppkey
WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
ORDER BY s_suppkey
"""


def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    both join sides (brand × size × quantity bands).  The disjunction
    can't prune the scan wholesale, but each conjunct's part-side half
    filters the broadcast build side and the quantity bounds stay on the
    probe side — Catalyst splits the predicate across the join (CNF
    conversion), the plan property this query pins."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    pred = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#14") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return joined.filter(pred).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


DISJUNCTIVE_REVENUE_SQL = f"""
SELECT {_sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
       count(*) AS n_lineitems
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""

# ---------------------------------------------------------------------------
# Round-6 additions: the six remaining TPC-H shapes (Q2, Q9, Q11, Q12, Q16,
# Q20), adapted to the reduced schema.  The test tables have no ``partsupp``
# relation, so the queries that need one derive it from lineitem: the set of
# (l_partkey, l_suppkey) pairs that actually traded, with the minimum unit
# price a supplier ever charged for the part standing in for ps_supplycost
# and the pair's all-time shipped quantity for ps_availqty.  Per-row unit
# price (double / double) is IEEE-identical in Spark and DuckDB, and MIN over
# identical doubles is order-free, so the derived relation is bit-exact
# cross-engine — which is what lets Q2's correlated scalar-min EQUALITY
# comparison work as a value oracle.
#
# The division produces doubles with arbitrary decimal digits, and rounding
# such a double (round(x, 4) or a DECIMAL cast) is where Spark's and DuckDB's
# tie-breaking can diverge (measured: one ulp flips the 4th digit at sf0.1).
# So the cost is quantized ONCE into an exact integer domain — ``floor(unit ·
# 1e4 + 0.5)``, the same convention as jaccard_e6 — where every later
# comparison, product, and sum is either pure-integer or a ≤4-nominal-digit
# double whose decimal casts are unambiguous in both engines.
# ---------------------------------------------------------------------------


def _cost_e4(price: Column, qty: Column) -> Column:
    """Unit price quantized to an exact integer (hundredths of a cent):
    identical IEEE double pipeline in both engines, then an exact floor."""
    return F.floor(price / qty * 1e4 + 0.5).cast("long")


_SQL_COST_E4 = ("CAST(floor(l_extendedprice / l_quantity * 1e4 + 0.5) "
                "AS BIGINT)")


def _derived_partsupp(li: DataFrame) -> DataFrame:
    """partsupp proxy: one row per (l_partkey, l_suppkey) pair that traded,
    with ``supply_cost_e4`` = min unit price in hundredths of a cent.  One
    shuffle of lineitem on the pair key; the result is dimension-sized
    (|part| × avg-suppliers-per-part), which is what makes the Q2/Q9/Q11
    joins against it cheap."""
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cost_e4(F.col("l_extendedprice"), F.col("l_quantity"))).alias(
            "supply_cost_e4"
        )
    )


_PS_CTE = f"""ps AS (SELECT l_partkey, l_suppkey,
                   min({_SQL_COST_E4}) AS supply_cost_e4
            FROM lineitem GROUP BY l_partkey, l_suppkey)"""


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated scalar-min subquery — for each qualifying
    part, the EUROPE supplier(s) whose supply cost equals the part's
    region-wide minimum.

    100 TB plan: the correlated ``cost = (SELECT min(cost) WHERE partkey =
    outer.partkey)`` decorrelates into a window MIN over the part key — no
    second scan, no join-back.  Everything non-fact broadcasts: the
    supplier⋈nation⋈region dim chain and the filtered part list both prune
    the derived partsupp BEFORE the window, so the only wide shuffles are
    the partsupp groupBy and the window's repartition by part key.  Ties on
    the exact minimum keep all tied suppliers (both engines compute the
    identical double, so tie sets match)."""
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    li = load_table(spark, sf_dir, "lineitem")

    eu = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pq = part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "LARGE"))
    ps = (
        _derived_partsupp(li)
        .join(F.broadcast(pq.select("p_partkey", "p_name")),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("min_cost", F.min("supply_cost_e4").over(w))
        .filter(F.col("supply_cost_e4") == F.col("min_cost"))
        .select(
            "s_name", "n_name", "p_partkey", "p_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "supply_cost_e4",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
    )


MIN_COST_SUPPLIER_SQL = f"""
WITH {_PS_CTE},
eu AS (SELECT s_suppkey, s_name, s_acctbal, n_name
       FROM supplier JOIN nation ON s_nationkey = n_nationkey
                     JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE')
SELECT s_name, n_name, p_partkey, p_name,
       round(s_acctbal, 2) AS s_acctbal,
       supply_cost_e4
FROM part, ps, eu
WHERE p_partkey = ps.l_partkey AND eu.s_suppkey = ps.l_suppkey
  AND p_size <= 10 AND p_type = 'LARGE'
  AND supply_cost_e4 = (SELECT min(ps2.supply_cost_e4)
                        FROM ps ps2
                        JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
                        WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


def product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: multi-fact profit rollup with a LIKE part filter —
    profit = revenue minus supply cost × quantity, by nation and year.

    100 TB plan: the LIKE-filtered part list broadcasts into BOTH the
    lineitem scan and the derived partsupp (pruning each before any wide
    join); supplier and nation broadcast; lineitem⋈orders shuffles once on
    orderkey and lineitem⋈partsupp once on the (partkey, suppkey) pair key.
    Partial aggregation collapses to |nation|×|year| groups map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    redp = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    ps = _derived_partsupp(li).join(
        F.broadcast(redp), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_suppkey", "supply_cost_e4")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("supply_cost_e4") / 1e4 * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(redp.select(F.col("p_partkey").alias("pp"))),
                F.col("l_partkey") == F.col("pp"))
        .join(ps, ["l_partkey", "l_suppkey"])
        .join(orders.select("o_orderkey", "o_orderdate"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(sup.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


PRODUCT_PROFIT_SQL = f"""
WITH {_PS_CTE}
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       {_sql_dsum('l_extendedprice * (1 - l_discount) '
                  '- supply_cost_e4 / 1e4 * l_quantity')} AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = lineitem.l_partkey
JOIN ps       ON ps.l_partkey = lineitem.l_partkey
             AND ps.l_suppkey = lineitem.l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = lineitem.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE 'red%'
GROUP BY n_name, CAST(year(o_orderdate) AS INTEGER)
ORDER BY nation, o_year DESC
"""


def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value for one region's suppliers,
    kept only where it exceeds a fraction of the GLOBAL total — the
    HAVING-against-a-global-scalar pattern.

    100 TB plan: the pair aggregate (one lineitem shuffle) computes cost
    AND quantity together; the region's supplier keys broadcast; the global
    total is a one-row aggregate broadcast back into the per-part HAVING —
    the fact never scans twice (AQE reuses the pair aggregate's exchange
    for both the per-part rollup and the total).  The threshold compare
    happens on decimal-exact sums cast to double identically in both
    engines, so the boundary is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    asia = (
        sup.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_cost_e4(F.col("l_extendedprice"), F.col("l_quantity"))).alias(
            "supply_cost_e4"
        ),
        F.sum(F.col("l_quantity").cast(DEC)).alias("availqty"),
    )
    pv = pair.join(
        F.broadcast(asia), F.col("l_suppkey") == F.col("s_suppkey")
    ).withColumn(
        "value",
        F.col("supply_cost_e4") / 1e4 * F.col("availqty").cast("double"),
    )
    per_part = pv.groupBy("l_partkey").agg(
        F.sum(F.col("value").cast(DEC)).alias("v_dec")
    )
    total = pv.agg(
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("v_dec").cast("double")
            > 2.0 * F.col("total_value") / F.col("n_parts")
        )
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.round(F.col("v_dec").cast("double"), 2).alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "ps_partkey")
    )


IMPORTANT_STOCK_SQL = f"""
WITH pair AS (SELECT l_partkey, l_suppkey,
                     min({_SQL_COST_E4}) AS supply_cost_e4,
                     sum(CAST(l_quantity AS DECIMAL(25,6))) AS availqty
              FROM lineitem GROUP BY l_partkey, l_suppkey),
pv AS (SELECT l_partkey,
              supply_cost_e4 / 1e4 * CAST(availqty AS DOUBLE) AS value
       FROM pair JOIN supplier ON s_suppkey = l_suppkey
                 JOIN nation   ON n_nationkey = s_nationkey
                 JOIN region   ON r_regionkey = n_regionkey
       WHERE r_name = 'ASIA'),
tot AS (SELECT CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS total_value,
               count(DISTINCT l_partkey) AS n_parts
        FROM pv)
SELECT l_partkey AS ps_partkey,
       round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE), 2)
         AS part_value
FROM pv, tot
GROUP BY l_partkey, tot.total_value, tot.n_parts
HAVING CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE)
         > 2.0 * tot.total_value / tot.n_parts
ORDER BY part_value DESC, ps_partkey
"""


def ship_priority_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way aggregation — per ship-delay
    bucket (this schema has no l_shipmode; the bucket is derived from
    shipdate − orderdate), count lines on high- vs low-priority orders in
    one pass (SUM of CASE, not two scans).

    100 TB plan: the year filter pushes to the lineitem scan; one shuffle
    joins orders on orderkey; the CASE sums partial-aggregate to three
    groups map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    bucket = (
        F.when(delay <= 30, "FAST")
        .when(delay <= 90, "MEDIUM")
        .otherwise("SLOW")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(bucket.alias("ship_bucket"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


SHIP_PRIORITY_BUCKETS_SQL = """
SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'FAST'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'MEDIUM'
            ELSE 'SLOW' END AS ship_bucket,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY ship_bucket
"""


def part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery + COUNT(DISTINCT) — how many
    distinct suppliers (excluding flagged ones; negative account balance
    plays the "customer complaints" role) trade each qualifying
    (brand, type, size) part bucket.

    100 TB plan: the trading pairs are ONE distinct over the two fact key
    columns (column-pruned scan); NOT IN decorrelates to a broadcast LEFT
    ANTI against the tiny flagged-supplier list (s_suppkey is non-null, so
    NOT IN ≡ anti-join here); the filtered part dim broadcasts; the
    count-distinct re-aggregates by the three part attributes."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    flagged = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = part.filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    return (
        pairs.join(F.broadcast(flagged),
                   F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(pf.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


PART_SUPPLIER_COUNTS_SQL = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON p_partkey = pairs.l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND pairs.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: double-nested IN with a correlated scalar — AMERICA
    suppliers who, for some 'red%' part, shipped more than half of their
    all-time quantity of that part inside 1997 (this schema has no
    ps_availqty; the pair's all-time shipped quantity plays that role, and
    the classic ``availqty > ½·year-shipments`` flips to ``year-shipments >
    ½·all-time`` to stay selective).

    100 TB plan: BOTH correlated inner sums decorrelate into ONE
    conditional aggregate over the part-filtered fact (total + in-window
    quantity per pair, decimal-exact); the qualifying supplier keys are a
    tiny distinct that AQE broadcasts into the supplier semi-join; nation
    and region broadcast.  One lineitem shuffle total, no repeated scans,
    no correlated execution."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    redp = part.filter(F.col("p_name").like("red%")).select("p_partkey")
    in_97 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    zero = F.lit(0).cast(DEC)
    pairs = (
        li.join(F.broadcast(redp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"),
            F.sum(
                F.when(in_97, F.col("l_quantity").cast(DEC)).otherwise(zero)
            ).alias("qty_1997"),
        )
    )
    qualifying = (
        pairs.filter(2 * F.col("qty_1997") > F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"),
                 "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(reg.filter(F.col("r_name") == "AMERICA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_name", "n_name",
                F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


EXCESS_SHIPPERS_SQL = """
SELECT s_name, n_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier JOIN nation ON n_nationkey = s_nationkey
              JOIN region ON r_regionkey = n_regionkey
WHERE r_name = 'AMERICA'
  AND s_suppkey IN (
    SELECT ps.l_suppkey
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    WHERE ps.l_partkey IN
          (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND 2 * COALESCE(
            (SELECT sum(CAST(l.l_quantity AS DECIMAL(25,6)))
             FROM lineitem l
             WHERE l.l_partkey = ps.l_partkey
               AND l.l_suppkey = ps.l_suppkey
               AND l.l_shipdate >= TIMESTAMP '1997-01-01'
               AND l.l_shipdate <  TIMESTAMP '1998-01-01'), 0)
          > (SELECT sum(CAST(l.l_quantity AS DECIMAL(25,6)))
             FROM lineitem l
             WHERE l.l_partkey = ps.l_partkey
               AND l.l_suppkey = ps.l_suppkey)
  )
ORDER BY s_name
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day, and
    for every (cohort, day-offset) cell the count of that cohort's users
    still active.  Counts stay integers; the ratio (n_active / n_cohort)
    is the consumer's one division, both operands provided.

    Plan: one distinct (user, day) projection feeds BOTH the first-touch
    aggregate and the activity join; the per-user first-day table is
    tiny relative to the event stream (users << events), so it
    broadcasts — the big side shuffles once for the distinct and never
    again."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        "user_id",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("d"),
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    mat = (
        act.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day"))
            .cast("long").alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").cast("long").alias("n_active"))
    )
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    return (
        mat.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset", "n_active", "n_cohort",
        )
        .orderBy("cohort_day", "day_offset")
    )


COHORT_RETENTION_SQL = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
f AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id),
m AS (
  SELECT f.cohort_day, act.d - f.cohort_day AS day_offset,
         count(DISTINCT act.user_id) AS n_active
  FROM act JOIN f USING (user_id)
  GROUP BY f.cohort_day, act.d - f.cohort_day
),
s AS (SELECT cohort_day, count(*) AS n_cohort FROM f GROUP BY cohort_day)
SELECT strftime(m.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(day_offset AS BIGINT) AS day_offset,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(n_cohort AS BIGINT) AS n_cohort
FROM m JOIN s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


def copurchase_pairs(spark: SparkSession, sf_dir: str, k: int = 25) -> DataFrame:
    """Market-basket co-occurrence: the part pairs most often ordered
    together, with the support counts a consumer needs for
    lift/confidence (kept as integers — the ratios are the consumer's
    divisions).

    Plan: one distinct (order, part) projection; the pair generation is
    a self-equi-join ON THE ORDER KEY with ``a < b`` — per-order pair
    fan-out is quadratic only in basket size, which TPC-H bounds at 7
    lineitems (and real carts bound similarly), so the blow-up is a
    constant factor, not a scale term.  Per-part support joins in from
    the same distinct projection via exchange reuse."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = op.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = op.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
    )
    support = op.groupBy("pk").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return (
        pairs.join(support.select(F.col("pk").alias("part_a"),
                                  F.col("cnt").alias("cnt_a")), "part_a")
        .join(support.select(F.col("pk").alias("part_b"),
                             F.col("cnt").alias("cnt_b")), "part_b")
        .select("part_a", "part_b", "pair_cnt", "cnt_a", "cnt_b")
        .orderBy(F.col("pair_cnt").desc(), F.col("part_a").asc(),
                 F.col("part_b").asc())
        .limit(k)
    )


def render_copurchase_sql(k: int = 25) -> str:
    """Oracle SQL parameterized on the same ``k`` as
    :func:`copurchase_pairs`, so a non-default k cannot silently diverge
    from the registered oracle (ADVICE r6)."""
    return f"""
WITH op AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
),
pairs AS (
  SELECT a.pk AS part_a, b.pk AS part_b,
         CAST(count(*) AS BIGINT) AS pair_cnt
  FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY a.pk, b.pk
),
support AS (SELECT pk, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY pk)
SELECT p.part_a, p.part_b, p.pair_cnt,
       sa.cnt AS cnt_a, sb.cnt AS cnt_b
FROM pairs p
JOIN support sa ON sa.pk = p.part_a
JOIN support sb ON sb.pk = p.part_b
ORDER BY p.pair_cnt DESC, p.part_a, p.part_b
LIMIT {int(k)}
"""


COPURCHASE_PAIRS_SQL = render_copurchase_sql(25)
