"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 (plus the training-data-pipeline
extensions) gets one entry here: a ``(spark, sf_dir) -> DataFrame`` callable
and, where ANSI-SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables.  Column names and rounding are aligned on both sides because
the driver hash-compares sorted values (see repo-root ``__spark_entry__.py``).

Float convention: every float-valued output column is rounded (typically to
6 decimals) in BOTH the Spark query and the oracle SQL, so independent
double-precision evaluation orders can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.knn import knn_search
from .sources import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


# --------------------------------------------------------------------------
# Parity operators (SURVEY.md §2.1) expressed over the driver's test tables.
# --------------------------------------------------------------------------

@register(
    "count",
    # vector_store.py:139-142 — SELECT count(*)
    "SELECT count(*) AS n FROM embeddings",
)
def q_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.agg(F.count(F.lit(1)).alias("n"))


@register(
    "head",
    # vector_store.py:145-161 — first n rows by id (TakeOrderedAndProject)
    "SELECT vec_id, label FROM embeddings ORDER BY vec_id LIMIT 5",
)
def q_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.orderBy("vec_id").limit(5).select("vec_id", "label")


@register(
    "select_ids",
    # vector_store.py:256-273 — WHERE id IN (...) ORDER BY id
    "SELECT vec_id, label FROM embeddings WHERE vec_id IN (1, 5, 10, 490) "
    "ORDER BY vec_id",
)
def q_select_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id").isin([1, 5, 10, 490]))
        .orderBy("vec_id")
        .select("vec_id", "label")
    )


@register(
    "dump_vecs",
    # vector_store.py:403-404 — full (n, dim) matrix in id order; flattened to
    # (id, pos, val) scalars so the hash compare avoids list-typed cells.
    "SELECT vec_id, i - 1 AS pos, round(CAST(embedding[i] AS DOUBLE), 6) AS val "
    "FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i) "
    "ORDER BY vec_id, pos",
)
def q_dump_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
        .withColumn("val", F.round(F.col("val").cast("double"), 6))
        .orderBy("vec_id", "pos")
    )


@register(
    "knn_l2",
    # The flagship (vector_store.py:275-332): exact L2 kNN, batch of 4
    # queries, k=5, tie-break (distance, id).  SURVEY.md §2.2 / §7.1.
    """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec
  FROM embeddings ORDER BY vec_id LIMIT 4
), d AS (
  SELECT q.query_id, e.vec_id AS id,
         sqrt((SELECT sum((u.a - u.b) * (u.a - u.b))
               FROM (SELECT unnest(e.embedding) AS a,
                            unnest(q.qvec) AS b) u)) AS dist
  FROM embeddings e CROSS JOIN q
), r AS (
  SELECT query_id, id, dist,
         row_number() OVER (PARTITION BY query_id ORDER BY dist, id) AS rn
  FROM d
)
SELECT query_id, id, round(dist, 6) AS distance
FROM r WHERE rn <= 5 ORDER BY query_id, distance, id
""",
)
def q_knn_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qs = (
        emb.orderBy("vec_id")
        .limit(4)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )
    res = knn_search(
        emb, qs, k=5, id_col="vec_id", vec_col="embedding", impl="expr"
    )
    return res.withColumn("distance", F.round("distance", 6))


@register("search_by_doc")  # no oracle: InDel ratio not SQL-expressible
def q_search_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy InDel top-k over documents.text (vector_store.py:358-401);
    rows-only driver check — DuckDB has no insert/delete-only edit distance
    (its levenshtein allows substitutions, SURVEY.md §2.3)."""
    from .operators.fuzzysearch import fuzzy_search_by_doc

    docs = load_table(spark, sf_dir, "documents")
    queries_txt = [
        "spark window merge sort",
        "the fast key order sort table",
    ]
    res = fuzzy_search_by_doc(
        docs, queries_txt, k=5, doc_col="text", id_col="doc_id"
    )
    return res.select(
        "query_id", "doc_id", F.round("distance", 6).alias("distance")
    )


@register(
    "query_by_doc",
    # vector_store.py:334-356 — JSON-path equality-set filter over the raw
    # doc string; events.props plays the doc role (FIXTURES.md §4).
    "SELECT event_id, user_id, event_type, "
    "json_extract_string(props, '$.k') AS k "
    "FROM events WHERE json_extract_string(props, '$.k') IN ('1', '2', '42') "
    "ORDER BY event_id",
)
def q_query_by_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .functions.jsonfn import query_by_doc

    ev = load_table(spark, sf_dir, "events")
    return (
        query_by_doc(ev, ["k"], [1, 2, 42], doc_col="props")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.get_json_object("props", "$.k").alias("k"),
        )
        .orderBy("event_id")
    )


# --------------------------------------------------------------------------
# Relational operator coverage (SURVEY.md §2.5 taxonomy) — joins, aggs,
# windows, semi/anti joins, set ops, grouping sets.  Also the BENCH queries.
# --------------------------------------------------------------------------

def _register_relational() -> None:
    from .operators import relational as R

    pairs = [
        ("q1_pricing_summary", R.pricing_summary, R.PRICING_SUMMARY_SQL),
        ("q3_shipping_priority", R.shipping_priority, R.SHIPPING_PRIORITY_SQL),
        ("q5_local_supplier_volume", R.local_supplier_volume,
         R.LOCAL_SUPPLIER_VOLUME_SQL),
        ("q4_order_priority", R.order_priority_counts,
         R.ORDER_PRIORITY_COUNTS_SQL),
        ("q13_customer_distribution", R.customer_distribution,
         R.CUSTOMER_DISTRIBUTION_SQL),
        ("window_top_orders", R.top_orders_per_customer,
         R.TOP_ORDERS_PER_CUSTOMER_SQL),
        ("events_windowed_agg", R.events_windowed_agg,
         R.EVENTS_WINDOWED_AGG_SQL),
        ("nation_setops", R.nation_setops, R.NATION_SETOPS_SQL),
        ("revenue_rollup", R.revenue_rollup, R.REVENUE_ROLLUP_SQL),
    ]
    for name, fn, sql in pairs:
        _QUERIES[name] = fn
        _ORACLES[name] = sql


_register_relational()
