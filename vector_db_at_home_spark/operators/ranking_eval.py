"""Retrieval evaluation metrics — MRR@k, recall@k, NDCG@k — the eval
harness every retrieval pipeline needs next to its indexes (public
definitions: Järvelin & Kekäläinen 2002 for (N)DCG; TREC MRR).

Determinism discipline (the engine's float laws): the only
transcendental in NDCG is ``1/log2(rank+1)``, and ``rank ≤ k`` is tiny
— so the discount WEIGHTS are precomputed once in Python as integers
(``round(1e9 / log2(r+1))``) and inlined as LITERALS into both the
Spark plan and the DuckDB oracle.  Every aggregation is then integer
sums and integer floor-divisions: the result value-hashes with no
cross-engine libm risk.

Scale shape: one equi-join of the run against the qrels on (query_id,
id), one partial-agg groupBy per query, two broadcast-size literal
arrays.  Run and qrel tables shuffle fixed-width rows only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

E9 = 1_000_000_000


def _dcg_weights(k: int) -> list[int]:
    return [round(E9 / math.log2(r + 1)) for r in range(1, k + 1)]


def _idcg_prefix(k: int) -> list[int]:
    w, out, acc = _dcg_weights(k), [], 0
    for x in w:
        acc += x
        out.append(acc)
    return out


def ranking_metrics(runs: DataFrame, qrels: DataFrame,
                    k: int = 10) -> DataFrame:
    """Per-query metrics of a ranked ``runs (query_id, id, rank)``
    against binary ``qrels (query_id, id)``:

    ``(query_id, n_rel, n_hits_at_k, first_rel_rank, mrr_e6,
    recall_at_k_e6, dcg_w, idcg_w, ndcg_e6)`` — all integers
    (``*_e6`` = floor(1e6 · metric); ``first_rel_rank`` 0 when no
    relevant doc ranked).  Queries present in ``qrels`` but absent from
    the run get zero metrics (they count — silently dropping unanswered
    queries is the classic eval inflation bug).  The REVERSE case is the
    opposite by design (ADVICE r7): a query present in ``runs`` with NO
    qrels row is UNJUDGED and does not appear in the output at all —
    the result is keyed off the qrels (there is no denominator to score
    it against), matching the oracle; callers wanting them visible
    should left-join their query list onto this result."""
    w_arr = F.array(*[F.lit(x) for x in _dcg_weights(k)])
    p_arr = F.array(*[F.lit(x) for x in _idcg_prefix(k)])
    hits = (
        runs.filter(F.col("rank") <= k)
        .join(qrels.select("query_id", "id"), ["query_id", "id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits_at_k"),
            F.min("rank").alias("frr"),
            F.sum(F.element_at(w_arr, F.col("rank").cast("int")))
            .alias("dcg_w"),
        )
    )
    nrel = qrels.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_rel"))
    idcg = F.element_at(p_arr, F.least(F.col("n_rel"), F.lit(k)).cast("int"))
    base = nrel.join(hits, "query_id", "left").select(
        "query_id",
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce("n_hits_at_k", F.lit(0)).cast("long")
        .alias("n_hits_at_k"),
        F.coalesce("frr", F.lit(0)).cast("long").alias("first_rel_rank"),
        F.coalesce("dcg_w", F.lit(0)).cast("long").alias("dcg_w"),
        idcg.cast("long").alias("idcg_w"),
    )
    # integer floor-divisions only (`div`), mirroring DuckDB's `//` —
    # no double division anywhere, so no cross-engine rounding edge
    return base.select(
        "query_id", "n_rel", "n_hits_at_k", "first_rel_rank",
        F.when(F.col("first_rel_rank") > 0,
               F.expr("1000000 div first_rel_rank"))
        .otherwise(F.lit(0)).cast("long").alias("mrr_e6"),
        F.expr("(1000000 * n_hits_at_k) div n_rel").cast("long")
        .alias("recall_at_k_e6"),
        "dcg_w", "idcg_w",
        F.expr("(1000000 * dcg_w) div idcg_w").cast("long")
        .alias("ndcg_e6"),
    ).orderBy("query_id")


def render_ranking_metrics_sql(runs_sql: str, qrels_sql: str,
                               k: int = 10) -> str:
    """DuckDB oracle: same literal weights, same integer floor-division
    bookkeeping, over caller-supplied ``runs``/``qrels`` subqueries
    (each a complete SELECT yielding the operator's input columns)."""
    w = _dcg_weights(k)
    p = _idcg_prefix(k)
    w_lit = "[" + ", ".join(str(x) for x in w) + "]"
    p_lit = "[" + ", ".join(str(x) for x in p) + "]"
    return f"""
WITH runs AS ({runs_sql}),
qrels AS ({qrels_sql}),
hits AS (
  SELECT r.query_id,
         count(*) AS n_hits_at_k,
         min(r.rank) AS frr,
         CAST(sum(({w_lit})[CAST(r.rank AS INTEGER)]) AS BIGINT) AS dcg_w
  FROM runs r JOIN qrels q ON q.query_id = r.query_id AND q.id = r.id
  WHERE r.rank <= {k}
  GROUP BY r.query_id
),
nrel AS (SELECT query_id, count(*) AS n_rel FROM qrels GROUP BY query_id)
SELECT n.query_id,
       CAST(n.n_rel AS BIGINT) AS n_rel,
       CAST(coalesce(h.n_hits_at_k, 0) AS BIGINT) AS n_hits_at_k,
       CAST(coalesce(h.frr, 0) AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN h.frr IS NOT NULL THEN 1000000 // h.frr
                 ELSE 0 END AS BIGINT) AS mrr_e6,
       CAST((1000000 * coalesce(h.n_hits_at_k, 0)) // n.n_rel AS BIGINT)
         AS recall_at_k_e6,
       CAST(coalesce(h.dcg_w, 0) AS BIGINT) AS dcg_w,
       CAST(({p_lit})[CAST(least(n.n_rel, {k}) AS INTEGER)] AS BIGINT)
         AS idcg_w,
       CAST((1000000 * coalesce(h.dcg_w, 0))
            // ({p_lit})[CAST(least(n.n_rel, {k}) AS INTEGER)] AS BIGINT)
         AS ndcg_e6
FROM nrel n LEFT JOIN hits h ON h.query_id = n.query_id
ORDER BY n.query_id
"""
