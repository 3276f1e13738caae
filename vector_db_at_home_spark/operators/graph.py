"""Connected components over near-duplicate pair sets — cluster formation.

Pair-producing dedup operators (MinHash, SimHash, embedding near-dup)
emit EDGES; production dedup keeps one canonical doc per connected
CLUSTER (the SlimPajama/MinHashLSH-dedup recipe — public knowledge).
Spark has no native iterative-graph operator, so this implements
min-label propagation as a driver-coordinated loop of keyed joins — the
(c)-strategy from the build brief, used only because the semantics are
genuinely iterative:

- per round, every vertex takes the min label over itself, its
  neighbors' labels, and its LABEL'S label (pointer-jumping/path
  compression — turns O(diameter) convergence into O(log diameter), so
  a 10⁶-long chain needs ~20 rounds, and typical near-dup clusters
  [diameter ≤ 3] converge in 2);
- every round ``localCheckpoint``s the label table: lineage stays O(1)
  instead of growing by three joins per round (the classic iterative-
  Spark failure mode), and each round's shuffle is |V| + 2|E| keyed
  rows — no broadcast of anything unbounded, no driver-side graph;
- convergence is an exact count of changed labels (one action per
  round, the unavoidable cost of a data-dependent loop).

Oracle: min-label-reachability is exactly what a SQL recursive CTE
computes, so the driver verifies clusters value-for-value (DuckDB
``WITH RECURSIVE`` over the same md5-derived MinHash pair SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 50,
                         on_round=None) -> DataFrame:
    """``(id, component)`` for every vertex appearing in ``pairs``;
    ``component`` is the smallest vertex id in the connected component
    (deterministic).  Raises if not converged within ``max_iter`` rounds
    (pointer-jumping makes that ~2^50-diameter graphs — unreachable).

    ``on_round(round_idx, n_changed)``, when given, is called after each
    round's convergence count — the scale-smoke hook for recording
    per-round shuffle volumes (tools/scale_smoke_1m.py)."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select(F.col("src").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _round in range(max_iter):
        # min label among neighbors
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # label-of-label (pointer jumping)
        jump = labels.select(
            F.col("id").alias("label"), F.col("label").alias("jump_label")
        ).groupBy("label").agg(F.min("jump_label").alias("jump_label"))
        updated = (
            labels.join(nbr, "id", "left")
            .join(jump, "label", "left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("nbr_label"), F.col("label")),
                    F.coalesce(F.col("jump_label"), F.col("label")),
                ).alias("label"),
                F.col("label").alias("__old"),
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("label") != F.col("__old")).count()
        if on_round is not None:
            on_round(_round, changed)
        labels = updated.drop("__old")
        if changed == 0:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def canonical_map_from_pairs(pairs: DataFrame, id_a: str = "id_a",
                             id_b: str = "id_b") -> DataFrame:
    """``(id, canonical_id)`` keep/drop map from near-dup pairs: every doc
    in a cluster maps to the cluster's smallest id (the kept doc).  Docs
    not in any pair are absent (they map to themselves implicitly)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select("id", F.col("component").alias("canonical_id"))


def drop_near_duplicates(df: DataFrame, pairs: DataFrame, id_col: str,
                         id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """The cleaning form: keep one doc per near-dup cluster (the smallest
    id) plus every unpaired doc — a left-anti join against the non-canonical
    ids; ``df`` never shuffles against the pair set beyond that key join."""
    cc = connected_components(pairs, id_a, id_b)
    losers = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank_fixed_point(edges: DataFrame, iters: int = 5,
                         scale: int = 1_000_000) -> DataFrame:
    """PageRank (Page et al. 1999, damping 0.85) as a FIXED number of
    iterations in exact integer fixed-point arithmetic.

    Ranks live in units of ``1/scale``: every node starts at ``scale``,
    and one round computes

        pr'(v) = (15·scale) div 100  +  Σ_{u→v} (pr(u)·85) div (100·deg(u))

    with INTEGER floor division — every operand and result is a BIGINT,
    so after any fixed iteration count the ranks are bit-identical
    across engines (the float formulation would accumulate
    reduction-order drift by iteration 2).  The truncation loses < 1
    rank unit per edge per round — irrelevant at scale = 1e6 and
    irrelevant to correctness, which is defined BY this recurrence.

    Plan: the degree-annotated edge table is built once; each round is
    one keyed join (edges × current ranks on src) plus one groupBy(dst)
    partial aggregate — the same per-round shuffle profile as
    ``connected_components`` (|E| + |V| keyed rows, nothing broadcast
    that grows with the graph).  ``iters`` is fixed, not data-dependent,
    so there is no per-round driver action at all: the whole rank table
    materializes lazily as one 5-stage plan.

    ``edges``: directed ``(src, dst)`` BIGINT pairs; dangling nodes
    (out-degree 0) contribute nothing, matching the recurrence as
    written.  Returns ``(node, pr)`` for every node appearing anywhere.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = edges.join(deg, "src")
    base = (15 * scale) // 100
    pr = nodes.select("node", F.lit(scale).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr("(pr * 85) div (100 * deg)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base).cast("long") + F.coalesce("c", F.lit(0)))
            .alias("pr"),
        )
    return pr


def render_pagerank_sql(edges_cte: str, iters: int = 5,
                        scale: int = 1_000_000, k: int = 20) -> str:
    """DuckDB oracle for ``pagerank_fixed_point`` over an ``edges``
    CTE body (must yield ``(src, dst)``): the identical integer
    recurrence with the iterations UNROLLED as MATERIALIZED stages
    (plain chained CTEs re-inline exponentially), top-``k`` by
    ``(pr DESC, node)``."""
    base = (15 * scale) // 100
    stages = [f"""pr_0 AS MATERIALIZED (
  SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes
)"""]
    for i in range(1, iters + 1):
        stages.append(f"""pr_{i} AS MATERIALIZED (
  SELECT n.node,
         CAST({base} + coalesce(c.c, 0) AS BIGINT) AS pr
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum((p.pr * 85) // (100 * e.deg)) AS c
    FROM e JOIN pr_{i-1} p ON p.node = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    body = ",\n".join(stages)
    return f"""
WITH edges AS MATERIALIZED ({edges_cte}),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
e AS MATERIALIZED (
  SELECT edges.src, edges.dst, deg.deg FROM edges JOIN deg USING (src)
),
{body}
SELECT node, pr FROM pr_{iters}
ORDER BY pr DESC, node
LIMIT {k}
"""
