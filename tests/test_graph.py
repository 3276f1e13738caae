"""Connected-components cluster formation over near-dup pairs."""

from __future__ import annotations

import pytest

from vector_db_at_home_spark.operators.graph import (
    canonical_map_from_pairs,
    connected_components,
    drop_near_duplicates,
)


def _union_find_reference(pairs):
    """Independent driver-side union-find for cross-checking."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp: dict[int, int] = {}
    for v in list(parent):
        r = find(v)
        comp[v] = min(comp.get(r, r), r)
    return {v: find(v) for v in parent}


def _cc(spark, edge_list):
    df = spark.createDataFrame(edge_list, "id_a long, id_b long")
    return {
        r.id: r.component for r in connected_components(df).collect()
    }


def test_cc_matches_union_find_random_graph(spark):
    # deterministic pseudo-random graph: 120 vertices, 90 edges
    edges = [((i * 37) % 120, (i * 53 + 11) % 120) for i in range(90)]
    edges = [(a, b) for a, b in edges if a != b]
    got = _cc(spark, edges)
    want = _union_find_reference(edges)
    assert got == want


def test_cc_long_chain_converges_logarithmically(spark):
    # a 400-vertex path has diameter 399; pointer jumping must converge
    # well within the 50-round cap (~9 rounds)
    edges = [(i, i + 1) for i in range(399)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}
    assert len(got) == 400


def test_cc_disconnected_and_star(spark):
    edges = [(10, 11), (11, 12), (50, 51), (7, 99), (7, 98), (7, 97)]
    got = _cc(spark, edges)
    assert got[10] == got[11] == got[12] == 10
    assert got[50] == got[51] == 50
    assert got[7] == got[97] == got[98] == got[99] == 7


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_canonical_map_and_drop(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (2, 6)], "id_a long, id_b long"
    )
    cmap = {
        r.id: r.canonical_id
        for r in canonical_map_from_pairs(pairs).collect()
    }
    assert cmap == {1: 1, 3: 1, 5: 1, 2: 2, 6: 2}
    kept = {
        r.doc_id
        for r in drop_near_duplicates(docs, pairs, "doc_id").collect()
    }
    # losers 3, 5, 6 dropped; unpaired docs kept
    assert kept == {0, 1, 2, 4, 7}


def test_cc_raises_when_iteration_cap_hit(spark):
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=1)


def test_pagerank_fixed_point_hand_graph(spark):
    """Star graph: the hub out-ranks every leaf; exact integer values
    match a hand-rolled reference loop; dangling nodes keep the base."""
    from vector_db_at_home_spark.operators.graph import pagerank_fixed_point

    # leaves 1..4 -> hub 0; hub -> leaf 1 only; node 9 dangles (dst only)
    edges = [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1), (1, 9)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr
           for r in pagerank_fixed_point(df, iters=5).collect()}

    # independent reference in plain Python (same integer recurrence)
    from collections import defaultdict
    nodes = {0, 1, 2, 3, 4, 9}
    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(5):
        nxt = {n: 150_000 for n in nodes}
        for u, dsts in out.items():
            c = (pr[u] * 85) // (100 * len(dsts))
            for d in dsts:
                nxt[d] += c
        pr = nxt
    assert got == pr
    assert got[0] == max(got.values())        # hub dominates
    assert got[2] == got[3] == got[4] == 150_000  # pure sources at base
