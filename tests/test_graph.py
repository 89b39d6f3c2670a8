"""Graph operator tests: integer-exact PageRank on graphs with
hand-computable answers, plus the invariants that make the operator
safe to trust at scale (mass conservation bound, determinism under
repartitioning, isolated-vertex handling)."""

import pytest
from pyspark.sql import functions as F

from hotdog_spark.operators import graph as g


def _pr(spark, vertex_ids, pairs, iters=3):
    verts = spark.createDataFrame([(v,) for v in vertex_ids], "id bigint")
    if pairs:
        p = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    else:
        p = spark.createDataFrame([], "id_a bigint, id_b bigint")
    edges = g.symmetrize_edges(p, "id_a", "id_b")
    rows = g.pagerank_integer(verts, edges, iters=iters).collect()
    return {r["id"]: (r["rank_scaled"], r["degree"]) for r in rows}


def _reference_pagerank(vertex_ids, pairs, iters=3):
    """Driver-side replay of the exact integer recurrence."""
    nbrs = {v: [] for v in vertex_ids}
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    n = len(vertex_ids)
    k = g.RANK_SCALE
    teleport = (15 * (k // n)) // 100
    r = {v: k // n for v in vertex_ids}
    for _ in range(iters):
        s = {v: 0 for v in vertex_ids}
        for u in vertex_ids:
            if nbrs[u]:
                c = r[u] // len(nbrs[u])
                for v in nbrs[u]:
                    s[v] += c
        r = {v: teleport + (85 * s[v]) // 100 for v in vertex_ids}
    return r


def test_pagerank_matches_reference_recurrence(spark):
    ids = list(range(1, 8))
    pairs = [(1, 2), (1, 3), (2, 3), (4, 5)]  # triangle, edge, isolated 6,7
    got = _pr(spark, ids, pairs)
    want = _reference_pagerank(ids, pairs)
    assert {v: rk for v, (rk, _) in got.items()} == want


def test_pagerank_isolated_vertices_hold_teleport_rank(spark):
    got = _pr(spark, [1, 2, 3, 4], [(1, 2)])
    k = g.RANK_SCALE
    teleport = (15 * (k // 4)) // 100
    assert got[3] == (teleport, 0)
    assert got[4] == (teleport, 0)
    # the connected pair exchange full (damped) mass with each other
    assert got[1][0] == got[2][0] > teleport
    assert got[1][1] == got[2][1] == 1


def test_pagerank_symmetric_graph_equal_ranks(spark):
    # a 4-cycle: all vertices are automorphic, ranks must be identical
    got = _pr(spark, [1, 2, 3, 4], [(1, 2), (2, 3), (3, 4), (1, 4)])
    ranks = {rk for rk, _ in got.values()}
    assert len(ranks) == 1
    degs = {d for _, d in got.values()}
    assert degs == {2}


def test_pagerank_mass_bounded_and_hub_wins(spark):
    # star: hub 1 connected to 2..6 — hub must outrank leaves
    ids = list(range(1, 7))
    pairs = [(1, v) for v in range(2, 7)]
    got = _pr(spark, ids, pairs)
    hub, leaves = got[1][0], [got[v][0] for v in range(2, 7)]
    assert all(hub > leaf for leaf in leaves)
    assert len(set(leaves)) == 1
    # floor divisions only ever LOSE mass: total never exceeds the scale
    assert sum(rk for rk, _ in got.values()) <= g.RANK_SCALE


def test_pagerank_invariant_under_repartitioning(spark):
    ids = list(range(100))
    pairs = [(i, (i * 7 + 3) % 100) for i in range(100) if i < (i * 7 + 3) % 100]
    verts = spark.createDataFrame([(v,) for v in ids], "id bigint")
    p = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    e1 = g.symmetrize_edges(p, "id_a", "id_b")
    r1 = {
        r["id"]: r["rank_scaled"]
        for r in g.pagerank_integer(verts, e1).collect()
    }
    r2 = {
        r["id"]: r["rank_scaled"]
        for r in g.pagerank_integer(
            verts.repartition(13), e1.repartition(7)
        ).collect()
    }
    assert r1 == r2


def test_pagerank_update_paths_and_copartition_identical(spark):
    # the fused union-aggregate update (edge_dsts_in_vertices=True, the
    # default both in-repo callers rely on), the join-based general
    # update, and the size-gated copartitioned edge layout must all
    # produce bit-identical ranks
    ids = list(range(60))
    pairs = [(i, (i * 11 + 5) % 60) for i in range(60) if i < (i * 11 + 5) % 60]
    verts = spark.createDataFrame([(v,) for v in ids], "id bigint")
    p = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    edges = g.symmetrize_edges(p, "id_a", "id_b")

    def run(**kw):
        return sorted(
            map(tuple, g.pagerank_integer(verts, edges, **kw).collect())
        )

    base = run()
    assert run(edge_dsts_in_vertices=False) == base
    assert run(copartition=True) == base
    assert run(edge_dsts_in_vertices=False, copartition=True) == base


def test_pagerank_join_update_drops_foreign_dsts(spark):
    # the general (edge_dsts_in_vertices=False) path must keep the old
    # semantics for edges pointing outside the vertex set: the foreign
    # dst's message is dropped, no phantom rank row appears, and the
    # src still pays out-degree for the dangling edge
    verts = spark.createDataFrame([(1,), (2,)], "id bigint")
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 99)], "src bigint, dst bigint"
    )
    rows = g.pagerank_integer(
        verts, edges, edge_dsts_in_vertices=False
    ).collect()
    got = {r["id"]: (r["rank_scaled"], r["degree"]) for r in rows}
    assert set(got) == {1, 2}
    assert got[1][1] == 2  # degree counts the dangling edge
    # vertex 2 receives only half of 1's mass (the other half leaks)
    assert got[2][0] < got[1][0]


def test_degree_distribution(spark):
    p = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5)], "id_a bigint, id_b bigint"
    )
    edges = g.symmetrize_edges(p, "id_a", "id_b")
    got = {
        r["degree"]: r["n_vertices"]
        for r in g.degree_distribution(edges).collect()
    }
    assert got == {2: 3, 1: 2}


def test_symmetrize_no_self_loops_no_dups(spark):
    p = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    edges = g.symmetrize_edges(p, "id_a", "id_b").collect()
    seen = {(r["src"], r["dst"]) for r in edges}
    assert len(edges) == len(seen) == 4
    assert all(s != d for s, d in seen)
