"""Unit fixtures for kcore and sssp_weighted (operators/graph.py).

Hand-computed graphs small enough to verify by eye:

  triangle {1,2,3} + pendant chain 3-4-5 + isolated edge 6-7
    2-core  = exactly the triangle (chain and isolated edge peel away;
              peeling must CASCADE: 5 dies first, then 4 — one round
              of degree filtering is not enough)
  weighted square 1-2-3-4 with a heavy direct edge
    shortest weighted path 1->3 must take the 2-hop light detour
"""

from __future__ import annotations

from gene_level_metadata_pipeline_spark.operators.graph import (
    kcore,
    sssp_weighted,
)


def _pairs(spark, rows, cols="u long, v long"):
    return spark.createDataFrame(rows, cols)


def test_kcore_cascading_peel(spark):
    g = _pairs(
        spark,
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (6, 7)],
    )
    out = {r["node"]: r["core_deg"] for r in kcore(g, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_kcore_whole_graph_survives_k1(spark):
    g = _pairs(spark, [(1, 2), (2, 3)])
    out = {r["node"]: r["core_deg"] for r in kcore(g, k=1).collect()}
    assert out == {1: 1, 2: 2, 3: 1}


def test_kcore_empty_result_and_self_loops(spark):
    # k=3 on a triangle (max degree 2) -> empty; self-loop ignored
    g = _pairs(spark, [(1, 2), (2, 3), (1, 3), (2, 2)])
    assert kcore(g, k=3).count() == 0


def test_kcore_duplicate_and_reversed_edges_collapse(spark):
    g = _pairs(spark, [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)])
    out = {r["node"]: r["core_deg"] for r in kcore(g, k=2).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_sssp_prefers_light_detour(spark):
    # 1-2 (w1), 2-3 (w1), 1-3 (w10): dist(3) = 2 via the detour
    g = _pairs(
        spark,
        [(1, 2, 1), (2, 3, 1), (1, 3, 10)],
        "u long, v long, w long",
    )
    seed = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in
           sssp_weighted(g, seed, max_hops=4).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_sssp_hop_bound_binds(spark):
    # path 1-2-3-4-5, unit weights: with max_hops=2 node 5 unreachable,
    # node 4 unreachable too (3 hops), node 3 = 2
    rows = [(1, 2, 1), (2, 3, 1), (3, 4, 1), (4, 5, 1)]
    g = _pairs(spark, rows, "u long, v long, w long")
    seed = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in
           sssp_weighted(g, seed, max_hops=2).collect()}
    assert out == {1: 0, 2: 1, 3: 2}


def test_sssp_early_exit_matches_full_run(spark):
    # diameter 2 < max_hops 6: early exit must return the same table
    g = _pairs(
        spark,
        [(1, 2, 5), (2, 3, 7), (1, 3, 20)],
        "u long, v long, w long",
    )
    seed = spark.createDataFrame([(1,)], "node long")
    a = sorted(map(tuple, sssp_weighted(g, seed, max_hops=2).collect()))
    b = sorted(map(tuple, sssp_weighted(g, seed, max_hops=6).collect()))
    assert a == b == [(1, 0), (2, 5), (3, 12)]


def test_sssp_directed_respects_orientation(spark):
    g = _pairs(spark, [(1, 2, 1), (3, 2, 1)], "u long, v long, w long")
    seed = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["dist"] for r in
           sssp_weighted(g, seed, max_hops=3, directed=True).collect()}
    assert out == {1: 0, 2: 1}  # 3 unreachable along direction


def test_hits_bipartite_hand_computed(spark):
    """Star bipartite graph: hub c1 points at both authorities, c2 at
    one. After one iteration: a(s1)=2M/2M=1M(max), a(s2)=1M*1M//2M=0.5M;
    h(c1)=1.5M -> 1M (max), h(c2)=1M*1M//1.5M=666666."""
    from gene_level_metadata_pipeline_spark.operators.graph import (
        hits_bipartite,
    )

    e = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "u long, v long"
    )
    out = {(r["side"], r["node"]): r["score"]
           for r in hits_bipartite(e, iterations=1).collect()}
    assert out[("authority", 10)] == 1_000_000
    assert out[("authority", 20)] == 500_000
    assert out[("hub", 1)] == 1_000_000
    assert out[("hub", 2)] == 666_666
