"""Closed-form fixtures for the second graph wave: triangle counting,
fixed-round k-core pruning, and multi-source BFS reach
(operators/graph.py). The registered queries (triangle_count,
kcore_rounds, khop_reach) are covered end-to-end by the auto-
parametrized oracle parity suite; these tests pin the operator
semantics on graphs small enough to verify by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.graph import (
    kcore_decompose,
    khop_reach,
    triangle_count,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _sym(spark, pairs):
    e = _edges(spark, pairs).select(
        F.col("src").alias("u"), F.col("dst").alias("v")
    )
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def test_triangle_count_k4_and_pendant(spark):
    # K4 on {1,2,3,4}: 4 triangles, each node in exactly 3.
    # Pendant 5-1 adds no triangle and node 5 must not appear.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = triangle_count(_edges(spark, k4 + [(5, 1)]))
    got = {r["node"]: r["triangles"] for r in out.collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_count_triangle_free_graph_is_empty(spark):
    # a path and a 4-cycle: both triangle-free
    path = [(1, 2), (2, 3), (3, 4)]
    c4 = [(10, 11), (11, 12), (12, 13), (13, 10)]
    assert triangle_count(_edges(spark, path + c4)).count() == 0


def test_triangle_count_input_canonicalization(spark):
    # duplicate edges, reversed duplicates, and self-loops must not
    # inflate counts: still one triangle on {1,2,3}
    messy = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (2, 2)]
    out = triangle_count(_edges(spark, messy))
    got = {r["node"]: r["triangles"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_count_two_triangles_sharing_an_edge(spark):
    # {1,2,3} and {2,3,4} share edge (2,3): nodes 2,3 sit in two
    # triangles each — the case a naive "count at lowest node id"
    # enumeration double- or under-counts if orientation is wrong
    e = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    out = triangle_count(_edges(spark, e))
    got = {r["node"]: r["triangles"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_kcore_chain_erodes_one_node_per_round(spark):
    # K4 core {1,2,3,4} with tail 4-5, 5-6, 6-7 at k=2: the tail end
    # erodes exactly one node per round — the cascade the fixed-round
    # profile is designed to expose — while the clique holds its
    # degrees (node 4 drops from 4 to 3 once the tail detaches).
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tail = [(4, 5), (5, 6), (6, 7)]
    out = kcore_decompose(_sym(spark, k4 + tail), k=2, rounds=3, src="u", dst="v")
    rounds = {
        i: {r["node"]: r["deg"] for r in out.filter(F.col("round") == i).collect()}
        for i in (1, 2, 3)
    }
    # round 1: only leaf 7 (deg 1) fails
    assert rounds[1] == {1: 3, 2: 3, 3: 3, 4: 4, 5: 2, 6: 2}
    # round 2: 6 lost its leaf -> deg 1 -> gone
    assert rounds[2] == {1: 3, 2: 3, 3: 3, 4: 4, 5: 2}
    # round 3: 5 now dangles (6 removed) -> gone; edge 4-5 is still
    # present THIS round (5 only fails now), so 4 keeps deg 4 — it
    # would drop to clique degree in a 4th round
    assert rounds[3] == {1: 3, 2: 3, 3: 3, 4: 4}


def test_kcore_clique_is_a_fixpoint(spark):
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    out = kcore_decompose(_sym(spark, k4), k=3, rounds=3, src="u", dst="v")
    assert out.count() == 12  # 4 nodes x 3 rounds, all deg 3
    assert out.filter(F.col("deg") != 3).count() == 0


def test_khop_reach_path_graph(spark):
    # path 1-2-3-4-5, seed 1: reach grows by one node per hop
    sym = _sym(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "seed long")
    got = {
        r["hop"]: r["reach"] for r in khop_reach(sym, seeds, hops=3).collect()
    }
    assert got == {1: 1, 2: 2, 3: 3}


def test_khop_reach_multi_seed_and_saturation(spark):
    # star center 0 with spokes 1..5: center saturates at hop 1;
    # a spoke sees the center at hop 1, everything at hop 2, and the
    # count must NOT grow at hop 3 (ball saturated, frontier empty)
    star = [(0, i) for i in range(1, 6)]
    sym = _sym(spark, star)
    seeds = spark.createDataFrame([(0,), (1,)], "seed long")
    rows = khop_reach(sym, seeds, hops=3).collect()
    got = {(r["seed"], r["hop"]): r["reach"] for r in rows}
    assert got == {
        (0, 1): 5, (0, 2): 5, (0, 3): 5,
        (1, 1): 1, (1, 2): 5, (1, 3): 5,
    }


def test_khop_reach_isolated_seed_absent(spark):
    sym = _sym(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,), (99,)], "seed long")
    rows = khop_reach(sym, seeds, hops=2).collect()
    assert {r["seed"] for r in rows} == {1}
