"""Round-9 bug hunt, graph family: independent pure-python references
computed straight from the sf0.001 parquet (pandas + dict/set graph
code — neither Spark nor DuckDB). The registered oracles replay the
same recurrences in unrolled SQL, so a formulation error mirrored
into both engines would pass parity; these third implementations
re-derive each algorithm from its published definition instead
(power iteration, BFS, Bellman-Ford, degree peeling, wedge closing).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _copurchase_edges(sf_dir):
    """Canonical (u < v) part co-purchase edges, distinct."""
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_partkey"]]
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = grp["l_partkey"].tolist()
        for i in range(len(ps)):
            for j in range(len(ps)):
                if ps[i] < ps[j]:
                    edges.add((int(ps[i]), int(ps[j])))
    return edges


def _repeat_copurchase_edges(sf_dir):
    """Support >= 2 co-purchase edges; multiplicity counts JOINED ROW
    pairs (a part appearing twice in one order contributes twice),
    mirroring the registry's a.join(b, "ok") before the HAVING."""
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_partkey"]]
    cnt = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = grp["l_partkey"].tolist()
        for i in range(len(ps)):
            for j in range(len(ps)):
                if ps[i] < ps[j]:
                    cnt[(int(ps[i]), int(ps[j]))] += 1
    return {p for p, c in cnt.items() if c >= 2}


def _purchase_graph(sf_dir):
    """Distinct customer<->supplier purchase edges, 'c{k}'/'s{k}'."""
    o = _pq(sf_dir, "orders")[["o_orderkey", "o_custkey"]]
    l = _pq(sf_dir, "lineitem")[["l_orderkey", "l_suppkey"]]
    m = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    return {
        (f"c{c}", f"s{s}")
        for c, s in zip(m["o_custkey"], m["l_suppkey"])
    }


def test_pagerank_top20_matches_python(spark, sf_dir):
    got = QUERIES["pagerank_top20"](spark, sf_dir).collect()
    e = _purchase_graph(sf_dir)
    sym = list(e) + [(v, u) for u, v in e]
    deg = Counter(u for u, _ in sym)
    nodes = {u for u, _ in sym} | {v for _, v in sym}
    n = len(nodes)
    scale = 1_000_000_000_000
    init = scale // n
    base = (3 * scale) // (20 * n)
    # power iteration with the documented integer quantization:
    # contribution floor((r * 17) / (20 * deg)), dangling mass dropped
    r = dict.fromkeys(nodes, init)
    for _ in range(3):
        inflow = defaultdict(int)
        for u, v in sym:
            inflow[v] += (r[u] * 17) // (20 * deg[u])
        r = {x: base + inflow.get(x, 0) for x in nodes}
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(row["node"], row["rank"]) for row in got] == top


def test_triangle_count_matches_python(spark, sf_dir):
    got = QUERIES["triangle_count"](spark, sf_dir).collect()
    edges = _copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = Counter()
    # enumerate each triangle u < v < w exactly once
    for u, v in edges:
        for w in adj[u] & adj[v]:
            if w > v:
                tri[u] += 1
                tri[v] += 1
                tri[w] += 1
    top = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(row["node"], row["triangles"]) for row in got] == top


def test_kcore_rounds_matches_python(spark, sf_dir):
    got = sorted(
        (row["round"], row["node"], row["deg"])
        for row in QUERIES["kcore_rounds"](spark, sf_dir).collect()
    )
    e = _copurchase_edges(sf_dir)
    sym = set(e) | {(v, u) for u, v in e}
    expect = []
    for rnd in range(1, 4):
        deg = Counter(u for u, _ in sym)
        kept = {u: d for u, d in deg.items() if d >= 80}
        expect.extend((rnd, u, d) for u, d in kept.items())
        sym = {(u, v) for u, v in sym if u in kept and v in kept}
    assert got == sorted(expect)
    assert got, "k=80 must bite at sf0.001 or the check is vacuous"


def test_khop_reach_matches_python(spark, sf_dir):
    got = sorted(
        (row["seed"], row["hop"], row["reach"])
        for row in QUERIES["khop_reach"](spark, sf_dir).collect()
    )
    e = _purchase_graph(sf_dir)
    adj = defaultdict(set)
    for u, v in e:
        adj[u].add(v)
        adj[v].add(u)
    custs = _pq(sf_dir, "customer")
    seeds = [
        f"c{k}"
        for k in custs.loc[custs["c_custkey"] <= 20, "c_custkey"]
    ]
    expect = []
    for s in seeds:
        visited = {s}
        frontier = {s}
        for h in range(1, 4):
            frontier = {
                v for u in frontier for v in adj[u]
            } - visited
            visited |= frontier
            reach = len(visited - {s})
            if reach:
                expect.append((s, h, reach))
    assert got == sorted(expect)
    assert got, "seeded customers with orders must exist at sf0.001"


def test_sssp_hops_matches_python(spark, sf_dir):
    got = [
        (row["node"], row["dist"])
        for row in QUERIES["sssp_hops"](spark, sf_dir).collect()
    ]
    o = _pq(sf_dir, "orders")[["o_orderkey", "o_custkey"]]
    l = _pq(sf_dir, "lineitem")[["l_orderkey", "l_suppkey", "l_quantity"]]
    m = o.merge(l, left_on="o_orderkey", right_on="l_orderkey")
    w = {}
    for c, s, q in zip(m["o_custkey"], m["l_suppkey"], m["l_quantity"]):
        key = (f"c{c}", f"s{s}")
        q = int(q)
        if key not in w or q < w[key]:
            w[key] = q
    edges = list(w.items()) + [
        ((v, u), q) for (u, v), q in w.items()
    ]
    # 4 synchronous Bellman-Ford relaxations from c1 (round k only
    # reads round k-1's distances)
    dist = {"c1": 0}
    for _ in range(4):
        nxt = dict(dist)
        for (u, v), q in edges:
            if u in dist:
                cand = dist[u] + q
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        dist = nxt
    expect = sorted(
        ((n, d) for n, d in dist.items()), key=lambda kv: (kv[1], kv[0])
    )[:50]
    assert got == expect


def test_local_clustering_matches_python(spark, sf_dir):
    got = QUERIES["local_clustering"](spark, sf_dir).collect()
    edges = _repeat_copurchase_edges(sf_dir)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = Counter()
    for u, v in edges:
        for z in adj[u] & adj[v]:
            if z > v:
                tri[u] += 1
                tri[v] += 1
                tri[z] += 1
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    expect = {
        n: (d, tri.get(n, 0), 2.0 * tri.get(n, 0) / (d * (d - 1)))
        for n, d in deg.items()
        if d >= 2
    }
    assert {row["node"] for row in got} == set(expect)
    for row in got:
        d, t, lcc = expect[row["node"]]
        assert row["degree"] == d
        assert row["triangles"] == t
        # engine rounds to 9dp; compare against the unrounded ref
        assert row["lcc"] == pytest.approx(lcc, abs=1e-9)
    assert any(t for _, t, _ in expect.values()), (
        "repeat co-purchase graph must contain triangles at sf0.001"
    )
