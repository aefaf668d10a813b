"""Round-11 bug hunt, clustering + graph + embedding-dedup family:
pure-python third implementations from the sf0.001 parquet (r10
verdict task 5 — the families still lacking one):

- kmeans_clusters: both Lloyd rounds replayed with explicit
  HALF_UP decimal rounding on the 1e-9 distance grid and quantized
  centroid sums (the determinism contract in operators/clustering.py).
- grouped_kmeans: the per-label k=4 fit replayed the same way.
- embedding_neardup_pairs: the LSH-blocked production path checked
  against an EXHAUSTIVE python cosine over the augmented corpus —
  full-recall verification independent of both Spark and DuckDB.
- incremental_cc: the split-graph incremental labeling checked
  against a from-scratch python union-find over the FULL co-purchase
  graph with min-id component naming.
"""

from __future__ import annotations

import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _sround(x: float, scale: int) -> float:
    """Spark's ROUND on doubles: BigDecimal(shortest-repr string)
    .setScale(scale, HALF_UP) — repr(float) is the same shortest
    round-trip string Double.toString produces."""
    q = Decimal(1).scaleb(-scale)
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))


def _vecs(sf_dir) -> dict[int, list[float]]:
    e = _pq(sf_dir, "embeddings")
    return {
        int(i): [float(x) for x in v]  # float32 -> float64, exact
        for i, v in zip(e["vec_id"], e["embedding"])
    }


def _sq_dist(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):  # same left-fold order as the SQL aggregate
        acc += (x - y) * (x - y)
    return acc


def _lloyd_round(
    vecs: dict[int, list[float]], cents: dict[int, list[float]]
) -> dict[int, tuple[int, float]]:
    """assign step: id -> (cluster, dist) with the 1e-9 grid +
    cluster-id tiebreak."""
    out = {}
    for vid, e in vecs.items():
        best = min(
            (_sround(_sq_dist(e, c), 9), k) for k, c in cents.items()
        )
        out[vid] = (best[1], best[0])
    return out


def _update_centroids(
    vecs: dict[int, list[float]],
    assigned: dict[int, tuple[int, float]],
    dims: int,
) -> dict[int, list[float]]:
    """update step: per (cluster, dim) exact quantized integer sums,
    then sum/1e9/count in the same double-division order."""
    sums: dict[int, list[int]] = defaultdict(lambda: [0] * dims)
    counts: dict[int, int] = defaultdict(int)
    for vid, (k, _) in assigned.items():
        counts[k] += 1
        for pos, val in enumerate(vecs[vid]):
            sums[k][pos] += int(_sround(val * 1e9, 0))
    return {
        k: [s / 1e9 / counts[k] for s in sums[k]] for k in sums
    }


def _inertia(dists: list[float]) -> float:
    return sum(int(_sround(d * 1e6, 0)) for d in dists) / 1e6


def test_kmeans_clusters_matches_python_lloyd(spark, sf_dir):
    vecs = _vecs(sf_dir)
    dims = len(next(iter(vecs.values())))
    seeds = sorted(vecs)[:8]
    cents = {i + 1: vecs[vid] for i, vid in enumerate(seeds)}
    assigned = _lloyd_round(vecs, cents)           # iter 1
    cents = _update_centroids(vecs, assigned, dims)
    assigned = _lloyd_round(vecs, cents)           # iter 2 (returned)
    per_cluster: dict[int, list[float]] = defaultdict(list)
    for _, (k, d) in assigned.items():
        per_cluster[k].append(d)
    expect = {
        k: (len(ds), _inertia(ds)) for k, ds in per_cluster.items()
    }
    rows = QUERIES["kmeans_clusters"](spark, sf_dir).collect()
    got = {r["cluster"]: (r["n"], r["inertia"]) for r in rows}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k][0] == expect[k][0], f"cluster {k} size"
        assert got[k][1] == pytest.approx(expect[k][1], abs=5e-6), (
            f"cluster {k} inertia"
        )


def test_grouped_kmeans_matches_python_lloyd(spark, sf_dir):
    e = _pq(sf_dir, "embeddings")
    by_label: dict[str, dict[int, list[float]]] = defaultdict(dict)
    for i, v, lab in zip(e["vec_id"], e["embedding"], e["label"]):
        by_label[lab][int(i)] = [float(x) for x in v]
    expect: dict[tuple[str, int], tuple[int, float]] = {}
    for lab, vecs in by_label.items():
        dims = len(next(iter(vecs.values())))
        seeds = sorted(vecs)[:4]
        cents = {i + 1: vecs[vid] for i, vid in enumerate(seeds)}
        assigned = _lloyd_round(vecs, cents)       # the single iter
        cents = _update_centroids(vecs, assigned, dims)
        final = _lloyd_round(vecs, cents)          # final assign
        per_cluster: dict[int, list[float]] = defaultdict(list)
        for _, (k, d) in final.items():
            per_cluster[k].append(d)
        for k, ds in per_cluster.items():
            expect[(lab, k)] = (len(ds), _inertia(ds))
    rows = QUERIES["grouped_kmeans"](spark, sf_dir).collect()
    got = {
        (r["label"], r["cluster"]): (r["n"], r["inertia"]) for r in rows
    }
    assert set(got) == set(expect)
    for key in expect:
        assert got[key][0] == expect[key][0], f"{key} size"
        assert got[key][1] == pytest.approx(expect[key][1], abs=5e-6), (
            f"{key} inertia"
        )


def test_embedding_neardup_lsh_has_full_recall_vs_exhaustive(
    spark, sf_dir
):
    """The production path blocks candidates with OR-amplified
    hyperplane LSH; this exhaustive python pass is blind to the
    blocking — any planted pair the buckets missed shows up here."""
    base = _vecs(sf_dir)
    aug = dict(base)
    for vid, e in base.items():
        aug[vid + 1_000_000] = [
            x * (1.0 + 0.002 * (((vid + i) % 7) - 3.0))
            for i, x in enumerate(e)
        ]
    norms = {i: math.sqrt(sum(x * x for x in v)) for i, v in aug.items()}
    ids = sorted(aug)
    expect = {}
    for ai, a in enumerate(ids):
        va, na = aug[a], norms[a]
        for b in ids[ai + 1 :]:
            cos = sum(x * y for x, y in zip(va, aug[b])) / (na * norms[b])
            if cos >= 0.98:
                expect[(a, b)] = cos
    rows = QUERIES["embedding_neardup_pairs"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in rows}
    assert set(got) == set(expect)
    assert len(got) >= len(base)  # every base vec has a planted twin
    for k, cos in expect.items():
        assert got[k] == pytest.approx(cos, abs=1e-6)


def test_incremental_cc_matches_python_union_find(spark, sf_dir):
    li = _pq(sf_dir, "lineitem")
    by_order: dict[int, set[int]] = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        by_order[int(ok)].add(int(pk))
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for parts in by_order.values():
        ps = sorted(parts)
        if len(ps) < 2:
            continue  # single-part orders contribute no edge
        for p in ps:
            parent.setdefault(p, p)
        for p in ps[1:]:
            ra, rb = find(ps[0]), find(p)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    members: dict[int, list[int]] = defaultdict(list)
    for n in parent:
        members[find(n)].append(n)
    expect = {n: min(ms) for ms in members.values() for n in ms}
    rows = QUERIES["incremental_cc"](spark, sf_dir).collect()
    got = {r["node"]: r["component"] for r in rows}
    assert got == expect


def test_ivf_topk_trained_matches_python_probe(spark, sf_dir):
    """The full trained-IVF path replayed: one Lloyd round (the same
    HALF_UP helpers as the kmeans replay), nearest-list assignment
    with the (-cosine, centroid_id) struct order, 4-list probing for
    the sub-10 query ids, exact cosine within probed lists, top-5 by
    (cosine desc, vec_id)."""
    vecs = _vecs(sf_dir)
    dims = len(next(iter(vecs.values())))
    seeds = sorted(vecs)[:8]
    init = {i + 1: vecs[vid] for i, vid in enumerate(seeds)}
    assigned = _lloyd_round(vecs, init)
    trained = _update_centroids(vecs, assigned, dims)

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    norms = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    cnorms = {k: math.sqrt(fold_dot(c, c)) for k, c in trained.items()}

    def entries(v, n):
        return sorted(
            (-fold_dot(v, c) / (n * cnorms[k]), k)
            for k, c in trained.items()
        )

    lists = {}
    for vid, v in vecs.items():
        lists.setdefault(entries(v, norms[vid])[0][1], []).append(vid)
    expect = {}
    for qid in (i for i in vecs if i < 10):
        probed = [k for _, k in entries(vecs[qid], norms[qid])[:4]]
        cand = [
            (
                fold_dot(vecs[qid], vecs[c])
                / (norms[qid] * norms[c]),
                c,
            )
            for k in probed
            for c in lists.get(k, [])
            if c != qid
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for cos, c in cand[:5]:
            expect[(qid, c)] = cos
    rows = QUERIES["ivf_topk_trained"](spark, sf_dir).collect()
    got = {(r["query_id"], r["vec_id"]): r["cosine"] for r in rows}
    assert set(got) == set(expect)
    for k, cos in expect.items():
        assert got[k] == pytest.approx(cos, abs=1e-6)
