"""Round-10 bug hunt capstone, ANN family: pure-python third
implementations — hyperplane-LSH top-k with the md5 plane recipe
replayed through hashlib (bucket collisions, any-table OR, exact
re-rank), IVF probing with first-16 codebooks and (cos desc, id)
tie-breaks, SemDeDup within-cluster pruning on an independently
re-fit Lloyd assignment, and per-label centroid cosines from
truncated integer means.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

GRID = 1_000_000_000


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _vecs(sf_dir):
    emb = _pq(sf_dir, "embeddings").sort_values("vec_id")
    return {
        int(i): [float(x) for x in v]
        for i, v in zip(emb["vec_id"], emb["embedding"])
    }


def _fold_dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _norm(a):
    return math.sqrt(_fold_dot(a, a))


def _topk(sims, k=5):
    return sorted(sims, key=lambda t: (-t[1], t[0]))[:k]


def test_lsh_topk_matches_hashlib_planes(spark, sf_dir):
    got = defaultdict(list)
    for r in QUERIES["lsh_topk"](spark, sf_dir).collect():
        got[r["query_id"]].append((r["vec_id"], r["cosine"]))
    vecs = _vecs(sf_dir)
    planes = {
        (t, p): [
            1.0
            if hashlib.md5(f"{t}|{p}|{j}".encode()).digest()[0] & 1
            else -1.0
            for j in range(64)
        ]
        for t in range(8)
        for p in range(6)
    }

    def bucket(e, t):
        b = 0
        for p in range(6):
            if _fold_dot(e, planes[(t, p)]) >= 0:
                b += 1 << (5 - p)
        return b

    buckets = {
        i: [bucket(e, t) for t in range(8)] for i, e in vecs.items()
    }
    norms = {i: _norm(e) for i, e in vecs.items()}
    for qid in (i for i in vecs if i < 10):
        cands = [
            c
            for c in vecs
            if c != qid
            and any(
                buckets[c][t] == buckets[qid][t] for t in range(8)
            )
        ]
        sims = [
            (
                c,
                _fold_dot(vecs[qid], vecs[c]) / (norms[qid] * norms[c]),
            )
            for c in cands
        ]
        expect = _topk(sims)
        mine = sorted(got[qid], key=lambda t: (-t[1], t[0]))
        assert [i for i, _ in mine] == [i for i, _ in expect], qid
        for (_, g), (_, e) in zip(mine, expect):
            assert g == pytest.approx(e, abs=1e-5)


def test_ivf_topk_matches_probe_replay(spark, sf_dir):
    got = defaultdict(list)
    for r in QUERIES["ivf_topk"](spark, sf_dir).collect():
        got[r["query_id"]].append((r["vec_id"], r["cosine"]))
    vecs = _vecs(sf_dir)
    ids = sorted(vecs)
    cents = {c: vecs[ids[c - 1]] for c in range(1, 17)}
    cnorms = {c: _norm(e) for c, e in cents.items()}
    norms = {i: _norm(e) for i, e in vecs.items()}

    def entries(e, n):
        out = []
        for cid, c in cents.items():
            den = n * cnorms[cid]
            negcos = (
                -_fold_dot(e, c) / den if den > 0 else math.inf
            )
            out.append((negcos, cid))
        return out

    assign = {
        i: min(entries(e, norms[i]))[1] for i, e in vecs.items()
    }
    lists: dict = defaultdict(list)
    for i, cid in assign.items():
        lists[cid].append(i)
    for qid in (i for i in vecs if i < 10):
        probed = [
            cid
            for _, cid in sorted(entries(vecs[qid], norms[qid]))[:4]
        ]
        cands = [
            c
            for cid in probed
            for c in lists[cid]
            if c != qid
        ]
        sims = [
            (
                c,
                _fold_dot(vecs[qid], vecs[c]) / (norms[qid] * norms[c]),
            )
            for c in cands
        ]
        expect = _topk(sims)
        mine = sorted(got[qid], key=lambda t: (-t[1], t[0]))
        assert [i for i, _ in mine] == [i for i, _ in expect], qid
        for (_, g), (_, e) in zip(mine, expect):
            assert g == pytest.approx(e, abs=1e-5)


def _lloyd_2round_k8(vecs):
    ids = sorted(vecs)
    cents = {c: vecs[ids[c - 1]] for c in range(1, 9)}

    def dist(e, c):
        acc = 0.0
        for x, y in zip(e, c):
            acc += (x - y) * (x - y)
        return round(acc, 9)

    assigned = None
    for _ in range(2):
        assigned = {
            i: min((dist(e, c), k) for k, c in cents.items())[1]
            for i, e in vecs.items()
        }
        sums: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
        for i, k in assigned.items():
            for pos, x in enumerate(vecs[i]):
                s = sums[k][pos]
                s[0] += _ha(x * GRID)
                s[1] += 1
        new_cents = {
            k: [
                dims[pos][0] / GRID / dims[pos][1]
                for pos in sorted(dims)
            ]
            for k, dims in sums.items()
        }
        final_assigned = assigned
        cents = new_cents
    return final_assigned


def test_semdedup_prune_matches_cluster_local_pairs(spark, sf_dir):
    got = {
        r["vec_id"]: (r["cluster"], r["dup_of"], r["cosine"])
        for r in QUERIES["semdedup_prune"](spark, sf_dir).collect()
    }
    vecs = _vecs(sf_dir)
    assigned = _lloyd_2round_k8(vecs)
    norms = {i: _norm(e) for i, e in vecs.items()}
    clusters: dict = defaultdict(list)
    for i, k in assigned.items():
        clusters[k].append(i)
    expect = {}
    for k, members in clusters.items():
        members.sort()
        for bi, b in enumerate(members):
            best = None
            for a in members[:bi]:
                cos = _fold_dot(vecs[a], vecs[b]) / (
                    norms[a] * norms[b]
                )
                if round(cos, 9) >= 0.35 and (
                    best is None or a < best[0]
                ):
                    best = (a, cos)
            if best is not None:
                expect[b] = (k, best[0], best[1])
    assert set(got) == set(expect)
    for b, (k, a, cos) in expect.items():
        gk, ga, gc = got[b]
        assert (gk, ga) == (k, a), b
        assert gc == pytest.approx(cos, abs=1e-5), b


def test_centroid_similarity_matches_integer_means(spark, sf_dir):
    got = {
        (r["g_a"], r["g_b"]): r
        for r in QUERIES["centroid_similarity"](spark, sf_dir).collect()
    }
    emb = _pq(sf_dir, "embeddings")
    sums: dict = defaultdict(lambda: defaultdict(int))
    counts: dict = defaultdict(int)
    for lab, v in zip(emb["label"], emb["embedding"]):
        counts[lab] += 1
        for pos, x in enumerate(v):
            sums[lab][pos] += _ha(float(x) * 1_000_000)
    cents = {
        lab: [
            s // counts[lab] if s >= 0 else -((-s) // counts[lab])
            for _, s in sorted(dims.items())
        ]
        for lab, dims in sums.items()
    }
    labs = sorted(cents)
    for ai, a in enumerate(labs):
        for b in labs[ai + 1 :]:
            dot = sum(x * y for x, y in zip(cents[a], cents[b]))
            na = sum(x * x for x in cents[a])
            nb = sum(x * x for x in cents[b])
            r = got[(a, b)]
            assert (r["n_a"], r["n_b"]) == (counts[a], counts[b])
            if na > 0 and nb > 0:
                assert r["cosine"] == pytest.approx(
                    dot / math.sqrt(na) / math.sqrt(nb), abs=1e-8
                )
            else:
                assert r["cosine"] is None
