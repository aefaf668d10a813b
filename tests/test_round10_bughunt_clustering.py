"""Round-10 bug hunt, clustering + ANN-recall family: pure-python
third implementations — two deterministic Lloyd rounds replayed as
the literal loop (first-8 init, grid-quantized centroid means,
left-fold distances), the BPE pair-count step via Counters, and the
LSH near-dup answer recomputed as the exhaustive cosine over the
planted-twin corpus (checking the blocking's recall, not just the
verify arithmetic).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

GRID = 1_000_000_000


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_kmeans_clusters_matches_lloyd_loop(spark, sf_dir):
    got = {r["cluster"]: r for r in QUERIES["kmeans_clusters"](spark, sf_dir).collect()}
    emb = _pq(sf_dir, "embeddings").sort_values("vec_id")
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(emb["vec_id"], emb["embedding"])
    }
    ids = sorted(vecs)
    centroids = {c: vecs[ids[c - 1]] for c in range(1, 9)}

    def dist(e, c):
        acc = 0.0
        for x, y in zip(e, c):  # the engine's sequential fold
            acc += (x - y) * (x - y)
        return round(acc, 9)

    def assign():
        out = {}
        for i, e in vecs.items():
            out[i] = min(
                (dist(e, c), k) for k, c in centroids.items()
            )
        return out

    for _ in range(2):
        assigned = assign()
        sums: dict = defaultdict(lambda: defaultdict(lambda: [0, 0]))
        for i, (_, k) in assigned.items():
            for pos, x in enumerate(vecs[i]):
                s = sums[k][pos]
                s[0] += _ha(x * GRID)
                s[1] += 1
        centroids = {
            k: [
                dims[pos][0] / GRID / dims[pos][1]
                for pos in sorted(dims)
            ]
            for k, dims in sums.items()
        }
        last = assigned

    agg: dict = defaultdict(lambda: [0, 0])
    for d, k in last.values():
        agg[k][0] += 1
        agg[k][1] += _ha(d * 1e6)
    assert set(got) == set(agg)
    for k, (n, iq) in agg.items():
        r = got[k]
        assert r["n"] == n, k
        assert r["inertia"] == pytest.approx(iq / 1e6, abs=1e-5), k


def test_bpe_merge_pairs_matches_counter(spark, sf_dir):
    import re

    got = [
        (r["pair"], r["n"])
        for r in QUERIES["bpe_merge_pairs"](spark, sf_dir).collect()
    ]
    d = _pq(sf_dir, "documents")
    counts: Counter = Counter()
    for t in d["text"]:
        norm = re.sub(r"\s+", " ", t.strip().lower())
        for w in norm.split(" "):
            if len(w) >= 2:
                counts.update(w[i : i + 2] for i in range(len(w) - 1))
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == expect


def test_embedding_neardup_matches_exhaustive_cosine(spark, sf_dir):
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in QUERIES["embedding_neardup_pairs"](spark, sf_dir).collect()
    }
    emb = _pq(sf_dir, "embeddings")
    vecs = {}
    for i, v in zip(emb["vec_id"], emb["embedding"]):
        e = [float(x) for x in v]
        vecs[int(i)] = e
        # the planted twin: dim i scaled by 1 + 0.002*(((id+i)%7)-3)
        vecs[int(i) + 1_000_000] = [
            x * (1.0 + 0.002 * (((int(i) + p) % 7) - 3.0))
            for p, x in enumerate(e)
        ]
    norms = {
        i: math.sqrt(sum(x * x for x in e)) for i, e in vecs.items()
    }
    ids = sorted(vecs)
    expect = {}
    for ai, a in enumerate(ids):
        ea, na = vecs[a], norms[a]
        for b in ids[ai + 1 :]:
            dot = sum(x * y for x, y in zip(ea, vecs[b]))
            cos = dot / (na * norms[b])
            if cos >= 0.98:
                expect[(a, b)] = cos
    assert set(got) == set(expect), (
        "LSH blocking missed or invented pairs vs exhaustive cosine"
    )
    for k, c in expect.items():
        assert got[k] == pytest.approx(c, abs=1e-5), k
