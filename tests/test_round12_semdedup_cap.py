"""Round-12 pins: semdedup_prune per-cluster size cap (r11 verdict
item 4) + the cosine_pairs_lsh num_planes validation and min_planes
floor (r11 ADVICE / verdict item 3).

The cap's contract (operators/similarity.py::semdedup_prune):
  * clusters at/under ``max_cluster`` are untouched — when no cluster
    exceeds the cap the output is IDENTICAL to the uncapped form
    (this is what keeps the registered query's exhaustive DuckDB
    oracle exact at the tested SF);
  * oversized clusters are subdivided by a deterministic hyperplane
    sub-signature, so near-twins (same side of every plane) are still
    pruned, while pairs near a loose tau can straddle a sub-bucket
    boundary and drop — bounded work, documented recall trade.
"""

from __future__ import annotations

import os

import pytest

from defimap_data_pipelines_spark.operators.similarity import (
    _auto_planes,
    cosine_pairs_lsh,
    plane_weights,
    semdedup_prune,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(
        (r.vec_id, r.cluster, r.dup_of, round(r.cosine, 6))
        for r in df.collect()
    )


def test_cap_identity_when_no_cluster_exceeds_it(spark):
    """At the oracle SF the whole corpus (500 vectors) is below the
    registered cap (1024), so no cluster can exceed it under any
    skew — the capped form must be bit-identical to the uncapped
    one, the oracle-exactness precondition."""
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    base = _rows(semdedup_prune(emb))
    capped = _rows(semdedup_prune(emb, max_cluster=1024))
    assert base == capped
    assert len(base) > 0


def test_cap_keeps_exact_twins_in_oversized_cluster(spark):
    """Exact duplicates share the sign of EVERY hyperplane, so they
    land in the same sub-bucket no matter how hard the cap splits —
    every planted twin is still pruned with the right root."""
    dim = 16
    rows = []
    for i in range(20):
        v = [0.0] * dim
        v[i % dim] = float(i + 1)
        rows.append((i, v, 0))
        rows.append((100 + i, [x * 2 for x in v], 0))  # exact dup of i
    assigned = spark.createDataFrame(rows, ["vec_id", "e", "cluster"])
    out = {
        r.vec_id: r
        for r in semdedup_prune(
            assigned.select("vec_id", "e"),
            tau=0.999,
            vec_col="e",
            assigned=assigned,
            max_cluster=8,
            dim=dim,
        ).collect()
    }
    # every twin pruned against a same-direction root (one-hot
    # directions repeat every `dim` ids, so the root is the SMALLEST
    # same-bucket id on that axis, not necessarily i itself)
    for i in range(20):
        assert 100 + i in out, f"twin of {i} not pruned under cap"
        assert out[100 + i].dup_of % dim == i % dim
        assert abs(out[100 + i].cosine - 1.0) < 1e-6
    # schema unchanged — no internal sub-bucket column leaks
    cols = semdedup_prune(
        assigned.select("vec_id", "e"),
        vec_col="e",
        assigned=assigned,
        max_cluster=8,
        dim=dim,
    ).columns
    assert cols == ["vec_id", "cluster", "dup_of", "cosine"]


def test_cap_drops_cross_subbucket_boundary_pair(spark):
    """Engagement proof: a pair with cosine >= tau that straddles a
    sub-signature plane is pruned UNCAPPED but survives CAPPED — the
    documented recall trade at loose tau, and evidence the pair
    search really ran within (cluster, sub)."""
    dim = 16
    wide = 16
    # sub uses the LOW bits of the 16-plane bucket = the HIGHEST
    # numbered planes; with 32 members and cap 4, p = 3 bits ->
    # planes 13, 14, 15 decide the sub-bucket.
    w15 = plane_weights(0, 15, dim)
    # u orthogonal to w15 (pairwise swap trick), +/-1 entries
    u = []
    for j in range(0, dim, 2):
        u.extend([w15[j + 1], -w15[j]])
    assert sum(a * b for a, b in zip(u, w15)) == 0
    # preconditions: u must be OFF the other two deciding planes'
    # boundaries so only plane 15 separates the pair
    for p in (13, 14):
        wp = plane_weights(0, p, dim)
        assert sum(a * b for a, b in zip(u, wp)) != 0
    v1 = [a + 0.1 * b for a, b in zip(u, w15)]  # w15-side +
    v2 = [a - 0.1 * b for a, b in zip(u, w15)]  # w15-side -
    rows = [(1, v1, 0), (2, v2, 0)]
    for i in range(30):  # fillers to push the cluster over the cap
        f = [0.0] * dim
        f[i % dim] = float(i + 3)
        rows.append((10 + i, f, 0))
    assigned = spark.createDataFrame(rows, ["vec_id", "e", "cluster"])
    kw = dict(tau=0.9, vec_col="e", assigned=assigned, dim=dim)
    uncapped = _rows(
        semdedup_prune(assigned.select("vec_id", "e"), **kw)
    )
    capped = _rows(
        semdedup_prune(
            assigned.select("vec_id", "e"), max_cluster=4, **kw
        )
    )
    pair = [t for t in uncapped if t[0] == 2 and t[2] == 1]
    assert pair, "uncapped run must prune v2 against v1 (cosine ~0.98)"
    assert not any(
        t[0] == 2 and t[2] == 1 for t in capped
    ), "capped run must drop the cross-sub-bucket pair"
    # and the capped result is a subset of the uncapped one
    assert set(capped) <= set(uncapped)


def test_num_planes_rejects_non_auto_strings(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="num_planes"):
        cosine_pairs_lsh(emb, num_planes="Auto", dim=2)


def test_auto_planes_floor_parameter():
    # data-dependent branch above a lowered floor (the registered
    # embedding_neardup_auto setting: 1000 aug vectors, target 8)
    assert _auto_planes(1000, 8, floor=6) == 7
    # floor binds when the corpus is small
    assert _auto_planes(100, 64, floor=6) == 6
    # default floor is unchanged at 10
    assert _auto_planes(1000, 8) == 10
