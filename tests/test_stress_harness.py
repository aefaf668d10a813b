"""Invariants of the scale-stress replication (tools/stress.py):
K× row counts, disjoint key spaces across copies, referential
integrity within a copy, zero cross-copy text similarity, and a real
registry query running unchanged on the replicated directory."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/tools")

import stress  # noqa: E402

from defimap_data_pipelines_spark.plans.queries import QUERIES  # noqa: E402


@pytest.fixture(scope="module")
def m2_dir(spark, sf_dir, tmp_path_factory):
    root = tmp_path_factory.mktemp("stress")
    old_base, old_root = stress.BASE_DIR, stress.STRESS_ROOT
    stress.BASE_DIR, stress.STRESS_ROOT = sf_dir, str(root)
    try:
        yield stress.generate(2)
    finally:
        stress.BASE_DIR, stress.STRESS_ROOT = old_base, old_root


def test_replication_invariants(m2_dir, sf_dir):
    for table, keys in stress.KEY_COLS.items():
        base = pd.read_parquet(f"{sf_dir}/{table}.parquet")
        rep = pd.read_parquet(f"{m2_dir}/{table}.parquet")
        assert len(rep) == 2 * len(base), table
        k = keys[0]
        lo = rep[rep[k] < stress.STRIDE]
        hi = rep[rep[k] >= stress.STRIDE]
        assert len(lo) == len(hi) == len(base), table
        # copy 0 is the base verbatim on its primary key
        assert sorted(lo[k]) == sorted(base[k]), table
        assert sorted(hi[k] - stress.STRIDE) == sorted(base[k]), table
    for table in stress.DIM_TABLES:
        base = pd.read_parquet(f"{sf_dir}/{table}.parquet")
        rep = pd.read_parquet(f"{m2_dir}/{table}.parquet")
        assert len(rep) == len(base), table


def test_referential_integrity_within_copies(m2_dir):
    o = pd.read_parquet(f"{m2_dir}/orders.parquet")
    c = pd.read_parquet(f"{m2_dir}/customer.parquet")
    li = pd.read_parquet(f"{m2_dir}/lineitem.parquet")
    assert set(o["o_custkey"]) <= set(c["c_custkey"])
    assert set(li["l_orderkey"]) <= set(o["o_orderkey"])
    # no edge crosses the copy boundary
    side = li["l_orderkey"] >= stress.STRIDE
    assert (li.loc[side, "l_partkey"] >= stress.STRIDE).all()
    assert (li.loc[~side, "l_suppkey"] < stress.STRIDE).all()


def test_cross_copy_text_is_disjoint(m2_dir):
    d = pd.read_parquet(f"{m2_dir}/documents.parquet")
    lo = d[d["doc_id"] < stress.STRIDE]
    hi = d[d["doc_id"] >= stress.STRIDE]
    tok_lo = {t for txt in lo["text"] for t in txt.split(" ")}
    tok_hi = {t for txt in hi["text"] for t in txt.split(" ")}
    assert not tok_lo & tok_hi, "copy suffix must make shingles disjoint"
    assert (d["n_chars"] == d["text"].str.len()).all()


def test_registry_query_runs_on_replica(spark, m2_dir, sf_dir):
    base = {
        r["l_returnflag"]: r
        for r in QUERIES["q1_pricing_summary"](spark, sf_dir).collect()
    }
    rep = {
        r["l_returnflag"]: r
        for r in QUERIES["q1_pricing_summary"](spark, m2_dir).collect()
    }
    assert set(rep) == set(base)
    for flag, r in rep.items():
        # doubled volume, identical distribution
        assert r["count_order"] == 2 * base[flag]["count_order"]
        assert r["avg_qty"] == pytest.approx(base[flag]["avg_qty"], rel=1e-9)


def test_embedding_copies_are_sign_masked(m2_dir):
    """v2 recipe: copy i>0 embeddings are the base times a per-copy
    ±1 mask — an orthogonal transform, so |components| and every
    within-copy distance are exactly preserved while aligned
    cross-copy vectors are no longer identical (constant dup density,
    the embedding analogue of the \\x01 text suffix)."""
    import numpy as np

    e = pd.read_parquet(f"{m2_dir}/embeddings.parquet")
    lo = e[e["vec_id"] < stress.STRIDE].set_index("vec_id")
    hi = e[e["vec_id"] >= stress.STRIDE].copy()
    hi["orig"] = hi["vec_id"] - stress.STRIDE
    hi = hi.set_index("orig")
    ids = sorted(lo.index)[:20]
    mask = None
    for vid in ids:
        a = np.asarray(lo.loc[vid, "embedding"], dtype=np.float64)
        b = np.asarray(hi.loc[vid, "embedding"], dtype=np.float64)
        assert np.array_equal(np.abs(a), np.abs(b)), vid
        nz = np.abs(a) > 0
        m = np.sign(b[nz]) * np.sign(a[nz])
        if mask is None and nz.all():
            mask = m
        elif nz.all():
            assert np.array_equal(m, mask), "mask must be per-copy, not per-row"
    assert mask is not None and (mask == -1).any(), "some dims must flip"
    # within-copy geometry preserved exactly: same pairwise distance
    a0 = np.asarray(lo.loc[ids[0], "embedding"], dtype=np.float64)
    a1 = np.asarray(lo.loc[ids[1], "embedding"], dtype=np.float64)
    b0 = np.asarray(hi.loc[ids[0], "embedding"], dtype=np.float64)
    b1 = np.asarray(hi.loc[ids[1], "embedding"], dtype=np.float64)
    assert np.dot(a0 - a1, a0 - a1) == pytest.approx(
        np.dot(b0 - b1, b0 - b1), rel=1e-12
    )


def test_stale_recipe_marker_triggers_regeneration(m2_dir):
    """A replica stamped with an older recipe regenerates instead of
    being silently reused (the run()-path bug found in r11: checking
    only the marker's existence reused the pre-v2 replica)."""
    import os

    marker = os.path.join(m2_dir, "_DONE")
    with open(marker, "w") as f:
        f.write("ok\n")  # the pre-v2 stamp
    out = stress.generate(2)
    assert out == m2_dir
    with open(marker) as f:
        assert f.read().strip() == stress.RECIPE


def test_replicate_empty_embeddings_guard(spark, tmp_path):
    """r11 ADVICE: _replicate on an EMPTY embeddings table must raise
    a clear ValueError when a sign mask is needed (mult > 1, not
    keep_text) — not a TypeError on first()[0] — and must not touch
    first() at all when no mask will be applied (mult == 1)."""
    import os

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>"
    )
    empty.write.parquet(os.path.join(str(tmp_path), "embeddings.parquet"))
    old_base = stress.BASE_DIR
    stress.BASE_DIR = str(tmp_path)
    try:
        with pytest.raises(ValueError, match="embeddings table is empty"):
            stress._replicate(spark, "embeddings", 2, keep_text=False)
        # no mask path -> no dims probe -> empty frame passes through
        assert stress._replicate(
            spark, "embeddings", 1, keep_text=False
        ).count() == 0
        assert stress._replicate(
            spark, "embeddings", 2, keep_text=True
        ).count() == 0
    finally:
        stress.BASE_DIR = old_base
