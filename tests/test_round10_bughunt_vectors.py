"""Round-10 bug hunt, vector + rolling-calendar family: pure-python
third implementations — per-vector fold statistics, int8 quantization
error, quantile normalization (explicit per-dim rank walk + truncating
rank means), trailing-7-day distinct actives, and ISO-week OHLC bars
recomputed from the collected raw series.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_vector_stats_matches_left_fold(spark, sf_dir):
    got = {r["vec_id"]: r for r in QUERIES["vector_stats"](spark, sf_dir).collect()}
    emb = _pq(sf_dir, "embeddings")
    for vid, vec in zip(emb["vec_id"], emb["embedding"]):
        e = [float(x) for x in vec]  # float32 -> double, exact
        sq = 0.0
        s = 0.0
        for x in e:  # the engine's sequential aggregate fold
            sq += x * x
            s += x
        mx = max(e)
        r = got[int(vid)]
        assert r["l2_norm"] == pytest.approx(math.sqrt(sq), abs=1e-6)
        assert r["max_val"] == pytest.approx(mx, abs=1e-6)
        assert r["argmax_pos"] == e.index(mx) + 1
        assert r["mean_val"] == pytest.approx(s / 64.0, abs=1e-6)


def test_embedding_quantize_matches_grid_error(spark, sf_dir):
    got = {r["label"]: r for r in QUERIES["embedding_quantize_int8"](spark, sf_dir).collect()}
    emb = _pq(sf_dir, "embeddings")
    agg: dict = defaultdict(lambda: [0, 0.0, 0])
    for lab, vec in zip(emb["label"], emb["embedding"]):
        e = [float(x) for x in vec]
        scale = max(abs(x) for x in e) / 127.0
        if scale <= 0:
            continue
        max_err = max(abs(x - _ha(x / scale) * scale) for x in e)
        a = agg[lab]
        a[0] += 1
        a[1] = max(a[1], max_err)
        a[2] += _ha(max_err * 1e9)
    assert set(got) == set(agg)
    for lab, (n, worst, qsum) in agg.items():
        r = got[lab]
        assert r["n_vecs"] == n
        assert r["worst_err"] == pytest.approx(worst, abs=1e-9)
        # third output column: mean err (name per query registration)
        mean_col = [
            c for c in r.asDict() if c not in ("label", "n_vecs", "worst_err")
        ][0]
        assert r[mean_col] == pytest.approx(qsum / 1e9 / n, abs=1e-9)


def test_quantile_normalize_matches_rank_means(spark, sf_dir):
    got = {
        (r["id"], r["dim"]): r["ref_q"]
        for r in QUERIES["quantile_normalize"](spark, sf_dir).collect()
    }
    emb = _pq(sf_dir, "embeddings")
    per_dim: dict = defaultdict(list)
    for vid, vec in zip(emb["vec_id"], emb["embedding"]):
        for d, x in enumerate(vec):
            per_dim[d].append((_ha(float(x) * 1e6), int(vid)))
    rank_of: dict = {}
    rank_sum: dict = defaultdict(lambda: [0, 0])
    for d, vals in per_dim.items():
        vals.sort()
        for rk, (q, vid) in enumerate(vals, start=1):
            rank_of[(vid, d)] = rk
            rs = rank_sum[rk]
            rs[0] += q
            rs[1] += 1
    ref = {
        rk: (s // n if s >= 0 else -((-s) // n))
        for rk, (s, n) in rank_sum.items()
    }
    expect = {
        (vid, d): ref[rk]
        for (vid, d), rk in rank_of.items()
        if vid < 20
    }
    assert got == expect


def test_rolling_active_users_matches_expansion(spark, sf_dir):
    got = {
        str(r["window_day"]): r["active_users_7d"]
        for r in QUERIES["rolling_active_users"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    act = {(int(u), ts.date()) for u, ts in zip(e["user_id"], e["ts"])}
    windows: dict = defaultdict(set)
    for u, d in act:
        for k in range(7):
            windows[d + pd.Timedelta(days=k).to_pytimedelta()].add(u)
    expect = {str(d): len(us) for d, us in windows.items()}
    assert got == expect


def test_weekly_ohlc_matches_pandas_rollup(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import (
        orders_raw_series,
    )

    raw = orders_raw_series(spark, sf_dir).select(
        "name", "date", "asset_price"
    ).collect()
    got = {
        (r["name"], str(r["week"])): r
        for r in QUERIES["resample_weekly_ohlc"](spark, sf_dir).collect()
    }
    groups: dict = defaultdict(list)
    for r in raw:
        monday = r["date"] - pd.Timedelta(days=r["date"].weekday()).to_pytimedelta()
        groups[(r["name"], str(monday))].append((r["date"], r["asset_price"]))
    assert set(got) == set(groups)
    for k, rows in groups.items():
        rows.sort()
        r = got[k]
        assert r["open"] == rows[0][1]
        assert r["close"] == rows[-1][1]
        assert r["high"] == max(p for _, p in rows)
        assert r["low"] == min(p for _, p in rows)
        assert r["n_days"] == len(rows)
