"""Round-10 bug hunt, experiment-analysis family: pure-python third
implementations from the sf0.001 parquet — difference-in-differences
cell means, CUPED (Deng et al.) with an independently derived pooled
theta, the delta-method ratio SE, and lead-lag cross-correlation via
per-lag explicit joins.
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


def test_did_estimator_matches_cell_means(spark, sf_dir):
    row = QUERIES["did_estimator"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")
    cut = pd.Timestamp("2024-01-16")
    n = defaultdict(int)
    s = defaultdict(int)
    for u, ts, v in zip(e["user_id"], e["ts"], e["value"]):
        cell = (1 if u % 2 == 1 else 0, 1 if ts >= cut else 0)
        n[cell] += 1
        s[cell] += _ha(v * 100)
    assert (
        row["n_ctrl_pre"],
        row["n_ctrl_post"],
        row["n_treat_pre"],
        row["n_treat_post"],
    ) == (n[(0, 0)], n[(0, 1)], n[(1, 0)], n[(1, 1)])
    mean = {c: s[c] / (n[c] * 100.0) for c in n if n[c]}
    assert row["mean_ctrl_pre"] == pytest.approx(mean[(0, 0)], abs=1e-9)
    assert row["mean_treat_post"] == pytest.approx(mean[(1, 1)], abs=1e-9)
    did = (mean[(1, 1)] - mean[(1, 0)]) - (mean[(0, 1)] - mean[(0, 0)])
    assert row["did"] == pytest.approx(did, abs=1e-8)


def test_cuped_adjustment_matches_deng(spark, sf_dir):
    got = {r["variant"]: r for r in QUERIES["cuped_adjustment"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    cut = pd.Timestamp("2024-01-16")
    per: dict = defaultdict(lambda: [0, 0])  # (u, variant) -> [x, y]
    for u, ts, v in zip(e["user_id"], e["ts"], e["value"]):
        variant = 1 if u % 2 == 1 else 0
        vq = _ha(v * 100)
        acc = per[(u, variant)]
        if ts >= cut:
            acc[1] += vq
        else:
            acc[0] += vq
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,sx,sy,sxy,sxx,syy
    for (u, variant), (x, y) in per.items():
        m = mom[variant]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
        m[5] += y * y
    pn, psx, psy, psxy, psxx, psyy = (
        sum(m[i] for m in mom.values()) for i in range(6)
    )
    cov = float(psxy) * pn - float(psx) * psy
    varx = float(psxx) * pn - float(psx) * psx
    vary = float(psyy) * pn - float(psy) * psy
    theta = cov / varx if varx > 0 else None
    mean_all_x = psx / (pn * 100.0)
    for variant, (nv, sx, sy, *_rest) in mom.items():
        r = got[variant]
        assert r["n_units"] == nv
        mean_x = sx / (nv * 100.0)
        mean_y = sy / (nv * 100.0)
        assert r["mean_x"] == pytest.approx(mean_x, abs=1e-9)
        assert r["mean_y"] == pytest.approx(mean_y, abs=1e-9)
        assert r["theta"] == pytest.approx(theta, abs=1e-8)
        assert r["adj_mean_y"] == pytest.approx(
            mean_y - theta * (mean_x - mean_all_x), abs=1e-8
        )
        if varx * vary > 0:
            assert r["rho2"] == pytest.approx(
                cov * cov / (varx * vary), abs=1e-8
            )
        else:
            assert r["rho2"] is None


def test_ratio_metric_delta_matches_deng_se(spark, sf_dir):
    got = {r["variant"]: r for r in QUERIES["ratio_metric_delta"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    per: dict = defaultdict(lambda: [0, 0])  # user -> [x cents, y rows]
    for u, t_, v in zip(e["user_id"], e["event_type"], e["value"]):
        acc = per[u]
        if t_ == "purchase":
            acc[0] += _ha(v * 100)
        acc[1] += 1
    mom = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for u, (x, y) in per.items():
        m = mom["treatment" if u % 2 == 1 else "control"]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * x
        m[4] += y * y
        m[5] += x * y
    for variant, (n, sx, sy, sxx, syy, sxy) in mom.items():
        r = got[variant]
        assert r["n_units"] == n
        ratio = sx / sy
        assert r["ratio"] == pytest.approx(ratio, abs=1e-9)
        vx = (n * float(sxx) - float(sx) * sx) / (n * (n - 1))
        vy = (n * float(syy) - float(sy) * sy) / (n * (n - 1))
        vxy = (n * float(sxy) - float(sx) * sy) / (n * (n - 1))
        ybar = sy / n
        var_r = (vx - 2 * ratio * vxy + ratio * ratio * vy) / n / (
            ybar * ybar
        )
        if var_r >= 0:
            assert r["se"] == pytest.approx(math.sqrt(var_r), abs=1e-8)
        else:
            assert r["se"] is None


def test_leadlag_xcorr_matches_per_lag_pearson(spark, sf_dir):
    got = {r["lag"]: r for r in QUERIES["leadlag_xcorr"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    epoch = pd.Timestamp("2024-01-01")
    daily: dict = defaultdict(lambda: defaultdict(int))
    for g, ts, v in zip(e["event_type"], e["ts"], e["value"]):
        daily[g][(ts.normalize() - epoch).days] += _ha(v * 100)
    x, y = daily["click"], daily["purchase"]
    for lag in range(-5, 6):
        pts = [
            (x[d], y[d + lag]) for d in x if (d + lag) in y
        ]
        n = len(pts)
        r = got[lag]
        assert r["n_days"] == n
        sx = sum(a for a, _ in pts)
        sy = sum(b for _, b in pts)
        sxy = sum(a * b for a, b in pts)
        sxx = sum(a * a for a, _ in pts)
        syy = sum(b * b for _, b in pts)
        cov = n * float(sxy) - float(sx) * sy
        vx = n * float(sxx) - float(sx) * sx
        vy = n * float(syy) - float(sy) * sy
        if vx * vy > 0:
            assert r["xcorr"] == pytest.approx(
                cov / math.sqrt(vx * vy), abs=1e-8
            )
        else:
            assert r["xcorr"] is None
