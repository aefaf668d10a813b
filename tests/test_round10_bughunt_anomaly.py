"""Round-10 bug hunt, anomaly/drift + feature-engineering family:
pure-python third implementations from the sf0.001 parquet —
day-of-week seasonal residual z-scores, the exact two-sample KS sup
via a sorted walk, smoothed target encoding with truncated integer
divisions, signed feature hashing via hashlib md5, and the EWMA
integer recursion replayed as the literal per-user loop.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_seasonal_anomalies_matches_decomposition(spark, sf_dir):
    got = {
        str(r["day"]): r
        for r in QUERIES["seasonal_anomalies"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    daily: dict = defaultdict(int)
    for ts, v in zip(e["ts"], e["value"]):
        daily[ts.date()] += _ha(v * 100)
    dows = {d: d.isoweekday() for d in daily}
    per_dow: dict = defaultdict(lambda: [0, 0])
    for d, xq in daily.items():
        acc = per_dow[dows[d]]
        acc[0] += 1
        acc[1] += xq
    resid = {
        d: _ha((xq - per_dow[dows[d]][1] / per_dow[dows[d]][0]) * 1000)
        for d, xq in daily.items()
    }
    m = len(resid)
    sr = sum(resid.values())
    srr = sum(r * r for r in resid.values())
    mean_r = sr / m
    var_r = (srr - float(sr) * sr / m) / (m - 1)
    assert set(got) == {str(d) for d in daily}
    for d, xq in daily.items():
        r = got[str(d)]
        assert (r["dow"], r["xq"], r["resid_u"]) == (
            dows[d],
            xq,
            resid[d],
        )
        if var_r > 0:
            assert r["z"] == pytest.approx(
                (resid[d] - mean_r) / math.sqrt(var_r), abs=1e-8
            )
        else:
            assert r["z"] is None


def test_ks_drift_matches_sorted_walk(spark, sf_dir):
    row = QUERIES["ks_drift"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")
    e = e[e["event_type"].isin(["click", "purchase"])]
    pooled = sorted(
        zip(e["value"], e["event_id"], e["event_type"]),
        key=lambda t: (t[0], t[1]),
    )
    na = sum(1 for *_ , t in pooled if t == "click")
    nb = len(pooled) - na
    ca = cb = 0
    best_d, best_v = -1, None
    # a_end/b_end at the END of each distinct-value block
    for i, (v, _, t) in enumerate(pooled):
        ca += t == "click"
        cb += t == "purchase"
        is_end = i + 1 == len(pooled) or pooled[i + 1][0] != v
        if is_end:
            d = abs(ca * nb - cb * na)
            if d > best_d or (d == best_d and v < best_v):
                best_d, best_v = d, v
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["ks_stat"] == pytest.approx(
        best_d / (na * nb), abs=1e-6
    )


def test_target_encoding_matches_truncated_divs(spark, sf_dir):
    got = {
        r["category"]: r
        for r in QUERIES["target_encoding"](spark, sf_dir).collect()
    }
    o = _pq(sf_dir, "orders")
    c = _pq(sf_dir, "customer").set_index("c_custkey")["c_nationkey"]
    per: dict = defaultdict(lambda: [0, 0])
    ss = nn = 0
    for cust, price in zip(o["o_custkey"], o["o_totalprice"]):
        tq = _ha(price * 100)
        nat = int(c[cust])
        per[nat][0] += 1
        per[nat][1] += tq
        nn += 1
        ss += tq
    gm4 = ss * 10000 // nn  # all-positive: trunc == floor
    assert set(got) == set(per)
    for nat, (n, sc) in per.items():
        r = got[nat]
        assert r["n"] == n
        raw4 = sc * 10000 // n
        enc4 = (sc * 10000 + 100 * gm4) // (n + 100)
        assert r["raw_mean"] == pytest.approx(
            raw4 / (10000.0 * 100), abs=1e-12
        )
        assert r["encoded"] == pytest.approx(
            enc4 / (10000.0 * 100), abs=1e-12
        )


def test_feature_hashing_matches_hashlib(spark, sf_dir):
    import re

    got = {
        (r["id"], r["bucket"]): r["weight"]
        for r in QUERIES["feature_hashing"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    acc: dict = defaultdict(int)
    for i, txt in zip(d["doc_id"], d["text"]):
        t = re.sub(r"\s+", " ", txt.strip().lower())
        for tok in (t.split(" ") if t else [""]):
            h = hashlib.md5(tok.encode()).hexdigest()
            word = int(h[:15], 16)
            sign = ((int(h[15], 16) >> 3) & 1) * 2 - 1
            acc[(i, word % 1024)] += sign
    expect = {k: w for k, w in acc.items() if w != 0}
    assert got == expect


def test_ewma_quantized_matches_sequential_loop(spark, sf_dir):
    got = {
        (r["user_id"], r["event_id"]): r["ewma_q"]
        for r in QUERIES["ewma_quantized"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    series: dict = defaultdict(list)
    for u, i, v in zip(e["user_id"], e["event_id"], e["value"]):
        series[u].append((int(i), _ha(v * 1_000_000)))
    expect = {}
    for u, rows in series.items():
        rows.sort()
        ew = None
        for i, xq in rows:
            if ew is None:
                ew = xq
            else:
                s = xq + ew
                ew = -((-s) // 2) if s < 0 else s // 2
            expect[(u, i)] = ew
    assert got == expect
