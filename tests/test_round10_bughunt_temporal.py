"""Round-10 bug hunt, temporal-join family: pure-python third
implementations from the sf0.001 parquet — backward/forward as-of
joins via explicit per-user scans (boundary-tie max convention),
the ±15-minute interval join via a literal double loop per user-free
theta scan, SCD2 point-in-time stamping via a dimension walk, and the
date-spine forward fill via a per-name calendar loop.
"""

from __future__ import annotations

import math
from bisect import bisect_left, bisect_right
from collections import defaultdict
from datetime import timedelta

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir):
    e = _pq(sf_dir, "events")
    e = e.assign(ts_us=e["ts"].astype("int64"))
    return e


def test_asof_last_purchase_matches_scan(spark, sf_dir):
    got = {r["event_id"]: r["last_purchase_value"] for r in QUERIES["asof_last_purchase"](spark, sf_dir).collect()}
    e = _events(sf_dir)
    purchases: dict = defaultdict(list)
    for u, t, ty, v in zip(e["user_id"], e["ts_us"], e["event_type"], e["value"]):
        if ty == "purchase":
            purchases[u].append((int(t), v))
    for v in purchases.values():
        v.sort()
    expect = {}
    for i, u, t in zip(e["event_id"], e["user_id"], e["ts_us"]):
        ps = purchases.get(u, [])
        # latest purchase ts <= event ts; tie at boundary -> max value
        k = bisect_right(ps, (int(t), float("inf")))
        if k == 0:
            expect[int(i)] = None
        else:
            boundary = ps[k - 1][0]
            expect[int(i)] = max(v for pt, v in ps if pt == boundary)
    assert got == expect


def test_asof_next_purchase_matches_scan(spark, sf_dir):
    got = {
        r["event_id"]: (r["next_purchase_us"], r["next_purchase_value"])
        for r in QUERIES["asof_next_purchase"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    purchases: dict = defaultdict(list)
    for u, t, ty, v in zip(e["user_id"], e["ts_us"], e["event_type"], e["value"]):
        if ty == "purchase":
            purchases[u].append((int(t), v))
    for v in purchases.values():
        v.sort()
    expect = {}
    for i, u, t, ty in zip(
        e["event_id"], e["user_id"], e["ts_us"], e["event_type"]
    ):
        if ty != "error":
            continue
        ps = purchases.get(u, [])
        k = bisect_left(ps, (int(t), -float("inf")))
        if k == len(ps):
            expect[int(i)] = (None, None)
        else:
            boundary = ps[k][0]
            val = max(v for pt, v in ps if pt == boundary)
            expect[int(i)] = (boundary, round(val, 6))
    assert set(got) == set(expect)
    for i, (ts, val) in expect.items():
        gts, gval = got[i]
        assert gts == ts, i
        if val is None:
            assert gval is None
        else:
            assert gval == pytest.approx(val, abs=1e-6), i


def test_interval_count_join_matches_theta_scan(spark, sf_dir):
    got = {
        r["event_id"]: (r["n_nearby_purchases"], r["nearby_value"])
        for r in QUERIES["interval_count_join"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    w = 900_000_000
    pur = sorted(
        (int(t), v)
        for t, ty, v in zip(e["ts_us"], e["event_type"], e["value"])
        if ty == "purchase"
    )
    pts = [t for t, _ in pur]
    expect = {}
    for i, t, ty in zip(e["event_id"], e["ts_us"], e["event_type"]):
        if ty != "error":
            continue
        lo = bisect_left(pts, int(t) - w)
        hi = bisect_right(pts, int(t) + w)
        vals = [v for _, v in pur[lo:hi]]
        expect[int(i)] = (
            len(vals),
            sum(_ha(v * 1e6) for v in vals) / 1e6,
        )
    assert set(got) == set(expect)
    for i, (n, v) in expect.items():
        assert got[i][0] == n, i
        assert got[i][1] == pytest.approx(v, abs=1e-9), i


def test_scd2_pit_join_matches_dimension_walk(spark, sf_dir):
    got = {
        (r["name"], r["version"], r["tier"]): (r["n_orders"], r["cents"])
        for r in QUERIES["scd2_pit_join"](spark, sf_dir).collect()
    }
    o = _pq(sf_dir, "orders")
    daily: dict = defaultdict(lambda: [0, 0])
    for p, d, pr in zip(
        o["o_orderpriority"], o["o_orderdate"], o["o_totalprice"]
    ):
        a = daily[(p, d)]
        a[0] += 1
        a[1] += _ha(pr * 100)
    tiers = {
        k: ("high" if s / n >= 15000000 else "low")
        for k, (n, s) in daily.items()
    }
    dim: dict = defaultdict(list)  # name -> [(date, version, tier)]
    by_name: dict = defaultdict(list)
    for (name, d), t in tiers.items():
        by_name[name].append((d, t))
    for name, rows in by_name.items():
        rows.sort()
        ver = 0
        prev = None
        for d, t in rows:
            if t != prev:
                ver += 1
                dim[name].append((d, ver, t))
            prev = t
    agg: dict = defaultdict(lambda: [0, 0])
    for p, d, pr in zip(
        o["o_orderpriority"], o["o_orderdate"], o["o_totalprice"]
    ):
        versions = dim[p]
        cur = None
        for vd, ver, t in versions:
            if vd <= d:
                cur = (ver, t)
            else:
                break
        a = agg[(p, cur[0], cur[1])]
        a[0] += 1
        a[1] += _ha(pr * 100)
    assert got == {k: tuple(v) for k, v in agg.items()}


def test_date_spine_ffill_matches_calendar_loop(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import (
        orders_raw_series,
    )

    raw = orders_raw_series(spark, sf_dir).select(
        "name", "date", "asset_price"
    ).collect()
    got = {r["name"]: r for r in QUERIES["date_spine_ffill"](spark, sf_dir).collect()}
    series: dict = defaultdict(dict)
    for r in raw:
        series[r["name"]][r["date"]] = r["asset_price"]
    for name, obs in series.items():
        days = sorted(obs)
        d, last = days[0], None
        n_days = n_obs = checksum = 0
        while d <= days[-1]:
            n_days += 1
            if d in obs:
                n_obs += 1
                last = obs[d]
            checksum += _ha(last * 100)
            d += timedelta(days=1)
        r = got[name]
        assert (r["n_days"], r["n_observed"], r["price_checksum"]) == (
            n_days,
            n_obs,
            checksum,
        )
