"""Round-12 third implementations, wave 2 — the range-join /
interval family (r11 verdict item 5): the binned ±15-minute interval
count join re-derived as a brute-force per-error scan over ALL
purchases (independent of the bucket-explode + re-check plan), and
SCD2 interval collapse re-derived as an explicit run-length scan over
the daily tier series.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

US_15M = 900_000_000


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_interval_count_join_brute_force_replay(spark, sf_dir):
    got = {
        r["event_id"]: (r["user_id"], r["n_nearby_purchases"], r["nearby_value"])
        for r in QUERIES["interval_count_join"](spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    # the purchase side is GLOBAL (no user key): time correlation only
    purch = sorted(
        zip(
            e[e.event_type == "purchase"]["us"],
            e[e.event_type == "purchase"]["value"],
        )
    )
    err = e[e.event_type == "error"]
    expect = {}
    for eid, uid, us in zip(err["event_id"], err["user_id"], err["us"]):
        n, v = 0, 0
        for pus, val in purch:
            if us - US_15M <= pus <= us + US_15M:
                n += 1
                v += _ha(val * 1e6)
        expect[eid] = (uid, n, v / 1e6)
    assert set(got) == set(expect)
    for eid, (uid, n, v) in expect.items():
        assert got[eid][0] == uid and got[eid][1] == n, eid
        assert got[eid][2] == pytest.approx(v, abs=1e-9), eid


def test_scd2_intervals_run_length_replay(spark, sf_dir):
    got = {
        (r["name"], r["version"]): (
            r["tier"],
            r["valid_from"],
            r["last_observed"],
            r["n_days"],
        )
        for r in QUERIES["scd2_intervals"](spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["date"] = pd.to_datetime(o["o_orderdate"]).dt.date
    daily: dict = defaultdict(lambda: [0, 0])  # (name, date) -> [cents, n]
    for d, name, price in zip(o["date"], o["o_orderpriority"], o["o_totalprice"]):
        a = daily[(name, d)]
        a[0] += _ha(price * 100)
        a[1] += 1
    series: dict = defaultdict(list)
    for (name, d), (cents, n) in daily.items():
        # integer-exact tier decision: avg cents >= 15,000,000
        series[name].append((d, "high" if cents / n >= 15_000_000 else "low"))
    expect = {}
    for name, rows in series.items():
        rows.sort()
        version = 0
        runs: list = []
        prev = object()  # sentinel: first row always opens a run
        for d, tier in rows:
            if tier != prev:
                version += 1
                runs.append([version, tier, d, d, 0])
            runs[-1][3] = d
            runs[-1][4] += 1
            prev = tier
        for version, tier, frm, to, n in runs:
            expect[(name, version)] = (tier, frm, to, n)
    assert set(got) == set(expect)
    for k, (tier, frm, to, n) in expect.items():
        assert got[k][0] == tier, k
        assert got[k][1] == frm and got[k][2] == to, k
        assert got[k][3] == n, k
