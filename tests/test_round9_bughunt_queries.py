"""Round-9 bug hunt, query level: independent pure-python references
computed straight from the sf0.001 parquet (pandas/pyarrow — neither
Spark nor DuckDB), for registered queries whose only prior coverage
was cross-engine parity. A formulation error mirrored into the oracle
SQL would pass parity; it cannot pass a third, independent
implementation."""

from __future__ import annotations

import datetime
import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_benford_digit_check_matches_python(spark, sf_dir):
    got = {
        r["digit"]: r
        for r in QUERIES["benford_digit_check"](spark, sf_dir).collect()
    }
    o = _pq(sf_dir, "orders")
    vals = o.loc[o["o_totalprice"] >= 1, "o_totalprice"]
    digits = vals.map(lambda x: int(str(int(math.floor(x)))[0]))
    counts = digits.value_counts().to_dict()
    total = sum(counts.values())
    for d in range(1, 10):
        if d not in counts:
            assert d not in got
            continue
        r = got[d]
        exp = total * math.log10(1 + 1 / d)
        assert r["n"] == counts[d]
        assert r["expected_n"] == pytest.approx(round(exp, 6), abs=1e-6)
        assert r["deviation"] == pytest.approx(
            round(counts[d] - exp, 6), abs=1e-6
        )


def test_twap_per_user_matches_python(spark, sf_dir):
    got = {
        r["user_id"]: r
        for r in QUERIES["twap_per_user"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    e = e[e["value"].notna()].copy()
    # Spark/DuckDB ROUND is half-AWAY-from-zero; pandas .round() is
    # banker's — must mirror the engines, not numpy
    e["cents"] = (
        (e["value"] * 100)
        .map(lambda x: math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5))
        .astype("int64")
    )
    # parquet ts is datetime64[us]; normalize to ns first or the
    # int64 view is microseconds and //1e6 silently yields SECONDS
    e["ms"] = e["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
    expect = {}
    for uid, grp in e.groupby("user_id"):
        grp = grp.sort_values(["ts", "event_id"], kind="stable")
        ms = grp["ms"].tolist()
        cents = grp["cents"].tolist()
        num = den = 0
        for i in range(len(ms) - 1):
            dt = ms[i + 1] - ms[i]
            num += cents[i] * dt
            den += dt
        if den > 0:
            expect[uid] = (len(ms), round(num / den / 100, 6))
    assert set(got) == set(expect)
    for uid, (n, tw) in expect.items():
        assert got[uid]["n_events"] == n
        assert got[uid]["twap"] == pytest.approx(tw, abs=1e-6)


def test_psi_drift_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["psi_drift"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    cut = datetime.datetime(2024, 1, 16)

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    expect = {}
    for g, grp in e.groupby("event_type"):
        vq = (grp["value"] * 100).map(half_away).astype("int64")
        lo, hi = vq.min(), vq.max()
        bins = ((vq - lo) * 10) // (hi - lo + 1)
        is_a = grp["ts"] < cut
        ca = defaultdict(int)
        cb = defaultdict(int)
        for b, a in zip(bins, is_a):
            (ca if a else cb)[int(b)] += 1
        ta, tb = sum(ca.values()), sum(cb.values())
        psi_nano = 0
        for b in range(10):
            pa = (ca[b] + 1) / (ta + 10)
            pb = (cb[b] + 1) / (tb + 10)
            psi_nano += half_away((pa - pb) * math.log(pa / pb) * 1e9)
        expect[g] = (ta, tb, round(psi_nano / 1e9, 9))
    assert set(got) == set(expect)
    for g, (ta, tb, psi) in expect.items():
        r = got[g]
        assert (r["n_a"], r["n_b"]) == (ta, tb)
        assert r["psi"] == pytest.approx(psi, abs=1e-9)


def test_gaps_islands_matches_python(spark, sf_dir):
    got = {
        r["name"]: r for r in QUERIES["gaps_islands"](spark, sf_dir).collect()
    }
    o = _pq(sf_dir, "orders")
    days = (
        o[["o_orderpriority", "o_orderdate"]]
        .drop_duplicates()
        .rename(columns={"o_orderpriority": "name", "o_orderdate": "date"})
    )
    for name, grp in days.groupby("name"):
        ds = sorted(pd.to_datetime(grp["date"]).dt.date)
        islands = []
        start = prev = ds[0]
        for d in ds[1:]:
            if (d - prev).days == 1:
                prev = d
            else:
                islands.append((start, prev))
                start = prev = d
        islands.append((start, prev))
        r = got[name]
        assert r["n_islands"] == len(islands)
        assert r["longest_island"] == max(
            (e - s).days + 1 for s, e in islands
        )
        assert r["first_day"] == ds[0]
        assert r["last_day"] == ds[-1]
        assert r["days_observed"] == len(ds)


def test_scd2_intervals_matches_python(spark, sf_dir):
    """SCD2 lag-compare-cumsum vs a sequential python scan of the
    daily tier snapshots: version boundaries, validity dates and day
    counts must all match; versions must be contiguous per entity and
    adjacent versions must differ in tier."""
    got = {}
    for r in QUERIES["scd2_intervals"](spark, sf_dir).collect():
        got[(r["name"], r["version"])] = r

    o = _pq(sf_dir, "orders")
    o = o.copy()
    o["cents"] = (
        (o["o_totalprice"] * 100)
        .map(lambda x: math.floor(x + 0.5))
        .astype("int64")
    )
    o["date"] = pd.to_datetime(o["o_orderdate"]).dt.date
    daily = (
        o.groupby(["date", "o_orderpriority"])
        .agg(cents=("cents", "sum"), cnt=("cents", "size"))
        .reset_index()
    )
    daily["tier"] = (daily["cents"] / daily["cnt"] >= 15_000_000).map(
        {True: "high", False: "low"}
    )

    expect = {}
    for name, grp in daily.groupby("o_orderpriority"):
        grp = grp.sort_values("date")
        version = 0
        prev_tier = object()
        for _, row in grp.iterrows():
            if row["tier"] != prev_tier:
                version += 1
                expect[(name, version)] = {
                    "tier": row["tier"],
                    "valid_from": row["date"],
                    "last_observed": row["date"],
                    "n_days": 1,
                }
                prev_tier = row["tier"]
            else:
                e = expect[(name, version)]
                e["last_observed"] = row["date"]
                e["n_days"] += 1
    assert set(got) == set(expect)
    for key, e in expect.items():
        r = got[key]
        assert r["tier"] == e["tier"], key
        assert r["valid_from"] == e["valid_from"], key
        assert r["last_observed"] == e["last_observed"], key
        assert r["n_days"] == e["n_days"], key
    # structural invariants: contiguous versions, alternating tiers
    by_name = defaultdict(list)
    for (name, v), e in expect.items():
        by_name[name].append((v, e["tier"]))
    for name, vs in by_name.items():
        vs.sort()
        assert [v for v, _ in vs] == list(range(1, len(vs) + 1))
        for (_, t1), (_, t2) in zip(vs, vs[1:]):
            assert t1 != t2, name


def test_bootstrap_ci_matches_python(spark, sf_dir):
    """Poisson-bootstrap CI vs a hashlib-based python replay of the
    md5-derived weights: every resample's (S_b, N_b) is recomputed
    independently, the CI order statistics must match exactly. The
    hash path (hashlib vs Spark md5 vs DuckDB md5) is the third
    implementation of the 'randomness'."""
    import hashlib

    r = QUERIES["bootstrap_ci"](spark, sf_dir).collect()[0]

    T = (12055, 24109, 30137, 32146, 32648, 32749, 32765)
    e = _pq(sf_dir, "events")
    n = len(e)
    s = 0
    sb = [0] * 32
    nb = [0] * 32
    for eid, v in zip(e["event_id"], e["value"]):
        xq = math.floor(v * 100 + 0.5) if v >= 0 else math.ceil(v * 100 - 0.5)
        s += xq
        words = {}
        for b in range(32):
            i = b // 8
            if i not in words:
                h = hashlib.md5(f"{eid}|{i}".encode()).hexdigest()
                words[i] = (int(h[0:15], 16), int(h[15:30], 16))
            word = words[i][0] if b % 8 < 4 else words[i][1]
            u = (word >> ((b % 4) * 15)) & 32767
            w = sum(u >= t for t in T)
            sb[b] += w * xq
            nb[b] += w
    means = sorted(
        sb[b] / nb[b] / 100 for b in range(32) if nb[b] > 0
    )
    assert r["n"] == n
    assert r["mean"] == pytest.approx(round(s / n / 100, 9), abs=1e-9)
    assert r["ci_lo"] == pytest.approx(round(means[1], 9), abs=1e-9)
    assert r["ci_hi"] == pytest.approx(round(means[-2], 9), abs=1e-9)
    assert r["resamples"] == 32
    # and the CI must bracket the full-sample mean for this data
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
