"""Round-10 bug hunt, robust-stats + interval family: pure-python
third implementations from the sf0.001 parquet — winsorized means
over independently computed type-1 quartiles, Gini via the
order-statistics identity with an explicit sort, the equi-depth
histogram's bucket stamps, and per-day peak concurrency replayed as
the literal sweep line over sessions rebuilt from raw events.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

US_PER_DAY = 86_400_000_000


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _type1(sorted_vals, q):
    """Type-1 (inverse-CDF) quantile: x_(ceil(n*q)), 1-indexed."""
    n = len(sorted_vals)
    h = max(1, math.ceil(n * q))
    return sorted_vals[h - 1]


def test_winsorized_stats_matches_clamped_mean(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["winsorized_stats"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    groups: dict = defaultdict(list)
    for t_, v in zip(e["event_type"], e["value"]):
        groups[t_].append(v)
    for t_, vals in groups.items():
        s = sorted(vals)
        q25, q75 = _type1(s, 0.25), _type1(s, 0.75)
        r = got[t_]
        assert (r["q25"], r["q75"]) == (q25, q75)
        wsum = sum(_ha(min(max(v, q25), q75) * 1e6) for v in vals)
        assert r["winsorized_mean"] == pytest.approx(
            wsum / 1e6 / len(vals), abs=1e-9
        )


def test_gini_matches_order_statistics_identity(spark, sf_dir):
    got = {
        r["source"]: r
        for r in QUERIES["gini_concentration"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    groups: dict = defaultdict(list)
    for s, nc, i in zip(d["source"], d["n_chars"], d["doc_id"]):
        groups[s].append((int(nc), int(i)))
    for s, rows in groups.items():
        rows.sort()  # (value, tie) ascending
        n = len(rows)
        sx = sum(x for x, _ in rows)
        six = sum(i * x for i, (x, _) in enumerate(rows, start=1))
        r = got[s]
        assert (r["n"], r["sx"]) == (n, sx)
        g = (2 * six - (n + 1) * sx) / (n * sx)
        assert r["gini"] == pytest.approx(g, abs=1e-9)


def test_equidepth_histogram_matches_bucket_stamps(spark, sf_dir):
    got = {
        r["bucket"]: r
        for r in QUERIES["equidepth_histogram"](spark, sf_dir).collect()
    }
    li = _pq(sf_dir, "lineitem")
    cents = sorted(_ha(p * 100) for p in li["l_extendedprice"])
    q = [_type1(cents, x) for x in (0.25, 0.5, 0.75)]
    buckets: dict = defaultdict(lambda: [0, None, None])
    for c in cents:
        b = 3 if c > q[2] else 2 if c > q[1] else 1 if c > q[0] else 0
        acc = buckets[b]
        acc[0] += 1
        acc[1] = c if acc[1] is None else min(acc[1], c)
        acc[2] = c if acc[2] is None else max(acc[2], c)
    assert set(got) == set(buckets)
    for b, (n, mn, mx) in buckets.items():
        r = got[b]
        assert (r["n"], r["min_cents"], r["max_cents"]) == (n, mn, mx)


def _sessions(sf_dir):
    e = _pq(sf_dir, "events")
    rows: dict = defaultdict(list)
    ts_us = e["ts"].astype("int64")  # datetime64[us] -> micros
    for u, i, t in zip(e["user_id"], e["event_id"], ts_us):
        rows[u].append((int(t), int(i)))
    sessions = []
    for u, evs in rows.items():
        evs.sort()
        start = end = None
        for t, _ in evs:
            if start is None:
                start = end = t
            elif t - end > 1_800_000_000:
                sessions.append((start, end))
                start = end = t
            else:
                end = t
        sessions.append((start, end))
    return sessions


def test_peak_concurrency_matches_sweep_line(spark, sf_dir):
    got = {
        str(r["day"]): (r["carry_in"], r["peak"])
        for r in QUERIES["peak_concurrency"](spark, sf_dir).collect()
    }
    sessions = _sessions(sf_dir)
    deltas: dict = defaultdict(list)
    carry: dict = defaultdict(int)
    for s, e_ in sessions:
        e1 = e_ + 1  # half-open
        deltas[s // US_PER_DAY].append((s, 1))
        deltas[e1 // US_PER_DAY].append((e1, -1))
        d0, d1 = s // US_PER_DAY, (e1 - 1) // US_PER_DAY
        for d in range(d0 + 1, d1 + 1):
            carry[d] += 1
    expect = {}
    for d in set(deltas) | set(carry):
        run = 0
        peak_delta = None
        # order by (ts, delta): -1 sorts before +1 at the same ts
        for _, dl in sorted(deltas.get(d, [])):
            run += dl
            peak_delta = run if peak_delta is None else max(peak_delta, run)
        c = carry.get(d, 0)
        day = str(pd.Timestamp("1970-01-01") + pd.Timedelta(days=d))[:10]
        expect[day] = (c, max(c, c + (peak_delta or 0)))
    assert got == expect
