"""Round-9 bug hunt, final mini-batch: peak_concurrency via a single
GLOBAL sweep line (the engines use a two-level day-partitioned sweep
plus a midnight carry-in — the decomposition is exactly what a third
implementation should re-derive), and zorder_layout via a plain
python Morton interleave."""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

DAY_US = 86_400_000_000


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _sessions(sf_dir):
    e = (
        _pq(sf_dir, "events")[["user_id", "event_id", "ts"]]
        .sort_values(["user_id", "ts", "event_id"], kind="stable")
        .copy()
    )
    e["us"] = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    out = []
    for _, grp in e.groupby("user_id"):
        uss = grp["us"].tolist()
        start = prev = uss[0]
        for us in uss[1:]:
            if us - prev > 1_800_000_000:
                out.append((start, prev))
                start = us
            prev = us
        out.append((start, prev))
    return out


def test_peak_concurrency_matches_global_sweep(spark, sf_dir):
    got = {
        str(r["day"]): (r["carry_in"], r["peak"])
        for r in QUERIES["peak_concurrency"](spark, sf_dir).collect()
    }
    sessions = _sessions(sf_dir)
    deltas = []
    for sb, se in sessions:
        deltas.append((sb, 1))
        deltas.append((se + 1, -1))
    deltas.sort()  # ties: -1 before +1, matching ORDER BY ts, delta
    by_day = defaultdict(list)
    for ts, d in deltas:
        by_day[ts // DAY_US].append(d)
    # carry_in(d): sessions active across day d's midnight
    carry = defaultdict(int)
    for sb, se in sessions:
        for d in range(sb // DAY_US + 1, se // DAY_US + 1):
            carry[d] += 1
    days = sorted(set(by_day) | {d for d, c in carry.items() if c > 0})
    # From first principles: a session is active on the half-open
    # interval [sb, se+1), so the level at instant d·DAY is
    # #{sb < d·DAY <= se} == carry(d), and within the day the level
    # moves by the day's own deltas — ends sorted before starts at
    # equal ts ((ts, delta) with -1 < +1), so a session whose
    # EXCLUSIVE end is exactly midnight never raises that day's peak
    expect = {}
    for d in days:
        level = peak = carry.get(d, 0)
        for delta in by_day.get(d, []):
            level += delta
            peak = max(peak, level)
        key = str(pd.Timestamp(d * DAY_US * 1000).date())
        expect[key] = (carry.get(d, 0), peak)
    assert got == expect
    assert max(p for _, p in expect.values()) > 1, "overlap must exist"


def test_zorder_layout_matches_python_morton(spark, sf_dir):
    got = {
        r["file_bucket"]: r
        for r in QUERIES["zorder_layout"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["user_id", "value"]]
    cells = defaultdict(list)
    for uid, val in zip(e["user_id"], e["value"]):
        x = int(uid) % 4096
        y = _half_away(val * 1e6) % 4096
        z = 0
        for i in range(12):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        cells[z // 262144].append((x, y))
    assert set(got) == set(cells)
    for fb, pts in cells.items():
        r = got[fb]
        assert r["n_rows"] == len(pts)
        assert r["x_min"] == min(x for x, _ in pts)
        assert r["x_max"] == max(x for x, _ in pts)
        assert r["y_min"] == min(y for _, y in pts)
        assert r["y_max"] == max(y for _, y in pts)
    # the data-skipping property: z-buckets tile (x, y) into bounded
    # rectangles — every bucket's rectangle fits inside the quadrant
    # its z-prefix encodes (top 6 interleaved bits = 8 x-bins x 8
    # y-bins of width 512)
    for fb, pts in cells.items():
        xs = {x // 512 for x, _ in pts}
        ys = {y // 512 for _, y in pts}
        assert len(xs) == 1 and len(ys) == 1, (
            "z-bucket crosses its Morton quadrant"
        )
