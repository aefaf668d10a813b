"""Round-12 third implementations, streaming-exec family (r11 verdict
item 5): the four exec twins beyond tumbling/sliding — sessions
(gap-based island assignment), two-sided interval join (state-bounded
click->purchase attribution), stateful dedup (first-seen pass-through
counts), and the rollup cascade (minute->hour->day re-aggregation
algebra) — each re-derived in pure python over the same parquet
events and compared VALUE-level against the real Structured Streaming
execution (AvailableNow + memory sink). The two-engine oracle already
proves Spark==DuckDB; these replays re-derive the SPEC independently
of both engines, so a shared wrong assumption (window arithmetic,
session end = last event + gap, join bounds inclusive on both ends,
HALF_UP quantization) cannot hide.
"""

from __future__ import annotations

import math
from collections import defaultdict
from datetime import timezone

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

US_30M = 1_800_000_000
US_DAY = 86_400_000_000


def _ha(x: float) -> int:
    """Spark F.round: HALF_UP (away from zero)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    return e


def test_stream_sessions_exec_matches_gap_islands(spark, sf_dir):
    got = {
        (r["user_id"], r["session_start_us"]): (
            r["session_end_us"],
            r["n_events"],
            r["sum_value"],
        )
        for r in QUERIES["stream_sessions_exec"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    expect: dict = {}
    for uid, g in e.groupby("user_id"):
        rows = sorted(zip(g["us"], g["value"]))
        sess: list[list] = []
        for us, v in rows:
            if not sess or us - sess[-1][1] > US_30M:
                sess.append([us, us, 0, 0])  # start, last, n, sum_q
            sess[-1][1] = us
            sess[-1][2] += 1
            sess[-1][3] += _ha(v * 1e6)
        for start, last, n, sq in sess:
            expect[(uid, start)] = (last + US_30M, n, sq / 1e6)
    assert set(got) == set(expect)
    for k, (end, n, s) in expect.items():
        assert got[k][0] == end, k
        assert got[k][1] == n, k
        assert got[k][2] == pytest.approx(s, abs=1e-9), k


def test_stream_join_exec_matches_interval_attribution(spark, sf_dir):
    got = {
        (
            r["user_id"],
            r["click_id"],
            r["purchase_id"],
        ): (r["click_us"], r["purchase_us"], r["purchase_value"])
        for r in QUERIES["stream_join_exec"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    clicks = e[e["event_type"] == "click"]
    purch = e[e["event_type"] == "purchase"]
    by_user: dict = defaultdict(list)
    for uid, pid, pus, v in zip(
        purch["user_id"], purch["event_id"], purch["us"], purch["value"]
    ):
        by_user[uid].append((pid, pus, v))
    expect: dict = {}
    for uid, cid, cus in zip(
        clicks["user_id"], clicks["event_id"], clicks["us"]
    ):
        for pid, pus, v in by_user.get(uid, ()):
            # both bounds INCLUSIVE: c_us <= p_us <= c_us + 30 min
            if cus <= pus <= cus + US_30M:
                expect[(uid, cid, pid)] = (cus, pus, round(v, 6))
    assert set(got) == set(expect)
    for k, (cus, pus, v) in expect.items():
        assert got[k][0] == cus and got[k][1] == pus, k
        assert got[k][2] == pytest.approx(v, abs=1e-9), k


def test_stream_dedup_exec_passes_every_first_seen_row(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_events"], r["n_users"])
        for r in QUERIES["stream_dedup_exec"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    expect = {
        ty: (
            g["event_id"].nunique(),  # dedup key: first-seen only
            g["user_id"].nunique(),
        )
        for ty, g in e.groupby("event_type")
    }
    assert got == expect


def test_stream_rollup_exec_matches_day_cascade(spark, sf_dir):
    rows = QUERIES["stream_rollup_exec"](spark, sf_dir).collect()
    got = {}
    for r in rows:
        b_us = int(
            r["bucket"].replace(tzinfo=timezone.utc).timestamp() * 1e6
        )
        got[b_us] = (r["n"], r["sum_q"], r["min_q"], r["max_q"], r["avg"])
    e = _events(sf_dir)
    agg: dict = defaultdict(lambda: [0, 0, None, None])
    for us, v in zip(e["us"], e["value"]):
        q = _ha(v * 100)  # quantum=100, HALF_UP at the MINUTE level
        day = (int(us) // US_DAY) * US_DAY
        a = agg[day]
        a[0] += 1
        a[1] += q
        a[2] = q if a[2] is None else min(a[2], q)
        a[3] = q if a[3] is None else max(a[3], q)
    expect = {
        d: (n, sq, mn, mx, sq / n / 100)
        for d, (n, sq, mn, mx) in agg.items()
    }
    assert set(got) == set(expect)
    for d, (n, sq, mn, mx, avg) in expect.items():
        assert got[d][:4] == (n, sq, mn, mx), d
        assert got[d][4] == pytest.approx(avg, abs=1e-12), d
