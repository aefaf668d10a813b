"""Round-10 bug hunt, streaming-execution family: the tumbling and
sliding window EXEC queries (real Structured Streaming runs,
AvailableNow + memory sink) checked against pure-python window
assignment over the same events — micro-batch boundaries must not be
able to change a quantized aggregate, and the window arithmetic
(floor-to-hour; two 30-min-slide windows per event) is re-derived
independently.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

US_H = 3_600_000_000
US_30M = 1_800_000_000


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir):
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    return zip(e["ts"].astype("int64"), e["event_type"], e["value"])


def test_stream_tumbling_exec_matches_floor_assignment(spark, sf_dir):
    got = {
        (r["window_start_us"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in QUERIES["stream_tumbling_exec"](spark, sf_dir).collect()
    }
    agg: dict = defaultdict(lambda: [0, 0])
    for t, ty, v in _events(sf_dir):
        w = (int(t) // US_H) * US_H
        a = agg[(w, ty)]
        a[0] += 1
        a[1] += _ha(v * 1e6)
    expect = {k: (n, s / 1e6) for k, (n, s) in agg.items()}
    assert set(got) == set(expect)
    for k, (n, s) in expect.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(s, abs=1e-9), k


def test_stream_sliding_exec_matches_two_window_assignment(spark, sf_dir):
    got = {
        (r["window_start_us"], r["event_type"]): (
            r["n_events"],
            r["sum_value"],
        )
        for r in QUERIES["stream_sliding_exec"](spark, sf_dir).collect()
    }
    agg: dict = defaultdict(lambda: [0, 0])
    for t, ty, v in _events(sf_dir):
        t = int(t)
        anchor = (t // US_30M) * US_30M
        for start in (anchor, anchor - US_30M):
            if start <= t < start + US_H:
                a = agg[(start, ty)]
                a[0] += 1
                a[1] += _ha(v * 1e6)
    expect = {k: (n, s / 1e6) for k, (n, s) in agg.items()}
    assert set(got) == set(expect)
    for k, (n, s) in expect.items():
        assert got[k][0] == n, k
        assert got[k][1] == pytest.approx(s, abs=1e-9), k
