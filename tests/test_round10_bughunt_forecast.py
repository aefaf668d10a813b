"""Round-10 bug hunt, forecast-eval + experiment family: pure-python
third implementations from the sf0.001 parquet — MASE via the Hyndman
& Koehler definition, pinball via the k/(10-k) integer loss,
split-conformal via explicit rank selection, Brier reliability via a
dict-of-bins accumulator, Qini via an explicit descending walk, and
the pooled two-proportion z from first principles.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _daily_by_type(sf_dir):
    e = _pq(sf_dir, "events")
    agg: dict = defaultdict(int)
    for g, d, v in zip(e["event_type"], e["ts"].dt.date, e["value"]):
        agg[(g, d)] += _ha(v * 100)
    series: dict = defaultdict(list)
    for (g, d), vq in sorted(agg.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[g].append((d, vq))
    return series


def test_forecast_mase_matches_hyndman_koehler(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["forecast_mase"](spark, sf_dir).collect()
    }
    for g, rows in _daily_by_type(sf_dir).items():
        y = [v for _, v in rows]
        n = len(y)
        scored = [(y[i], y[i - 7]) for i in range(7, n)]
        naive = [(y[i], y[i - 1]) for i in range(1, n)]
        sf = sum(abs(a - b) for a, b in scored)
        sn = sum(abs(a - b) for a, b in naive)
        r = got[g]
        assert r["n_scored"] == len(scored)
        if sn > 0 and scored:
            mase = (sf / len(scored)) / (sn / len(naive))
            assert r["mase"] == pytest.approx(mase, abs=1e-8)
        else:
            assert r["mase"] is None


def test_pinball_loss_matches_integer_loss(spark, sf_dir):
    got = {
        (r["event_type"], r["decile"]): r
        for r in QUERIES["pinball_loss"](spark, sf_dir).collect()
    }
    for g, rows in _daily_by_type(sf_dir).items():
        y = [v for _, v in rows]
        scored = [(y[i], y[i - 7]) for i in range(7, len(y))]
        for k in (1, 5, 9):
            lq = sum(
                k * (yy - f) if yy >= f else (10 - k) * (f - yy)
                for yy, f in scored
            )
            r = got[(g, k)]
            assert r["n_scored"] == len(scored)
            assert r["pinball"] == pytest.approx(
                lq / 10.0 / 100.0 / len(scored), abs=1e-8
            )


def test_conformal_interval_matches_rank_selection(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["conformal_interval"](spark, sf_dir).collect()
    }
    for g, rows in _daily_by_type(sf_dir).items():
        y = [v for _, v in rows]
        days = [d for d, _ in rows]
        scored = [
            (days[i], abs(y[i] - y[i - 7])) for i in range(7, len(y))
        ]
        n = len(scored)
        n_cal = 7 * n // 10
        cal = scored[:n_cal]
        test = scored[n_cal:]
        if not cal or not test:
            assert g not in got
            continue
        ranked = sorted(cal, key=lambda t: (t[1], t[0]))
        sel = min(len(cal), (9 * (len(cal) + 1) + 9) // 10)
        q = ranked[sel - 1][1]
        cov = sum(1 for _, r_ in test if r_ <= q) / len(test)
        r = got[g]
        assert (r["n_cal"], r["n_test"]) == (len(cal), len(test))
        assert r["q"] == pytest.approx(q / 100.0, abs=1e-9)
        assert r["coverage"] == pytest.approx(cov, abs=1e-9)


def test_brier_calibration_matches_reliability_table(spark, sf_dir):
    got = {
        r["bin"]: r
        for r in QUERIES["brier_calibration"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    bins: dict = defaultdict(lambda: [0, 0, 0, 0])  # n, sp, sy, se
    for nc, lang in zip(d["n_chars"], d["lang"]):
        p = min(2 * int(nc), 1000)
        yv = 1 if lang == "en" else 0
        b = min(p * 10 // 1000, 9)
        acc = bins[b]
        acc[0] += 1
        acc[1] += p
        acc[2] += yv
        acc[3] += (p - 1000 * yv) ** 2
    assert set(got) == set(bins)
    for b, (n, sp, sy, se) in bins.items():
        r = got[b]
        assert r["n"] == n
        assert r["mean_pred"] == pytest.approx(sp / (n * 1000.0), abs=1e-9)
        assert r["obs_rate"] == pytest.approx(sy / n, abs=1e-9)
        assert r["brier"] == pytest.approx(se / (n * 1e6), abs=1e-9)


def test_qini_uplift_matches_descending_walk(spark, sf_dir):
    got = {r["bin"]: r for r in QUERIES["qini_uplift"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    blocks: dict = defaultdict(lambda: [0, 0, 0, 0])  # cnt, nt, rt, rc
    for u, t_, v in zip(e["user_id"], e["event_type"], e["value"]):
        vq = _ha(v * 100)
        tr = 1 if u % 2 == 1 else 0
        yv = 1 if t_ == "purchase" else 0
        b = blocks[vq]
        b[0] += 1
        b[1] += tr
        b[2] += tr * yv
        b[3] += (1 - tr) * yv
    n = sum(b[0] for b in blocks.values())
    per_bin: dict = {}
    cum_cnt = cum_t = cum_rt = cum_rc = 0
    for vq in sorted(blocks, reverse=True):
        cnt, nt, rt, rc = blocks[vq]
        off = cum_cnt
        cum_cnt += cnt
        cum_t += nt
        cum_rt += rt
        cum_rc += rc
        b = off * 10 // n
        per_bin[b] = (cum_t, cum_cnt - cum_t, cum_rt, cum_rc)
    assert set(got) == set(per_bin)
    for b, (cnt_t, cnt_c, crt, crc) in per_bin.items():
        r = got[b]
        assert (
            r["cum_n_t"],
            r["cum_n_c"],
            r["cum_resp_t"],
            r["cum_resp_c"],
        ) == (cnt_t, cnt_c, crt, crc)
        if cnt_c > 0:
            assert r["qini"] == pytest.approx(
                crt - crc * cnt_t / cnt_c, abs=1e-8
            )
        else:
            assert r["qini"] is None


def test_two_proportion_ztest_matches_pooled_z(spark, sf_dir):
    row = QUERIES["two_proportion_ztest"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")
    conv: dict = {}
    for u, t_ in zip(e["user_id"], e["event_type"]):
        conv[u] = conv.get(u, 0) | (1 if t_ == "purchase" else 0)
    n1 = sum(1 for u in conv if u % 2 == 1)
    c1 = sum(c for u, c in conv.items() if u % 2 == 1)
    n0 = len(conv) - n1
    c0 = sum(conv.values()) - c1
    assert (row["n1"], row["c1"], row["n0"], row["c0"]) == (n1, c1, n0, c0)
    assert row["p1"] == pytest.approx(c1 / n1, abs=1e-9)
    assert row["p0"] == pytest.approx(c0 / n0, abs=1e-9)
    assert row["diff"] == pytest.approx(c1 / n1 - c0 / n0, abs=1e-9)
    p = (c1 + c0) / (n1 + n0)
    if 0 < c1 + c0 < n1 + n0:
        z = (c1 / n1 - c0 / n0) / math.sqrt(
            p * (1 - p) * (1 / n1 + 1 / n0)
        )
        assert row["z"] == pytest.approx(z, abs=1e-8)
    else:
        assert row["z"] is None
