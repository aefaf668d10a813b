"""Round-12 third implementations, as-of-join + experiments families
(r11 verdict item 5): backward/forward as-of joins (union-and-carry
operator vs a brute-force per-event scan), CUPED covariate
adjustment, the Qini uplift table, and split-conformal calibration —
each re-derived in pure python from the method definitions
(Deng et al. 2013 for CUPED; Radcliffe 2007 for Qini; Vovk's split
conformal with the finite-sample ceil((n+1)q) rank) and compared
VALUE-level against the Spark queries. The tie rules the replays pin
(backward: max p_us then max value; forward: min p_us then max
value; conformal: residual rank breaks ties by day) are exactly the
ones the oracles declare.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

US_30M = 1_800_000_000


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    return e


def test_asof_last_purchase_brute_force_replay(spark, sf_dir):
    got = {
        r["event_id"]: (r["user_id"], r["ts_us"], r["last_purchase_value"])
        for r in QUERIES["asof_last_purchase"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    purch: dict = defaultdict(list)
    for uid, pus, v in zip(
        e[e.event_type == "purchase"]["user_id"],
        e[e.event_type == "purchase"]["us"],
        e[e.event_type == "purchase"]["value"],
    ):
        purch[uid].append((pus, v))
    expect = {}
    for eid, uid, us in zip(e["event_id"], e["user_id"], e["us"]):
        # most recent (<= ts) purchase; ties on ts -> MAX value (the
        # carry's pv ASC order makes the largest value the last one)
        best = max(
            ((p, v) for p, v in purch.get(uid, ()) if p <= us),
            default=None,
        )
        expect[eid] = (uid, us, None if best is None else best[1])
    assert set(got) == set(expect)
    for eid, (uid, us, v) in expect.items():
        assert got[eid][0] == uid and got[eid][1] == us, eid
        if v is None:
            assert got[eid][2] is None, eid
        else:
            assert got[eid][2] == pytest.approx(v, abs=1e-9), eid


def test_asof_next_purchase_brute_force_replay(spark, sf_dir):
    got = {
        r["event_id"]: (r["next_purchase_us"], r["next_purchase_value"])
        for r in QUERIES["asof_next_purchase"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    purch: dict = defaultdict(list)
    for uid, pus, v in zip(
        e[e.event_type == "purchase"]["user_id"],
        e[e.event_type == "purchase"]["us"],
        e[e.event_type == "purchase"]["value"],
    ):
        purch[uid].append((pus, v))
    err = e[e.event_type == "error"]
    expect = {}
    for eid, uid, us in zip(err["event_id"], err["user_id"], err["us"]):
        # earliest (>= ts) purchase; ties on ts -> MAX value
        cand = [(p, v) for p, v in purch.get(uid, ()) if p >= us]
        if not cand:
            expect[eid] = (None, None)
        else:
            p, v = min(cand, key=lambda t: (t[0], -t[1]))
            expect[eid] = (p, round(v, 6))
    assert set(got) == set(expect)
    for eid, (p, v) in expect.items():
        assert got[eid][0] == p, eid
        if v is None:
            assert got[eid][1] is None, eid
        else:
            assert got[eid][1] == pytest.approx(v, abs=1e-9), eid


def test_cuped_adjustment_moment_replay(spark, sf_dir):
    got = {
        r["variant"]: r
        for r in QUERIES["cuped_adjustment"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    cutoff_us = int(pd.Timestamp("2024-01-16", tz="UTC").timestamp() * 1e6)
    per_user: dict = defaultdict(lambda: [0, 0])  # (uid) -> [x, y]
    for uid, us, v in zip(e["user_id"], e["us"], e["value"]):
        q = _ha(v * 100)
        per_user[uid][1 if us >= cutoff_us else 0] += q
    mom: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n,sx,sy,sxy,sxx,syy
    for uid, (x, y) in per_user.items():
        m = mom[int(uid) % 2]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * y
        m[4] += x * x
        m[5] += y * y
    pn = sum(m[0] for m in mom.values())
    psx = sum(m[1] for m in mom.values())
    psy = sum(m[2] for m in mom.values())
    psxy = sum(m[3] for m in mom.values())
    psxx = sum(m[4] for m in mom.values())
    psyy = sum(m[5] for m in mom.values())
    cov = float(psxy) * float(pn) - float(psx) * float(psy)
    varx = float(psxx) * float(pn) - float(psx) * float(psx)
    vary = float(psyy) * float(pn) - float(psy) * float(psy)
    mean_all_x = float(psx) / (pn * 100.0)
    assert set(got) == {0, 1}
    for variant, (n, sx, sy, *_rest) in sorted(mom.items()):
        r = got[variant]
        theta = cov / varx
        mean_x = sx / (n * 100.0)
        mean_y = sy / (n * 100.0)
        assert r["n_units"] == n
        assert r["mean_x"] == pytest.approx(mean_x, abs=1e-9)
        assert r["mean_y"] == pytest.approx(mean_y, abs=1e-9)
        assert r["theta"] == pytest.approx(theta, abs=1e-9)
        assert r["adj_mean_y"] == pytest.approx(
            mean_y - theta * (mean_x - mean_all_x), abs=1e-9
        )
        assert r["rho2"] == pytest.approx(cov * cov / (varx * vary), abs=1e-9)
    # variance-reduction fraction is a correlation^2: in [0, 1]
    assert 0.0 <= got[0]["rho2"] <= 1.0


def test_qini_uplift_block_decile_replay(spark, sf_dir):
    got = {r["bin"]: r for r in QUERIES["qini_uplift"](spark, sf_dir).collect()}
    e = _events(sf_dir)
    blocks: dict = defaultdict(lambda: [0, 0, 0, 0])  # cnt, nt, rt, rc
    for uid, ty, v in zip(e["user_id"], e["event_type"], e["value"]):
        vq = _ha(v * 100)
        t = int(uid) % 2
        y = 1 if ty == "purchase" else 0
        b = blocks[vq]
        b[0] += 1
        b[1] += t
        b[2] += t * y
        b[3] += (1 - t) * y
    n_total = sum(b[0] for b in blocks.values())
    cum = [0, 0, 0, 0]  # cnt, nt, crt, crc
    binned: dict = {}
    for vq in sorted(blocks, reverse=True):
        cnt, nt, rt, rc = blocks[vq]
        off = cum[0]  # rows STRICTLY ahead of this block
        cum[0] += cnt
        cum[1] += nt
        cum[2] += rt
        cum[3] += rc
        b = (off * 10) // n_total
        cur = binned.setdefault(b, [0, 0, 0, 0])
        cur[0] = max(cur[0], cum[1])          # cum_n_t
        cur[1] = max(cur[1], cum[0] - cum[1])  # cum_n_c
        cur[2] = max(cur[2], cum[2])          # cum_resp_t
        cur[3] = max(cur[3], cum[3])          # cum_resp_c
    assert set(got) == set(binned)
    for b, (cnt_t, cnt_c, crt, crc) in binned.items():
        r = got[b]
        assert (r["cum_n_t"], r["cum_n_c"]) == (cnt_t, cnt_c), b
        assert (r["cum_resp_t"], r["cum_resp_c"]) == (crt, crc), b
        if cnt_c > 0:
            assert r["qini"] == pytest.approx(
                crt - crc * cnt_t / cnt_c, abs=1e-9
            ), b


def test_conformal_interval_split_rank_replay(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["conformal_interval"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    daily: dict = Counter()
    for ty, us, v in zip(e["event_type"], e["us"], e["value"]):
        day = int(us) // 86_400_000_000
        daily[(ty, day)] += _ha(v * 100)
    by_type: dict = defaultdict(list)
    for (ty, day), vq in daily.items():
        by_type[ty].append((day, vq))
    expect = {}
    for ty, rows in by_type.items():
        rows.sort()
        vals = [vq for _, vq in rows]
        days = [d for d, _ in rows]
        scored = [
            (days[i], abs(vals[i] - vals[i - 7]))
            for i in range(7, len(vals))
        ]
        n = len(scored)
        n_cal_cut = (7 * n) // 10
        cal = scored[:n_cal_cut]
        test = scored[n_cal_cut:]
        ncal = len(cal)
        # finite-sample conformal rank: ceil(0.9 * (ncal + 1)),
        # clamped to ncal; ties in r broken by day
        rank = min(ncal, (9 * (ncal + 1) + 9) // 10)
        q = sorted(cal, key=lambda t: (t[1], t[0]))[rank - 1][1]
        n_test = len(test)
        covered = sum(1 for _, r in test if r <= q)
        expect[ty] = (ncal, n_test, q / 100.0, covered / n_test)
    assert set(got) == set(expect)
    for ty, (ncal, ntest, q, cov) in expect.items():
        r = got[ty]
        assert (r["n_cal"], r["n_test"]) == (ncal, ntest), ty
        assert r["q"] == pytest.approx(q, abs=1e-9), ty
        assert r["coverage"] == pytest.approx(cov, abs=1e-9), ty
        # split-conformal validity: coverage should sit near 90%
        assert r["coverage"] >= 0.5, ty
