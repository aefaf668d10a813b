"""Round-12 third implementations, wave 4 — statistics / drift /
eval families: Wasserstein-1 drift (exact support-grid integral),
the pooled two-proportion z-test, PSI with add-1 smoothing, MRR@10
via the LCM integer trick, the 6-round integer Markov power
iteration, Benford's first-digit screen, and the Herfindahl
concentration index — each re-derived in pure python from the
method definitions and compared value-level against the Spark
queries.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    return e


def test_wasserstein_drift_support_grid_replay(spark, sf_dir):
    row = QUERIES["wasserstein_drift"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    e = _events(sf_dir)
    e = e[e["value"].notna()]
    per_v: dict = defaultdict(lambda: [0, 0])
    for uid, v in zip(e["user_id"], e["value"]):
        per_v[_ha(v * 100)][int(uid) % 2] += 1  # [even=a][odd=b]
    support = sorted(per_v)
    n_a = sum(c[0] for c in per_v.values())
    n_b = sum(c[1] for c in per_v.values())
    raw = cuma = cumb = 0
    for v, nxt in zip(support, support[1:]):
        cuma += per_v[v][0]
        cumb += per_v[v][1]
        raw += abs(cuma * n_b - cumb * n_a) * (nxt - v)
    w1 = raw / n_a / n_b / 100.0
    assert (got["n_a"], got["n_b"]) == (n_a, n_b)
    assert got["w1"] == pytest.approx(w1, abs=1e-9)


def test_two_proportion_ztest_pooled_replay(spark, sf_dir):
    row = QUERIES["two_proportion_ztest"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    e = _events(sf_dir)
    conv: dict = {}
    for uid, ty in zip(e["user_id"], e["event_type"]):
        u = int(uid)
        conv[u] = conv.get(u, 0) or (1 if ty == "purchase" else 0)
    n1 = sum(1 for u in conv if u % 2 == 1)
    c1 = sum(c for u, c in conv.items() if u % 2 == 1)
    n0 = len(conv) - n1
    c0 = sum(conv.values()) - c1
    p1, p0 = c1 / n1, c0 / n0
    # the declared degenerate guard: z only when 0 < c1+c0 < n1+n0
    z = None
    if 0 < c1 + c0 < n1 + n0:
        pool = (c1 + c0) / (n1 + n0)
        z = (p1 - p0) / math.sqrt(
            pool * (1 - pool) * (1 / n1 + 1 / n0)
        )
    assert (got["n1"], got["c1"], got["n0"], got["c0"]) == (n1, c1, n0, c0)
    assert got["p1"] == pytest.approx(p1, abs=1e-9)
    assert got["p0"] == pytest.approx(p0, abs=1e-9)
    assert got["diff"] == pytest.approx(p1 - p0, abs=1e-9)
    if z is None:
        assert got["z"] is None
    else:
        assert got["z"] == pytest.approx(z, abs=1e-9)


def test_psi_drift_add1_smoothed_replay(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["psi"])
        for r in QUERIES["psi_drift"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    cutoff_us = int(pd.Timestamp("2024-01-16", tz="UTC").timestamp() * 1e6)
    by_g: dict = defaultdict(list)
    for ty, us, v in zip(e["event_type"], e["us"], e["value"]):
        by_g[ty].append((_ha(v * 100), "a" if us < cutoff_us else "b"))
    expect = {}
    for g, rows in by_g.items():
        lo = min(v for v, _ in rows)
        hi = max(v for v, _ in rows)
        cells: dict = {b: [0, 0] for b in range(10)}
        for v, h in rows:
            cells[((v - lo) * 10) // (hi - lo + 1)][0 if h == "a" else 1] += 1
        ta = sum(c[0] for c in cells.values())
        tb = sum(c[1] for c in cells.values())
        acc = 0
        for b in range(10):
            ca, cb = cells[b]
            pa = (ca + 1) / (ta + 10)
            pb = (cb + 1) / (tb + 10)
            acc += _ha((pa - pb) * math.log(pa / pb) * 1e9)
        expect[g] = (ta, tb, acc / 1e9)
    assert set(got) == set(expect)
    for g, (ta, tb, psi) in expect.items():
        assert got[g][:2] == (ta, tb), g
        assert got[g][2] == pytest.approx(psi, abs=1e-9), g


def test_mrr_at_k_lcm_integer_replay(spark, sf_dir):
    row = QUERIES["mrr_at_k"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    lcm = 2520  # lcm(1..10) — every 1/rank is exact in units of 1/2520
    acc = n_q = n_hit = 0
    for _, g in d.groupby("source"):
        ranked = sorted(
            zip(g["n_chars"], g["doc_id"]), key=lambda t: (-t[0], t[1])
        )
        n_q += 1
        frk = next(
            (
                rk
                for rk, (_, did) in enumerate(ranked[:10], start=1)
                if int(did) % 7 == 0
            ),
            None,
        )
        if frk is not None:
            n_hit += 1
            acc += lcm // frk
    assert (got["n_queries"], got["n_hit"]) == (n_q, n_hit)
    assert got["mrr"] == pytest.approx(acc / (lcm * n_q), abs=1e-9)


def test_markov_stationary_integer_power_replay(spark, sf_dir):
    got = {
        r["event_type"]: r["v_micro"]
        for r in QUERIES["markov_stationary"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    trans: Counter = Counter()
    for _, g in e.groupby("user_id"):
        seq = [ty for _, _, ty in sorted(zip(g["us"], g["event_id"], g["event_type"]))]
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    rowsum: Counter = Counter()
    for (a, _), c in trans.items():
        rowsum[a] += c
    nodes = sorted(rowsum)
    v = {a: 1_000_000 // len(nodes) for a in nodes}
    for _ in range(6):
        nxt: Counter = Counter()
        for (a, b), c in trans.items():
            if a in v:
                nxt[b] += (v[a] * c) // rowsum[a]
        v = dict(nxt)
    assert got == v


def test_benford_first_digit_replay(spark, sf_dir):
    got = {
        r["digit"]: (r["n"], r["expected_n"], r["deviation"])
        for r in QUERIES["benford_digit_check"](spark, sf_dir).collect()
    }
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    counts: Counter = Counter()
    for p in o["o_totalprice"]:
        if p >= 1:
            counts[int(str(int(math.floor(p)))[0])] += 1
    total = sum(counts.values())
    assert set(got) == set(counts)
    for d, n in counts.items():
        exp = total * math.log10(1 + 1 / d)
        assert got[d][0] == n, d
        assert got[d][1] == pytest.approx(exp, abs=1e-6), d
        assert got[d][2] == pytest.approx(n - exp, abs=1e-6), d


def test_hhi_concentration_mass_squared_replay(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_members"], r["total"], r["hhi"], r["hhi_norm"])
        for r in QUERIES["hhi_concentration"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    mass: dict = defaultdict(Counter)
    for ty, uid, v in zip(e["event_type"], e["user_id"], e["value"]):
        mass[ty][int(uid)] += _ha(v * 100)
    expect = {}
    for ty, m in mass.items():
        n = len(m)
        total = sum(m.values())
        ssq = sum(q * q for q in m.values())
        hhi = ssq / (total * total)
        expect[ty] = (n, total, hhi, (n * hhi - 1) / (n - 1))
    assert set(got) == set(expect)
    for ty, (n, total, hhi, norm) in expect.items():
        assert got[ty][0] == n and got[ty][1] == total, ty
        assert got[ty][2] == pytest.approx(hhi, abs=1e-9), ty
        assert got[ty][3] == pytest.approx(norm, abs=1e-9), ty
