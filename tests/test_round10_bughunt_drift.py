"""Round-10 bug hunt, monitoring / text-law / multiple-testing
family: pure-python third implementations from the sf0.001 parquet —
McNemar's discordant cells, Wald-Wolfowitz runs, AR(1) half-life
OLS, Page-Hinkley sequential recursion (re-derived as the literal
online loop, not the window closed form), Zipf and Heaps log-log
fits with an independent OLS, and Benjamini-Hochberg with the step-up
procedure written as the textbook reverse scan.
"""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _norm_tokens(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ") if t else [""]


def test_mcnemar_matches_discordant_cells(spark, sf_dir):
    row = QUERIES["mcnemar_test"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")
    dd = (e["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    cut = int(dd.min()) + (int(dd.max()) - int(dd.min())) // 2
    per: dict = defaultdict(lambda: [0, 0])
    for u, d, t_ in zip(e["user_id"], dd, e["event_type"]):
        f = 1 if t_ == "purchase" else 0
        per[u][1 if d >= cut else 0] |= f
    n11 = sum(1 for a, b in per.values() if a and b)
    n10 = sum(1 for a, b in per.values() if a and not b)
    n01 = sum(1 for a, b in per.values() if not a and b)
    n00 = sum(1 for a, b in per.values() if not a and not b)
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    if n10 + n01 > 0:
        chi2 = (abs(n10 - n01) - 1) ** 2 / (n10 + n01)
        assert row["mcnemar_chi2"] == pytest.approx(chi2, abs=1e-9)
    else:
        assert row["mcnemar_chi2"] is None


def _lineitem_daily(sf_dir, scale):
    li = _pq(sf_dir, "lineitem")
    agg: dict = defaultdict(int)
    for k, d, p in zip(
        li["l_returnflag"], li["l_shipdate"], li["l_extendedprice"]
    ):
        agg[(k, d)] += _ha(scale(p))
    series: dict = defaultdict(list)
    for (k, d), v in sorted(agg.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))):
        series[k].append(v)
    return series


def test_runs_test_matches_wald_wolfowitz(spark, sf_dir):
    got = {
        r["returnflag"]: r
        for r in QUERIES["runs_test"](spark, sf_dir).collect()
    }
    for k, xs in _lineitem_daily(sf_dir, lambda p: p * 100).items():
        ups = [1 if xs[i] > xs[i - 1] else 0 for i in range(1, len(xs))]
        if not ups:
            assert k not in got
            continue
        runs = 1 + sum(
            1 for i in range(1, len(ups)) if ups[i] != ups[i - 1]
        )
        n1 = sum(ups)
        n2 = len(ups) - n1
        n = n1 + n2
        r = got[k]
        assert (r["n_up"], r["n_down"], r["runs"]) == (n1, n2, runs)
        var = (
            2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
            if n > 1
            else 0.0
        )
        if var > 0:
            z = (runs - (2.0 * n1 * n2 / n + 1.0)) / math.sqrt(var)
            assert r["z"] == pytest.approx(z, abs=1e-8)
        else:
            assert r["z"] is None


def test_ar1_halflife_matches_ols(spark, sf_dir):
    got = {
        r["returnflag"]: r
        for r in QUERIES["ar1_halflife"](spark, sf_dir).collect()
    }
    for k, xs in _lineitem_daily(sf_dir, lambda p: p / 100).items():
        pairs = list(zip(xs[:-1], xs[1:]))
        n = len(pairs)
        r = got[k]
        assert r["n_steps"] == n
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        sxy = sum(x * y for x, y in pairs)
        den = float(n) * sxx - float(sx) * sx
        if den == 0:
            assert r["beta"] is None
            continue
        beta = (float(n) * sxy - float(sx) * sy) / den
        assert r["beta"] == pytest.approx(beta, abs=1e-8)
        if 0 < beta < 1:
            assert r["halflife"] == pytest.approx(
                -math.log(2) / math.log(beta), abs=1e-6
            )
        else:
            assert r["halflife"] is None


def test_page_hinkley_matches_sequential_loop(spark, sf_dir):
    got = {r["day"]: r["ph_q"] for r in QUERIES["page_hinkley"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    agg: dict = defaultdict(int)
    epoch = pd.Timestamp("2024-01-01")
    for t_, ts, v in zip(e["event_type"], e["ts"], e["value"]):
        if t_ == "purchase":
            agg[(ts.normalize() - epoch).days] += _ha(v * 100)
    cs = rn = m = 0
    mmin = None
    expect = {}
    for day in sorted(agg):
        x = agg[day]
        cs += x
        rn += 1
        m += x - cs // rn  # running mean INCLUDING current, trunc div
        mmin = m if mmin is None else min(mmin, m)
        expect[day] = m - mmin
    assert got == expect


def _ols_quantized(points):
    xs = [_ha(math.log(t) * 1e6) for t, _ in points]
    ys = [_ha(math.log(v) * 1e6) for _, v in points]
    k = len(points)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    num = k * sxy - sx * sy
    denx = k * sxx - sx * sx
    deny = k * syy - sy * sy
    slope = num / denx if denx != 0 else None
    intercept = (
        (sy - slope * sx) / k / 1e6 if slope is not None else None
    )
    # engine guard: r2 NULL when either variance is zero (e.g. the
    # 31-token synthetic corpus saturates V, making deny = 0)
    r2 = (
        num * float(num) / (float(denx) * deny)
        if denx != 0 and deny != 0
        else None
    )
    return k, slope, intercept, r2


def test_zipf_fit_matches_loglog_ols(spark, sf_dir):
    row = QUERIES["zipf_fit"](spark, sf_dir).collect()[0]
    d = _pq(sf_dir, "documents")
    counts = Counter(
        tok for txt in d["text"] for tok in _norm_tokens(txt)
    )
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    pts = [(rank, cnt) for rank, (_, cnt) in enumerate(top, start=1)]
    k, slope, intercept, r2 = _ols_quantized(pts)
    assert row["k"] == k
    assert row["slope"] == pytest.approx(slope, abs=1e-8)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-8)
    assert row["r2"] == pytest.approx(r2, abs=1e-8)


def test_heaps_fit_matches_accretion_curve(spark, sf_dir):
    row = QUERIES["heaps_fit"](spark, sf_dir).collect()[0]
    d = _pq(sf_dir, "documents").sort_values("doc_id")
    docs = [
        _norm_tokens(t) for t in d["text"]
    ]  # index i = doc rank i+1 in doc_id order
    nd = len(docs)
    first: dict = {}
    cum_t = [0]
    for i, toks in enumerate(docs, start=1):
        for t_ in toks:
            first.setdefault(t_, i)
        cum_t.append(cum_t[-1] + len(toks))
    pts = []
    for i in range(1, 9):
        c = i * nd // 8
        t_total = cum_t[c]
        v = sum(1 for f in first.values() if f <= c)
        pts.append((t_total, v))
    k, slope, intercept, r2 = _ols_quantized(pts)
    assert row["points"] == k
    assert row["beta"] == pytest.approx(slope, abs=1e-8)
    assert row["intercept"] == pytest.approx(intercept, abs=1e-8)
    if r2 is None:
        assert row["r2"] is None
    else:
        assert row["r2"] == pytest.approx(r2, abs=1e-8)


def _norm_sf2(az: float) -> float:
    t = 1.0 / (1.0 + 0.2316419 * az)
    poly = t * (
        0.319381530
        + t
        * (
            -0.356563782
            + t * (1.781477937 + t * (-1.821255978 + t * 1.330274429))
        )
    )
    return 2.0 * math.exp(-az * az / 2.0) * 0.3989422804014327 * poly


def test_bh_fdr_matches_step_up_procedure(spark, sf_dir):
    rows = QUERIES["bh_fdr"](spark, sf_dir).collect()
    got = {(r["event_type"], r["dow"]): r for r in rows}
    e = _pq(sf_dir, "events")
    dow = e["ts"].dt.weekday + 1
    cells: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for t_, d, u, v in zip(e["event_type"], dow, e["user_id"], e["value"]):
        x = _ha(v * 100)
        c = cells[(t_, int(d))]
        if u % 2 == 0:  # control
            c[0] += 1
            c[1] += x
            c[2] += x * x
        else:
            c[3] += 1
            c[4] += x
            c[5] += x * x
    tested = []
    for key, (nc, sc, ssqc, nt, st, ssqt) in cells.items():
        if nc < 2 or nt < 2:
            continue
        se2 = (ssqc - float(sc) * sc / nc) / (nc - 1) / nc + (
            ssqt - float(st) * st / nt
        ) / (nt - 1) / nt
        if se2 <= 0:
            continue
        z = (float(st) / nt - float(sc) / nc) / math.sqrt(se2)
        tested.append((key, nc, nt, z, _norm_sf2(abs(z))))
    m = len(tested)
    tested.sort(key=lambda t: (t[4], t[0]))
    # textbook step-up: q_i = min_{j>=i} p_j * m / j, capped at 1
    padj = [0.0] * m
    running = math.inf
    for i in range(m - 1, -1, -1):
        running = min(running, tested[i][4] * m / (i + 1))
        padj[i] = min(1.0, running)
    assert set(got) == {t[0] for t in tested}
    for i, (key, nc, nt, z, p) in enumerate(tested):
        r = got[key]
        assert (r["n_c"], r["n_t"]) == (nc, nt)
        assert r["z"] == pytest.approx(z, abs=1e-8)
        assert r["p"] == pytest.approx(p, abs=1e-9)
        assert r["p_adj"] == pytest.approx(padj[i], abs=1e-9)
        assert r["rejected"] == (round(padj[i], 9) <= 0.1)
