"""Round-10 bug hunt, association / hypothesis-test family:
pure-python third implementations from the sf0.001 parquet —
kendall_tau via the textbook tau-b pair statistic, welch_t_pairs via
the Welch formula + Satterthwaite df, chi2/cramers_v via explicit
contingency tables, anova via the classic SSB/SSW decomposition,
cohens_kappa via the (p_o - p_e)/(1 - p_e) definition. Parity proves
Spark == DuckDB; these prove both == the math.
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


def _daily(sf_dir, quantum=100, epoch="2024-01-01"):
    e = _pq(sf_dir, "events")
    day = (e["ts"].dt.normalize() - pd.Timestamp(epoch)).dt.days
    q = [_ha(v * quantum) for v in e["value"]]
    agg: dict = defaultdict(int)
    for g, d, vq in zip(e["event_type"], day, q):
        agg[(g, int(d))] += vq
    return agg


def test_kendall_tau_matches_pair_statistic(spark, sf_dir):
    row = QUERIES["kendall_tau"](spark, sf_dir).collect()[0]
    agg = _daily(sf_dir)
    x = {d: v for (g, d), v in agg.items() if g == "click"}
    y = {d: v for (g, d), v in agg.items() if g == "purchase"}
    days = sorted(set(x) & set(y))
    pts = [(x[d], y[d]) for d in days]
    n = len(pts)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            prod = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            conc += prod > 0
            disc += prod < 0
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in Counter(p[0] for p in pts).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(p[1] for p in pts).values())
    assert (row["n_days"], row["concordant"], row["discordant"]) == (
        n,
        conc,
        disc,
    )
    if (n0 - n1) * (n0 - n2) > 0:
        tau = (conc - disc) / math.sqrt((n0 - n1) * (n0 - n2))
        assert row["tau_b"] == pytest.approx(tau, abs=1e-8)
    else:
        assert row["tau_b"] is None


def test_welch_t_pairs_matches_formula(spark, sf_dir):
    got = {
        (r["g_a"], r["g_b"]): r
        for r in QUERIES["welch_ttest"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    groups: dict = defaultdict(list)
    for g, v in zip(e["event_type"], e["value"]):
        groups[g].append(_ha(v * 100))
    names = sorted(g for g, vals in groups.items() if len(vals) >= 2)
    expected_pairs = {
        (a, b) for i, a in enumerate(names) for b in names[i + 1 :]
    }
    assert set(got) == expected_pairs
    for a, b in expected_pairs:
        va, vb = groups[a], groups[b]
        na, nb = len(va), len(vb)
        ma, mb = sum(va) / na, sum(vb) / nb
        sa2 = (sum(v * v for v in va) - sum(va) ** 2 / na) / (na - 1)
        sb2 = (sum(v * v for v in vb) - sum(vb) ** 2 / nb) / (nb - 1)
        se2a, se2b = sa2 / na, sb2 / nb
        t = (ma - mb) / math.sqrt(se2a + se2b)
        df = (se2a + se2b) ** 2 / (
            se2a**2 / (na - 1) + se2b**2 / (nb - 1)
        )
        r = got[(a, b)]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["t"] == pytest.approx(t, abs=1e-8)
        assert r["df"] == pytest.approx(df, abs=1e-5)


def _chi2_table(rows, cols):
    cells = Counter(zip(rows, cols))
    rt = Counter(rows)
    ct = Counter(cols)
    n = len(rows)
    chi_u = 0
    for (r, c), o in cells.items():
        e = rt[r] * ct[c] / n
        chi_u += _ha((o - e) * (o - e) / e * 1_000_000)
    return chi_u / 1_000_000, len(rt), len(ct), n


def test_chi2_independence_matches_contingency(spark, sf_dir):
    row = QUERIES["chi2_independence"](spark, sf_dir).collect()[0]
    d = _pq(sf_dir, "documents")
    chi2, nr, nc, n = _chi2_table(list(d["source"]), list(d["lang"]))
    assert row["n"] == n
    assert row["dof"] == (nr - 1) * (nc - 1)
    assert row["chi2"] == pytest.approx(chi2, abs=1e-9)


def test_cramers_v_matches_contingency(spark, sf_dir):
    row = QUERIES["cramers_v"](spark, sf_dir).collect()[0]
    c = _pq(sf_dir, "customer")
    chi2, nr, nc, n = _chi2_table(
        list(c["c_mktsegment"]), list(c["c_nationkey"])
    )
    assert (row["n"], row["dof"]) == (n, (nr - 1) * (nc - 1))
    assert row["chi2"] == pytest.approx(chi2, abs=1e-9)
    mindim = min(nr - 1, nc - 1)
    if mindim > 0:
        assert row["v"] == pytest.approx(
            math.sqrt(chi2 / (n * mindim)), abs=1e-9
        )
    else:
        assert row["v"] is None


def test_anova_oneway_matches_decomposition(spark, sf_dir):
    row = QUERIES["anova_oneway"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")
    groups: dict = defaultdict(list)
    for g, v in zip(e["event_type"], e["value"]):
        groups[g].append(_ha(v * 100))
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    s = sum(sum(v) for v in groups.values())
    ss = sum(sum(x * x for x in v) for v in groups.values())
    # micro-quantized per-group fractional terms, as documented
    stq = sum(
        _ha(float(sum(v)) * sum(v) / len(v) * 1_000_000.0)
        for v in groups.values()
    )
    sum_term = stq / 1_000_000.0
    grand = float(s) * s / n
    ssb = sum_term - grand
    ssw = ss - sum_term
    q2 = 100.0 * 100.0
    assert (row["n"], row["k"]) == (n, k)
    assert row["ss_between"] == pytest.approx(ssb / q2, abs=1e-5)
    assert row["ss_within"] == pytest.approx(ssw / q2, abs=1e-5)
    if round(ssw, 6) > 0:
        assert row["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-8)
        assert row["f_stat"] == pytest.approx(
            (ssb / (k - 1)) / (ssw / (n - k)), abs=1e-6
        )
    else:
        assert row["eta_sq"] is None and row["f_stat"] is None


def test_cohens_kappa_matches_definition(spark, sf_dir):
    row = QUERIES["cohens_kappa"](spark, sf_dir).collect()[0]
    d = _pq(sf_dir, "documents")
    ra = d["n_chars"] >= 300
    rb = d["text"].str.count(" ") >= 55
    n = len(d)
    agree = int((ra == rb).sum())
    na = Counter(ra)
    nb = Counter(rb)
    sum_rc = sum(na[v] * nb[v] for v in set(na) & set(nb))
    po = agree / n
    pe = sum_rc / (n * n)
    assert row["n"] == n
    assert row["observed_agreement"] == pytest.approx(po, abs=1e-9)
    assert row["expected_agreement"] == pytest.approx(pe, abs=1e-9)
    if n * n - sum_rc > 0:
        kappa = (agree * n - sum_rc) / (n * n - sum_rc)
        assert row["kappa"] == pytest.approx(kappa, abs=1e-9)
    else:
        assert row["kappa"] is None
