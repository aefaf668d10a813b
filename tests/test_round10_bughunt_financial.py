"""Round-10 bug hunt, financial tail-risk family: pure-python
references computed from the SAME gotk/benchmark daily series the
queries consume (collected once to pandas), independently re-deriving
each statistic from its documented contract — neither Spark window
arithmetic nor DuckDB SQL. Parity proves Spark == DuckDB; these prove
both == the published formula.

Conventions replayed from the docstrings (operators/risk.py):
nano/micro quantization is ROUND HALF AWAY FROM ZERO (Spark ROUND);
annualization is compounding (1 + mean_daily)^365 - 1 for
sortino/ulcer but SIMPLE x365 for the information ratio's mean
active return; drawdowns are rounded to their quantum BEFORE the
max/sum; var_cvar ranks ascending by (quantized return, date) with
k = max(1, n*5 div 100).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.plans.queries import (
    DS,
    LAST_YEAR,
    QUERIES,
    orders_raw_series,
)

RQ9 = 1_000_000_000
RQ6 = 1_000_000


def _ha(x: float) -> int:
    """round half away from zero (Spark/DuckDB ROUND)."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


@pytest.fixture(scope="module")
def series(spark, sf_dir):
    """Per-name trailing-365 daily gotk rows, date-ascending, plus
    the 1-URGENT capital benchmark — the exact frames the financial
    queries consume, collected once."""
    from defimap_data_pipelines_spark.operators.growth import (
        capital_gotk,
        growth_of_10k,
    )
    from defimap_data_pipelines_spark.operators.risk import _tail

    raw = orders_raw_series(spark, sf_dir)
    g = _tail(growth_of_10k(raw, LAST_YEAR, DS), 365)
    rows = g.select(
        "name", "date", "percent_change", "end_day_investment"
    ).collect()
    per_name: dict[str, list] = {}
    for r in rows:
        per_name.setdefault(r["name"], []).append(
            (r["date"], r["percent_change"], r["end_day_investment"])
        )
    for v in per_name.values():
        v.sort(key=lambda t: t[0])
    bench_rows = (
        _tail(
            capital_gotk(
                raw.filter(
                    (F.col("name") == "1-URGENT")
                    & F.col("date").between(F.lit(LAST_YEAR), F.lit(DS))
                )
            ),
            365,
        )
        .select("date", "percent_change")
        .collect()
    )
    bench = {r["date"]: r["percent_change"] for r in bench_rows}
    return per_name, bench


def _ann_compound(rq_sum: int, n: int) -> float:
    return (rq_sum / RQ9 / n + 1) ** 365.0 - 1


def _cummax(vals):
    peak, out = -math.inf, []
    for v in vals:
        peak = max(peak, v)
        out.append(peak)
    return out


def test_sortino_calmar_matches_definition(spark, sf_dir, series):
    per_name, _ = series
    got = {r["name"]: r for r in QUERIES["sortino_calmar"](spark, sf_dir).collect()}
    assert set(got) == set(per_name)
    for name, rows in per_name.items():
        rq = [_ha(r * RQ9) for _, r, _ in rows]
        rq6 = [_ha(r * RQ6) for _, r, _ in rows]
        edi = [e for _, _, e in rows]
        n = len(rows)
        ann = _ann_compound(sum(rq), n)
        ssqn = sum(v * v for v in rq6 if v < 0)
        ddev = math.sqrt(ssqn / (RQ6 * RQ6) / (n - 1)) * math.sqrt(365.0)
        mddq = max(
            _ha((1 - e / p) * RQ9) for e, p in zip(edi, _cummax(edi))
        )
        r = got[name]
        assert r["n_days"] == n
        assert r["ann_return"] == pytest.approx(ann, abs=2e-9)
        assert r["downside_dev"] == pytest.approx(ddev, abs=2e-9)
        assert r["max_dd"] == pytest.approx(mddq / RQ9, abs=2e-9)
        if ssqn > 0:
            assert r["sortino"] == pytest.approx(ann / ddev, abs=1e-6)
        else:
            assert r["sortino"] is None
        if mddq > 0:
            assert r["calmar"] == pytest.approx(ann / (mddq / RQ9), abs=1e-6)
        else:
            assert r["calmar"] is None


def test_var_cvar_matches_order_statistics(spark, sf_dir, series):
    per_name, _ = series
    got = {r["name"]: r for r in QUERIES["var_cvar"](spark, sf_dir).collect()}
    for name, rows in per_name.items():
        ranked = sorted((_ha(r * RQ9), d) for d, r, _ in rows)
        n = len(ranked)
        k = max(1, n * 5 // 100)
        tail = [rq for rq, _ in ranked[:k]]
        r = got[name]
        assert (r["n_days"], r["k_tail"]) == (n, k)
        assert r["var_pct"] == pytest.approx(-tail[-1] / RQ9, abs=2e-9)
        assert r["cvar_pct"] == pytest.approx(
            -sum(tail) / k / RQ9, abs=2e-9
        )


def test_ulcer_martin_matches_rms_drawdown(spark, sf_dir, series):
    per_name, _ = series
    got = {r["name"]: r for r in QUERIES["ulcer_martin"](spark, sf_dir).collect()}
    for name, rows in per_name.items():
        rq = [_ha(r * RQ9) for _, r, _ in rows]
        edi = [e for _, _, e in rows]
        n = len(rows)
        dd6 = [
            _ha((1 - e / p) * RQ6) for e, p in zip(edi, _cummax(edi))
        ]
        ui = math.sqrt(sum(v * v for v in dd6) / n) / RQ6 * 100.0
        ann = _ann_compound(sum(rq), n)
        r = got[name]
        assert r["n_days"] == n
        assert r["ulcer_index"] == pytest.approx(ui, abs=2e-9)
        assert r["ann_return"] == pytest.approx(ann, abs=2e-9)
        if any(dd6):
            assert r["martin"] == pytest.approx(ann * 100.0 / ui, abs=1e-6)
        else:
            assert r["martin"] is None


def test_variance_ratio_matches_lo_mackinlay(spark, sf_dir, series):
    per_name, _ = series
    q = 5
    got = {r["name"]: r for r in QUERIES["variance_ratio"](spark, sf_dir).collect()}
    for name, rows in per_name.items():
        r6 = [_ha(r * RQ6) for _, r, _ in rows]
        n = len(r6)
        s1, ss1 = sum(r6), sum(v * v for v in r6)
        var1 = (n * ss1 - s1 * s1) / (n * (n - 1)) / (RQ6 * RQ6)
        sums_q = [
            sum(r6[i - q + 1 : i + 1]) for i in range(q - 1, n)
        ]
        nq = len(sums_q)
        sq, ssq = sum(sums_q), sum(v * v for v in sums_q)
        varq = (nq * ssq - sq * sq) / (nq * (nq - 1)) / (RQ6 * RQ6)
        r = got[name]
        assert (r["n_days"], r["q"]) == (n, q)
        assert r["var_1"] == pytest.approx(var1, abs=1e-12)
        assert r["var_q"] == pytest.approx(varq, abs=1e-12)
        if n * ss1 - s1 * s1 > 0:
            assert r["vr"] == pytest.approx(varq / (q * var1), abs=1e-6)
        else:
            assert r["vr"] is None


def test_information_ratio_matches_active_moments(spark, sf_dir, series):
    per_name, bench = series
    got = {
        r["name"]: r
        for r in QUERIES["information_ratio"](spark, sf_dir).collect()
    }
    for name, rows in per_name.items():
        joined = [(d, r) for d, r, _ in rows if d in bench]
        d9 = [_ha(a * RQ9) - _ha(bench[d] * RQ9) for d, a in joined]
        d6 = [_ha(a * RQ6) - _ha(bench[d] * RQ6) for d, a in joined]
        n = len(joined)
        mean_ann = sum(d9) / RQ9 / n * 365.0
        s6, ss6 = sum(d6), sum(v * v for v in d6)
        var6 = (n * ss6 - s6 * s6) / (n * (n - 1))
        te = math.sqrt(var6) / RQ6 * math.sqrt(365.0)
        r = got[name]
        assert r["n_days"] == n
        assert r["active_return_ann"] == pytest.approx(mean_ann, abs=2e-9)
        assert r["tracking_error"] == pytest.approx(te, abs=2e-9)
        if n * ss6 - s6 * s6 > 0:
            assert r["info_ratio"] == pytest.approx(mean_ann / te, abs=1e-6)
        else:
            assert r["info_ratio"] is None


def test_updown_capture_matches_conditional_sums(spark, sf_dir, series):
    per_name, bench = series
    got = {
        r["name"]: r
        for r in QUERIES["updown_capture"](spark, sf_dir).collect()
    }
    for name, rows in per_name.items():
        pairs = [
            (_ha(a * RQ9), _ha(bench[d] * RQ9))
            for d, a, _ in rows
            if d in bench
        ]
        up = [(a, b) for a, b in pairs if b > 0]
        dn = [(a, b) for a, b in pairs if b < 0]
        r = got[name]
        assert (r["n_up"], r["n_down"]) == (len(up), len(dn))
        sb_up = sum(b for _, b in up)
        sb_dn = sum(b for _, b in dn)
        uc = sum(a for a, _ in up) / sb_up if sb_up else None
        dc = sum(a for a, _ in dn) / sb_dn if sb_dn else None
        if uc is not None:
            assert r["up_capture"] == pytest.approx(uc, abs=1e-6)
        else:
            assert r["up_capture"] is None
        if dc is not None:
            assert r["down_capture"] == pytest.approx(dc, abs=1e-6)
        else:
            assert r["down_capture"] is None
        if uc is not None and dc not in (None, 0):
            assert r["capture_ratio"] == pytest.approx(uc / dc, abs=1e-6)


def test_omega_ratio_matches_gain_loss_sums(spark, sf_dir, series):
    per_name, _ = series
    got = {r["name"]: r for r in QUERIES["omega_ratio"](spark, sf_dir).collect()}
    for name, rows in per_name.items():
        rq = [_ha(r * RQ9) for _, r, _ in rows]
        g = sum(max(v, 0) for v in rq)
        l = sum(max(-v, 0) for v in rq)
        r = got[name]
        assert r["n_days"] == len(rq)
        assert r["gain_sum"] == pytest.approx(g / RQ9, abs=2e-9)
        assert r["loss_sum"] == pytest.approx(l / RQ9, abs=2e-9)
        if l > 0:
            assert r["omega"] == pytest.approx(g / l, abs=1e-6)
        else:
            assert r["omega"] is None
