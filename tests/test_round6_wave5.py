"""Closed-form tests for round-6 wave-5 operators: Spearman,
Mann-Whitney, Kaplan-Meier, Holt smoothing, seasonal residuals.

The registered queries are oracle-checked end-to-end by the parity
suite; these pin operator-level semantics against hand-computed (or
scipy-free reimplemented) values on tiny inputs, plus the contract
edges (ties, censoring, duplicate order keys) a SQL replay alone
cannot distinguish from coincidence.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestSpearman:
    def test_perfect_monotone(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            spearman_by_group,
        )

        rows = [("a", i, float(i * i)) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "g string, x long, y double")
        got = spearman_by_group(df, "g", "x", "y").collect()
        assert len(got) == 1
        assert got[0]["rho"] == pytest.approx(1.0, abs=1e-12)

    def test_perfect_inverse(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            spearman_by_group,
        )

        rows = [("a", i, float(-3 * i)) for i in range(1, 8)]
        df = spark.createDataFrame(rows, "g string, x long, y double")
        got = spearman_by_group(df, "g", "x", "y").collect()
        assert got[0]["rho"] == pytest.approx(-1.0, abs=1e-12)

    def test_ties_average_ranks(self, spark):
        # x = 1,2,3,4 ; y = 10,20,20,30. Average ranks for the tied
        # 20s are 2.5 each. Hand Pearson on ranks: rho = 0.9486833.
        from defimap_data_pipelines_spark.operators.stats import (
            spearman_by_group,
        )

        rows = [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 20.0), ("a", 4, 30.0)]
        df = spark.createDataFrame(rows, "g string, x long, y double")
        got = spearman_by_group(df, "g", "x", "y").collect()[0]
        rx = [1, 2, 3, 4]
        ry = [1, 2.5, 2.5, 4]
        n = 4
        mx = sum(rx) / n
        my = sum(ry) / n
        num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        den = math.sqrt(
            sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)
        )
        assert got["rho"] == pytest.approx(num / den, abs=1e-9)

    def test_constant_column_dropped(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            spearman_by_group,
        )

        rows = [("a", i, 5.0) for i in range(5)]
        df = spark.createDataFrame(rows, "g string, x long, y double")
        assert spearman_by_group(df, "g", "x", "y").count() == 0


def _mw_reference(xs: list[float], ys: list[float]) -> tuple[float, float]:
    """Plain-Python tie-corrected Mann-Whitney (U of sample x, z)."""
    u = 0.0
    for a in xs:
        for b in ys:
            if a > b:
                u += 1.0
            elif a == b:
                u += 0.5
    n1, n2 = len(xs), len(ys)
    nn = n1 + n2
    combined = sorted(xs + ys)
    ties: dict[float, int] = {}
    for v in combined:
        ties[v] = ties.get(v, 0) + 1
    t = sum(c**3 - c for c in ties.values())
    var = n1 * n2 / 12.0 * ((nn + 1) - t / (nn * (nn - 1)))
    z = (u - n1 * n2 / 2.0) / math.sqrt(var)
    return u, z


class TestMannWhitney:
    def test_matches_reference_with_ties(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            mannwhitney_pairs,
        )

        xs = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 7.0]
        ys = [2.0, 4.0, 4.0, 5.0, 6.0]
        rows = [("a", v) for v in xs] + [("b", v) for v in ys]
        df = spark.createDataFrame(rows, "g string, v double")
        got = mannwhitney_pairs(df, "g", "v", quantum=1).collect()
        assert len(got) == 1
        r = got[0]
        u_ref, z_ref = _mw_reference(xs, ys)
        assert r["u2"] == int(round(2 * u_ref))
        assert r["z"] == pytest.approx(z_ref, abs=1e-9)
        assert (r["n_a"], r["n_b"]) == (len(xs), len(ys))

    def test_all_pairs_emitted(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            mannwhitney_pairs,
        )

        rows = [(g, float(i + ord(g[0]))) for g in "abc" for i in range(4)]
        df = spark.createDataFrame(rows, "g string, v double")
        got = mannwhitney_pairs(df, "g", "v", quantum=1)
        assert {(r["g_a"], r["g_b"]) for r in got.collect()} == {
            ("a", "b"),
            ("a", "c"),
            ("b", "c"),
        }

    def test_identical_groups_zero_z(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            mannwhitney_pairs,
        )

        rows = [("a", float(v)) for v in (1, 2, 3)] + [
            ("b", float(v)) for v in (1, 2, 3)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        r = mannwhitney_pairs(df, "g", "v", quantum=1).collect()[0]
        # U = n1*n2/2 = 4.5 -> u2 = 9, z = 0
        assert r["u2"] == 9
        assert r["z"] == pytest.approx(0.0, abs=1e-12)

    def test_all_tied_dropped(self, spark):
        # Every value identical: variance is exactly 0 -> no row.
        from defimap_data_pipelines_spark.operators.stats import (
            mannwhitney_pairs,
        )

        rows = [("a", 2.0)] * 3 + [("b", 2.0)] * 4
        df = spark.createDataFrame(rows, "g string, v double")
        assert mannwhitney_pairs(df, "g", "v", quantum=1).count() == 0


class TestKaplanMeier:
    def test_textbook_curve(self, spark):
        # Durations 1,2+,3,4 (+: censored). Steps at 1: S=3/4; at 3:
        # S=3/4 * 1/2 = 3/8. Death at max duration 4 has n==d -> row
        # dropped by contract (survival 0 beyond).
        from defimap_data_pipelines_spark.operators.stats import (
            kaplan_meier_curve,
        )

        rows = [("g", 1, 1), ("g", 2, 0), ("g", 3, 1), ("g", 4, 1)]
        df = spark.createDataFrame(rows, "c string, dur long, obs int")
        got = {
            r["dur"]: r
            for r in kaplan_meier_curve(df, "c", "dur", "obs").collect()
        }
        assert set(got) == {1, 3}
        assert got[1]["at_risk"] == 4
        assert got[1]["survival"] == pytest.approx(0.75, abs=1e-9)
        assert got[3]["at_risk"] == 2
        assert got[3]["survival"] == pytest.approx(0.375, abs=1e-9)

    def test_censoring_changes_curve(self, spark):
        # The same death times with the censored subject flipped to
        # observed must change survival — censoring is load-bearing.
        from defimap_data_pipelines_spark.operators.stats import (
            kaplan_meier_curve,
        )

        base = [("g", 1, 1), ("g", 2, 0), ("g", 5, 1), ("g", 9, 0)]
        flip = [("g", 1, 1), ("g", 2, 1), ("g", 5, 1), ("g", 9, 0)]
        mk = lambda rows: {  # noqa: E731
            r["dur"]: r["survival"]
            for r in kaplan_meier_curve(
                spark.createDataFrame(
                    rows, "c string, dur long, obs int"
                ),
                "c",
                "dur",
                "obs",
            ).collect()
        }
        a, b = mk(base), mk(flip)
        assert a[5] == pytest.approx(0.75 * 0.5, abs=1e-9)
        assert b[5] == pytest.approx(0.75 * (2 / 3) * 0.5, rel=1e-6)

    def test_groups_independent(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            kaplan_meier_curve,
        )

        rows = [("a", 1, 1), ("a", 2, 0), ("b", 1, 1), ("b", 1, 1),
                ("b", 2, 0)]
        df = spark.createDataFrame(rows, "c string, dur long, obs int")
        got = kaplan_meier_curve(df, "c", "dur", "obs").collect()
        by = {(r["c"], r["dur"]): r["survival"] for r in got}
        assert by[("a", 1)] == pytest.approx(0.5, abs=1e-9)
        assert by[("b", 1)] == pytest.approx(1 / 3, rel=1e-6)


class TestHolt:
    def test_matches_plain_loop(self, spark):
        from defimap_data_pipelines_spark.operators.rolling import (
            holt_quantized,
        )

        xs = [3.2, -1.7, 4.4, 4.9, -0.3, 8.8]
        rows = [("k", i, x) for i, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "k string, o long, v double")
        got = {
            r["o"]: (r["level_q"], r["trend_q"], r["forecast_q"])
            for r in holt_quantized(df, "k", "o", "v", micro=1000).collect()
        }

        def trunc2(s: int) -> int:
            return -((-s) // 2) if s < 0 else s // 2

        l = b = None
        for i, x in enumerate(xs):
            xq = round(x * 1000)
            if l is None:
                l, b = xq, 0
            else:
                lp = l
                l = trunc2(xq + l + b)
                b = trunc2((l - lp) + b)
            assert got[i] == (l, b, l + b)

    def test_linear_series_tracks_trend(self, spark):
        # On x_t = 10*t the converged trend approaches the true slope
        # (alpha=beta=1/2 converges geometrically).
        from defimap_data_pipelines_spark.operators.rolling import (
            holt_quantized,
        )

        rows = [("k", i, float(10 * i)) for i in range(40)]
        df = spark.createDataFrame(rows, "k string, o long, v double")
        last = (
            holt_quantized(df, "k", "o", "v", micro=1)
            .orderBy("o")
            .collect()[-1]
        )
        assert abs(last["trend_q"] - 10) <= 1
        assert abs(last["forecast_q"] - (last["level_q"] + 10)) <= 2

    def test_duplicate_order_raises(self, spark):
        from defimap_data_pipelines_spark.operators.rolling import (
            holt_quantized,
        )

        rows = [("k", 1, 1.0), ("k", 1, 2.0)]
        df = spark.createDataFrame(rows, "k string, o long, v double")
        with pytest.raises(Exception, match="duplicate order"):
            holt_quantized(df, "k", "o", "v").collect()


class TestSeasonalResiduals:
    def test_pure_seasonal_zero_residuals(self, spark):
        # Value depends only on weekday -> every residual is exactly
        # 0; variance is exactly 0 so z is NULL (the guarded branch)
        from defimap_data_pipelines_spark.operators.timeseries import (
            seasonal_residuals,
        )

        rows = []
        for i in range(28):
            d = f"2024-01-{i + 1:02d}"
            rows.append((d, (i % 7) * 100))
        df = spark.createDataFrame(rows, "day_s string, xq long").select(
            F.to_date("day_s").alias("day"), "xq"
        )
        got = seasonal_residuals(df, "day", "xq").collect()
        assert len(got) == 28
        assert all(r["resid_u"] == 0 for r in got)
        assert all(r["z"] is None for r in got)

    def test_single_spike_flagged(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            seasonal_residuals,
        )

        rows = []
        for i in range(28):
            d = f"2024-01-{i + 1:02d}"
            xq = (i % 7) * 100 + (5000 if i == 13 else 0)
            rows.append((d, xq))
        df = spark.createDataFrame(rows, "day_s string, xq long").select(
            F.to_date("day_s").alias("day"), "xq"
        )
        got = seasonal_residuals(df, "day", "xq").orderBy("day").collect()
        zmax = max(got, key=lambda r: abs(r["z"]))
        assert zmax["day"].isoformat() == "2024-01-14"
        assert abs(zmax["z"]) > 3

    def test_iso_weekday_convention(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            seasonal_residuals,
        )

        # 2024-01-01 is a Monday -> ISO dow 1; 2024-01-07 Sunday -> 7.
        rows = [(f"2024-01-{i + 1:02d}", 10) for i in range(7)]
        df = spark.createDataFrame(rows, "day_s string, xq long").select(
            F.to_date("day_s").alias("day"), "xq"
        )
        got = {
            r["day"].isoformat(): r["dow"]
            for r in seasonal_residuals(df, "day", "xq").collect()
        }
        assert got["2024-01-01"] == 1
        assert got["2024-01-07"] == 7
