"""Brute-force twins for round-6 wave-9/10 operators: DiD, CUPED,
NDCG@k, AP@k, Brier calibration, lead-lag cross-correlation."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F


def _cents(x: float) -> int:
    s = x * 100
    return int(math.copysign(math.floor(abs(s) + 0.5), s))


def _exp_rows(seed: int, n_users: int = 40, n_rows: int = 600):
    """(user, post, value) rows with a real treatment effect baked in
    so DiD has something to find."""
    rnd = random.Random(seed)
    rows = []
    for _ in range(n_rows):
        u = rnd.randrange(n_users)
        post = rnd.random() < 0.5
        v = rnd.uniform(1, 20)
        if u % 2 == 1 and post:
            v += 3.0  # the true effect
        rows.append((u, post, round(v, 2)))
    return rows


class TestDidEstimator:
    def test_matches_cell_means(self, spark):
        from defimap_data_pipelines_spark.operators.experiments import (
            did_estimator,
        )

        rows = _exp_rows(3)
        df = spark.createDataFrame(
            rows, "u long, post boolean, value double"
        )
        got = did_estimator(
            df, F.col("u") % 2 == 1, F.col("post"), "value"
        ).collect()[0]

        cells: dict = {}
        for u, post, v in rows:
            cells.setdefault((u % 2, int(post)), []).append(_cents(v))
        mean = {
            k: sum(vs) / (len(vs) * 100.0) for k, vs in cells.items()
        }
        did = (mean[(1, 1)] - mean[(1, 0)]) - (
            mean[(0, 1)] - mean[(0, 0)]
        )
        assert got["n_treat_post"] == len(cells[(1, 1)])
        assert got["mean_ctrl_pre"] == pytest.approx(
            mean[(0, 0)], abs=2e-9
        )
        assert got["did"] == pytest.approx(did, abs=2e-9)
        # the baked-in +3 effect should be visible
        assert 2.0 < got["did"] < 4.0

    def test_empty_cell_gives_null_not_blowup(self, spark):
        from defimap_data_pipelines_spark.operators.experiments import (
            did_estimator,
        )

        # no treated-pre rows at all
        df = spark.createDataFrame(
            [(0, False, 1.0), (0, True, 2.0), (1, True, 3.0)],
            "u long, post boolean, value double",
        )
        got = did_estimator(
            df, F.col("u") % 2 == 1, F.col("post"), "value"
        ).collect()[0]
        assert got["n_treat_pre"] == 0
        assert got["mean_treat_pre"] is None
        assert got["did"] is None


class TestCuped:
    def test_matches_python_replica(self, spark):
        from defimap_data_pipelines_spark.operators.experiments import (
            cuped_adjustment,
        )

        rows = _exp_rows(9)
        df = spark.createDataFrame(
            rows, "u long, post boolean, value double"
        )
        got = {
            r["variant"]: r
            for r in cuped_adjustment(
                df, "u", F.col("u") % 2 == 1, F.col("post"), "value"
            ).collect()
        }

        per_unit: dict = {}
        for u, post, v in rows:
            x, y = per_unit.setdefault(u, [0, 0])
            per_unit[u][1 if post else 0] += _cents(v)
        units = [
            (u % 2, xy[0], xy[1]) for u, xy in per_unit.items()
        ]
        pn = len(units)
        psx = sum(x for _, x, _ in units)
        psy = sum(y for _, _, y in units)
        psxy = sum(x * y for _, x, y in units)
        psxx = sum(x * x for _, x, _ in units)
        psyy = sum(y * y for _, _, y in units)
        cov = float(psxy * pn - psx * psy)
        varx = float(psxx * pn - psx * psx)
        vary = float(psyy * pn - psy * psy)
        theta = cov / varx
        mean_all_x = psx / (pn * 100.0)
        for variant in (0, 1):
            vu = [(x, y) for t, x, y in units if t == variant]
            n = len(vu)
            mx = sum(x for x, _ in vu) / (n * 100.0)
            my = sum(y for _, y in vu) / (n * 100.0)
            g = got[variant]
            assert g["n_units"] == n
            assert g["mean_x"] == pytest.approx(mx, abs=2e-9)
            assert g["mean_y"] == pytest.approx(my, abs=2e-9)
            assert g["theta"] == pytest.approx(theta, abs=2e-9)
            assert g["adj_mean_y"] == pytest.approx(
                my - theta * (mx - mean_all_x), abs=2e-9
            )
            assert g["rho2"] == pytest.approx(
                (cov * cov) / (varx * vary), abs=2e-9
            )

    def test_adjustment_reduces_between_variant_gap_noise(self, spark):
        """With Y strongly driven by X and NO true effect, the
        adjusted means of the two variants should sit closer together
        than the raw means (the whole point of CUPED)."""
        from defimap_data_pipelines_spark.operators.experiments import (
            cuped_adjustment,
        )

        rnd = random.Random(21)
        rows = []
        for u in range(60):
            base = rnd.uniform(5, 50)  # user-level appetite
            for _ in range(4):
                rows.append((u, False, round(base * rnd.uniform(0.8, 1.2), 2)))
                rows.append((u, True, round(base * rnd.uniform(0.8, 1.2), 2)))
        df = spark.createDataFrame(
            rows, "u long, post boolean, value double"
        )
        got = {
            r["variant"]: r
            for r in cuped_adjustment(
                df, "u", F.col("u") % 2 == 1, F.col("post"), "value"
            ).collect()
        }
        raw_gap = abs(got[1]["mean_y"] - got[0]["mean_y"])
        adj_gap = abs(got[1]["adj_mean_y"] - got[0]["adj_mean_y"])
        assert got[0]["rho2"] > 0.5  # the covariate is informative
        assert adj_gap < raw_gap


class TestNdcg:
    def _brute(self, rows, k=10):
        # rows: (query, score, tb, rel)
        byq: dict = {}
        for q, s, tb, rel in rows:
            byq.setdefault(q, []).append((s, tb, rel))
        out = {}
        for q, cands in byq.items():
            by_score = sorted(cands, key=lambda c: (-c[0], c[1]))
            by_rel = sorted(cands, key=lambda c: (-c[2], c[1]))
            dcg = sum(
                rel / math.log2(i + 2)
                for i, (_, _, rel) in enumerate(by_score[:k])
            )
            idcg = sum(
                rel / math.log2(i + 2)
                for i, (_, _, rel) in enumerate(by_rel[:k])
            )
            out[q] = dcg / idcg if idcg > 0 else None
        return out

    def test_matches_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        rnd = random.Random(33)
        rows = [
            (f"q{i % 6}", rnd.randrange(100), i, rnd.randrange(4))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "q string, s long, tb long, rel long"
        )
        got = {
            r["query"]: r["ndcg"]
            for r in ndcg_at_k(
                df, "q", F.col("s"), "tb", F.col("rel")
            ).collect()
        }
        want = self._brute(rows)
        for q, v in want.items():
            if v is None:
                assert got[q] is None
            else:
                # nano-quantized weights vs float weights: agree to ~1e-8
                assert got[q] == pytest.approx(v, abs=1e-7)

    def test_perfect_ranking_is_one(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            ndcg_at_k,
        )

        rows = [("q", 100 - i, i, max(0, 3 - i)) for i in range(20)]
        df = spark.createDataFrame(
            rows, "q string, s long, tb long, rel long"
        )
        got = ndcg_at_k(df, "q", F.col("s"), "tb", F.col("rel")).collect()[0]
        assert got["ndcg"] == 1.0


class TestAveragePrecision:
    def test_matches_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            avg_precision_at_k,
        )

        rnd = random.Random(41)
        k = 10
        rows = [
            (f"q{i % 5}", rnd.randrange(50), i, rnd.random() < 0.3)
            for i in range(150)
        ]
        df = spark.createDataFrame(
            rows, "q string, s long, tb long, rel boolean"
        )
        got = {
            r["query"]: r["ap"]
            for r in avg_precision_at_k(
                df, "q", F.col("s"), "tb", F.col("rel"), k=k
            ).collect()
        }
        byq: dict = {}
        for q, s, tb, rel in rows:
            byq.setdefault(q, []).append((s, tb, rel))
        for q, cands in byq.items():
            ranked = sorted(cands, key=lambda c: (-c[0], c[1]))
            n_rel = sum(1 for _, _, r in ranked if r)
            cum, ap = 0, 0.0
            for i, (_, _, rel) in enumerate(ranked[:k], start=1):
                if rel:
                    cum += 1
                    ap += cum / i
            want = ap / min(k, n_rel) if n_rel else None
            if want is None:
                assert got[q] is None
            else:
                assert got[q] == pytest.approx(want, abs=1e-9)


class TestBrierCalibration:
    def test_matches_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            brier_calibration,
        )

        rnd = random.Random(55)
        rows = []
        for _ in range(400):
            p = rnd.randrange(0, 1001)
            y = rnd.random() < p / 1000.0  # perfectly calibrated source
            rows.append((p, y))
        df = spark.createDataFrame(rows, "p long, y boolean")
        got = {
            r["bin"]: r
            for r in brier_calibration(df, F.col("p"), F.col("y")).collect()
        }
        bins: dict = {}
        for p, y in rows:
            bins.setdefault(min(p * 10 // 1000, 9), []).append((p, int(y)))
        assert set(got) == set(bins)
        for b, vs in bins.items():
            n = len(vs)
            g = got[b]
            assert g["n"] == n
            assert g["mean_pred"] == pytest.approx(
                sum(p for p, _ in vs) / (n * 1000.0), abs=1e-9
            )
            assert g["obs_rate"] == pytest.approx(
                sum(y for _, y in vs) / n, abs=1e-9
            )
            assert g["brier"] == pytest.approx(
                sum((p - 1000 * y) ** 2 for p, y in vs) / (n * 1e6),
                abs=1e-9,
            )

    def test_p_1000_lands_in_top_bin(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            brier_calibration,
        )

        df = spark.createDataFrame([(1000, True)], "p long, y boolean")
        got = brier_calibration(df, F.col("p"), F.col("y")).collect()
        assert [(r["bin"], r["brier"]) for r in got] == [(9, 0.0)]


class TestLeadLagXcorr:
    def test_recovers_known_lag(self, spark):
        """y is x shifted by +2 days plus noise: the xcorr argmax
        must land on lag = +2 (a leads b by 2)."""
        from defimap_data_pipelines_spark.operators.stats import (
            daily_series,
            leadlag_xcorr,
        )

        rnd = random.Random(61)
        d0 = dt.datetime(2024, 1, 1)
        xs = [rnd.uniform(10, 100) for _ in range(40)]
        rows = []
        for i, x in enumerate(xs):
            rows.append((d0 + dt.timedelta(days=i), "a", round(x, 2)))
        for i, x in enumerate(xs):
            if i + 2 < len(xs):
                rows.append(
                    (
                        d0 + dt.timedelta(days=i + 2),
                        "b",
                        round(x + rnd.uniform(-1, 1), 2),
                    )
                )
        df = spark.createDataFrame(rows, "ts timestamp, t string, v double")
        daily = daily_series(df, "t", "ts", "v", "2024-01-01")
        out = {
            r["lag"]: r["xcorr"]
            for r in leadlag_xcorr(daily, "a", "b", max_lag=4).collect()
        }
        assert len(out) == 9
        best = max(out, key=lambda k: out[k] if out[k] is not None else -2)
        assert best == 2
        assert out[2] > 0.99

    def test_matches_pearson_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            daily_series,
            leadlag_xcorr,
        )

        rnd = random.Random(71)
        d0 = dt.datetime(2024, 1, 1)
        rows = []
        series: dict = {"a": {}, "b": {}}
        for g in ("a", "b"):
            for i in range(30):
                v = round(rnd.uniform(1, 50), 2)
                series[g][i] = _cents(v)
                rows.append((d0 + dt.timedelta(days=i), g, v))
        df = spark.createDataFrame(rows, "ts timestamp, t string, v double")
        daily = daily_series(df, "t", "ts", "v", "2024-01-01")
        got = {
            r["lag"]: (r["n_days"], r["xcorr"])
            for r in leadlag_xcorr(daily, "a", "b", max_lag=3).collect()
        }
        for lag in range(-3, 4):
            pairs = [
                (series["a"][d], series["b"][d + lag])
                for d in series["a"]
                if d + lag in series["b"]
            ]
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            want = (n * sxy - sx * sy) / math.sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            assert got[lag][0] == n
            assert got[lag][1] == pytest.approx(want, abs=2e-9)
