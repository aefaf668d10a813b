"""Brute-force twins for round-6 wave-12 operators: Kruskal-Wallis
vs textbook average ranks, average precision vs the step-integral
definition, Cohen's kappa vs the confusion-matrix formula, ulcer
index and variance ratio vs float reimplementations."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Kruskal-Wallis == textbook average-rank H
# ---------------------------------------------------------------------------


def _brute_kw(samples: dict):
    allv = sorted(v for vs in samples.values() for v in vs)
    n = len(allv)
    # average rank per value
    rank: dict = {}
    i = 0
    while i < n:
        j = i
        while j < n and allv[j] == allv[i]:
            j += 1
        for k in range(i, j):
            rank[allv[i]] = (i + 1 + j) / 2.0
        i = j
    h = sum(
        sum(rank[v] for v in vs) ** 2 / len(vs)
        for vs in samples.values()
    )
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    counts: dict = {}
    for v in allv:
        counts[v] = counts.get(v, 0) + 1
    t = sum(c**3 - c for c in counts.values())
    corr = 1 - t / (n**3 - n)
    return n, t, h, (h / corr if corr > 0 else None)


class TestKruskalWallis:
    @pytest.mark.parametrize("seed", [2, 5])
    def test_matches_bruteforce(self, spark, seed):
        from defimap_data_pipelines_spark.operators.stats import (
            kruskal_wallis,
        )

        rnd = random.Random(seed)
        samples = {
            g: [rnd.randint(0, 30 + shift) for _ in range(50)]
            for g, shift in [("a", 0), ("b", 10), ("c", 5)]
        }
        rows = [
            (g, float(v)) for g, vs in samples.items() for v in vs
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = kruskal_wallis(df, "g", "v", quantum=1).collect()[0]
        n, t, h, hc = _brute_kw(samples)
        assert got["n_total"] == n
        assert got["n_groups"] == 3
        assert got["t_ties"] == t
        # per-group terms quantized at 1e-6 before the sum
        assert got["h_stat"] == pytest.approx(h, abs=1e-5)
        assert got["h_corrected"] == pytest.approx(hc, abs=1e-5)

    def test_all_tied_gives_null(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            kruskal_wallis,
        )

        df = spark.createDataFrame(
            [("a", 1.0)] * 4 + [("b", 1.0)] * 4, "g string, v double"
        )
        got = kruskal_wallis(df, "g", "v", quantum=1).collect()[0]
        assert got["h_corrected"] is None


# ---------------------------------------------------------------------------
# Average precision == step integral over score blocks
# ---------------------------------------------------------------------------


def _brute_ap(pairs):
    """pairs: list of (score, y). Returns sklearn-convention AP with
    tied scores collapsed to one threshold."""
    from collections import defaultdict

    blocks = defaultdict(lambda: [0, 0])
    for s, y in pairs:
        blocks[s][0] += 1
        blocks[s][1] += y
    n1 = sum(y for _s, y in pairs)
    ap = 0.0
    ccnt = cpos = 0
    for s in sorted(blocks, reverse=True):
        cnt, pos = blocks[s]
        ccnt += cnt
        cpos += pos
        ap += (pos / n1) * (cpos / ccnt)
    return ap


class TestAveragePrecision:
    @pytest.mark.parametrize("seed", [1, 4])
    def test_matches_bruteforce(self, spark, seed):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            average_precision,
        )

        rnd = random.Random(seed)
        pairs = []
        for _ in range(300):
            s = rnd.randint(0, 40)
            y = 1 if rnd.random() < s / 60.0 else 0
            pairs.append((s, y))
        df = spark.createDataFrame(
            [(float(s), bool(y)) for s, y in pairs],
            "score double, y boolean",
        )
        got = average_precision(
            df, F.col("y"), "score", quantum=1
        ).collect()[0]
        n1 = sum(y for _s, y in pairs)
        assert got["n_pos"] == n1
        assert got["n_neg"] == len(pairs) - n1
        assert got["avg_precision"] == pytest.approx(
            _brute_ap(pairs), abs=1e-6
        )
        assert got["baseline"] == pytest.approx(
            n1 / len(pairs), abs=1e-9
        )


# ---------------------------------------------------------------------------
# Cohen's kappa == confusion-matrix formula
# ---------------------------------------------------------------------------


class TestCohensKappa:
    def test_matches_formula(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            cohens_kappa,
        )

        rnd = random.Random(9)
        rows = []
        for _ in range(400):
            a = rnd.choice(["x", "y", "z"])
            b = a if rnd.random() < 0.7 else rnd.choice(["x", "y", "z"])
            rows.append((a, b))
        df = spark.createDataFrame(rows, "a string, b string")
        got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        n = len(rows)
        agree = sum(a == b for a, b in rows)
        cats = ["x", "y", "z"]
        pe = sum(
            sum(a == c for a, _b in rows) * sum(b == c for _a, b in rows)
            for c in cats
        ) / (n * n)
        po = agree / n
        assert got["n"] == n
        assert got["observed_agreement"] == pytest.approx(po, abs=1e-9)
        assert got["expected_agreement"] == pytest.approx(pe, abs=1e-9)
        assert got["kappa"] == pytest.approx(
            (po - pe) / (1 - pe), abs=1e-9
        )

    def test_constant_raters_give_null(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            cohens_kappa,
        )

        df = spark.createDataFrame(
            [("k", "k")] * 5, "a string, b string"
        )
        got = cohens_kappa(df, F.col("a"), F.col("b")).collect()[0]
        assert got["kappa"] is None


# ---------------------------------------------------------------------------
# Ulcer index / Martin == float reimplementation
# ---------------------------------------------------------------------------


class TestUlcerMartin:
    def test_matches_reimplementation(self, spark):
        from defimap_data_pipelines_spark.operators.risk import ulcer_martin

        rnd = random.Random(3)
        rows, curves = [], {}
        for nm in ["s1", "s2"]:
            v, curve = 10000.0, []
            for d in range(50):
                pct = rnd.uniform(-0.04, 0.045)
                v *= 1 + pct
                curve.append((round(v, 4), pct))
                rows.append(
                    (
                        nm,
                        dt.date(2024, 1, 1) + dt.timedelta(d),
                        curve[-1][0],
                        pct,
                    )
                )
            curves[nm] = curve
        df = spark.createDataFrame(
            rows,
            "name string, date date, end_day_investment double,"
            " percent_change double",
        )
        got = {r["name"]: r for r in ulcer_martin(df, 365).collect()}
        for nm, curve in curves.items():
            peak, sdd2 = -math.inf, 0.0
            for v, _p in curve:
                peak = max(peak, v)
                sdd2 += (1 - v / peak) ** 2
            ui = math.sqrt(sdd2 / len(curve)) * 100
            mean_r = sum(p for _v, p in curve) / len(curve)
            ann = (1 + mean_r) ** 365 - 1
            r = got[nm]
            assert r["ulcer_index"] == pytest.approx(ui, rel=1e-3)
            assert r["ann_return"] == pytest.approx(ann, rel=1e-4)
            assert r["martin"] == pytest.approx(
                ann * 100 / ui, rel=1e-3
            )


# ---------------------------------------------------------------------------
# Variance ratio == float reimplementation
# ---------------------------------------------------------------------------


class TestVarianceRatio:
    def test_random_walk_near_one(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            variance_ratio,
        )

        rnd = random.Random(7)
        rets = [round(rnd.uniform(-0.03, 0.03), 6) for _ in range(200)]
        rows = [
            ("w", dt.date(2024, 1, 1) + dt.timedelta(d), r)
            for d, r in enumerate(rets)
        ]
        df = spark.createDataFrame(
            rows, "name string, date date, percent_change double"
        )
        got = variance_ratio(df, q=5, day_period=365).collect()[0]

        def svar(xs):
            m = sum(xs) / len(xs)
            return sum((x - m) ** 2 for x in xs) / (len(xs) - 1)

        qsums = [sum(rets[i - 4 : i + 1]) for i in range(4, len(rets))]
        v1, vq = svar(rets), svar(qsums)
        assert got["n_days"] == len(rets)
        assert got["var_1"] == pytest.approx(v1, rel=1e-4)
        assert got["var_q"] == pytest.approx(vq, rel=1e-4)
        assert got["vr"] == pytest.approx(vq / (5 * v1), rel=1e-3)
        # iid noise: VR should hover around 1
        assert 0.5 < got["vr"] < 1.6
