"""Brute-force twins for round-6 wave-15 operators: Cramer's V vs
the chi2 formula, Friedman vs textbook within-block ranks, one-way
ANOVA vs float sums of squares, and Heaps fit vs a sequential
vocabulary scan."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


class TestCramersV:
    def test_matches_formula(self, spark):
        from defimap_data_pipelines_spark.operators.stats import cramers_v

        rnd = random.Random(2)
        rows = []
        for _ in range(600):
            r = rnd.choice(["a", "b", "c"])
            # association: column category leans on the row one
            c = r.upper() if rnd.random() < 0.5 else rnd.choice("ABC")
            rows.append((r, c))
        df = spark.createDataFrame(rows, "r string, c string")
        got = cramers_v(df, "r", "c").collect()[0]

        from collections import Counter

        obs = Counter(rows)
        rm = Counter(r for r, _c in rows)
        cm = Counter(c for _r, c in rows)
        n = len(rows)
        chi2 = sum(
            (obs.get((r, c), 0) - rm[r] * cm[c] / n) ** 2
            / (rm[r] * cm[c] / n)
            for r in rm
            for c in cm
        )
        v = math.sqrt(chi2 / (n * (min(len(rm), len(cm)) - 1)))
        assert got["n"] == n
        assert got["dof"] == (len(rm) - 1) * (len(cm) - 1)
        assert got["chi2"] == pytest.approx(chi2, abs=1e-4)
        assert got["v"] == pytest.approx(v, abs=1e-6)
        assert got["v"] > 0.3  # the planted association is strong

    def test_degenerate_table_gives_null_v(self, spark):
        from defimap_data_pipelines_spark.operators.stats import cramers_v

        df = spark.createDataFrame(
            [("only", c) for c in "xyzxyz"], "r string, c string"
        )
        got = cramers_v(df, "r", "c").collect()[0]
        assert got["v"] is None


def _brute_friedman(blocks: dict):
    """blocks: {block: {treatment: value}} (complete). Returns
    (n, k, Q, Q_corrected)."""
    n = len(blocks)
    treatments = sorted(next(iter(blocks.values())))
    k = len(treatments)
    rsum = {t: 0.0 for t in treatments}
    t_ties = 0
    for vals in blocks.values():
        svals = sorted(vals.values())
        from collections import Counter

        cnt = Counter(svals)
        t_ties += sum(c**3 - c for c in cnt.values())
        for t, v in vals.items():
            below = sum(1 for x in svals if x < v)
            eq = cnt[v]
            rsum[t] += below + (eq + 1) / 2
    q = 12.0 / (n * k * (k + 1)) * sum(
        r * r for r in rsum.values()
    ) - 3 * n * (k + 1)
    den = 1 - t_ties / (n * k * (k * k - 1))
    return n, k, q, (q / den if den > 0 else None)


class TestFriedman:
    @pytest.mark.parametrize("seed", [1, 5])
    def test_matches_bruteforce(self, spark, seed):
        from defimap_data_pipelines_spark.operators.stats import (
            friedman_test,
        )

        rnd = random.Random(seed)
        treatments = ["t1", "t2", "t3", "t4"]
        effect = {"t1": 0, "t2": 3, "t3": 1, "t4": 6}
        blocks = {}
        rows = []
        for b in range(25):
            base = rnd.randint(0, 40)
            vals = {
                t: base + effect[t] + rnd.randint(0, 4)
                for t in treatments
            }
            blocks[b] = vals
            rows += [(b, t, v) for t, v in vals.items()]
        df = spark.createDataFrame(rows, "b long, t string, v long")
        got = friedman_test(df, "b", "t", "v").collect()[0]
        n, k, q, qc = _brute_friedman(blocks)
        assert got["n_blocks"] == n
        assert got["k"] == k
        assert got["q_stat"] == pytest.approx(q, abs=1e-5)
        assert got["q_corrected"] == pytest.approx(qc, abs=1e-5)

    def test_incomplete_blocks_dropped(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            friedman_test,
        )

        rows = [
            (b, t, b * 10 + i)
            for b in range(6)
            for i, t in enumerate(["x", "y", "z"])
        ]
        rows.append((99, "x", 5))  # block 99 lacks y and z
        df = spark.createDataFrame(rows, "b long, t string, v long")
        got = friedman_test(df, "b", "t", "v").collect()[0]
        assert got["n_blocks"] == 6


class TestAnovaOneway:
    @pytest.mark.parametrize("seed", [3, 8])
    def test_matches_float_ss(self, spark, seed):
        from defimap_data_pipelines_spark.operators.stats import (
            anova_oneway,
        )

        rnd = random.Random(seed)
        groups = {"a": 5.0, "b": 8.0, "c": 6.5}
        rows = [
            (g, round(mu + rnd.uniform(-2, 2), 2))
            for g, mu in groups.items()
            for _ in range(120)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = anova_oneway(df, "g", "v", quantum=100).collect()[0]

        byg: dict = {}
        for g, v in rows:
            byg.setdefault(g, []).append(round(v * 100))
        n = len(rows)
        k = len(byg)
        s = sum(sum(vs) for vs in byg.values())
        ssb = sum(sum(vs) ** 2 / len(vs) for vs in byg.values()) - s**2 / n
        ssw = sum(
            x * x for vs in byg.values() for x in vs
        ) - sum(sum(vs) ** 2 / len(vs) for vs in byg.values())
        f = (ssb / (k - 1)) / (ssw / (n - k))
        assert got["n"] == n and got["k"] == k
        assert got["ss_between"] == pytest.approx(ssb / 1e4, rel=1e-6)
        assert got["ss_within"] == pytest.approx(ssw / 1e4, rel=1e-6)
        assert got["f_stat"] == pytest.approx(f, rel=1e-6)
        assert got["eta_sq"] == pytest.approx(
            ssb / (ssb + ssw), rel=1e-6
        )

    def test_constant_groups_give_null_f(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            anova_oneway,
        )

        rows = [("a", 1.0)] * 5 + [("b", 2.0)] * 5
        df = spark.createDataFrame(rows, "g string, v double")
        got = anova_oneway(df, "g", "v").collect()[0]
        assert got["f_stat"] is None
        assert got["ss_between"] > 0


class TestHeapsFit:
    def test_matches_sequential_scan(self, spark):
        from defimap_data_pipelines_spark.operators.textops import heaps_fit

        rnd = random.Random(4)
        # a power-law token source gives genuine Heaps behavior
        vocab = [f"w{i}" for i in range(800)]
        weights = [1.0 / (i + 1) for i in range(800)]
        rows = []
        docs = []
        for d in range(64):
            doc = rnd.choices(vocab, weights=weights, k=40)
            docs.append(doc)
            rows += [(d, t) for t in doc]
        df = spark.createDataFrame(rows, "doc long, token string")
        got = heaps_fit(df, "doc", "token", n_points=8).collect()[0]

        seen: set = set()
        xs, ys = [], []
        tcum = 0
        cps = [(i * 64) // 8 for i in range(1, 9)]
        ci = 0
        for d, doc in enumerate(docs, start=1):
            tcum += len(doc)
            seen.update(doc)
            while ci < 8 and d == cps[ci]:
                xs.append(math.log(tcum))
                ys.append(math.log(len(seen)))
                ci += 1
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        assert got["points"] == 8
        assert got["beta"] == pytest.approx(slope, abs=1e-4)
        assert 0.2 < got["beta"] < 0.95  # sub-linear growth
        assert got["r2"] > 0.9
