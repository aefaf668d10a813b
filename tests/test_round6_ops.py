"""Closed-form tests for round-6 operators (timeseries + stats).

The registered queries are oracle-checked end-to-end by the parity
suite; these pin operator-level semantics on hand-computable inputs —
the properties a SQL replay cannot distinguish from coincidence.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _events(spark):
    rows = [
        (i, f"2024-01-{1 + (i % 3):02d} 0{i % 6}:1{i % 6}:00", float(i + 1))
        for i in range(18)
    ]
    return spark.createDataFrame(
        rows, "id long, ts_s string, value double"
    ).select("id", F.to_timestamp("ts_s").alias("ts"), "value")


class TestRollupCascade:
    def test_cascade_equals_direct(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            rollup_cascade,
            rollup_level,
        )

        e = _events(spark)
        via_cascade = rollup_cascade(
            e, "ts", "value", ("minute", "hour", "day")
        )
        direct = rollup_level(e, "ts", "day", "value").select(
            "bucket",
            "n",
            "sum_q",
            "min_q",
            "max_q",
            (F.col("sum_q").cast("double") / F.col("n") / 100).alias(
                "avg"
            ),
        )
        assert sorted(via_cascade.collect()) == sorted(direct.collect())

    def test_state_reaggregation_requires_state(self, spark):
        import pytest

        from defimap_data_pipelines_spark.operators.timeseries import (
            rollup_level,
        )

        with pytest.raises(ValueError, match="lacks state"):
            rollup_level(_events(spark), "ts", "hour")


class TestAcf:
    def test_matches_plain_python(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            acf_quantized,
        )

        xs = [3, 1, 4, 1, 5, 9, 2, 6]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "t int, xq long"
        )
        got = {
            r["lag"]: r["acf"]
            for r in acf_quantized(df, "t", "xq", max_lag=3).collect()
        }
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        d = sum(v * v for v in c)
        for lag in (1, 2, 3):
            num = sum(c[t] * c[t - lag] for t in range(lag, n))
            assert got[lag] == round(num / d, 9), lag


class TestCusum:
    def test_matches_sequential_recursion(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            cusum_scores,
        )

        xs = [5, 1, 9, 9, 2, 2, 8, 0, 7]
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "t int, xq long"
        )
        got = {
            r["t"]: r["score_q"]
            for r in cusum_scores(df, "t", "xq").collect()
        }
        n, s = len(xs), sum(xs)
        st, want = 0, {}
        for i, x in enumerate(xs):
            st = max(0, st + (n * x - s))
            want[i] = st
        assert got == want


class TestWelch:
    def test_matches_textbook_formula(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            welch_t_pairs,
        )

        a = [1.0, 2.0, 3.0, 4.0]
        b = [2.0, 4.0, 6.0, 8.0, 10.0]
        df = spark.createDataFrame(
            [("a", x) for x in a] + [("b", x) for x in b],
            "g string, v double",
        )
        row = welch_t_pairs(df, "g", "v", quantum=100).collect()[0]

        def mv(xs):
            n = len(xs)
            m = sum(xs) / n
            v = sum((x - m) ** 2 for x in xs) / (n - 1)
            return n, m, v

        na, ma, va = mv(a)
        nb, mb, vb = mv(b)
        t = (ma - mb) / math.sqrt(va / na + vb / nb)
        dfree = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        assert abs(row["t"] - t) < 1e-8
        assert abs(row["df"] - dfree) < 1e-5
        assert (row["n_a"], row["n_b"]) == (4, 5)

    def test_singleton_groups_dropped(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            welch_t_pairs,
        )

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("solo", 9.0), ("b", 3.0), ("b", 4.0)],
            "g string, v double",
        )
        pairs = {
            (r["g_a"], r["g_b"])
            for r in welch_t_pairs(df, "g", "v").collect()
        }
        assert pairs == {("a", "b")}  # n=1 group has no variance


class TestChi2:
    def test_2x2_hand_example(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            chi2_independence,
        )

        # classic 2x2: O = [[10, 20], [20, 10]]; N=60, all marginals 30
        # E = 15 everywhere; chi2 = 4 * 25/15 = 20/3
        rows = (
            [("r1", "c1")] * 10
            + [("r1", "c2")] * 20
            + [("r2", "c1")] * 20
            + [("r2", "c2")] * 10
        )
        df = spark.createDataFrame(rows, "r string, c string")
        out = chi2_independence(df, "r", "c").collect()[0]
        assert abs(out["chi2"] - 20 / 3) < 1e-5
        assert out["dof"] == 1 and out["n"] == 60

    def test_independent_columns_near_zero(self, spark):
        from defimap_data_pipelines_spark.operators.stats import (
            chi2_independence,
        )

        # perfectly proportional table -> chi2 exactly 0
        rows = (
            [("r1", "c1")] * 6
            + [("r1", "c2")] * 12
            + [("r2", "c1")] * 3
            + [("r2", "c2")] * 6
        )
        df = spark.createDataFrame(rows, "r string, c string")
        out = chi2_independence(df, "r", "c").collect()[0]
        assert out["chi2"] == 0.0
