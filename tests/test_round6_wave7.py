"""Closed-form tests for round-6 wave-7 operators: Markov stationary
distribution and the deterministic Poisson bootstrap."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


class TestMarkovStationary:
    def test_two_state_chain_converges(self, spark):
        # P = [[0, 1], [1, 0]] alternating chain: uniform start stays
        # uniform (the exact stationary distribution, integer-exact:
        # v*1e6/2 swaps between the states each round).
        from defimap_data_pipelines_spark.operators.graph import (
            markov_stationary,
        )

        t = spark.createDataFrame(
            [("a", "b", 10), ("b", "a", 10)], "a string, b string, c long"
        )
        got = {
            r["t"]: r["v_micro"]
            for r in markov_stationary(t, "a", "b", "c", rounds=4).collect()
        }
        assert got == {"a": 500000, "b": 500000}

    def test_absorbing_state_accumulates(self, spark):
        # a->b only, b->b self loop: all mass should drain toward b.
        from defimap_data_pipelines_spark.operators.graph import (
            markov_stationary,
        )

        t = spark.createDataFrame(
            [("a", "b", 1), ("b", "b", 1)], "a string, b string, c long"
        )
        got = {
            r["t"]: r["v_micro"]
            for r in markov_stationary(t, "a", "b", "c", rounds=6).collect()
        }
        # after round 1 all of a's mass is in b and stays there
        assert got["b"] == 1000000
        assert got.get("a", 0) == 0 or "a" not in got

    def test_matches_plain_python(self, spark):
        from defimap_data_pipelines_spark.operators.graph import (
            markov_stationary,
        )

        counts = {
            ("a", "a"): 5,
            ("a", "b"): 3,
            ("b", "a"): 2,
            ("b", "c"): 6,
            ("c", "a"): 4,
        }
        t = spark.createDataFrame(
            [(a, b, c) for (a, b), c in counts.items()],
            "a string, b string, c long",
        )
        rounds = 5
        got = {
            r["t"]: r["v_micro"]
            for r in markov_stationary(
                t, "a", "b", "c", rounds=rounds
            ).collect()
        }
        # replay in plain integers with trunc division
        states = sorted({a for a, _ in counts})
        r = {
            a: sum(c for (x, _), c in counts.items() if x == a)
            for a in states
        }
        v = {s: 1_000_000 // len(states) for s in states}
        for _ in range(rounds):
            nxt: dict = {}
            for (a, b), c in counts.items():
                if a in v:
                    m = v[a] * c
                    q = -((-m) // r[a]) if m < 0 else m // r[a]
                    nxt[b] = nxt.get(b, 0) + q
            v = nxt
        assert got == v

    def test_empty_raises(self, spark):
        from defimap_data_pipelines_spark.operators.graph import (
            markov_stationary,
        )

        t = spark.createDataFrame([], "a string, b string, c long")
        with pytest.raises(ValueError, match="no transitions"):
            markov_stationary(t, "a", "b", "c")


class TestPoissonBootstrap:
    def test_weights_follow_poisson_cdf(self, spark):
        # Over many keys the weight distribution must match the
        # integer-threshold Poisson(1) CDF closely.
        from defimap_data_pipelines_spark.operators.sampling import (
            _POISSON_T,
            _boot_word,
            poisson_weight,
        )

        n = 20000
        df = spark.createDataFrame([(i,) for i in range(n)], "k long")
        w = df.select(
            poisson_weight(_boot_word(F.col("k"), 0, True), 0).alias("w")
        )
        dist = {
            r["w"]: r["c"]
            for r in w.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        p0 = dist.get(0, 0) / n
        p1 = dist.get(1, 0) / n
        assert abs(p0 - math.exp(-1)) < 0.02
        assert abs(p1 - math.exp(-1)) < 0.02
        # mean weight ~ 1
        mean_w = sum(k * c for k, c in dist.items()) / n
        assert abs(mean_w - 1.0) < 0.03
        # max weight respects the CDF truncation
        assert max(dist) <= len(_POISSON_T)

    def test_ci_brackets_mean_and_is_deterministic(self, spark):
        from defimap_data_pipelines_spark.operators.sampling import (
            poisson_bootstrap_mean,
        )

        rows = [(i, float(100 + (i * 37) % 50)) for i in range(4000)]
        df = spark.createDataFrame(rows, "k long, v double")
        a = poisson_bootstrap_mean(df, "k", "v", resamples=32).collect()[0]
        b = (
            poisson_bootstrap_mean(
                df.repartition(13), "k", "v", resamples=32
            ).collect()[0]
        )
        assert a == b  # layout-independent, bit for bit
        assert a["n"] == 4000
        assert a["ci_lo"] < a["mean"] < a["ci_hi"]
        # true mean of the deterministic ramp is within the CI
        true_mean = sum(v for _, v in rows) / len(rows)
        assert a["ci_lo"] - 1 < true_mean < a["ci_hi"] + 1
        # CI width ~ 2*2sigma/sqrt(n): sanity that it's not degenerate
        assert 0 < a["ci_hi"] - a["ci_lo"] < 5

    def test_resample_cap(self, spark):
        from defimap_data_pipelines_spark.operators.sampling import (
            poisson_bootstrap_mean,
        )

        df = spark.createDataFrame([(1, 1.0)], "k long, v double")
        with pytest.raises(ValueError, match=r"\[1, 64\]"):
            poisson_bootstrap_mean(df, "k", "v", resamples=65)


def test_stream_ams_incremental_equals_batch_sketch(spark, sf_dir, tmp_path):
    """Linear-sketch maintenance: AMS sign-sums merged across 3 token
    micro-batches must equal the from-scratch sums INTEGER-EXACTLY,
    and the closed F2 estimate must match the batch operator's."""
    import os
    import time

    from defimap_data_pipelines_spark.operators.sketches import (
        ams_f2_from_sums,
        ams_sign_sums,
    )
    from defimap_data_pipelines_spark.pipelines.models import ModelStore
    from defimap_data_pipelines_spark.streaming.jobs import (
        stream_ams_incremental,
    )

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(F.col("event_type").alias("token"), "event_id")
        .cache()
    )
    scratch = ams_sign_sums(events, "token", estimators=12)

    arrivals = str(tmp_path / "ams_tokens")
    os.makedirs(arrivals)
    n = events.count()
    ids = sorted(r.event_id for r in events.select("event_id").collect())
    cuts = [ids[0], ids[n // 3], ids[2 * n // 3], None]
    for i in range(3):
        part = events.filter(F.col("event_id") >= cuts[i])
        if cuts[i + 1] is not None:
            part = part.filter(F.col("event_id") < cuts[i + 1])
        chunk = str(tmp_path / f"amstok{i}")
        part.select("token").coalesce(1).write.parquet(chunk)
        src = [f for f in os.listdir(chunk) if f.endswith(".parquet")][0]
        dst = os.path.join(arrivals, f"{i:02d}.parquet")
        os.rename(os.path.join(chunk, src), dst)
        os.utime(dst, (time.time() + i, time.time() + i))

    store = ModelStore(str(tmp_path / "ams_models"))
    stream = (
        spark.readStream.schema("token string")
        .option("maxFilesPerTrigger", "1")
        .parquet(arrivals)
    )
    q = stream_ams_incremental(
        stream, store, str(tmp_path / "ams_ckpt"), estimators=12
    )
    q.awaitTermination(120)

    merged = store.load_frame(spark, "ams_stream")
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, scratch.collect()))
    assert a == b  # linear sketch: merge == from-scratch, exactly
    est_m = ams_f2_from_sums(merged).collect()[0]
    est_b = ams_f2_from_sums(scratch).collect()[0]
    assert est_m == est_b
    assert est_m["estimators"] == 12


def _pava_reference(points):
    """Plain-Python minimax isotonic fit: y_hat(k) = max over i<=k of
    min over j>=k of mean(y[i..j]), in exact fractions, truncated to
    micro-units — a THIRD independent implementation (the operator is
    a pool stack, the oracle an interval join)."""
    from fractions import Fraction

    n = len(points)
    ss = [s for s, _ in points]
    cs = [c for _, c in points]
    out = []
    for k in range(n):
        best = None
        for i in range(k + 1):
            worst = None
            for j in range(k, n):
                m = Fraction(sum(ss[i:j + 1]), sum(cs[i:j + 1]))
                worst = m if worst is None else min(worst, m)
            best = worst if best is None else max(best, worst)
        v = best * 1_000_000
        q = int(v) if v >= 0 else -int(-v)  # trunc
        out.append(q)
    return out


class TestIsotonicFit:
    def test_monotone_and_matches_reference_many_cases(self, spark):
        # 12 deterministic pseudo-random cases ride as 12 GROUPS of
        # one DataFrame — one Spark job checks them all.
        from defimap_data_pipelines_spark.operators.cleaning import (
            isotonic_fit,
        )

        rows = []
        cases = {}
        for g in range(12):
            pts = []
            for x in range(1 + (g * 7) % 9):
                s = ((g * 31 + x * 17) % 23) - 5
                c = 1 + (g + x) % 4
                pts.append((s, c))
                rows.append((f"g{g}", x, s, c))
            if pts:
                cases[f"g{g}"] = pts
        # expand (s over c rows): feed raw rows so the operator's own
        # groupBy does the aggregation — emit c rows summing to s
        raw = []
        for gname, x, s, c in rows:
            base = s // c
            rem = s - base * c
            for r in range(c):
                raw.append((gname, x, base + (1 if r < rem else 0)))
        df = spark.createDataFrame(raw, "g string, x long, y long")
        got = isotonic_fit(df, "g", "x", "y").collect()
        by_group: dict = {}
        for r in got:
            by_group.setdefault(r["g"], []).append((r["x"], r["y_hat_micro"]))
        for gname, pts in cases.items():
            fit = [v for _, v in sorted(by_group[gname])]
            assert fit == _pava_reference(pts), gname
            assert all(a <= b for a, b in zip(fit, fit[1:]))  # monotone

    def test_already_monotone_unchanged(self, spark):
        from defimap_data_pipelines_spark.operators.cleaning import (
            isotonic_fit,
        )

        raw = [("g", x, x * 10) for x in range(5)]
        df = spark.createDataFrame(raw, "g string, x long, y long")
        got = sorted(
            (r["x"], r["y_hat_micro"])
            for r in isotonic_fit(df, "g", "x", "y").collect()
        )
        assert got == [(x, x * 10 * 1_000_000) for x in range(5)]

    def test_strictly_decreasing_pools_to_global_mean(self, spark):
        from defimap_data_pipelines_spark.operators.cleaning import (
            isotonic_fit,
        )

        raw = [("g", x, 40 - 10 * x) for x in range(4)]  # 40,30,20,10
        df = spark.createDataFrame(raw, "g string, x long, y long")
        got = {
            r["x"]: r["y_hat_micro"]
            for r in isotonic_fit(df, "g", "x", "y").collect()
        }
        assert set(got.values()) == {25 * 1_000_000}


class TestPathsAndBundles:
    def test_top_paths_counts(self, spark, sf_dir):
        from defimap_data_pipelines_spark.plans.queries import QUERIES

        got = QUERIES["top_event_paths"](spark, sf_dir).collect()
        assert 0 < len(got) <= 20
        ns = [r["n"] for r in got]
        assert ns == sorted(ns, reverse=True)

    def test_mutual_best_symmetry(self, spark, sf_dir):
        from defimap_data_pipelines_spark.plans.queries import QUERIES

        got = QUERIES["mutual_best_pairs"](spark, sf_dir).collect()
        for r in got:
            assert r["i"] < r["j"]
        # pairs are unique
        pairs = [(r["i"], r["j"]) for r in got]
        assert len(pairs) == len(set(pairs))


class TestTrailingDistinctKmv:
    def test_exact_when_under_k(self, spark):
        # fewer than k distinct keys in every window -> the sketch IS
        # the exact count, and rel_err == 0
        from defimap_data_pipelines_spark.operators.sketches import (
            trailing_distinct_kmv,
        )

        rows = []
        for d in range(10):
            for u in range(5 + d):
                rows.append((f"2024-02-{d + 1:02d}", u))
        df = spark.createDataFrame(rows, "ds string, u long").select(
            F.to_date("ds").alias("day"), "u"
        )
        got = trailing_distinct_kmv(
            df, "day", "u", window_days=3, k=64
        ).collect()
        for r in got:
            assert r["kmv_estimate"] == float(r["exact_distinct"])
            assert r["rel_err"] == 0.0

    def test_calendar_gap_does_not_stretch_window(self, spark):
        # days 1, 2 then a gap to day 9: the day-9 window (3 days)
        # must contain ONLY day 9's users, not reach back across the
        # gap the way a ROWS frame would.
        from defimap_data_pipelines_spark.operators.sketches import (
            trailing_distinct_kmv,
        )

        rows = (
            [("2024-02-01", u) for u in range(4)]
            + [("2024-02-02", u) for u in range(4, 8)]
            + [("2024-02-09", u) for u in range(8, 10)]
        )
        df = spark.createDataFrame(rows, "ds string, u long").select(
            F.to_date("ds").alias("day"), "u"
        )
        got = {
            r["day"].isoformat(): r["exact_distinct"]
            for r in trailing_distinct_kmv(
                df, "day", "u", window_days=3, k=64
            ).collect()
        }
        assert got["2024-02-02"] == 8  # day1+day2
        assert got["2024-02-09"] == 2  # gap: only its own users

    def test_estimate_accuracy_at_scale(self, spark, sf_dir):
        from defimap_data_pipelines_spark.plans.queries import QUERIES

        got = QUERIES["trailing_distinct_kmv"](spark, sf_dir).collect()
        assert len(got) > 0
        # k=256 -> expected relative error ~ 1/sqrt(254) ~ 6%;
        # assert a loose 4-sigma bound on every day
        for r in got:
            assert r["rel_err"] < 0.25, (r["day"], r["rel_err"])
