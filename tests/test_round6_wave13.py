"""Brute-force twins for round-6 wave-13 operators: local clustering
vs neighbor-set intersection, Page-Hinkley vs the sequential
recursion, the permutation test vs an md5 replay in pure Python, and
R/S Hurst vs a float reimplementation."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Local clustering == neighbor-set intersection
# ---------------------------------------------------------------------------


def _brute_lcc(edges):
    from collections import defaultdict

    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    out = {}
    for w, ns in nbr.items():
        d = len(ns)
        if d < 2:
            continue
        tri = sum(
            1
            for a in ns
            for b in ns
            if a < b and b in nbr[a]
        )
        out[w] = (d, tri, 2 * tri / (d * (d - 1)))
    return out


class TestLocalClustering:
    @pytest.mark.parametrize("seed", [1, 6])
    def test_matches_bruteforce(self, spark, seed):
        from defimap_data_pipelines_spark.operators.graph import (
            local_clustering,
        )

        rnd = random.Random(seed)
        edges = set()
        while len(edges) < 60:
            u, v = rnd.sample(range(20), 2)
            edges.add((min(u, v), max(u, v)))
        df = spark.createDataFrame(sorted(edges), "u long, v long")
        got = {
            r["node"]: (r["degree"], r["triangles"], r["lcc"])
            for r in local_clustering(df).collect()
        }
        want = _brute_lcc(edges)
        assert set(got) == set(want)
        for w, (d, t, lcc) in want.items():
            assert got[w][0] == d
            assert got[w][1] == t
            assert got[w][2] == pytest.approx(lcc, abs=1e-9)

    def test_clique_is_all_ones(self, spark):
        from defimap_data_pipelines_spark.operators.graph import (
            local_clustering,
        )

        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        df = spark.createDataFrame(edges, "u long, v long")
        rows = local_clustering(df).collect()
        assert len(rows) == 5
        assert all(r["lcc"] == 1.0 and r["triangles"] == 6 for r in rows)


# ---------------------------------------------------------------------------
# Page-Hinkley == sequential recursion
# ---------------------------------------------------------------------------


def _brute_ph(xs, delta=0):
    def trunc_div(a, b):
        return -((-a) // b) if a < 0 else a // b

    cs = 0
    m = 0
    mmin = math.inf
    out = []
    for i, x in enumerate(xs, start=1):
        cs += x
        m += x - trunc_div(cs, i) - delta
        mmin = min(mmin, m)
        out.append(m - mmin)
    return out


class TestPageHinkley:
    @pytest.mark.parametrize("seed", [2, 9])
    def test_matches_recursion(self, spark, seed):
        from defimap_data_pipelines_spark.operators.timeseries import (
            page_hinkley,
        )

        rnd = random.Random(seed)
        xs = [rnd.randint(-500, 1500) for _ in range(80)]
        # inject an upward drift in the back half
        xs = xs[:40] + [x + 800 for x in xs[40:]]
        df = spark.createDataFrame(
            list(enumerate(xs)), "t long, x long"
        )
        got = [
            r["ph_q"]
            for r in page_hinkley(df, "t", "x").orderBy("t").collect()
        ]
        assert got == _brute_ph(xs)
        # the drifted half must push the score well above the front
        assert max(got[40:]) > max(got[:40])


# ---------------------------------------------------------------------------
# Permutation test == md5 replay in Python
# ---------------------------------------------------------------------------


def _word(key) -> int:
    return int(hashlib.md5(f"{key}|0".encode()).hexdigest()[0:15], 16)


def _brute_perm(rows, resamples=16, quantum=100):
    """rows: (key, y, value). Returns (t_obs, n_valid, n_extreme)."""
    data = [
        (int(round(v * quantum)), y, _word(k)) for k, y, v in rows
    ]

    def t_of(bits):
        s1 = sum(x for x, b in bits if b)
        n1 = sum(1 for _x, b in bits if b)
        s = sum(x for x, _b in bits)
        n = len(bits)
        if n1 == 0 or n == n1:
            return None
        return round(
            s1 / n1 / quantum - (s - s1) / (n - n1) / quantum, 9
        )

    t_obs = t_of([(x, y) for x, y, _w in data])
    n_valid = n_extreme = 0
    for b in range(resamples):
        t = t_of([(x, (w >> b) & 1) for x, _y, w in data])
        if t is None:
            continue
        n_valid += 1
        if round(abs(t), 9) >= round(abs(t_obs), 9):
            n_extreme += 1
    return t_obs, n_valid, n_extreme


class TestPermutationTest:
    def test_matches_md5_replay(self, spark):
        from defimap_data_pipelines_spark.operators.sampling import (
            permutation_mean_test,
        )

        rnd = random.Random(4)
        rows = [
            (i, rnd.random() < 0.4, round(rnd.uniform(0, 50), 2))
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows, "k long, y boolean, v double"
        )
        got = permutation_mean_test(
            df, "k", F.col("y"), "v", resamples=16
        ).collect()[0]
        t_obs, n_valid, n_extreme = _brute_perm(
            [(k, int(y), v) for k, y, v in rows], resamples=16
        )
        assert got["t_obs"] == pytest.approx(t_obs, abs=1e-9)
        assert got["n_valid"] == n_valid
        assert got["n_extreme"] == n_extreme
        assert got["p_value"] == pytest.approx(
            (n_extreme + 1) / (n_valid + 1), abs=1e-9
        )

    def test_big_effect_gives_min_p(self, spark):
        from defimap_data_pipelines_spark.operators.sampling import (
            permutation_mean_test,
        )

        rnd = random.Random(5)
        rows = [
            (i, i % 2 == 0, (1000.0 if i % 2 == 0 else 1.0) + rnd.random())
            for i in range(300)
        ]
        df = spark.createDataFrame(rows, "k long, y boolean, v double")
        got = permutation_mean_test(
            df, "k", F.col("y"), "v", resamples=32
        ).collect()[0]
        assert got["n_extreme"] == 0
        assert got["p_value"] == pytest.approx(
            1 / (got["n_valid"] + 1), abs=1e-9
        )


# ---------------------------------------------------------------------------
# R/S Hurst == float reimplementation
# ---------------------------------------------------------------------------


def _brute_hurst(xs, sizes=(8, 16, 32, 64)):
    ys = {}
    rss = {}
    for n in sizes:
        vals = []
        for b in range(len(xs) // n):
            blk = xs[b * n : (b + 1) * n]
            mean = sum(blk) / n
            cum, lo, hi, sd2 = 0.0, math.inf, -math.inf, 0.0
            for x in blk:
                cum += x - mean
                lo, hi = min(lo, cum), max(hi, cum)
                sd2 += (x - mean) ** 2
            if sd2 == 0:
                continue
            vals.append((hi - lo) / math.sqrt(sd2 / n))
        if vals:
            rss[n] = sum(vals) / len(vals)
            ys[n] = math.log(rss[n])
    if len(ys) < 4:
        return rss, None
    y = [ys[n] for n in sizes]
    h = (3 * (y[3] - y[0]) + (y[2] - y[1])) / (10 * math.log(2))
    return rss, h


class TestRsHurst:
    def test_matches_reimplementation(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            rs_hurst,
        )

        rnd = random.Random(8)
        xs = [rnd.randint(-1000, 1000) for _ in range(200)]
        rows = [
            ("a", dt.date(2024, 1, 1) + dt.timedelta(i), x)
            for i, x in enumerate(xs)
        ]
        df = spark.createDataFrame(rows, "k string, d date, x long")
        got = rs_hurst(df, "k", "d", "x").collect()[0]
        rss, h = _brute_hurst(xs)
        assert got["n_periods"] == 200
        for n in (8, 16, 32, 64):
            assert got[f"rs_{n}"] == pytest.approx(rss[n], rel=1e-4)
        assert got["hurst"] == pytest.approx(h, abs=1e-4)
        # iid noise: H must sit well under the trending regime
        assert got["hurst"] < 0.65

    def test_bad_sizes_raise(self, spark):
        from defimap_data_pipelines_spark.operators.timeseries import (
            rs_hurst,
        )

        df = spark.createDataFrame([("a", 1, 1)], "k string, d long, x long")
        with pytest.raises(ValueError):
            rs_hurst(df, "k", "d", "x", sizes=(8, 16, 32))
        with pytest.raises(ValueError):
            rs_hurst(df, "k", "d", "x", sizes=(8, 16, 24, 48))
