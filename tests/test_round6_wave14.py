"""Brute-force twins for round-6 wave-14 operators: capture ratios,
Zipf OLS fit, smoothed target encoding, and signed feature hashing
(replayed token-by-token from hashlib)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import random

import pytest
from pyspark.sql import functions as F


class TestUpdownCapture:
    def test_matches_reimplementation(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            updown_capture,
        )

        rnd = random.Random(2)
        days = [dt.date(2024, 1, 1) + dt.timedelta(d) for d in range(80)]
        bench = [round(rnd.uniform(-0.03, 0.03), 6) for _ in days]
        strat = [round(b * (1.4 if b > 0 else 0.6), 6) for b in bench]
        gdf = spark.createDataFrame(
            [("s", d, r) for d, r in zip(days, strat)],
            "name string, date date, percent_change double",
        )
        bdf = spark.createDataFrame(
            list(zip(days, bench)), "date date, percent_change double"
        )
        got = updown_capture(gdf, bdf, 365).collect()[0]
        up = [(s, b) for s, b in zip(strat, bench) if b > 0]
        dn = [(s, b) for s, b in zip(strat, bench) if b < 0]
        uc = sum(s for s, _b in up) / sum(b for _s, b in up)
        dc = sum(s for s, _b in dn) / sum(b for _s, b in dn)
        assert got["n_up"] == len(up)
        assert got["n_down"] == len(dn)
        assert got["up_capture"] == pytest.approx(uc, abs=1e-6)
        assert got["down_capture"] == pytest.approx(dc, abs=1e-6)
        assert got["capture_ratio"] == pytest.approx(uc / dc, abs=1e-5)
        # the construction is asymmetric by design
        assert got["up_capture"] > 1 > got["down_capture"]

    def test_flat_benchmark_gives_null(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            updown_capture,
        )

        days = [dt.date(2024, 1, 1) + dt.timedelta(d) for d in range(5)]
        gdf = spark.createDataFrame(
            [("s", d, 0.01) for d in days],
            "name string, date date, percent_change double",
        )
        bdf = spark.createDataFrame(
            [(d, 0.0) for d in days], "date date, percent_change double"
        )
        got = updown_capture(gdf, bdf, 365).collect()[0]
        assert got["up_capture"] is None
        assert got["down_capture"] is None


class TestZipfFit:
    def test_exact_power_law_recovered(self, spark):
        from defimap_data_pipelines_spark.operators.textops import zipf_fit

        # counts = round(10000 / rank): a near-exact slope -1 law
        rows = []
        for rank in range(1, 41):
            tok = f"tok{rank:03d}"
            rows += [(tok,)] * round(10000 / rank)
        df = spark.createDataFrame(rows, "token string")
        got = zipf_fit(df, "token", top_k=40).collect()[0]
        assert got["k"] == 40
        assert got["slope"] == pytest.approx(-1.0, abs=0.01)
        assert got["r2"] > 0.999

    def test_matches_ols(self, spark):
        from defimap_data_pipelines_spark.operators.textops import zipf_fit

        rnd = random.Random(7)
        counts = sorted(
            {rnd.randint(2, 5000) for _ in range(30)}, reverse=True
        )
        rows = [
            (f"t{i:03d}",) for i, c in enumerate(counts) for _ in range(c)
        ]
        df = spark.createDataFrame(rows, "token string")
        got = zipf_fit(df, "token", top_k=len(counts)).collect()[0]
        xs = [math.log(r) for r in range(1, len(counts) + 1)]
        ys = [math.log(c) for c in counts]
        k = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
        intercept = (sy - slope * sx) / k
        assert got["slope"] == pytest.approx(slope, abs=1e-4)
        assert got["intercept"] == pytest.approx(intercept, abs=1e-4)


class TestTargetEncoding:
    def test_matches_formula_and_shrinks(self, spark):
        from defimap_data_pipelines_spark.operators.cleaning import (
            target_encoding,
        )

        rnd = random.Random(3)
        rows = []
        # big category around 10.0, small category around 100.0
        for _ in range(500):
            rows.append(("big", int(round(rnd.uniform(5, 15) * 100))))
        for _ in range(3):
            rows.append(("small", int(round(rnd.uniform(95, 105) * 100))))
        df = spark.createDataFrame(rows, "c string, tq long")
        got = {
            r["category"]: r
            for r in target_encoding(df, "c", "tq", smoothing=100).collect()
        }
        s = sum(t for _c, t in rows)
        n = len(rows)
        gmean = s / n
        for cat in ("big", "small"):
            vals = [t for c, t in rows if c == cat]
            enc = (sum(vals) + 100 * gmean) / (len(vals) + 100) / 100
            # outputs are truncated at 1e-6 dollars (no ROUND ties)
            assert got[cat]["encoded"] == pytest.approx(enc, abs=3e-6)
            assert got[cat]["raw_mean"] == pytest.approx(
                sum(vals) / len(vals) / 100, abs=3e-6
            )
        # the 3-row category must be pulled almost to the global mean
        assert abs(got["small"]["encoded"] - gmean / 100) < 3.0
        assert abs(got["small"]["raw_mean"] - 100.0) < 6.0


def _hash_tok(tok: str):
    h = hashlib.md5(tok.encode()).hexdigest()
    bucket = int(h[0:15], 16) % 1024
    sign = (int(h[15], 16) >> 3) * 2 - 1
    return bucket, sign


class TestFeatureHashing:
    def test_matches_hashlib_replay(self, spark):
        from defimap_data_pipelines_spark.operators.textops import (
            feature_hashing,
        )

        rnd = random.Random(1)
        vocab = [f"w{i}" for i in range(50)]
        rows = [
            (d, rnd.choice(vocab)) for d in range(10) for _ in range(30)
        ]
        df = spark.createDataFrame(rows, "doc long, token string")
        got = {
            (r["id"], r["bucket"]): r["weight"]
            for r in feature_hashing(df, "doc", "token").collect()
        }
        from collections import defaultdict

        want: dict = defaultdict(int)
        for d, tok in rows:
            b, s = _hash_tok(tok)
            want[(d, b)] += s
        want = {k: v for k, v in want.items() if v != 0}
        assert got == want

    def test_signs_cancel_collisions(self, spark):
        from defimap_data_pipelines_spark.operators.textops import (
            feature_hashing,
        )

        # same token repeated: weight must be +-count, never 0
        df = spark.createDataFrame(
            [(1, "hello")] * 7, "doc long, token string"
        )
        got = feature_hashing(df, "doc", "token").collect()
        assert len(got) == 1
        assert abs(got[0]["weight"]) == 7
