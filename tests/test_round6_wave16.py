"""Brute-force twins for round-6 wave-16 operators: Shapley
attribution vs all-orderings enumeration, Markov removal vs an exact
integer value-iteration replay, and the delta-method ratio SE vs the
float formula."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F


def _brute_shapley(units, channels):
    """units: list of (set_of_channels, conv 0/1). Exact Shapley by
    enumerating all k! orderings, with v(S) = truncated-nano exact-set
    conversion rate (0 for unobserved sets) — mirroring the operator's
    quantization so the comparison is exact."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for s, c in units:
        if not s:
            continue  # unattributable, dropped by the operator
        key = frozenset(s)
        agg[key][0] += 1
        agg[key][1] += c

    def v(sub: frozenset) -> int:
        n, c = agg.get(sub, (0, 0))
        return (c * 10**9) // n if n else 0

    k = len(channels)
    phi = {c: 0 for c in channels}
    for order in itertools.permutations(channels):
        cur: set = set()
        for c in order:
            before = v(frozenset(cur))
            cur.add(c)
            phi[c] += v(frozenset(cur)) - before
    return {c: p / math.factorial(k) / 1e9 for c, p in phi.items()}


class TestShapleyAttribution:
    @pytest.mark.parametrize("seed", [1, 6])
    def test_matches_enumeration(self, spark, seed):
        from defimap_data_pipelines_spark.operators.journeys import (
            shapley_attribution,
        )

        rnd = random.Random(seed)
        channels = ["a", "b", "c"]
        rows, units = [], []
        for u in range(120):
            touched = {c for c in channels if rnd.random() < 0.55}
            # channel 'a' genuinely causes conversions
            conv = 1 if ("a" in touched and rnd.random() < 0.7) or (
                rnd.random() < 0.1
            ) else 0
            units.append((touched, conv))
            for c in touched:
                rows.append((u, c, False))
            if conv:
                rows.append((u, "BUY", True))
            if not touched and not conv:
                rows.append((u, "noise", False))
        df = spark.createDataFrame(rows, "u long, ch string, conv boolean")
        got = {
            r["channel"]: r["shapley"]
            for r in shapley_attribution(
                df, "u", "ch", F.col("conv"), channels
            ).collect()
        }
        want = _brute_shapley(units, channels)
        for c in channels:
            assert got[c] == pytest.approx(want[c], abs=1e-6)

    def test_efficiency_axiom(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            shapley_attribution,
        )

        rnd = random.Random(9)
        channels = ["x", "y", "z", "w"]
        rows = []
        masks = {}
        for u in range(200):
            touched = {c for c in channels if rnd.random() < 0.5}
            conv = rnd.random() < 0.2 + 0.15 * len(touched)
            masks[u] = (frozenset(touched), int(conv))
            for c in touched:
                rows.append((u, c, False))
            rows.append((u, "END", bool(conv)))
        df = spark.createDataFrame(rows, "u long, ch string, conv boolean")
        phis = {
            r["channel"]: r["shapley"]
            for r in shapley_attribution(
                df, "u", "ch", F.col("conv"), channels
            ).collect()
        }
        from collections import defaultdict

        agg = defaultdict(lambda: [0, 0])
        for s, c in masks.values():
            if s:
                agg[s][0] += 1
                agg[s][1] += c
        full = frozenset(channels)
        v_full = (
            agg[full][1] * 10**9 // agg[full][0] if full in agg else 0
        )
        # sum of Shapley values telescopes to v(full) - v(empty)=v(full)
        assert sum(phis.values()) == pytest.approx(
            v_full / 1e9, abs=1e-6
        )


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return -q if a < 0 else q


def _brute_markov(trans, channels, rounds=12, nano=10**9):
    """trans: dict (a, b) -> count. Exact integer value-iteration
    replay including truncated division."""
    from collections import defaultdict

    rtot = defaultdict(int)
    for (a, _b), c in trans.items():
        rtot[a] += c

    def iterate(removed):
        v = {"conv": nano}
        for _ in range(rounds):
            nv = defaultdict(int)
            for (a, b), c in trans.items():
                if b == removed:
                    continue
                if b in v:
                    nv[a] += _trunc_div(v[b] * c, rtot[a])
            nv["conv"] = nano
            nv.pop("null", None)
            v = dict(nv)
        return v.get("start", 0)

    pf = iterate(None)
    out = {}
    for c in channels:
        p = iterate(c)
        out[c] = (pf, p, 1 - p / pf if pf > 0 else None)
    return out


class TestMarkovRemoval:
    def test_matches_integer_replay(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            markov_removal_attribution,
        )

        rnd = random.Random(3)
        channels = ["ad", "email", "social"]
        rows = []
        for u in range(150):
            t = 0
            path = []
            while len(path) < 6 and rnd.random() < 0.8:
                path.append(rnd.choice(channels))
            # 'ad' strongly drives conversion
            converts = rnd.random() < (0.7 if "ad" in path else 0.15)
            for ch in path:
                rows.append((u, ch, t))
                t += 1
            if converts:
                rows.append((u, "BUY", t))
        df = spark.createDataFrame(rows, "u long, ch string, t long")
        got = {
            r["channel"]: r
            for r in markov_removal_attribution(
                df, "u", "ch", ["t"], "BUY", channels, rounds=12
            ).collect()
        }

        # rebuild the exact transition counts the operator derives
        from collections import defaultdict

        journeys = defaultdict(list)
        for u, ch, t in sorted(rows, key=lambda r: (r[0], r[2])):
            journeys[u].append(ch)
        trans: dict = defaultdict(int)
        for path in journeys.values():
            cut = (
                path.index("BUY") + 1 if "BUY" in path else len(path)
            )
            path = path[:cut]
            prev = "start"
            for ch in path:
                cur = "conv" if ch == "BUY" else ch
                trans[(prev, cur)] += 1
                prev = cur
            if prev != "conv":
                trans[(prev, "null")] += 1
        want = _brute_markov(dict(trans), channels)
        for c in channels:
            pf, p, re = want[c]
            assert got[c]["p_full"] == pytest.approx(pf / 1e9, abs=1e-9)
            assert got[c]["p_removed"] == pytest.approx(
                p / 1e9, abs=1e-9
            )
            assert got[c]["removal_effect"] == pytest.approx(
                re, abs=1e-8
            )
        # the planted causal channel must dominate
        assert (
            got["ad"]["removal_effect"]
            > got["email"]["removal_effect"]
        )
        assert (
            got["ad"]["removal_effect"]
            > got["social"]["removal_effect"]
        )


class TestRatioMetricDelta:
    def test_matches_float_formula(self, spark):
        from defimap_data_pipelines_spark.operators.experiments import (
            ratio_metric_delta,
        )

        rnd = random.Random(5)
        rows = []
        units: dict = {}
        for u in range(300):
            var = "A" if u % 2 == 0 else "B"
            x = y = 0
            for _ in range(rnd.randint(1, 9)):
                xv = rnd.randint(0, 2000)
                x += xv
                y += 1
                rows.append((u, var, xv, 1))
            units[u] = (var, x, y)
        df = spark.createDataFrame(rows, "u long, v string, x long, y long")
        got = {
            r["variant"]: r
            for r in ratio_metric_delta(df, "u", "v", "x", "y").collect()
        }
        for var in ("A", "B"):
            xs = [x for vv, x, _y in units.values() if vv == var]
            ys = [y for vv, _x, y in units.values() if vv == var]
            n = len(xs)
            r = sum(xs) / sum(ys)
            mx, my = sum(xs) / n, sum(ys) / n
            vx = sum((x - mx) ** 2 for x in xs) / (n - 1)
            vy = sum((y - my) ** 2 for y in ys) / (n - 1)
            vxy = sum(
                (x - mx) * (y - my) for x, y in zip(xs, ys)
            ) / (n - 1)
            se = math.sqrt(
                (vx - 2 * r * vxy + r * r * vy) / n / (my * my)
            )
            assert got[var]["n_units"] == n
            assert got[var]["ratio"] == pytest.approx(r, rel=1e-9)
            assert got[var]["se"] == pytest.approx(se, rel=1e-6)
