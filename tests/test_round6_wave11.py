"""Brute-force twins for round-6 wave-11 operators: FIFO lot
matching vs a literal sequential queue, Kendall tau-b vs the O(n^2)
pair definition, underwater spells vs a day-by-day scan, and the
information ratio vs a float reimplementation."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# FIFO lot matching == sequential queue
# ---------------------------------------------------------------------------


def _queue_fifo(buys, sells):
    """The textbook algorithm: (key, ord, qty[, price]) rows; pop the
    oldest open lot until each sell is filled. Returns
    {(key, buy_ord, sell_ord): matched_qty}."""
    from collections import defaultdict, deque

    book: dict = defaultdict(deque)
    for k, o, q, _p in sorted(buys):
        book[k].append([o, q])
    out: dict = {}
    for k, o, q, _p in sorted(sells):
        need = q
        dq = book[k]
        while need > 0 and dq:
            bo, bq = dq[0]
            take = min(need, bq)
            out[(k, bo, o)] = take
            need -= take
            if take == bq:
                dq.popleft()
            else:
                dq[0][1] -= take
    return out


def _trades(seed: int, n_keys: int = 6, n: int = 120):
    rnd = random.Random(seed)
    buys, sells = [], []
    for i in range(n):
        k = rnd.randrange(n_keys)
        row = (k, i, rnd.randint(1, 50), rnd.randint(100, 9999))
        # bias toward buys so most sells are coverable, but keep
        # some keys short so the unmatched-remainder path is hit too
        (buys if rnd.random() < 0.6 else sells).append(row)
    return buys, sells


class TestFifoMatch:
    @pytest.mark.parametrize("seed", [1, 2, 7])
    def test_matches_sequential_queue(self, spark, seed):
        from defimap_data_pipelines_spark.operators.lots import fifo_match

        buys, sells = _trades(seed)
        schema = "k long, ord long, qty long, pc long"
        bdf = spark.createDataFrame(buys, schema)
        sdf = spark.createDataFrame(sells, schema)
        got = {
            (r["k"], r["buy_ord"], r["sell_ord"]): r["matched_qty"]
            for r in fifo_match(
                bdf, sdf, "k", "qty", ["ord"], "pc"
            ).collect()
        }
        assert got == _queue_fifo(buys, sells)

    def test_cost_is_lot_price_times_qty(self, spark):
        from defimap_data_pipelines_spark.operators.lots import fifo_match

        buys, sells = _trades(11)
        price = {(k, o): p for k, o, _q, p in buys}
        schema = "k long, ord long, qty long, pc long"
        rows = fifo_match(
            spark.createDataFrame(buys, schema),
            spark.createDataFrame(sells, schema),
            "k",
            "qty",
            ["ord"],
            "pc",
        ).collect()
        assert rows
        for r in rows:
            assert r["cost_cents"] == r["matched_qty"] * price[
                (r["k"], r["buy_ord"])
            ]

    def test_summary_reconciles(self, spark):
        from defimap_data_pipelines_spark.operators.lots import (
            fifo_realized_summary,
        )

        buys, sells = _trades(5)
        schema = "k long, ord long, qty long, pc long"
        out = fifo_realized_summary(
            spark.createDataFrame(buys, schema),
            spark.createDataFrame(sells, schema),
            "k",
            "qty",
            ["ord"],
            "pc",
        ).collect()
        queue = _queue_fifo(buys, sells)
        per_key_matched: dict = {}
        for (k, _bo, _so), q in queue.items():
            per_key_matched[k] = per_key_matched.get(k, 0) + q
        for r in out:
            # matched == min-coverable given the book, never above
            # either side's total
            assert r["matched_qty"] == per_key_matched.get(r["k"], 0)
            assert r["matched_qty"] <= r["bought_qty"]
            assert r["matched_qty"] <= r["sold_qty"]


# ---------------------------------------------------------------------------
# Kendall tau-b == pair definition
# ---------------------------------------------------------------------------


def _brute_tau(xs, ys):
    n = len(xs)
    c = d = 0
    for i in range(n):
        for j in range(i + 1, n):
            p = (xs[i] - xs[j]) * (ys[i] - ys[j])
            c += p > 0
            d += p < 0
    n0 = n * (n - 1)  # 2x the pair count, matching the operator
    n1 = sum(
        t * (t - 1) for t in _counts(xs).values()
    )
    n2 = sum(t * (t - 1) for t in _counts(ys).values())
    den = math.sqrt((n0 - n1) * (n0 - n2))
    return (c, d, 2.0 * (c - d) / den if den else None)


def _counts(vals):
    out: dict = {}
    for v in vals:
        out[v] = out.get(v, 0) + 1
    return out


class TestKendallTau:
    @pytest.mark.parametrize("seed", [3, 9])
    def test_matches_bruteforce(self, spark, seed):
        from defimap_data_pipelines_spark.operators.stats import kendall_tau

        rnd = random.Random(seed)
        days = [dt.date(2024, 1, 1) + dt.timedelta(d) for d in range(25)]
        # deliberate ties on both sides
        xs = [rnd.randint(0, 8) for _ in days]
        ys = [x + rnd.randint(-2, 2) for x in xs]
        rows = [("a", d, x) for d, x in zip(days, xs)] + [
            ("b", d, y) for d, y in zip(days, ys)
        ]
        daily = spark.createDataFrame(rows, "g string, day date, yq long")
        got = kendall_tau(daily, "a", "b").collect()[0]
        c, d, tau = _brute_tau(xs, ys)
        assert (got["concordant"], got["discordant"]) == (c, d)
        assert got["n_days"] == len(days)
        if tau is None:
            assert got["tau_b"] is None
        else:
            assert got["tau_b"] == pytest.approx(tau, abs=2e-9)

    def test_all_tied_side_gives_null(self, spark):
        from defimap_data_pipelines_spark.operators.stats import kendall_tau

        days = [dt.date(2024, 1, 1) + dt.timedelta(d) for d in range(6)]
        rows = [("a", d, 5) for d in days] + [
            ("b", d, i) for i, d in enumerate(days)
        ]
        daily = spark.createDataFrame(rows, "g string, day date, yq long")
        got = kendall_tau(daily, "a", "b").collect()[0]
        assert got["tau_b"] is None


# ---------------------------------------------------------------------------
# Underwater spells == day-by-day scan
# ---------------------------------------------------------------------------


def _brute_spells(curve):
    peak = -math.inf
    spells = []
    run = 0
    for v in curve:
        peak = max(peak, v)
        if v < peak:
            run += 1
        else:
            if run:
                spells.append(run)
            run = 0
    if run:
        spells.append(run)
    return spells


class TestUnderwaterSpells:
    @pytest.mark.parametrize("seed", [4, 8])
    def test_matches_scan(self, spark, seed):
        from defimap_data_pipelines_spark.operators.risk import (
            underwater_spells,
        )

        rnd = random.Random(seed)
        names = ["s1", "s2"]
        rows, expect = [], {}
        for nm in names:
            v, curve = 10000.0, []
            for d in range(40):
                v *= 1 + rnd.uniform(-0.05, 0.05)
                curve.append(round(v, 4))
                rows.append(
                    (nm, dt.date(2024, 1, 1) + dt.timedelta(d), curve[-1])
                )
            expect[nm] = _brute_spells(curve)
        df = spark.createDataFrame(
            rows, "name string, date date, end_day_investment double"
        )
        got = {r["name"]: r for r in underwater_spells(df).collect()}
        for nm, spells in expect.items():
            if not spells:
                assert nm not in got
                continue
            r = got[nm]
            assert r["n_spells"] == len(spells)
            assert r["max_spell_days"] == max(spells)
            assert r["total_underwater_days"] == sum(spells)


# ---------------------------------------------------------------------------
# Information ratio == float reimplementation
# ---------------------------------------------------------------------------


class TestInformationRatio:
    def test_matches_reimplementation(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            information_ratio,
        )

        rnd = random.Random(6)
        days = [dt.date(2024, 1, 1) + dt.timedelta(d) for d in range(60)]
        bench = [round(rnd.uniform(-0.02, 0.02), 6) for _ in days]
        series = {
            nm: [
                round(b + rnd.uniform(-0.01, 0.01), 6)
                for b in bench
            ]
            for nm in ["x", "y"]
        }
        grows = [
            (nm, d, r)
            for nm, rs in series.items()
            for d, r in zip(days, rs)
        ]
        gdf = spark.createDataFrame(
            grows, "name string, date date, percent_change double"
        )
        bdf = spark.createDataFrame(
            list(zip(days, bench)), "date date, percent_change double"
        )
        got = {
            r["name"]: r
            for r in information_ratio(gdf, bdf, 365).collect()
        }
        for nm, rs in series.items():
            diffs = [a - b for a, b in zip(rs, bench)]
            n = len(diffs)
            mean_ann = sum(diffs) / n * 365.0
            m = sum(diffs) / n
            var = sum((d - m) ** 2 for d in diffs) / (n - 1)
            te = math.sqrt(var) * math.sqrt(365.0)
            r = got[nm]
            assert r["n_days"] == n
            # quantization at 1e-6 on each diff: the te is a sum of
            # ~60 squared micro-quantized terms — loose tolerance
            assert r["active_return_ann"] == pytest.approx(
                mean_ann, abs=1e-6
            )
            assert r["tracking_error"] == pytest.approx(te, rel=1e-3)
            assert r["info_ratio"] == pytest.approx(
                mean_ann / te, rel=1e-3
            )
