"""Brute-force twins for round-6 wave-8/9 operators: downside risk
(Sortino/Calmar, VaR/CVaR, rolling beta), eval metrics (AUC, lift),
and journeys (linear attribution, peak concurrency).

Each test recomputes the operator's answer in plain Python with the
SAME integer quantization, so a pass means the distributed plan and a
from-scratch implementation agree bit-for-bit on the quantized
decisions (membership, ranks, bins) and to 1e-9 on the final floats.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def _rq(x: float, q: int) -> int:
    # mirror of F.round(col * q).cast("long"): round-half-up on the
    # scaled value (Spark's ROUND is half-up for positive, half-down
    # for negative magnitudes — i.e. half-away-from-zero).
    scaled = x * q
    f = math.floor(abs(scaled) + 0.5)
    return int(math.copysign(f, scaled))


# --------------------------------------------------------------------
# downside risk
# --------------------------------------------------------------------


def _series(seed: int, n: int = 90):
    rnd = random.Random(seed)
    d0 = dt.date(2024, 1, 1)
    rows, edi = [], 10000.0
    for i in range(n):
        pc = rnd.uniform(-0.08, 0.09)
        edi *= 1 + pc
        rows.append((d0 + dt.timedelta(days=i), "s", edi, pc))
    return rows


class TestSortinoCalmar:
    def test_matches_python_replica(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            sortino_calmar,
        )

        rows = _series(7)
        df = spark.createDataFrame(
            rows,
            "date date, name string, end_day_investment double,"
            " percent_change double",
        )
        got = sortino_calmar(df).collect()[0]

        n = len(rows)
        sr = sum(_rq(pc, 10**9) for _, _, _, pc in rows)
        ssqn = sum(
            _rq(pc, 10**6) ** 2
            for _, _, _, pc in rows
            if _rq(pc, 10**6) < 0
        )
        cummax, mddq = 0.0, 0
        for _, _, edi, _ in rows:
            cummax = max(cummax, edi)
            mddq = max(mddq, _rq(1 - edi / cummax, 10**9))
        ann = (sr / 1e9 / n + 1) ** 365 - 1
        ddev = math.sqrt(ssqn / 1e12 / (n - 1)) * math.sqrt(365.0)
        assert got["n_days"] == n
        assert got["ann_return"] == pytest.approx(ann, abs=2e-9)
        assert got["downside_dev"] == pytest.approx(ddev, abs=2e-9)
        assert got["sortino"] == pytest.approx(ann / ddev, abs=2e-9)
        assert got["max_dd"] == pytest.approx(mddq / 1e9, abs=2e-9)
        assert got["calmar"] == pytest.approx(
            ann / (mddq / 1e9), abs=2e-9
        )

    def test_monotone_up_gives_null_calmar(self, spark):
        from defimap_data_pipelines_spark.operators.risk import (
            sortino_calmar,
        )

        d0 = dt.date(2024, 1, 1)
        rows = [
            (d0 + dt.timedelta(days=i), "up", 10000.0 * 1.01**i, 0.01)
            for i in range(30)
        ]
        got = sortino_calmar(
            spark.createDataFrame(
                rows,
                "date date, name string, end_day_investment double,"
                " percent_change double",
            )
        ).collect()[0]
        # no down day, no drawdown: both ratios NULL, never inf
        assert got["sortino"] is None
        assert got["calmar"] is None


class TestVarCvar:
    def test_matches_order_statistics(self, spark):
        from defimap_data_pipelines_spark.operators.risk import var_cvar

        rows = _series(11, n=120)
        df = spark.createDataFrame(
            rows,
            "date date, name string, end_day_investment double,"
            " percent_change double",
        )
        got = var_cvar(df, tail_pct=5).collect()[0]

        ranked = sorted(
            (_rq(pc, 10**9), d) for d, _, _, pc in rows
        )
        k = max(1, len(rows) * 5 // 100)
        tail = [r for r, _ in ranked[:k]]
        assert got["k_tail"] == k
        assert got["var_pct"] == pytest.approx(-tail[-1] / 1e9, abs=1e-9)
        assert got["cvar_pct"] == pytest.approx(
            -sum(tail) / (k * 1e9), abs=1e-9
        )

    def test_k_floor_is_one(self, spark):
        from defimap_data_pipelines_spark.operators.risk import var_cvar

        rows = _series(3, n=10)  # 10 * 5 // 100 == 0 -> floor to 1
        got = var_cvar(
            spark.createDataFrame(
                rows,
                "date date, name string, end_day_investment double,"
                " percent_change double",
            ),
            tail_pct=5,
        ).collect()[0]
        worst = min(_rq(pc, 10**9) for _, _, _, pc in rows)
        assert got["k_tail"] == 1
        assert got["var_pct"] == pytest.approx(-worst / 1e9, abs=1e-9)
        assert got["cvar_pct"] == got["var_pct"]


class TestRollingBeta:
    def test_matches_numpy_ols(self, spark):
        np = pytest.importorskip("numpy")
        from defimap_data_pipelines_spark.operators.risk import (
            rolling_beta,
        )

        rnd = random.Random(5)
        d0 = dt.date(2024, 1, 1)
        n, w = 60, 20
        xs = [rnd.uniform(-0.03, 0.03) for _ in range(n)]
        ys = [1.4 * x + rnd.uniform(-0.01, 0.01) for x in xs]
        dates = [d0 + dt.timedelta(days=i) for i in range(n)]
        a = spark.createDataFrame(
            [(d, "s", 0.0, y) for d, y in zip(dates, ys)],
            "date date, name string, end_day_investment double,"
            " percent_change double",
        )
        b = spark.createDataFrame(
            [(d, x) for d, x in zip(dates, xs)],
            "date date, percent_change double",
        )
        got = {
            r["date"]: r["beta"]
            for r in rolling_beta(a, b, window_days=w).collect()
        }
        assert len(got) == n - w + 1
        xq = [_rq(x, 10**6) for x in xs]
        yq = [_rq(y, 10**6) for y in ys]
        for i in range(w - 1, n):
            xw = np.array(xq[i - w + 1 : i + 1], dtype=float)
            yw = np.array(yq[i - w + 1 : i + 1], dtype=float)
            beta = float(
                ((w * (xw * yw).sum() - xw.sum() * yw.sum()))
                / (w * (xw * xw).sum() - xw.sum() ** 2)
            )
            assert got[dates[i]] == pytest.approx(beta, abs=2e-9)


# --------------------------------------------------------------------
# eval metrics
# --------------------------------------------------------------------


class TestRocAuc:
    def test_matches_pairwise_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            roc_auc,
        )

        rnd = random.Random(13)
        rows = []
        for i in range(300):
            y = rnd.random() < 0.4
            s = rnd.uniform(0.2, 0.8) + (0.15 if y else 0.0)
            rows.append((s, y))
        df = spark.createDataFrame(rows, "score double, label boolean")
        got = roc_auc(df, F.col("label"), "score", quantum=100).collect()[0]

        q = [( _rq(s, 100), y) for s, y in rows]
        pos = [v for v, y in q if y]
        neg = [v for v, y in q if not y]
        wins = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p in pos
            for n in neg
        )
        auc = wins / (len(pos) * len(neg))
        assert got["n_pos"] == len(pos)
        assert got["n_neg"] == len(neg)
        assert got["auc"] == pytest.approx(auc, abs=1e-9)
        assert got["gini"] == pytest.approx(2 * auc - 1, abs=1e-9)

    def test_perfect_and_random(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            roc_auc,
        )

        rows = [(float(i), i >= 50) for i in range(100)]
        df = spark.createDataFrame(rows, "score double, label boolean")
        got = roc_auc(df, F.col("label"), "score").collect()[0]
        assert got["auc"] == 1.0
        # all-tied scores: AUC exactly 1/2 by the tie convention
        flat = spark.createDataFrame(
            [(1.0, i % 2 == 0) for i in range(40)],
            "score double, label boolean",
        )
        got2 = roc_auc(flat, F.col("label"), "score").collect()[0]
        assert got2["auc"] == 0.5


class TestLiftGains:
    def test_matches_rank_bruteforce(self, spark):
        from defimap_data_pipelines_spark.operators.evalmetrics import (
            lift_gains,
        )

        rnd = random.Random(17)
        rows = []
        for i in range(200):
            y = rnd.random() < 0.3
            s = round(rnd.uniform(0, 1), 2)  # force many score ties
            rows.append((i, s, y))
        df = spark.createDataFrame(rows, "id long, score double, label boolean")
        got = {
            r["bin"]: r
            for r in lift_gains(
                df, F.col("label"), "score", "id", n_bins=10
            ).collect()
        }

        ordered = sorted(rows, key=lambda r: (-_rq(r[1], 100), r[0]))
        n = len(ordered)
        tp = sum(1 for _, _, y in ordered if y)
        bins: dict[int, list] = {}
        for rk, (_, _, y) in enumerate(ordered, start=1):
            bins.setdefault((rk - 1) * 10 // n, []).append(y)
        cum = 0
        for b in sorted(bins):
            ys = bins[b]
            pos = sum(ys)
            cum += pos
            g = got[b]
            assert g["n"] == len(ys)
            assert g["pos"] == pos
            assert g["rate"] == pytest.approx(pos / len(ys), abs=1e-9)
            assert g["lift"] == pytest.approx(
                (pos * n) / (len(ys) * tp), abs=1e-9
            )
            assert g["cum_gain"] == pytest.approx(cum / tp, abs=1e-9)


# --------------------------------------------------------------------
# journeys
# --------------------------------------------------------------------


def _ts(day: int, hour: int = 0, minute: int = 0):
    return dt.datetime(2024, 3, 1 + day, hour, minute)


class TestAttribution:
    def _frames(self, spark, conv_rows, touch_rows):
        c = spark.createDataFrame(
            conv_rows, "user_id long, ts timestamp, event_id long"
        )
        t = spark.createDataFrame(
            touch_rows,
            "user_id long, ts timestamp, event_id long, event_type string",
        )
        return c, t

    def test_credit_conservation_invariant(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            attribute_linear,
        )

        rnd = random.Random(23)
        convs, touches, eid = [], [], 0
        for u in range(12):
            for _ in range(rnd.randint(0, 3)):
                eid += 1
                convs.append((u, _ts(rnd.randint(3, 8), 12), eid))
            for _ in range(rnd.randint(0, 7)):
                eid += 1
                touches.append(
                    (
                        u,
                        _ts(rnd.randint(0, 8), rnd.randint(0, 23)),
                        eid,
                        rnd.choice(["ads", "email", "social"]),
                    )
                )
        c, t = self._frames(spark, convs, touches)
        out = attribute_linear(c, t).collect()
        total = sum(r["credit_bp"] for r in out)
        # THE contract: basis points conserve exactly
        assert total == 10000 * len(convs)
        assert sum(r["conversions_credited"] for r in out) == pytest.approx(
            len(convs), abs=1e-6
        )

    def test_remainder_goes_to_most_recent(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            attribute_linear,
        )

        # one conversion, 3 touches -> 3334 to the latest, 3333 x2
        c, t = self._frames(
            spark,
            [(1, _ts(5), 100)],
            [
                (1, _ts(2), 1, "ads"),
                (1, _ts(3), 2, "email"),
                (1, _ts(4), 3, "social"),
            ],
        )
        got = {r["channel"]: r["credit_bp"] for r in attribute_linear(c, t).collect()}
        assert got == {"ads": 3333, "email": 3333, "social": 3334}

    def test_no_touch_is_direct_and_lookback_excludes(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            attribute_linear,
        )

        # the only touch is 10 days before the conversion: outside the
        # 7-day lookback, so the conversion is (direct)
        c, t = self._frames(
            spark, [(1, _ts(11), 100)], [(1, _ts(1), 1, "ads")]
        )
        got = {r["channel"]: r["credit_bp"] for r in attribute_linear(c, t).collect()}
        assert got == {"(direct)": 10000}


class TestPeakConcurrency:
    def _brute(self, sessions):
        days = set()
        for s, e in sessions:
            days.update(range(s // US_PER_DAY, e // US_PER_DAY + 1))
        out = {}
        for day in days:
            lo, hi = day * US_PER_DAY, (day + 1) * US_PER_DAY
            carry = sum(1 for s, e in sessions if s < lo and e >= lo)
            cands = [lo] + [
                t for s, e in sessions for t in (s, e + 1) if lo <= t < hi
            ]
            peak = max(
                sum(1 for s, e in sessions if s <= t < e + 1)
                for t in cands
            )
            out[day] = (carry, peak)
        return out

    def test_matches_bruteforce_with_midnight_spans(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            peak_concurrency,
        )

        rnd = random.Random(31)
        sessions = []
        for _ in range(80):
            s = rnd.randrange(0, 5 * US_PER_DAY)
            dur = rnd.randrange(1, 2 * US_PER_DAY)  # up to 2-day spans
            sessions.append((s, s + dur))
        df = spark.createDataFrame(
            sessions, "session_start_us long, session_end_us long"
        )
        got = {
            (r["day"] - dt.date(1970, 1, 1)).days: (r["carry_in"], r["peak"])
            for r in peak_concurrency(df).collect()
        }
        assert got == self._brute(sessions)

    def test_back_to_back_no_double_count(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            peak_concurrency,
        )

        # session B starts the microsecond after A ends: peak is 1
        df = spark.createDataFrame(
            [(0, 999), (1000, 1999)],
            "session_start_us long, session_end_us long",
        )
        got = peak_concurrency(df).collect()
        assert [(r["carry_in"], r["peak"]) for r in got] == [(0, 1)]

    def test_day_inside_long_session(self, spark):
        from defimap_data_pipelines_spark.operators.journeys import (
            peak_concurrency,
        )

        # one session spanning 3 full days: middle day has no deltas
        # but must still report peak = carry_in = 1
        df = spark.createDataFrame(
            [(10, 3 * US_PER_DAY + 10)],
            "session_start_us long, session_end_us long",
        )
        got = {
            (r["day"] - dt.date(1970, 1, 1)).days: (r["carry_in"], r["peak"])
            for r in peak_concurrency(df).collect()
        }
        assert got == {0: (0, 1), 1: (1, 1), 2: (1, 1), 3: (1, 1)}
