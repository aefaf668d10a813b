"""Round-9 bug hunt: python-reference property tests for operators
previously covered only by the cross-engine parity sweep. Parity
proves Spark == DuckDB; these prove both == the math (a shared
expression-tree mistake would pass parity and fail here)."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = dict(max_examples=12, deadline=None, derandomize=True)

SERIES = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 30), st.integers(-50, 50)),
    min_size=2,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),  # one row per (g, day)
)


@given(SERIES)
@settings(**SET)
def test_theilsen_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.stats import (
        theilsen_by_group,
    )

    df = spark.createDataFrame(rows, "g long, day long, yq long")
    got = {r["g"]: r for r in theilsen_by_group(df).collect()}

    groups = {}
    for g, d, y in rows:
        groups.setdefault(g, []).append((d, y))
    for g, pts in groups.items():
        pts.sort()
        slopes = []
        for i in range(len(pts)):
            for j in range(i + 1, len(pts)):
                di, yi = pts[i]
                dj, yj = pts[j]
                slopes.append(
                    math.floor(float(yj - yi) * 1e9 / float(dj - di))
                )
        if not slopes:
            assert g not in got  # single-day group: no pairs
            continue
        slopes.sort()
        n = len(slopes)
        lo, hi = (n + 1) // 2, n // 2 + 1
        med = (slopes[lo - 1] + slopes[hi - 1]) / 2e9
        r = got[g]
        assert r["n_days"] == len(pts)
        assert r["n_pairs"] == n
        assert r["slope"] == pytest.approx(round(med, 9), abs=1e-9)


@given(SERIES)
@settings(**SET)
def test_mann_kendall_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.stats import (
        mann_kendall_trend,
    )

    df = spark.createDataFrame(rows, "g long, day long, yq long")
    got = {r["g"]: r for r in mann_kendall_trend(df).collect()}

    groups = {}
    for g, d, y in rows:
        groups.setdefault(g, []).append((d, y))
    for g, pts in groups.items():
        pts.sort()
        n = len(pts)
        s = sum(
            (pts[j][1] > pts[i][1]) - (pts[j][1] < pts[i][1])
            for i in range(n)
            for j in range(i + 1, n)
        )
        from collections import Counter

        ties = Counter(y for _, y in pts)
        tie18 = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
        var18 = (n * (n - 1) * (2 * n + 5) - tie18) / 18.0
        if var18 <= 0:
            assert g not in got  # all-tied group drops
            continue
        if s > 0:
            z = (s - 1) / math.sqrt(var18)
        elif s < 0:
            z = (s + 1) / math.sqrt(var18)
        else:
            z = 0.0
        r = got[g]
        assert r["n_days"] == n
        assert r["s_stat"] == s
        assert r["z"] == pytest.approx(round(z, 9), abs=1e-9)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),
            st.integers(-20, 20),  # value (whole units; quantum=1)
            st.integers(0, 5),  # weight, INCLUDING zero
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SET)
def test_weighted_median_matches_python(spark, rows):
    """Lower weighted median: smallest v with 2*cumw(<=v) >= total.
    Zero-weight rows participate in the value grid — an all-zero
    group has total 0, so EVERY value qualifies (2*0 >= 0) and the
    min value wins; the python ref mirrors that exactly."""
    from defimap_data_pipelines_spark.operators.quantiles import (
        weighted_median_by_group,
    )

    df = spark.createDataFrame(rows, "g long, v long, w long")
    got = {
        r["g"]: r
        for r in weighted_median_by_group(
            df, "g", "v", F.col("w"), quantum=1
        ).collect()
    }

    groups = {}
    for g, v, w in rows:
        groups.setdefault(g, {}).setdefault(v, 0)
        groups[g][v] += w
    for g, byv in groups.items():
        total = sum(byv.values())
        cum = 0
        med = None
        for v in sorted(byv):
            cum += byv[v]
            if 2 * cum >= total:
                med = v
                break
        r = got[g]
        assert r["total_w"] == total
        assert r["w_median"] == pytest.approx(float(med))


def _fifo_python(buys, sells):
    """(key, buy_ord, qty, price) x (key, sell_ord, qty) -> FIFO
    matches [(key, buy_ord, sell_ord, qty, cost)]."""
    out = []
    keys = {k for k, *_ in buys} | {k for k, *_ in sells}
    for k in sorted(keys):
        lots = sorted(
            [(o, q, p) for kk, o, q, p in buys if kk == k]
        )
        li, used = 0, 0
        for so, sq in sorted((o, q) for kk, o, q in sells if kk == k):
            need = sq
            while need > 0 and li < len(lots):
                bo, bq, bp = lots[li]
                avail = bq - used
                take = min(avail, need)
                if take > 0:
                    out.append((k, bo, so, take, take * bp))
                need -= take
                used += take
                if used == bq:
                    li, used = li + 1, 0
    return sorted(out)


@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 8), st.integers(1, 50)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(1, 8)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@settings(**SET)
def test_fifo_match_matches_python(spark, buy_rows, sell_rows):
    """FIFO via cumulative-interval overlap must equal the
    sequential lot-queue simulation — including sells that exhaust
    all lots (unmatched remainder emits no row) and zero-overlap
    keys."""
    from defimap_data_pipelines_spark.operators.lots import fifo_match

    buys = [(k, o, (o * 7 + 3) % 9 + 1, p) for k, o, p in buy_rows]
    sells = [(k, o, (o * 5 + 2) % 7 + 1) for k, o in sell_rows]
    bdf = spark.createDataFrame(
        buys or [(99, 1, 1, 1)], "k long, ord long, qty long, pc long"
    )
    sdf = spark.createDataFrame(
        sells or [(98, 1, 1)], "k long, ord long, qty long"
    )
    if not buys:
        bdf = bdf.filter(F.lit(False))
    if not sells:
        sdf = sdf.filter(F.lit(False))

    got = sorted(
        (r["k"], r["buy_ord"], r["sell_ord"], r["matched_qty"], r["cost_cents"])
        for r in fifo_match(
            bdf, sdf, "k", "qty", ["ord"], price_cents_col="pc"
        ).collect()
        if r["matched_qty"] > 0
    )
    expect = _fifo_python(buys, sells)
    assert got == expect


def test_fifo_match_zero_qty_edge(spark):
    """A zero-quantity lot occupies no interval and must never match
    (its lo == hi); a sell that exactly consumes lot 1 must not touch
    lot 2 (boundary is half-open)."""
    from defimap_data_pipelines_spark.operators.lots import fifo_match

    buys = spark.createDataFrame(
        [(1, 1, 5, 100), (1, 2, 0, 200), (1, 3, 5, 300)],
        "k long, ord long, qty long, pc long",
    )
    sells = spark.createDataFrame(
        [(1, 1, 5)], "k long, ord long, qty long"
    )
    rows = sorted(
        (r["buy_ord"], r["matched_qty"], r["cost_cents"])
        for r in fifo_match(
            buys, sells, "k", "qty", ["ord"], price_cents_col="pc"
        ).collect()
        if r["matched_qty"] > 0
    )
    assert rows == [(1, 5, 500)]


def test_holt_quantized_rejects_duplicate_order(spark):
    from defimap_data_pipelines_spark.operators.rolling import (
        holt_quantized,
    )

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, 1, 2.0)], "k long, o long, x double"
    )
    with pytest.raises(Exception, match="duplicate order"):
        holt_quantized(df, "k", "o", "x").collect()


@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),
            st.one_of(
                st.integers(-1000, 1000).map(float),
                st.just(None),
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    st.sampled_from([0.25, 0.5, 0.75, 0.9]),
)
@settings(**SET)
def test_exact_grouped_quantile_is_type1(spark, rows, q):
    """Bucket-refinement quantile must equal the TYPE-1 definition
    (element at rank ceil(q*n) of the sorted non-null values) for
    every group — including all-equal groups (degenerate histogram),
    NULL-heavy groups, and negative values. Tiny bucket count forces
    multiple refinement passes."""
    from defimap_data_pipelines_spark.operators.quantiles import (
        exact_grouped_quantiles,
    )

    df = spark.createDataFrame(rows, "g long, v double")
    got = {
        (r["g"], r["q"]): r["quantile"]
        for r in exact_grouped_quantiles(
            df, "g", "v", [q], buckets=4
        ).collect()
    }
    groups = {}
    for g, v in rows:
        if v is not None:
            groups.setdefault(g, []).append(v)
    for g, vs in groups.items():
        vs.sort()
        rank = max(1, math.ceil(q * len(vs)))
        assert got[(g, q)] == pytest.approx(vs[rank - 1]), (
            g,
            q,
            vs,
            got[(g, q)],
        )
    # groups with only NULLs produce no row
    null_only = {g for g, v in rows if g not in groups}
    for g in null_only:
        assert (g, q) not in got


@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # x bucket
            st.integers(0, 1),  # binary y
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**SET)
def test_isotonic_fit_equals_minimax_identity(spark, rows):
    """PAVA (stack algorithm) must equal the independent minimax
    identity y_hat(k) = max_{i<=k} min_{j>=k} mean(y[i..j]) with the
    same truncation — the O(B^3) reference the oracle uses, computed
    here in exact python rationals."""
    from fractions import Fraction

    from defimap_data_pipelines_spark.operators.cleaning import (
        isotonic_fit,
    )

    df = spark.createDataFrame(rows, "x long, y long").select(
        F.lit(0).alias("g"), "x", "y"
    )
    got = {
        r["x"]: r["y_hat_micro"]
        for r in isotonic_fit(df, "g", "x", "y").collect()
    }

    agg = {}
    for _, x, y in ((0, x, y) for x, y in rows):
        s, c = agg.get(x, (0, 0))
        agg[x] = (s + y, c + 1)
    xs = sorted(agg)
    ss = [agg[x][0] for x in xs]
    cs = [agg[x][1] for x in xs]
    B = len(xs)
    for k in range(B):
        best = None
        for i in range(k + 1):
            inner = None
            for j in range(k, B):
                m = Fraction(sum(ss[i : j + 1]), sum(cs[i : j + 1]))
                inner = m if inner is None else min(inner, m)
            best = inner if best is None else max(best, inner)
        m = best * 1_000_000
        # trunc toward zero of the exact rational * micro
        q = math.floor(m) if m >= 0 else -math.floor(-m)
        assert got[xs[k]] == q, (xs[k], got[xs[k]], q)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.booleans()),
        min_size=2,
        max_size=60,
    )
)
@settings(**SET)
def test_best_split_ig_matches_python(spark, rows):
    """Equal-width decision-stump scan vs python: identical binning
    (integer div on the shifted value), identical 0*log(0) guards,
    per-threshold information gain."""
    from defimap_data_pipelines_spark.operators.stats import best_split_ig

    df = spark.createDataFrame(rows, "v long, y boolean")
    got = {
        r["threshold"]: r
        for r in best_split_ig(
            df, "v", F.col("y"), n_bins=5, quantum=1
        ).collect()
    }

    vqs = [(v, int(y)) for v, y in rows]
    lo = min(v for v, _ in vqs)
    hi = max(v for v, _ in vqs)
    bins = {}
    for v, y in vqs:
        b = (v - lo) * 5 // (hi - lo + 1)
        n, p = bins.get(b, (0, 0))
        bins[b] = (n + 1, p + y)

    def ent(pos, n):
        out = 0.0
        if pos > 0:
            p = pos / n
            out -= p * math.log(p)
        if n - pos > 0:
            q = (n - pos) / n
            out -= q * math.log(q)
        return out

    nn = len(vqs)
    post = sum(y for _, y in vqs)
    nl = posl = 0
    for b in sorted(bins):
        n, p = bins[b]
        nl += n
        posl += p
        if b >= 4:
            continue
        nr, posr = nn - nl, post - posl
        ig = ent(post, nn) - (nl / nn) * ent(posl, nl)
        if nr > 0:
            ig -= (nr / nn) * ent(posr, nr)
        if b in got:
            r = got[b]
            assert r["n_left"] == nl and r["pos_left"] == posl
            assert r["ig"] == pytest.approx(round(ig, 9), abs=1e-9)
    # thresholds present in spark output == populated bins < n_bins-1
    assert set(got) == {b for b in bins if b < 4}
