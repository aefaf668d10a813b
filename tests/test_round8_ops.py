"""Round-8 wave 21 operators vs plain-python references:
Ljung-Box Q, partial correlation, Qini uplift table."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = dict(max_examples=12, deadline=None, derandomize=True)


def _ljung_python(xs, h):
    n = len(xs)
    s = sum(xs)
    c = [n * x - s for x in xs]
    d = sum(ci * ci for ci in c)
    if n <= h or d == 0:
        return None
    q = 0.0
    for k in range(1, h + 1):
        num = sum(c[t] * c[t - k] for t in range(k, n))
        rho = float(num) / float(d)
        q += rho * rho / (n - k)
    return float(n) * (n + 2) * q


@given(st.lists(st.integers(0, 3000), min_size=3, max_size=60))
@settings(**SET)
def test_ljung_box_matches_python(spark, xs):
    from defimap_data_pipelines_spark.operators.timeseries import (
        ljung_box,
    )

    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "day long, xq long"
    )
    out = ljung_box(df, "day", "xq", max_lag=7).collect()[0]
    assert out["n_days"] == len(xs)
    assert out["max_lag"] == 7
    expect = _ljung_python(xs, 7)
    if expect is None:
        assert out["lb_q"] is None
    else:
        assert out["lb_q"] == pytest.approx(expect, rel=1e-6)


def test_ljung_box_separates_trend_from_noise(spark):
    """A strongly autocorrelated series (monotone ramp) must score a
    much larger Q than a fixed pseudo-noise sequence (an alternating
    series would NOT work — Q counts rho^2, and +/- alternation is
    near-perfect lag-1 ANTIcorrelation); a constant series has zero
    variance -> NULL."""
    from defimap_data_pipelines_spark.operators.timeseries import (
        ljung_box,
    )

    ramp = [(i, 10 * i) for i in range(40)]
    # fixed LCG: deterministic, negligible autocorrelation
    v, noise = 1234, []
    for i in range(40):
        v = (v * 1103515245 + 12345) % (1 << 31)
        noise.append((i, v % 1000))
    const = [(i, 7) for i in range(40)]
    q = {}
    for name, rows in (("ramp", ramp), ("noise", noise), ("const", const)):
        df = spark.createDataFrame(rows, "day long, xq long")
        q[name] = ljung_box(df, "day", "xq").collect()[0]["lb_q"]
    assert q["const"] is None
    assert q["ramp"] > 5 * q["noise"]


def _pearson(pairs):
    n = len(pairs)
    sa = sum(a for a, _ in pairs)
    sb = sum(b for _, b in pairs)
    sab = sum(a * b for a, b in pairs)
    saa = sum(a * a for a, _ in pairs)
    sbb = sum(b * b for _, b in pairs)
    va = float(n) * float(saa) - float(sa) * float(sa)
    vb = float(n) * float(sbb) - float(sb) * float(sb)
    if va <= 0 or vb <= 0:
        return None
    return (float(n) * float(sab) - float(sa) * float(sb)) / (
        (va * vb) ** 0.5
    )


@given(
    st.lists(
        st.tuples(
            st.integers(0, 500), st.integers(0, 500), st.integers(0, 500)
        ),
        min_size=3,
        max_size=40,
    )
)
@settings(**SET)
def test_partial_corr_matches_python(spark, triples):
    from defimap_data_pipelines_spark.operators.stats import partial_corr

    rows = []
    for d, (x, y, z) in enumerate(triples):
        rows += [("a", d, x), ("b", d, y), ("c", d, z)]
    daily = spark.createDataFrame(rows, "g string, day long, yq long")
    out = partial_corr(daily, "a", "b", "c").collect()[0]
    assert out["n_days"] == len(triples)
    rxy = _pearson([(x, y) for x, y, _ in triples])
    rxz = _pearson([(x, z) for x, _, z in triples])
    ryz = _pearson([(y, z) for _, y, z in triples])
    for col, ref in (("r_xy", rxy), ("r_xz", rxz), ("r_yz", ryz)):
        if ref is None:
            assert out[col] is None
        else:
            assert out[col] == pytest.approx(ref, abs=1e-8)
    if None not in (rxy, rxz, ryz):
        den = (1 - rxz * rxz) * (1 - ryz * ryz)
        if den > 0:
            expect = (rxy - rxz * ryz) / den**0.5
            assert out["r_partial"] == pytest.approx(expect, abs=1e-8)


def test_partial_corr_removes_common_driver(spark):
    """x and y both = z plus independent alternating noise: the raw
    r_xy is strongly positive (common driver), the partial r_xy.z
    must collapse toward 0."""
    from defimap_data_pipelines_spark.operators.stats import partial_corr

    rows = []
    for d in range(60):
        z = 100 * d
        x = z + (13 if d % 2 else -13)
        y = z + (7 if d % 3 == 0 else -7)
        rows += [("x", d, x), ("y", d, y), ("z", d, z)]
    daily = spark.createDataFrame(rows, "g string, day long, yq long")
    out = partial_corr(daily, "x", "y", "z").collect()[0]
    assert out["r_xy"] > 0.99
    assert abs(out["r_partial"]) < 0.5


def _qini_python(rows, n_bins=10):
    """rows: (vq, t, y). Block-cum reference mirroring the operator's
    start-offset bin rule."""
    from collections import defaultdict

    blocks = defaultdict(lambda: [0, 0, 0, 0])  # cnt, nt, rt, rc
    for vq, t, y in rows:
        b = blocks[vq]
        b[0] += 1
        b[1] += t
        b[2] += t * y
        b[3] += (1 - t) * y
    n = len(rows)
    out = {}
    cc = ct = crt = crc = 0
    for vq in sorted(blocks, reverse=True):
        cnt, nt, rt, rc = blocks[vq]
        off = cc
        cc += cnt
        ct += nt
        crt += rt
        crc += rc
        b = (off * n_bins) // n
        out[b] = (ct, cc - ct, crt, crc)
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(0, 1), st.integers(0, 1)
        ),
        min_size=5,
        max_size=200,
    )
)
@settings(**SET)
def test_qini_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.evalmetrics import (
        qini_uplift,
    )

    df = spark.createDataFrame(
        [(float(vq) / 100.0, t, y) for vq, t, y in rows],
        "value double, t long, y long",
    )
    got = {
        r["bin"]: r
        for r in qini_uplift(
            df, F.col("t") == 1, F.col("y") == 1, "value"
        ).collect()
    }
    expect = _qini_python(rows)
    assert set(got) == set(expect)
    for b, (ct, cc, crt, crc) in expect.items():
        r = got[b]
        assert (
            r["cum_n_t"],
            r["cum_n_c"],
            r["cum_resp_t"],
            r["cum_resp_c"],
        ) == (ct, cc, crt, crc)
        if cc > 0:
            assert r["qini"] == pytest.approx(
                crt - crc * ct / cc, abs=1e-8
            )
        else:
            assert r["qini"] is None


def test_qini_perfect_model_front_loads(spark):
    """Treated responders all get top scores: the first occupied
    bin's qini equals its treated-response count (control is empty
    or clean)."""
    from defimap_data_pipelines_spark.operators.evalmetrics import (
        qini_uplift,
    )

    rows = (
        [(9.0, 1, 1)] * 10  # treated responders, top score
        + [(5.0, 1, 0)] * 40  # treated non-responders
        + [(5.0, 0, 0)] * 40  # control non-responders
        + [(1.0, 0, 1)] * 10  # control responders, bottom
    )
    df = spark.createDataFrame(rows, "value double, t long, y long")
    out = qini_uplift(
        df, F.col("t") == 1, F.col("y") == 1, "value"
    ).orderBy("bin")
    last = out.collect()[-1]
    # endpoint: qini = 10 - 10 * (50/50) = 0 overall (balanced arms,
    # symmetric responses) — the perfect-model signal is the interior
    rows_all = out.collect()
    assert rows_all[0]["cum_resp_t"] == 10
    assert last["qini"] == pytest.approx(0.0, abs=1e-9)
