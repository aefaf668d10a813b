"""Round-9 wave 22 operators vs plain-python references: MRR@k,
recall@k, binned log loss, Omega ratio, Herfindahl index, pooled
two-proportion z-test."""

from __future__ import annotations

import datetime
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = dict(max_examples=12, deadline=None, derandomize=True)

# (query_id 0..3, score 0..50, relevant?) rows — small enough that
# hypothesis explores tie patterns and empty groups
ROWS = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 50),
        st.booleans(),
    ),
    min_size=1,
    max_size=60,
)


def _ranked_groups(rows):
    """python reference ranking: per query, sort by (-score, tie)
    where tie = the row's unique index (the tiebreak column)."""
    groups = {}
    for i, (q, s, rel) in enumerate(rows):
        groups.setdefault(q, []).append((s, i, rel))
    out = {}
    for q, items in groups.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        out[q] = items
    return out


@given(ROWS)
@settings(**SET)
def test_mrr_at_k_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.evalmetrics import mrr_at_k

    df = spark.createDataFrame(
        [(q, s, i, rel) for i, (q, s, rel) in enumerate(rows)],
        "q long, s long, tb long, rel boolean",
    )
    out = mrr_at_k(df, "q", F.col("s"), "tb", F.col("rel"), k=10).collect()[0]

    groups = _ranked_groups(rows)
    total, hits = 0.0, 0
    for items in groups.values():
        frk = next(
            (
                rk
                for rk, (_, _, rel) in enumerate(items[:10], start=1)
                if rel
            ),
            None,
        )
        if frk is not None:
            hits += 1
            total += 1.0 / frk
    assert out["n_queries"] == len(groups)
    assert out["n_hit"] == hits
    assert out["mrr"] == pytest.approx(total / len(groups), abs=1e-9)


@given(ROWS)
@settings(**SET)
def test_recall_at_k_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.evalmetrics import (
        recall_at_k,
    )

    df = spark.createDataFrame(
        [(q, s, i, rel) for i, (q, s, rel) in enumerate(rows)],
        "q long, s long, tb long, rel boolean",
    )
    got = {
        r["query"]: r
        for r in recall_at_k(
            df, "q", F.col("s"), "tb", F.col("rel"), k=10
        ).collect()
    }
    for q, items in _ranked_groups(rows).items():
        n_rel = sum(1 for _, _, rel in items if rel)
        hits = sum(1 for _, _, rel in items[:10] if rel)
        r = got[q]
        assert r["n_cands"] == len(items)
        assert r["n_rel"] == n_rel
        assert r["hits_k"] == hits
        if n_rel == 0:
            assert r["recall"] is None
        else:
            assert r["recall"] == pytest.approx(hits / n_rel, abs=1e-9)


@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.booleans()),
        min_size=1,
        max_size=50,
    )
)
@settings(**SET)
def test_logloss_binned_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.evalmetrics import (
        logloss_binned,
        logloss_nano_weights,
    )

    df = spark.createDataFrame(rows, "p long, y boolean")
    out = logloss_binned(df, "p", F.col("y"), n_bins=10).collect()[0]

    pos_w, neg_w = logloss_nano_weights(10)
    loss = 0
    npos = 0
    for p, y in rows:
        b = min(p * 10 // 1000, 9)
        loss += pos_w[b] if y else neg_w[b]
        npos += int(y)
    assert out["n_rows"] == len(rows)
    assert out["n_pos"] == npos
    assert out["log_loss"] == pytest.approx(
        loss / 1e9 / len(rows), abs=1e-9
    )


def test_logloss_bin_weights_are_true_cross_entropy():
    """The literal weights must BE -ln(center)*1e9 — a sanity pin so
    nobody regenerates them with log2/log10."""
    from defimap_data_pipelines_spark.operators.evalmetrics import (
        logloss_nano_weights,
    )

    pos, neg = logloss_nano_weights(10)
    assert pos[0] == round(-math.log(0.05) * 1e9)
    assert neg[9] == round(-math.log(0.05) * 1e9)
    assert pos[9] == round(-math.log(0.95) * 1e9)
    # symmetric binning => pos reversed equals neg
    assert pos == neg[::-1]


@given(
    st.lists(
        st.floats(-0.2, 0.2, allow_nan=False),
        min_size=2,
        max_size=40,
    )
)
@settings(**SET)
def test_omega_ratio_matches_python(spark, returns):
    from defimap_data_pipelines_spark.operators.risk import omega_ratio

    base = datetime.date(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(days=i), "s1", 10_000.0, float(r))
        for i, r in enumerate(returns)
    ]
    df = spark.createDataFrame(
        rows,
        "date date, name string, end_day_investment double,"
        " percent_change double",
    )
    out = omega_ratio(df, day_period=365).collect()[0]

    rq = [round(r * 1_000_000_000) for r in returns]
    g = sum(max(x, 0) for x in rq)
    loss = sum(max(-x, 0) for x in rq)
    assert out["n_days"] == len(returns)
    assert out["gain_sum"] == pytest.approx(g / 1e9, abs=1e-9)
    assert out["loss_sum"] == pytest.approx(loss / 1e9, abs=1e-9)
    if loss == 0:
        assert out["omega"] is None
    else:
        assert out["omega"] == pytest.approx(g / loss, rel=1e-9)


@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 4), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
    )
)
@settings(**SET)
def test_hhi_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.stats import hhi_by_group

    df = spark.createDataFrame(rows, "g long, m long, vq long")
    got = {
        r["g"]: r
        for r in hhi_by_group(df, "g", "m", "vq").collect()
    }
    groups = {}
    for g, m, v in rows:
        groups.setdefault(g, {}).setdefault(m, 0)
        groups[g][m] += v
    for g, members in groups.items():
        tot = sum(members.values())
        n = len(members)
        r = got[g]
        assert r["n_members"] == n
        assert r["total"] == tot
        if tot == 0:
            assert r["hhi"] is None
        else:
            hhi = sum(v * v for v in members.values()) / (tot * tot)
            assert r["hhi"] == pytest.approx(hhi, abs=1e-9)
            if n > 1:
                assert r["hhi_norm"] == pytest.approx(
                    (n * hhi - 1) / (n - 1), abs=1e-8
                )
            else:
                assert r["hhi_norm"] is None


def test_hhi_known_extremes(spark):
    """Monopoly -> HHI 1; k equal members -> HHI 1/k, norm 0."""
    from defimap_data_pipelines_spark.operators.stats import hhi_by_group

    rows = [(0, 0, 500)] + [(1, m, 100) for m in range(4)]
    df = spark.createDataFrame(rows, "g long, m long, vq long")
    got = {r["g"]: r for r in hhi_by_group(df, "g", "m", "vq").collect()}
    assert got[0]["hhi"] == pytest.approx(1.0)
    assert got[0]["hhi_norm"] is None
    assert got[1]["hhi"] == pytest.approx(0.25)
    assert got[1]["hhi_norm"] == pytest.approx(0.0)


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.booleans()),
        min_size=1,
        max_size=80,
    )
)
@settings(**SET)
def test_two_prop_ztest_matches_python(spark, rows):
    from defimap_data_pipelines_spark.operators.experiments import (
        two_proportion_ztest,
    )

    df = spark.createDataFrame(rows, "user_id long, conv boolean")
    out = two_proportion_ztest(
        df, "user_id", F.col("user_id") % 2 == 1, F.col("conv")
    ).collect()[0]

    units = {}
    for u, c in rows:
        units[u] = units.get(u, False) or c
    n1 = sum(1 for u in units if u % 2 == 1)
    c1 = sum(1 for u, c in units.items() if u % 2 == 1 and c)
    n0 = len(units) - n1
    c0 = sum(1 for u, c in units.items() if u % 2 == 0 and c)
    assert (out["n1"], out["c1"], out["n0"], out["c0"]) == (n1, c1, n0, c0)
    if n1 > 0 and n0 > 0 and 0 < c1 + c0 < n1 + n0:
        p = (c1 + c0) / (n1 + n0)
        se = math.sqrt(p * (1 - p) * (1 / n1 + 1 / n0))
        z = (c1 / n1 - c0 / n0) / se
        assert out["z"] == pytest.approx(z, abs=1e-8)
    else:
        assert out["z"] is None


def test_two_prop_ztest_idempotent_in_event_volume(spark):
    """Duplicating every event row must not move any output field —
    the unit rollup is MAX, so conversion is per-unit, not per-row."""
    from defimap_data_pipelines_spark.operators.experiments import (
        two_proportion_ztest,
    )

    rows = [(u, u % 3 == 0) for u in range(20)]
    df1 = spark.createDataFrame(rows, "user_id long, conv boolean")
    df2 = spark.createDataFrame(rows * 3, "user_id long, conv boolean")
    a = two_proportion_ztest(
        df1, "user_id", F.col("user_id") % 2 == 1, F.col("conv")
    ).collect()[0]
    b = two_proportion_ztest(
        df2, "user_id", F.col("user_id") % 2 == 1, F.col("conv")
    ).collect()[0]
    assert a.asDict() == b.asDict()


def test_wave22_empty_input_shapes_match_oracle_semantics(spark):
    """The ljung_box lesson applied proactively: every wave-22
    operator must produce the same DEGENERATE shape its oracle
    produces on empty input — global aggregates yield ONE row of
    NULL/zero scalars, grouped aggregates yield ZERO rows."""
    import duckdb
    from pyspark.sql import functions as F

    from defimap_data_pipelines_spark.operators.evalmetrics import (
        logloss_binned,
        mrr_at_k,
        recall_at_k,
    )
    from defimap_data_pipelines_spark.operators.experiments import (
        two_proportion_ztest,
    )
    from defimap_data_pipelines_spark.operators.risk import omega_ratio
    from defimap_data_pipelines_spark.operators.stats import hhi_by_group

    rank_empty = spark.createDataFrame(
        [], "q long, s long, tb long, rel boolean"
    )
    rows = mrr_at_k(
        rank_empty, "q", F.col("s"), "tb", F.col("rel")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["n_queries"] == 0 and rows[0]["mrr"] is None

    assert (
        recall_at_k(
            rank_empty, "q", F.col("s"), "tb", F.col("rel")
        ).count()
        == 0
    )

    ll = logloss_binned(
        spark.createDataFrame([], "p long, y boolean"), "p", F.col("y")
    ).collect()
    assert len(ll) == 1
    assert ll[0]["n_rows"] == 0 and ll[0]["log_loss"] is None

    gotk_empty = spark.createDataFrame(
        [],
        "date date, name string, end_day_investment double,"
        " percent_change double",
    )
    assert omega_ratio(gotk_empty).count() == 0

    assert (
        hhi_by_group(
            spark.createDataFrame([], "g long, m long, vq long"),
            "g",
            "m",
            "vq",
        ).count()
        == 0
    )

    zt = two_proportion_ztest(
        spark.createDataFrame([], "user_id long, conv boolean"),
        "user_id",
        F.col("user_id") % 2 == 1,
        F.col("conv"),
    ).collect()
    assert len(zt) == 1
    assert zt[0]["n1"] is None and zt[0]["z"] is None

    # and the registered ORACLES agree on an empty substrate
    from defimap_data_pipelines_spark.plans.queries import ORACLE

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, source VARCHAR,"
        " n_chars BIGINT, lang VARCHAR, text VARCHAR)"
    )
    con.execute(
        "CREATE TABLE events (ts TIMESTAMP, event_type VARCHAR,"
        " value DOUBLE, user_id BIGINT)"
    )
    assert len(con.execute(ORACLE["mrr_at_k"]).fetchall()) == 1
    assert len(con.execute(ORACLE["recall_at_k"]).fetchall()) == 0
    assert len(con.execute(ORACLE["logloss_binned"]).fetchall()) == 1
    assert len(con.execute(ORACLE["hhi_concentration"]).fetchall()) == 0
    zo = con.execute(ORACLE["two_proportion_ztest"]).fetchall()
    assert len(zo) == 1 and zo[0][0] is None
