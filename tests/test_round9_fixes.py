"""Round-9 regression tests: the r8 ADVICE adjudications.

1. partial_corr's six quadratic moments are products of two
   daily-mass-scaled values summed into what used to be plain int64
   — the rows/mass-squared overflow class the r8 sweep widened
   everywhere else (gini, roc_auc, mannwhitney, wasserstein,
   ams_f2). Now decimal(38,0) engine-side / HUGEINT oracle-side.
   The fixture uses the ar1_halflife method: per-day masses tuned so
   every LINEAR sum fits int64 but the old int64 product-sum wraps;
   the widened form must match python's arbitrary-precision ints.

2. ljung_box's numerator aggregate was groupBy("_n") — zero rows on
   an empty series while the oracle's global aggregate yields one
   NULL row. Now a global agg carrying _n via MAX; the degenerate
   shape is a tested contract in BOTH engines.
"""

from __future__ import annotations

import datetime
import math

import duckdb

I64_MAX = (1 << 63) - 1


def _mk_daily(spark, triples):
    rows = [
        (datetime.date(2024, 1, 1) + datetime.timedelta(days=i), g, v)
        for i, (x, y, z) in enumerate(triples)
        for g, v in (("a", x), ("b", y), ("c", z))
    ]
    return spark.createDataFrame(rows, "day date, g string, yq long")


def test_partial_corr_survives_moment_overflow_magnitudes(spark):
    """Daily masses ~3e8: sxx ~ days * 9e16 fits int64 at 40 days
    (~3.6e18) but would wrap at ~100 days — and products of two
    such masses summed over a year of days are far past int64. The
    widened decimal path must agree with python exact ints."""
    from defimap_data_pipelines_spark.operators.stats import partial_corr

    triples = []
    for i in range(40):
        z = 3_3000_0000 + i * 7_000_000  # common driver, ~3e8
        x = z + (i % 5) * 11_000_000
        y = z + (i % 3) * 13_000_000
        triples.append((x, y, z))

    sxx = sum(x * x for x, _, _ in triples)
    assert sxx > I64_MAX, (
        "fixture too small: old int64 moment sum would not overflow"
    )
    assert sum(x for x, _, _ in triples) <= I64_MAX

    out = partial_corr(_mk_daily(spark, triples), "a", "b", "c").collect()[0]

    # python reference with arbitrary-precision ints
    n = len(triples)

    def r(sab, sa, sb, saa, sbb):
        cov = float(n) * float(sab) - float(sa) * float(sb)
        va = float(n) * float(saa) - float(sa) * float(sa)
        vb = float(n) * float(sbb) - float(sb) * float(sb)
        if va > 0 and vb > 0:
            return cov / math.sqrt(va * vb)
        return None

    sx = sum(x for x, _, _ in triples)
    sy = sum(y for _, y, _ in triples)
    sz = sum(z for _, _, z in triples)
    sxy = sum(x * y for x, y, _ in triples)
    sxz = sum(x * z for x, _, z in triples)
    syz = sum(y * z for _, y, z in triples)
    syy = sum(y * y for _, y, _ in triples)
    szz = sum(z * z for _, _, z in triples)
    rxy = r(sxy, sx, sy, sxx, syy)
    rxz = r(sxz, sx, sz, sxx, szz)
    ryz = r(syz, sy, sz, syy, szz)
    den = (1 - rxz * rxz) * (1 - ryz * ryz)
    rp = (rxy - rxz * ryz) / math.sqrt(den)

    assert out["n_days"] == n
    assert abs(out["r_xy"] - round(rxy, 9)) < 1e-9
    assert abs(out["r_xz"] - round(rxz, 9)) < 1e-9
    assert abs(out["r_yz"] - round(ryz, 9)) < 1e-9
    assert abs(out["r_partial"] - round(rp, 9)) < 1e-9


def test_partial_corr_oracle_hugeint_survives_same_magnitudes(spark):
    """The SAME fixture through the registered DuckDB oracle text:
    DuckDB must not raise its BIGINT-overflow error (it errors loudly
    where Spark nulls, so this is the revert guard for the oracle
    side of the widening)."""
    from defimap_data_pipelines_spark.plans.queries import PARTIAL_CORR_SQL

    triples = []
    for i in range(40):
        z = 3_3000_0000 + i * 7_000_000
        x = z + (i % 5) * 11_000_000
        y = z + (i % 3) * 13_000_000
        triples.append((x, y, z))

    # the oracle reads an `events` view; synthesize one event per
    # (day, group) whose value round-trips to the daily mass
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (ts TIMESTAMP, event_type VARCHAR,"
        " value DOUBLE, user_id BIGINT)"
    )
    base = datetime.datetime(2024, 1, 1)
    for i, (x, y, z) in enumerate(triples):
        ts = base + datetime.timedelta(days=i)
        for g, v in (("click", x), ("purchase", y), ("view", z)):
            con.execute("INSERT INTO events VALUES (?, ?, ?, 1)", [ts, g, float(v)])
    row = con.execute(PARTIAL_CORR_SQL).fetchone()
    assert row[0] == len(triples)
    assert row[4] is not None  # r_partial computed, no overflow


def test_ljung_box_empty_series_one_null_row_both_engines(spark):
    """r8 ADVICE shape fix: an EMPTY series yields exactly ONE row of
    NULLs in the Spark operator (global agg) — matching the oracle's
    no-GROUP-BY aggregate — never zero rows."""
    from defimap_data_pipelines_spark.operators.timeseries import ljung_box
    from defimap_data_pipelines_spark.plans.queries import LJUNG_BOX_SQL

    empty = spark.createDataFrame([], "day date, xq long")
    rows = ljung_box(empty, "day", "xq", max_lag=7).collect()
    assert len(rows) == 1
    assert rows[0]["n_days"] is None
    assert rows[0]["max_lag"] == 7
    assert rows[0]["lb_q"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (ts TIMESTAMP, event_type VARCHAR,"
        " value DOUBLE, user_id BIGINT)"
    )
    orows = con.execute(LJUNG_BOX_SQL).fetchall()
    assert len(orows) == 1
    assert orows[0][0] is None and orows[0][2] is None


def test_levenshtein_containment_contract_split(spark):
    """r8 verdict task 6: the levenshtein band constraint is an
    OUTPUT CONTRACT that excludes cross-length near-dups BY DESIGN,
    delegating them to containment_pairs — so the two operators'
    COMBINED coverage is the invariant, not prose. One short doc
    quoted verbatim inside a much longer doc: levenshtein_neardup
    must exclude the pair (different full-length bands), and
    containment_pairs must report it at full containment."""
    from defimap_data_pipelines_spark.operators.dedup import (
        containment_pairs,
        levenshtein_neardup_pairs,
    )

    short = "the quarterly report shows steady growth in revenue"
    long_ = (
        "executive summary for the board: " + short + " and the "
        "outlook for the next fiscal year remains positive across "
        "every segment we track, with particular strength in the "
        "subscription business and continued expansion overseas."
    )
    docs = spark.createDataFrame(
        [(1, short, len(short), "en"), (2, long_, len(long_), "en")],
        "doc_id long, text string, n_chars int, lang string",
    )

    lev = levenshtein_neardup_pairs(
        docs, "doc_id", "text", "n_chars", "lang"
    ).collect()
    assert lev == [], (
        "cross-length pair must be OUTSIDE the levenshtein contract"
    )

    cont = containment_pairs(docs, "text", 3, 5000).collect()
    assert len(cont) == 1
    row = cont[0]
    assert (row["doc_a"], row["doc_b"]) == (1, 2)
    # every 3-shingle of the short doc appears in the long doc
    assert row["cont_bp"] == 10000

    # and the same-length direction still belongs to levenshtein:
    # a one-word edit of the short doc IS a levenshtein near-dup
    tweaked = short.replace("steady", "stable")
    docs2 = spark.createDataFrame(
        [(1, short, len(short), "en"), (2, tweaked, len(tweaked), "en")],
        "doc_id long, text string, n_chars int, lang string",
    )
    lev2 = levenshtein_neardup_pairs(
        docs2, "doc_id", "text", "n_chars", "lang"
    ).collect()
    assert len(lev2) == 1 and lev2[0]["lev"] <= 12
