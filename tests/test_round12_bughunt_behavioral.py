"""Round-12 third implementations, wave 5 — behavioral-analytics +
information-theory families: the exact distributed two-sample KS
statistic (integer cross-product argmax), per-source Gini (rank-
weighted integer sums), the ordered view→click→purchase funnel
(MATCH_RECOGNIZE semantics by brute-force per-user scan), weekly
cohort retention (Monday-truncated weeks), and categorical mutual
information with marginals — each re-derived in pure python and
compared value-level against the Spark queries.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import datetime, timedelta, timezone

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _events(sf_dir) -> pd.DataFrame:
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    e["us"] = e["ts"].astype("int64")
    return e


def test_ks_drift_integer_argmax_replay(spark, sf_dir):
    row = QUERIES["ks_drift"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    e = _events(sf_dir)
    e = e[e["event_type"].isin(["click", "purchase"])]
    pooled = sorted(
        zip(e["value"], e["event_id"], e["event_type"])
    )  # (value, event_id) order
    na = sum(1 for _, _, t in pooled if t == "click")
    nb = len(pooled) - na
    ca = cb = 0
    ends: dict = {}
    for v, _, t in pooled:
        if t == "click":
            ca += 1
        else:
            cb += 1
        ends[v] = (ca, cb)  # cumulative at the END of value v's run
    best_d, at_value = -1, None
    for v in sorted(ends):
        a_end, b_end = ends[v]
        d = abs(a_end * nb - b_end * na)
        if d > best_d:
            best_d, at_value = d, v
    assert (got["n_a"], got["n_b"]) == (na, nb)
    assert got["ks_stat"] == pytest.approx(best_d / (na * nb), abs=1e-6)
    assert got["at_value"] == pytest.approx(at_value, abs=1e-12)


def test_gini_concentration_rank_weighted_replay(spark, sf_dir):
    got = {
        r["source"]: (r["n"], r["sx"], r["gini"])
        for r in QUERIES["gini_concentration"](spark, sf_dir).collect()
    }
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    expect = {}
    for src, g in d.groupby("source"):
        xs = [x for x, _ in sorted(zip(g["n_chars"], g["doc_id"]))]
        n = len(xs)
        sx = sum(xs)
        six = sum(i * x for i, x in enumerate(xs, start=1))
        expect[src] = (n, sx, (2 * six - (n + 1) * sx) / (n * sx))
    assert set(got) == set(expect)
    for src, (n, sx, gini) in expect.items():
        assert got[src][:2] == (n, sx), src
        assert got[src][2] == pytest.approx(gini, abs=1e-9), src


def test_event_funnel_ordered_stage_replay(spark, sf_dir):
    row = QUERIES["event_funnel"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    e = _events(sf_dir)
    by_user: dict = defaultdict(lambda: defaultdict(list))
    for uid, ty, us in zip(e["user_id"], e["event_type"], e["us"]):
        by_user[uid][ty].append(int(us))
    n1 = n2 = n3 = 0
    total = 0
    for uid, tys in by_user.items():
        views = tys.get("view")
        if not views:
            continue
        n1 += 1
        t1 = min(views)
        clicks = [t for t in tys.get("click", ()) if t > t1]
        if not clicks:
            continue
        n2 += 1
        t2 = min(clicks)
        purch = [t for t in tys.get("purchase", ()) if t > t2]
        if not purch:
            continue
        n3 += 1
        total += min(purch) - t1
    assert (got["n_view"], got["n_view_click"], got["n_full_funnel"]) == (
        n1,
        n2,
        n3,
    )
    assert got["total_convert_us"] == total


def _monday_week(us: int):
    dt = datetime.fromtimestamp(us / 1e6, tz=timezone.utc)
    return (dt - timedelta(days=dt.weekday())).date()


def test_cohort_retention_weekly_replay(spark, sf_dir):
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in QUERIES["cohort_retention"](spark, sf_dir).collect()
    }
    e = _events(sf_dir)
    first: dict = {}
    weeks: dict = defaultdict(set)
    for uid, us in zip(e["user_id"], e["us"]):
        u, w = int(uid), _monday_week(int(us))
        if u not in first or w < first[u]:
            first[u] = w
        weeks[u].add(w)
    expect: Counter = Counter()
    for u, cohort in first.items():
        for w in weeks[u]:
            expect[(cohort, (w - cohort).days // 7)] += 1
    assert got == dict(expect)
    # week 0 of each cohort contains the whole cohort by construction
    cohort_sizes = Counter(first.values())
    for cw, size in cohort_sizes.items():
        assert got[(cw, 0)] == size, cw


def test_mutual_information_quantized_replay(spark, sf_dir):
    row = QUERIES["mutual_information"](spark, sf_dir).collect()
    assert len(row) == 1
    got = row[0]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    cells = Counter(zip(o["o_orderpriority"], o["o_orderstatus"]))
    nx: Counter = Counter()
    ny: Counter = Counter()
    for (x, y), c in cells.items():
        nx[x] += c
        ny[y] += c
    nn = sum(cells.values())
    mi_t = sum(
        c * _ha(math.log(c * nn / (nx[x] * ny[y])) * 1e9)
        for (x, y), c in cells.items()
    )
    hx_t = sum(c * _ha(math.log(c / nn) * 1e9) for c in nx.values())
    hy_t = sum(c * _ha(math.log(c / nn) * 1e9) for c in ny.values())
    assert got["n"] == nn
    assert got["mi"] == pytest.approx(mi_t / (1e9 * nn), abs=1e-9)
    assert got["h_x"] == pytest.approx(-hx_t / (1e9 * nn), abs=1e-9)
    assert got["h_y"] == pytest.approx(-hy_t / (1e9 * nn), abs=1e-9)
    # information inequality: 0 <= MI <= min(H(X), H(Y))
    assert -1e-9 <= got["mi"] <= min(got["h_x"], got["h_y"]) + 1e-9
