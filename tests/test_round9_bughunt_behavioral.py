"""Round-9 bug hunt, behavioral-analytics family: pure-python
references from the sf0.001 parquet for queries whose only prior
coverage was cross-engine parity. cusum is checked through the
SEQUENTIAL recursion s_t = max(0, s_{t-1} + d_t) — the closed-form
prefix-min equivalence both engines rely on is exactly what a third
implementation should re-derive."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_mutual_information_matches_definition(spark, sf_dir):
    row = QUERIES["mutual_information"](spark, sf_dir).collect()[0]
    o = _pq(sf_dir, "orders")
    cells = Counter(zip(o["o_orderpriority"], o["o_orderstatus"]))
    n = sum(cells.values())
    nx, ny = Counter(), Counter()
    for (x, y), c in cells.items():
        nx[x] += c
        ny[y] += c
    mi = sum(
        c / n * math.log(c * n / (nx[x] * ny[y]))
        for (x, y), c in cells.items()
    )
    hx = -sum(c / n * math.log(c / n) for c in nx.values())
    hy = -sum(c / n * math.log(c / n) for c in ny.values())
    assert row["n"] == n
    assert row["mi"] == pytest.approx(mi, abs=1e-8)
    assert row["h_x"] == pytest.approx(hx, abs=1e-8)
    assert row["h_y"] == pytest.approx(hy, abs=1e-8)
    assert 0 <= row["mi"] <= min(row["h_x"], row["h_y"]) + 1e-9


def _repeat_copurchase_edges(sf_dir):
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_partkey"]]
    cnt = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = grp["l_partkey"].tolist()
        for i in range(len(ps)):
            for j in range(len(ps)):
                if ps[i] < ps[j]:
                    cnt[(int(ps[i]), int(ps[j]))] += 1
    return {p for p, c in cnt.items() if c >= 2}


def test_community_modularity_matches_newman_formula(spark, sf_dir):
    got = {
        r["com"]: r
        for r in QUERIES["community_modularity"](spark, sf_dir).collect()
    }
    edges = _repeat_copurchase_edges(sf_dir)
    lbl = dict(
        zip(
            _pq(sf_dir, "part")["p_partkey"],
            _pq(sf_dir, "part")["p_brand"],
        )
    )
    m = len(edges)
    ec, dc = Counter(), Counter()
    for u, v in edges:
        dc[lbl[u]] += 1
        dc[lbl[v]] += 1
        if lbl[u] == lbl[v]:
            ec[lbl[u]] += 1
    assert set(got) == set(dc)
    for com, d in dc.items():
        q = ec.get(com, 0) / m - (d / (2 * m)) ** 2
        assert got[com]["ec"] == ec.get(com, 0)
        assert got[com]["dc"] == d
        assert got[com]["q_nano"] == _half_away(q * 1e9)
    # total modularity of a partition is bounded by 1
    assert sum(r["q_nano"] for r in got.values()) <= 1_000_000_000


def test_event_funnel_matches_sequential_scan(spark, sf_dir):
    row = QUERIES["event_funnel"](spark, sf_dir).collect()[0]
    e = _pq(sf_dir, "events")[["user_id", "event_type", "ts"]].copy()
    e["us"] = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    n1 = n2 = n3 = 0
    total = 0
    for _, grp in e.groupby("user_id"):
        views = grp.loc[grp["event_type"] == "view", "us"]
        if views.empty:
            continue
        t1 = int(views.min())
        n1 += 1
        clicks = grp.loc[
            (grp["event_type"] == "click") & (grp["us"] > t1), "us"
        ]
        if clicks.empty:
            continue
        t2 = int(clicks.min())
        n2 += 1
        buys = grp.loc[
            (grp["event_type"] == "purchase") & (grp["us"] > t2), "us"
        ]
        if buys.empty:
            continue
        n3 += 1
        total += int(buys.min()) - t1
    assert (
        row["n_view"],
        row["n_view_click"],
        row["n_full_funnel"],
        row["total_convert_us"],
    ) == (n1, n2, n3, total)
    assert n1 >= n2 >= n3 > 0, "funnel must bite at sf0.001"


def test_cohort_retention_matches_python(spark, sf_dir):
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in QUERIES["cohort_retention"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["user_id", "ts"]].copy()
    e["week"] = (
        e["ts"].dt.normalize() - pd.to_timedelta(e["ts"].dt.weekday, "D")
    ).dt.date
    cohort = e.groupby("user_id")["week"].min()
    cells = Counter()
    for (uid, wk) in {(u, w) for u, w in zip(e["user_id"], e["week"])}:
        off = (wk - cohort[uid]).days // 7
        cells[(str(cohort[uid]), off)] += 1
    assert got == dict(cells)
    assert any(off > 0 for _, off in cells), "need multi-week activity"


def test_attribution_credit_matches_python(spark, sf_dir):
    got = {
        r["channel"]: r
        for r in QUERIES["attribution_credit"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[
        ["user_id", "event_id", "event_type", "ts"]
    ].copy()
    e["us"] = e["ts"].astype("datetime64[ns]").astype("int64") // 1000
    touches_by_user = defaultdict(list)
    for _, r in e[e["event_type"] != "purchase"].iterrows():
        touches_by_user[r["user_id"]].append(
            (int(r["us"]), int(r["event_id"]), r["event_type"])
        )
    n_touch, credit = Counter(), Counter()
    for _, c in e[e["event_type"] == "purchase"].iterrows():
        cus = int(c["us"])
        win = [
            t
            for t in touches_by_user.get(c["user_id"], [])
            if cus - 604800000000 <= t[0] < cus
        ]
        if not win:
            credit["(direct)"] += 10000
            continue
        k = len(win)
        win.sort(key=lambda t: (-t[0], -t[1]))  # most recent first
        for rn, (_, _, ch) in enumerate(win, start=1):
            n_touch[ch] += 1
            credit[ch] += 10000 // k + (1 if rn <= 10000 % k else 0)
    assert set(got) == set(credit)
    total = 0
    for ch, r in got.items():
        assert r["n_touches"] == n_touch.get(ch, 0)
        assert r["credit_bp"] == credit[ch]
        assert r["conversions_credited"] == pytest.approx(
            credit[ch] / 10000, abs=1e-9
        )
        total += r["credit_bp"]
    n_conv = int((e["event_type"] == "purchase").sum())
    assert total == 10000 * n_conv


def test_cusum_matches_sequential_recursion(spark, sf_dir):
    got = [
        (r["day"], r["d"], r["score_q"])
        for r in QUERIES["cusum_changepoints"](spark, sf_dir).collect()
    ]
    e = _pq(sf_dir, "events")[["ts", "value"]].copy()
    e["day"] = e["ts"].dt.normalize()
    e["xq"] = [_half_away(v) for v in e["value"]]
    daily = e.groupby("day")["xq"].sum().sort_index()
    n, s = len(daily), int(daily.sum())
    # the recursion itself, not the prefix-min closed form
    run = 0
    expect = []
    for day, xq in daily.items():
        d = n * int(xq) - s
        run = max(0, run + d)
        expect.append((day, d, run))
    assert len(got) == len(expect)
    for (gd, gdd, gs), (ed, edd, es) in zip(got, expect):
        assert pd.Timestamp(gd) == ed
        assert gdd == edd
        assert gs == es
