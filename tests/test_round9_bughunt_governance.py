"""Round-9 bug hunt, governance/corpus-planning family: pure-python
references from the sf0.001 parquet for winsorized robust stats,
bigram association lift, k-anonymity risk, and Hamilton
apportionment (including the sum(alloc) == budget exactness law).

Engine-semantics traps mirrored deliberately: Spark `div` and DuckDB
`//` both truncate toward ZERO (python // floors — measured:
DuckDB -5//2 = -2), and ROUND is half-away-from-zero."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _trunc_div(a: int, b: int) -> int:
    return abs(a) // abs(b) * (1 if (a >= 0) == (b >= 0) else -1)


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip(" ").lower()).split(" ")


def test_winsorized_stats_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["winsorized_stats"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["event_type", "value"]]
    expect = {}
    for et, grp in e.groupby("event_type"):
        vals = sorted(grp["value"])
        n = len(vals)
        # type-1 discrete quantile: smallest x with cdf >= q
        q25 = vals[math.ceil(0.25 * n) - 1]
        q75 = vals[math.ceil(0.75 * n) - 1]
        s = sum(
            _half_away(min(max(v, q25), q75) * 1e6) for v in vals
        )
        expect[et] = (q25, q75, s / 1e6 / n)
    assert set(got) == set(expect)
    for et, (q25, q75, wm) in expect.items():
        assert got[et]["q25"] == pytest.approx(q25, abs=1e-12)
        assert got[et]["q75"] == pytest.approx(q75, abs=1e-12)
        assert got[et]["winsorized_mean"] == pytest.approx(wm, abs=1e-9)


def test_bigram_lift_matches_python(spark, sf_dir):
    got = [
        (r["bigram"], r["pair_n"], r["left_n"], r["right_n"], r["lift_bp"])
        for r in QUERIES["bigram_lift"](spark, sf_dir).collect()
    ]
    docs = _pq(sf_dir, "documents")["text"]
    uni, bi = Counter(), Counter()
    for t in docs:
        toks = _tokens(t)
        uni.update(toks)
        for a, b in zip(toks, toks[1:]):
            bi[f"{a} {b}"] += 1
    n = sum(bi.values())
    scored = []
    for gram, pn in bi.items():
        if pn < 5:
            continue
        a, b = gram.split(" ")
        scored.append(
            (gram, pn, uni[a], uni[b], (pn * n * 10000) // (uni[a] * uni[b]))
        )
    expect = sorted(scored, key=lambda r: (-r[4], r[0]))[:50]
    assert got == expect
    assert len(got) == 50


def test_k_anonymity_matches_python(spark, sf_dir):
    got = {
        r["segment"]: r
        for r in QUERIES["k_anonymity"](spark, sf_dir).collect()
    }
    c = _pq(sf_dir, "customer")[
        ["c_mktsegment", "c_nationkey", "c_acctbal"]
    ]
    groups = Counter()
    for seg, nk, bal in zip(
        c["c_mktsegment"], c["c_nationkey"], c["c_acctbal"]
    ):
        band = _trunc_div(_half_away(bal * 100), 200000)
        groups[(seg, int(nk), band)] += 1
    per_seg = defaultdict(lambda: [0, 0, 0, 0])
    for (seg, _, _), cnt in groups.items():
        agg = per_seg[seg]
        agg[0] += cnt
        agg[1] += 1
        if cnt < 5:
            agg[2] += 1
            agg[3] += cnt
    assert set(got) == set(per_seg)
    for seg, (n_rows, n_groups, n_small, n_rows_small) in per_seg.items():
        r = got[seg]
        assert r["n_rows"] == n_rows
        assert r["n_groups"] == n_groups
        assert r["n_small_groups"] == n_small
        assert r["n_rows_small"] == n_rows_small
        assert r["reident_risk"] == pytest.approx(
            n_rows_small / n_rows, abs=1e-9
        )
    assert any(v[2] for v in per_seg.values()), "k=5 must bite"


def test_apportion_budget_matches_hamilton(spark, sf_dir):
    got = {
        (r["source"], r["lang"]): r
        for r in QUERIES["apportion_budget"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")[["source", "lang", "n_chars"]]
    w = d.groupby(["source", "lang"])["n_chars"].sum().astype(int)
    total = int(w.sum())
    budget = 1_000_000
    fl = {k: (budget * int(v)) // total for k, v in w.items()}
    rem = {k: (budget * int(v)) % total for k, v in w.items()}
    leftover = budget - sum(fl.values())
    order = sorted(w.index, key=lambda k: (-rem[k], k[0], k[1]))
    alloc = dict(fl)
    for rk, k in enumerate(order, start=1):
        if rk <= leftover and rem[k] > 0:
            alloc[k] += 1
    assert set(got) == set(alloc)
    for k, a in alloc.items():
        assert got[k]["weight"] == int(w[k])
        assert got[k]["alloc"] == a
    assert sum(r["alloc"] for r in got.values()) == budget
