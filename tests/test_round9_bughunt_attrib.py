"""Round-9 bug hunt, attribution + Markov family: pure-python
references from the sf0.001 parquet. shapley_attribution is checked
by PERMUTATION ENUMERATION (the definition) rather than the weighted
subset-pair lattice both engines use — the two derivations agree only
if the [6,2,2,6] factorial weights are right. The Markov queries'
integer value-iteration recurrences are replayed from independently
computed transition counts."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import permutations

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

CHANNELS = ["click", "error", "signup", "view"]
BITS = {"click": 1, "error": 2, "signup": 4, "view": 8}


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_shapley_attribution_matches_permutation_def(spark, sf_dir):
    got = {
        r["channel"]: r
        for r in QUERIES["shapley_attribution"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[["user_id", "ts", "event_type"]].copy()
    e["unit"] = (
        e["user_id"].astype(str) + "|" + e["ts"].dt.date.astype(str)
    )
    masks, convs = defaultdict(int), defaultdict(int)
    for unit, et in zip(e["unit"], e["event_type"]):
        masks[unit] |= BITS.get(et, 0)
        if et == "purchase":
            convs[unit] = 1
    by_mask_n, by_mask_c = Counter(), Counter()
    for unit, m in masks.items():
        if m:
            by_mask_n[m] += 1
            by_mask_c[m] += convs[unit]
    # v(S) = truncated nano conversion rate of units with mask == S
    v = {
        s: (by_mask_c[s] * 10**9 // by_mask_n[s]) if by_mask_n[s] else 0
        for s in range(16)
    }
    # Shapley by definition: average the marginal contribution over
    # all 4! channel orderings
    phi = dict.fromkeys(CHANNELS, 0)
    for perm in permutations(CHANNELS):
        s = 0
        for ch in perm:
            phi[ch] += v[s | BITS[ch]] - v[s]
            s |= BITS[ch]
    pos_total = sum(p for p in phi.values() if p > 0)
    assert set(got) == set(CHANNELS)
    for ch in CHANNELS:
        assert got[ch]["shapley"] == pytest.approx(
            phi[ch] / 24e9, abs=1e-9
        )
        if pos_total > 0:
            exp_share = (max(phi[ch], 0)) / pos_total
            assert got[ch]["share"] == pytest.approx(exp_share, abs=1e-9)
    assert pos_total > 0, "fixture must attribute some conversion"


def _journey_steps(sf_dir):
    """Transition counts of the first-purchase-truncated journeys."""
    e = _pq(sf_dir, "events")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"], kind="stable")
    cnt = Counter()
    for _, grp in e.groupby("user_id"):
        types = grp["event_type"].tolist()
        journey = []
        for t in types:
            journey.append(t)
            if t == "purchase":
                break
        prev = "start"
        for t in journey:
            cnt[(prev, "conv" if t == "purchase" else t)] += 1
            prev = t
        if journey[-1] != "purchase":
            cnt[(journey[-1], "null")] += 1
    return cnt


def _value_iteration(cnt, removed, rounds=12):
    """v(a) = sum_b (v(b) * c(a,b)) // r(a) per-term-truncated, conv
    pinned at 1e9; hops into `removed` contribute nothing."""
    r = Counter()
    for (a, _), c in cnt.items():
        r[a] += c
    v = {"conv": 10**9}
    for _ in range(rounds):
        nxt = defaultdict(int)
        for (a, b), c in cnt.items():
            if b == removed:
                continue
            vb = v.get(b)
            if vb is not None:
                nxt[a] += (vb * c) // r[a]
        nxt.pop("conv", None)
        nxt["conv"] = 10**9
        v = dict(nxt)
    return v.get("start", 0)


def test_markov_attribution_matches_python(spark, sf_dir):
    got = {
        r["channel"]: r
        for r in QUERIES["markov_attribution"](spark, sf_dir).collect()
    }
    cnt = _journey_steps(sf_dir)
    pf = _value_iteration(cnt, removed=None)
    assert pf > 0, "full chain must convert at sf0.001"
    res, shares = {}, {}
    for ch in CHANNELS:
        p = _value_iteration(cnt, removed=ch)
        res[ch] = (p, 1.0 - p / pf)
    nano = {
        ch: int(round(re * 1e9)) if re > 0 else 0
        for ch, (_, re) in res.items()
    }
    tre = sum(nano.values())
    assert set(got) == set(CHANNELS)
    for ch in CHANNELS:
        p, re = res[ch]
        assert got[ch]["p_full"] == pytest.approx(pf / 1e9, abs=1e-9)
        assert got[ch]["p_removed"] == pytest.approx(p / 1e9, abs=1e-9)
        assert got[ch]["removal_effect"] == pytest.approx(re, abs=1e-9)
        if tre > 0:
            assert got[ch]["share"] == pytest.approx(
                nano[ch] / tre, abs=1e-9
            )


def test_markov_stationary_matches_python(spark, sf_dir):
    got = {
        r["event_type"]: r["v_micro"]
        for r in QUERIES["markov_stationary"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"], kind="stable")
    cnt = Counter()
    for _, grp in e.groupby("user_id"):
        types = grp["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            cnt[(a, b)] += 1
    r = Counter()
    for (a, _), c in cnt.items():
        r[a] += c
    nodes = sorted(r)
    v = dict.fromkeys(nodes, 10**6 // len(nodes))
    for _ in range(6):
        nxt = defaultdict(int)
        for (a, b), c in cnt.items():
            va = v.get(a)
            if va is not None:
                nxt[b] += (va * c) // r[a]
        v = dict(nxt)
    assert got == v
    assert len(got) >= 3, "event-type chain must be non-trivial"
