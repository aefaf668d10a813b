"""Round-10 bug hunt, pairs / sequence / CDC family: pure-python
third implementations from the sf0.001 parquet — the 2-D skyline via
the quadratic dominance definition, mutual-best itemCF pairs via an
explicit co-occurrence recommender, Goh-Barabasi burstiness from a
literal gap walk, snapshot-diff recovery of closed-form change sets,
event-transition counts, and Spearman rho via float average ranks.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_pareto_frontier_matches_dominance_definition(spark, sf_dir):
    got = sorted(
        (r["p_retailprice"], r["p_size"])
        for r in QUERIES["pareto_frontier"](spark, sf_dir).collect()
    )
    p = _pq(sf_dir, "part")
    pts = sorted(set(zip(p["p_retailprice"], p["p_size"])))
    frontier = [
        (lo, hi)
        for lo, hi in pts
        if not any(
            (lo2 <= lo and hi2 >= hi) and (lo2 < lo or hi2 > hi)
            for lo2, hi2 in pts
        )
    ]
    assert got == sorted(frontier)


def _itemcf_best(sf_dir, max_basket=64):
    li = _pq(sf_dir, "lineitem")
    baskets: dict = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[o].add(int(p))
    baskets = {b: s for b, s in baskets.items() if len(s) <= max_basket}
    ci: Counter = Counter()
    cij: Counter = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i in s:
            ci[i] += 1
        for a_i, i in enumerate(s):
            for j in s[a_i + 1 :]:
                cij[(i, j)] += 1
    best = {}
    sims: dict = defaultdict(list)
    for (i, j), c in cij.items():
        sim = c / math.sqrt(ci[i] * ci[j])
        sims[i].append((-round(sim, 9), j, c))
        sims[j].append((-round(sim, 9), i, c))
    for i, lst in sims.items():
        lst.sort()
        best[i] = (lst[0][1], lst[0][2], -lst[0][0])
    return best


def test_mutual_best_pairs_matches_reciprocal_top1(spark, sf_dir):
    got = sorted(
        (r["i"], r["j"], r["cij"])
        for r in QUERIES["mutual_best_pairs"](spark, sf_dir).collect()
    )
    best = _itemcf_best(sf_dir)
    expect = sorted(
        (i, j, c)
        for i, (j, c, _) in best.items()
        if i < j and best.get(j, (None,))[0] == i
    )
    assert got == expect


def test_burstiness_matches_gap_walk(spark, sf_dir):
    got = {r["event_type"]: r for r in QUERIES["burstiness"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    ts_us = e["ts"].astype("int64")
    per_user: dict = defaultdict(list)
    for u, t, ty, i in zip(e["user_id"], ts_us, e["event_type"], e["event_id"]):
        per_user[u].append((int(t), int(i), ty))
    gaps: dict = defaultdict(list)
    for evs in per_user.values():
        evs.sort()
        for (t0, _, ty0), (t1, _, _) in zip(evs, evs[1:]):
            gaps[ty0].append((t1 - t0) // 1_000_000)
    for ty, gs in gaps.items():
        if len(gs) < 2:
            assert ty not in got
            continue
        n = len(gs)
        s, ssq = sum(gs), sum(g * g for g in gs)
        mu = s / n
        sigma = math.sqrt((ssq - float(s) * s / n) / (n - 1))
        r = got[ty]
        assert r["n_gaps"] == n
        assert r["mean_gap_s"] == pytest.approx(mu, abs=1e-9)
        assert r["burstiness"] == pytest.approx(
            (sigma - mu) / (sigma + mu), abs=1e-9
        )


def test_snapshot_diff_recovers_closed_form_changes(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["change_type"])
        for r in QUERIES["snapshot_diff"](spark, sf_dir).collect()
    )
    ids = [int(i) for i in _pq(sf_dir, "documents")["doc_id"]]
    expect = []
    for i in ids:
        if i % 97 == 0:
            expect.append((i, "deleted"))
        elif i % 31 == 0:
            expect.append((i, "changed"))  # " v2" suffix always differs
        if i % 53 == 0:
            expect.append((i + 1_000_000, "added"))
    assert got == sorted(expect)


def test_event_transitions_matches_sequential_pairs(spark, sf_dir):
    got = {
        (r["prev_type"], r["curr_type"]): r["n"]
        for r in QUERIES["event_transitions"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    ts_us = e["ts"].astype("int64")
    per_user: dict = defaultdict(list)
    for u, t, i, ty in zip(e["user_id"], ts_us, e["event_id"], e["event_type"]):
        per_user[u].append((int(t), int(i), ty))
    counts: Counter = Counter()
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    assert got == dict(counts)


def _avg_ranks(vals):
    order = sorted(range(len(vals)), key=lambda k: vals[k])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for k in range(i, j + 1):
            ranks[order[k]] = avg
        i = j + 1
    return ranks


def test_spearman_matches_rank_pearson(spark, sf_dir):
    got = {r["event_type"]: r for r in QUERIES["spearman_corr"](spark, sf_dir).collect()}
    e = _pq(sf_dir, "events")
    groups: dict = defaultdict(lambda: ([], []))
    for ty, i, v in zip(e["event_type"], e["event_id"], e["value"]):
        groups[ty][0].append(int(i))
        groups[ty][1].append(v)
    for ty, (xs, ys) in groups.items():
        rx, ry = _avg_ranks(xs), _avg_ranks(ys)
        n = len(rx)
        mx, my = sum(rx) / n, sum(ry) / n
        sxy = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
        sxx = sum((a - mx) ** 2 for a in rx)
        syy = sum((b - my) ** 2 for b in ry)
        if sxx == 0 or syy == 0:
            assert ty not in got
            continue
        r = got[ty]
        assert r["n"] == n
        assert r["rho"] == pytest.approx(
            sxy / math.sqrt(sxx * syy), abs=1e-8
        )
