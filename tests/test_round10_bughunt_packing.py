"""Round-10 bug hunt, final pair: incremental connected components
vs a from-scratch python union-find over the FULL co-purchase graph
(the incremental path must reproduce the full labeling exactly), and
first-fit-decreasing packing replayed as an independent python FFD
over independently computed shard offsets.
"""

from __future__ import annotations

from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def test_incremental_cc_matches_full_union_find(spark, sf_dir):
    rows = QUERIES["incremental_cc"](spark, sf_dir).collect()
    label_col = [c for c in rows[0].asDict() if c != "node"][0]
    got = {r["node"]: r[label_col] for r in rows}
    li = _pq(sf_dir, "lineitem")
    per_order: dict = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        per_order[ok].add(int(pk))
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for items in per_order.values():
        s = sorted(items)
        for a, b in zip(s, s[1:]):
            union(a, b)
    comp: dict = defaultdict(list)
    for n in parent:
        comp[find(n)].append(n)
    expect = {
        n: min(members)
        for root, members in comp.items()
        for n in members
    }
    assert got == expect


def test_pack_sequences_matches_independent_ffd(spark, sf_dir):
    got = {
        (r["shard"], r["bin"]): r
        for r in QUERIES["pack_sequences"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents").sort_values("doc_id")
    docs = [
        (int(i), len(t.split(" "))) for i, t in zip(d["doc_id"], d["text"])
    ]
    # shard = exclusive token prefix // budget, in doc_id order
    shards: dict = defaultdict(list)
    cum = 0
    for i, n in docs:
        shards[cum // 65536].append((i, n))
        cum += n
    expect = {}
    for s, members in shards.items():
        members.sort(key=lambda t: (-t[1], t[0]))  # FFD order
        fills: list = []
        counts: list = []
        for _, n in members:
            placed = None
            for b in range(len(fills)):
                if fills[b] + n <= 256:
                    placed = b
                    break
            if placed is None:
                placed = len(fills)
                fills.append(0)
                counts.append(0)
            fills[placed] += n
            counts[placed] += 1
        for b in range(len(fills)):
            expect[(s, b)] = (counts[b], fills[b])
    assert set(got) == set(expect)
    for key, (nd, fill) in expect.items():
        r = got[key]
        assert (r["n_docs"], r["bin_fill"]) == (nd, fill), key
