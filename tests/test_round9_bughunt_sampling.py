"""Round-9 bug hunt, sampling/planning/maintenance family:
pure-python references from the sf0.001 parquet — temperature
(alpha=0.5) mixture planning, md5-ordered domain capping, the DQ
constraint report, 8-gram benchmark decontamination, and
deterministic random walks replayed hop by hop from hashlib."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_temperature_mixture_matches_alpha_sampling(spark, sf_dir):
    got = {
        r["source"]: r
        for r in QUERIES["temperature_mixture"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")[["source", "text"]]
    n_docs, n_tok = Counter(), Counter()
    for src, txt in zip(d["source"], d["text"]):
        n_docs[src] += 1
        n_tok[src] += len(txt.split(" "))  # raw split, per the plan
    z = sum(math.sqrt(v) for v in n_tok.values())
    all_tok = sum(n_tok.values())
    assert set(got) == set(n_docs)
    for src in n_docs:
        r = got[src]
        w = math.sqrt(n_tok[src])
        assert r["n_docs"] == n_docs[src]
        assert r["n_tokens"] == n_tok[src]
        assert r["natural_share"] == pytest.approx(
            n_tok[src] / all_tok, abs=1e-6
        )
        assert r["sample_share"] == pytest.approx(w / z, abs=1e-6)
        assert r["target_tokens"] == _half_away(w / z * all_tok)
    # the flattening property: sampled share > natural share exactly
    # for below-average-mass sources
    shares = [(n_tok[s] / all_tok, math.sqrt(n_tok[s]) / z) for s in n_tok]
    assert any(s > n for n, s in shares) and any(s < n for n, s in shares)


def test_source_cap_matches_md5_order(spark, sf_dir):
    got = defaultdict(list)
    for r in QUERIES["source_cap"](spark, sf_dir).collect():
        got[r["source"]].append((r["rank_in_group"], r["doc_id"]))
    d = _pq(sf_dir, "documents")[["doc_id", "source"]]
    expect = defaultdict(list)
    for src, grp in d.groupby("source"):
        order = sorted(
            (int(i) for i in grp["doc_id"]),
            key=lambda i: (_md5(str(i)), i),
        )[:15]
        expect[src] = [(rk + 1, i) for rk, i in enumerate(order)]
    assert {s: sorted(v) for s, v in got.items()} == dict(expect)


def test_dq_checks_matches_pandas_recount(spark, sf_dir):
    got = {
        r["check"]: r["violations"]
        for r in QUERIES["dq_checks"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    li = _pq(sf_dir, "lineitem")
    docs = _pq(sf_dir, "documents")
    o = _pq(sf_dir, "orders")
    c = _pq(sf_dir, "customer")
    expect = {
        "unique(event_id)": len(e) - e["event_id"].nunique(),
        "unique(l_orderkey, l_linenumber)": len(li)
        - len(li[["l_orderkey", "l_linenumber"]].drop_duplicates()),
        "not_null(text)": int(docs["text"].isna().sum()),
        "range(l_discount in [0.0, 1.0])": int(
            (~li["l_discount"].between(0.0, 1.0)).sum()
        ),
        "fk(o_custkey -> c_custkey)": int(
            (~o["o_custkey"].isin(c["c_custkey"])).sum()
        ),
        "fk(l_orderkey -> o_orderkey)": int(
            (~li["l_orderkey"].isin(o["o_orderkey"])).sum()
        ),
    }
    assert got == expect
    assert expect["unique(l_orderkey, l_linenumber)"] > 0, (
        "the generator's compound-key violation must be caught"
    )


def _shingles(tokens):
    if len(tokens) <= 8:
        return {" ".join(tokens)}
    return {
        " ".join(tokens[i : i + 8]) for i in range(len(tokens) - 7)
    }


def test_decontamination_overlap_matches_python(spark):
    # sf0.001's 5% benchmark draw shares no 8-gram with the train
    # split (verified), which would make this check vacuous — sf0.01
    # is the smallest SF with real overlap (3 contaminated docs)
    sf_dir = "/root/testdata/sf0.01"
    got = {
        r["doc_id"]: (r["n_bench_docs"], r["n_shared_shingles"])
        for r in QUERIES["decontamination_overlap"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")[["doc_id", "text"]]
    sh = {
        int(i): _shingles(
            re.sub(r"\s+", " ", t.strip(" ").lower()).split(" ")
        )
        for i, t in zip(d["doc_id"], d["text"])
    }
    is_bench = {
        i: int(_md5(str(i))[:8], 16) % 10000 < 500 for i in sh
    }
    bench_index = defaultdict(set)
    for i, ss in sh.items():
        if is_bench[i]:
            for s in ss:
                bench_index[s].add(i)
    expect = {}
    for i, ss in sh.items():
        if is_bench[i]:
            continue
        hit_docs, hit_sh = set(), set()
        for s in ss:
            if s in bench_index:
                hit_docs |= bench_index[s]
                hit_sh.add(s)
        if hit_sh:
            expect[i] = (len(hit_docs), len(hit_sh))
    assert got == expect
    assert expect, "the 5% benchmark draw must overlap something"


def test_graph_walks_matches_hashlib_replay(spark, sf_dir):
    got = {
        (r["start"], r["walk"]): r["path"]
        for r in QUERIES["graph_walks"](spark, sf_dir).collect()
    }
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_partkey"]]
    cnt = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = grp["l_partkey"].tolist()
        for i in range(len(ps)):
            for j in range(len(ps)):
                if ps[i] < ps[j]:
                    cnt[(int(ps[i]), int(ps[j]))] += 1
    adj = defaultdict(set)
    for (u, v), c in cnt.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    expect = {}
    for start in adj:
        if start >= 1000:
            continue
        for walk in (0, 1):
            cur, path = start, str(start)
            for step in range(3):
                nbrs = sorted(adj[cur])
                idx = int(_md5(f"{cur}|{walk}|{step}")[:15], 16) % len(
                    nbrs
                )
                cur = nbrs[idx]
                path += f"->{cur}"
            expect[(start, walk)] = path
    assert got == expect
    assert expect, "walks must exist from the low-id starts"
