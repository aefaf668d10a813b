"""Round-9 bug hunt, retrieval + segmentation family: pure-python
references from the sf0.001 parquet. BM25 is re-derived from the
Robertson formula; RRF from the Cormack/Clarke/Buettcher definition
over independently recomputed rankings; item-CF from plain
co-occurrence cosine; JS divergence from the 0.5·KL(p||m) definition;
RFM from explicit sorts."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

BM25_TERMS = ("vector", "stream", "filter")


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _half_away(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def _tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip(" ").lower()).split(" ")


def _bm25_ranking(sf_dir, top):
    d = _pq(sf_dir, "documents")[["doc_id", "text"]]
    toks = {int(i): _tokens(t) for i, t in zip(d["doc_id"], d["text"])}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {
        doc: Counter(t for t in ts if t in BM25_TERMS)
        for doc, ts in toks.items()
    }
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    scores = {}
    for doc, c in tf.items():
        if not c:
            continue
        q = 0
        dl = len(toks[doc])
        for term, f in c.items():
            idf = math.log(1 + (n_docs - df[term] + 0.5) / (df[term] + 0.5))
            denom = f + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
            q += _half_away(idf * f * 2.2 / denom * 1e6)
        scores[doc] = q / 1e6
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return ranked


def test_bm25_search_matches_robertson_formula(spark, sf_dir):
    got = QUERIES["bm25_search"](spark, sf_dir).collect()
    expect = _bm25_ranking(sf_dir, 20)
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert r["bm25"] == pytest.approx(s, abs=1e-9)


def test_rrf_fusion_matches_definition(spark, sf_dir):
    got = QUERIES["rrf_fusion"](spark, sf_dir).collect()
    br = {d: i + 1 for i, (d, _) in enumerate(_bm25_ranking(sf_dir, 50))}
    e = _pq(sf_dir, "embeddings")[["vec_id", "embedding"]]
    vecs = {int(v): [float(x) for x in emb]
            for v, emb in zip(e["vec_id"], e["embedding"])}
    q = vecs[0]
    qn = math.sqrt(sum(x * x for x in q))
    cos = {}
    for v, emb in vecs.items():
        if v == 0:
            continue
        dot = sum(a * b for a, b in zip(q, emb))
        cos[v] = dot / (qn * math.sqrt(sum(x * x for x in emb)))
    cr = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
        )
    }
    fused, in_lists = Counter(), Counter()
    for ranking in (br, cr):
        for d, rk in ranking.items():
            fused[d] += _half_away(1e9 / (60 + rk))
            in_lists[d] += 1
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r["doc_id"], r["rrf_nano"], r["in_lists"]) for r in got] == [
        (d, s, in_lists[d]) for d, s in expect
    ]
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_itemcf_topk_matches_cooccurrence_cosine(spark, sf_dir):
    got = defaultdict(list)
    for r in QUERIES["itemcf_topk"](spark, sf_dir).collect():
        got[r["i"]].append((r["j"], r["cij"], r["sim"]))
    li = _pq(sf_dir, "lineitem")[["l_orderkey", "l_partkey"]]
    baskets = defaultdict(set)
    for b, i in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[int(b)].add(int(i))
    baskets = {b: s for b, s in baskets.items() if len(s) <= 64}
    ci = Counter()
    for s in baskets.values():
        ci.update(s)
    cij = Counter()
    for s in baskets.values():
        for i in s:
            if i < 100:
                for j in s:
                    if j != i:
                        cij[(i, j)] += 1
    expect = defaultdict(list)
    for (i, j), c in cij.items():
        expect[i].append((j, c, c / math.sqrt(ci[i] * ci[j])))
    assert set(got) == set(expect)
    for i, rows in expect.items():
        top = sorted(rows, key=lambda r: (-r[2], r[0]))[:5]
        assert [(j, c) for j, c, _ in top] == [
            (j, c) for j, c, _ in got[i]
        ]
        for (_, _, sim), (_, _, gsim) in zip(top, got[i]):
            assert gsim == pytest.approx(sim, abs=1e-9)


def test_js_divergence_matches_definition(spark, sf_dir):
    got = {
        (r["s_a"], r["s_b"]): r["js_nano"]
        for r in QUERIES["js_divergence"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")[["source", "text"]]
    cnt = defaultdict(Counter)
    for src, txt in zip(d["source"], d["text"]):
        cnt[src].update(_tokens(txt))
    tot = {s: sum(c.values()) for s, c in cnt.items()}
    sources = sorted(cnt)
    expect = {}
    for ai, a in enumerate(sources):
        for b in sources[ai + 1:]:
            js = 0
            for tok in set(cnt[a]) | set(cnt[b]):
                pa = cnt[a][tok] / tot[a]
                pb = cnt[b][tok] / tot[b]
                m = 0.5 * (pa + pb)
                term = 0.0
                if pa > 0:
                    term += 0.5 * pa * math.log(pa / m)
                if pb > 0:
                    term += 0.5 * pb * math.log(pb / m)
                js += _half_away(term * 1e9)
            expect[(a, b)] = js
    assert got == expect
    for v in expect.values():
        assert 0 <= v <= _half_away(math.log(2) * 1e9) + len(expect)


def test_rfm_segments_matches_explicit_sorts(spark, sf_dir):
    got = {
        r["segment"]: (r["customers"], r["cents"])
        for r in QUERIES["rfm_segments"](spark, sf_dir).collect()
    }
    o = _pq(sf_dir, "orders")[["o_custkey", "o_orderdate", "o_totalprice"]]
    cust = {}
    for ck, grp in o.groupby("o_custkey"):
        cents = sum(_half_away(p * 100) for p in grp["o_totalprice"])
        cust[int(ck)] = (
            grp["o_orderdate"].dt.date.max(),
            len(grp),
            cents,
        )
    n = len(cust)

    def buckets(idx):
        order = sorted(cust, key=lambda c: (cust[c][idx], c))
        return {c: (rn * 4) // n for rn, c in enumerate(order)}

    rb, fb, mb = buckets(0), buckets(1), buckets(2)
    expect = defaultdict(lambda: [0, 0])
    for c, (_, _, cents) in cust.items():
        seg = f"r{rb[c]}f{fb[c]}m{mb[c]}"
        expect[seg][0] += 1
        expect[seg][1] += cents
    assert got == {s: tuple(v) for s, v in expect.items()}
    assert len(got) > 10, "quartile grid must be populated"


def test_top_event_paths_matches_trigram_count(spark, sf_dir):
    got = [
        (r["a"], r["b"], r["c"], r["n"])
        for r in QUERIES["top_event_paths"](spark, sf_dir).collect()
    ]
    e = _pq(sf_dir, "events")[
        ["user_id", "ts", "event_id", "event_type"]
    ].sort_values(["user_id", "ts", "event_id"], kind="stable")
    cnt = Counter()
    for _, grp in e.groupby("user_id"):
        t = grp["event_type"].tolist()
        for i in range(len(t) - 2):
            cnt[(t[i], t[i + 1], t[i + 2])] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == [(a, b, c, n) for (a, b, c), n in expect]
