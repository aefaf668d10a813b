"""Round-10 bug hunt, retrieval-ranking + concentration family:
pure-python third implementations from the sf0.001 parquet — NDCG via
an explicit per-query sort and the textbook DCG/IDCG, AP@k via the
running-precision definition, MRR@k via a first-hit scan, recall@k by
counting, binned log loss via the bin-center cross-entropy, and HHI
from explicit member shares.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

K = 10
LCM10 = 2520


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ranked_by_source(sf_dir):
    """Per source: docs sorted by (n_chars desc, doc_id asc)."""
    d = _pq(sf_dir, "documents")
    groups: dict = defaultdict(list)
    for s, nc, i in zip(d["source"], d["n_chars"], d["doc_id"]):
        groups[s].append((int(nc), int(i)))
    for v in groups.values():
        v.sort(key=lambda t: (-t[0], t[1]))
    return groups


def test_ndcg_at_k_matches_textbook(spark, sf_dir):
    got = {r["query"]: r for r in QUERIES["ndcg_at_k"](spark, sf_dir).collect()}
    w = [round(1e9 / math.log2(i + 2)) for i in range(K)]
    for s, ranked in _ranked_by_source(sf_dir).items():
        rels = [i % 4 for _, i in ranked]
        dcgq = sum(rel * w[p] for p, rel in enumerate(rels[:K]))
        ideal = sorted(
            ((i % 4, i) for _, i in ranked), key=lambda t: (-t[0], t[1])
        )
        idcgq = sum(rel * w[p] for p, (rel, _) in enumerate(ideal[:K]))
        r = got[s]
        assert r["n_cands"] == len(ranked)
        assert r["dcg"] == pytest.approx(dcgq / 1e9, abs=1e-9)
        assert r["idcg"] == pytest.approx(idcgq / 1e9, abs=1e-9)
        if idcgq > 0:
            assert r["ndcg"] == pytest.approx(dcgq / idcgq, abs=1e-9)
        else:
            assert r["ndcg"] is None


def test_map_at_k_matches_running_precision(spark, sf_dir):
    got = {r["query"]: r for r in QUERIES["map_at_k"](spark, sf_dir).collect()}
    for s, ranked in _ranked_by_source(sf_dir).items():
        ys = [1 if i % 4 == 0 else 0 for _, i in ranked]
        n_rel = sum(ys)
        cum = 0
        num = 0
        for pos, y in enumerate(ys[:K], start=1):
            cum += y
            if y:
                num += cum * (LCM10 // pos)
        r = got[s]
        assert (r["n_cands"], r["n_rel"]) == (len(ys), n_rel)
        if n_rel > 0:
            ap = num / (LCM10 * min(K, n_rel))
            assert r["ap"] == pytest.approx(ap, abs=1e-9)
        else:
            assert r["ap"] is None


def test_mrr_at_k_matches_first_hit_scan(spark, sf_dir):
    row = QUERIES["mrr_at_k"](spark, sf_dir).collect()[0]
    groups = _ranked_by_source(sf_dir)
    n_queries = len(groups)
    num = 0
    n_hit = 0
    for ranked in groups.values():
        for pos, (_, i) in enumerate(ranked[:K], start=1):
            if i % 7 == 0:
                num += LCM10 // pos
                n_hit += 1
                break
    assert (row["n_queries"], row["n_hit"]) == (n_queries, n_hit)
    assert row["mrr"] == pytest.approx(
        num / (LCM10 * n_queries), abs=1e-9
    )


def test_recall_at_k_matches_counting(spark, sf_dir):
    got = {r["query"]: r for r in QUERIES["recall_at_k"](spark, sf_dir).collect()}
    for s, ranked in _ranked_by_source(sf_dir).items():
        ys = [1 if i % 4 == 0 else 0 for _, i in ranked]
        n_rel = sum(ys)
        hits = sum(ys[:K])
        r = got[s]
        assert (r["n_cands"], r["n_rel"], r["hits_k"]) == (
            len(ys),
            n_rel,
            hits,
        )
        if n_rel > 0:
            assert r["recall"] == pytest.approx(hits / n_rel, abs=1e-9)
        else:
            assert r["recall"] is None


def test_logloss_binned_matches_bin_center_xent(spark, sf_dir):
    row = QUERIES["logloss_binned"](spark, sf_dir).collect()[0]
    d = _pq(sf_dir, "documents")
    loss_nano = 0
    n_pos = 0
    for nc, lang in zip(d["n_chars"], d["lang"]):
        p = min(2 * int(nc), 1000)
        b = min(p * 10 // 1000, 9)
        pb = (2 * b + 1) / 20
        if lang == "en":
            n_pos += 1
            loss_nano += round(-math.log(pb) * 1e9)
        else:
            loss_nano += round(-math.log(1 - pb) * 1e9)
    n = len(d)
    assert (row["n_rows"], row["n_pos"]) == (n, n_pos)
    assert row["log_loss"] == pytest.approx(
        loss_nano / 1e9 / n, abs=1e-9
    )


def test_hhi_matches_member_shares(spark, sf_dir):
    got = {
        r["event_type"]: r
        for r in QUERIES["hhi_concentration"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    masses: dict = defaultdict(lambda: defaultdict(int))
    for t_, u, v in zip(e["event_type"], e["user_id"], e["value"]):
        q = (
            int(math.floor(v * 100 + 0.5))
            if v >= 0
            else int(math.ceil(v * 100 - 0.5))
        )
        masses[t_][u] += q
    for t_, members in masses.items():
        vals = list(members.values())
        n = len(vals)
        total = sum(vals)
        ssq = sum(m * m for m in vals)
        r = got[t_]
        assert (r["n_members"], r["total"]) == (n, total)
        if total != 0:
            hhi = ssq / (total * total)
            assert r["hhi"] == pytest.approx(hhi, abs=1e-9)
            if n > 1:
                assert r["hhi_norm"] == pytest.approx(
                    (n * hhi - 1) / (n - 1), abs=1e-9
                )
            else:
                assert r["hhi_norm"] is None
        else:
            assert r["hhi"] is None
