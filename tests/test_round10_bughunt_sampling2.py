"""Round-10 bug hunt, deterministic sampling/sharding family (second
wave — r9 covered source_cap / temperature_mixture / graph_walks /
decontamination / dq_checks): full hashlib replays of the md5
contracts — HRW rendezvous argmax, epoch-shuffle permutations, the
10000-bucket stratified filter, the A-ES integer race, mixture
fractional copies, and the train/val/test bucket edges.
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

SHARDS = [f"shard-{i:02d}" for i in range(16)]


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _bucket(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 10000


def test_rendezvous_matches_hrw_argmax(spark, sf_dir):
    got = {r["shard"]: r for r in QUERIES["rendezvous_sharding"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for i, nc in zip(d["doc_id"], d["n_chars"]):
        best = max(SHARDS, key=lambda s: (_md5_60(f"{i}|{s}"), s))
        a = agg[best]
        a[0] += 1
        a[1] += int(nc)
        a[2] += int(i)
    assert set(got) == set(agg)
    for s, (n, chars, keys) in agg.items():
        r = got[s]
        assert (r["n_docs"], r["tot_chars"], r["sum_key"]) == (
            n,
            chars,
            keys,
        )


def test_epoch_shuffle_matches_md5_permutations(spark, sf_dir):
    got = {
        (r["epoch"], r["doc_id"]): (r["position"], r["shard"])
        for r in QUERIES["epoch_shuffle"](spark, sf_dir).collect()
    }
    ids = list(_pq(sf_dir, "documents")["doc_id"])
    expect = {}
    for e in (0, 1):
        order = sorted(
            ids, key=lambda i: (hashlib.md5(f"{e}|{i}".encode()).hexdigest(), i)
        )
        for pos, i in enumerate(order):
            expect[(e, i)] = (pos, pos // 512)
    assert got == expect


def test_stratified_sample_matches_bucket_filter(spark, sf_dir):
    got = {r["lang"]: r for r in QUERIES["stratified_sample"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    thr = {"en": 500, "de": 2000, "fr": 5000}
    agg: dict = defaultdict(lambda: [0, 0])
    for i, lang, nc in zip(d["doc_id"], d["lang"], d["n_chars"]):
        if _bucket(str(i)) < thr.get(lang, 0):
            agg[lang][0] += 1
            agg[lang][1] += int(nc)
    assert set(got) == set(agg)
    for lang, (n, chars) in agg.items():
        assert (got[lang]["n_sampled"], got[lang]["total_chars"]) == (
            n,
            chars,
        )


def test_weighted_sample_matches_integer_aes_race(spark, sf_dir):
    rows = QUERIES["weighted_sample"](spark, sf_dir).collect()
    d = _pq(sf_dir, "documents")
    draws = []
    for i, nc in zip(d["doc_id"], d["n_chars"]):
        w = min(max(1 + int(nc) // 500, 1), 64)
        draw = max(_md5_60(f"{i}|{j}") for j in range(1, w + 1))
        draws.append((draw, int(i), 1 + int(nc) // 500))
    draws.sort(key=lambda t: (-t[0], t[1]))
    top = draws[:100]
    assert [(r["doc_id"], r["draw"]) for r in rows] == [
        (i, dr) for dr, i, _ in top
    ]
    assert [r["weight"] for r in rows] == [w for _, _, w in top]


def test_mixture_resample_matches_fractional_copies(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["source"], r["copy"])
        for r in QUERIES["mixture_resample"](spark, sf_dir).collect()
    )
    d = _pq(sf_dir, "documents")
    thr = {"src0": 23000, "src1": 4000, "src2": 15000}
    expect = []
    for i, src in zip(d["doc_id"], d["source"]):
        t = thr.get(src, 10000)
        whole = t // 10000
        frac = t - whole * 10000
        copies = whole + (1 if _bucket(str(i)) < frac else 0)
        for c in range(copies):
            expect.append((int(i), src, c))
    assert got == sorted(expect)


def test_dataset_split_matches_bucket_edges(spark, sf_dir):
    got = {r["split"]: r for r in QUERIES["dataset_split"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    agg: dict = defaultdict(lambda: [0, 0, set()])
    for i, nc, lang in zip(d["doc_id"], d["n_chars"], d["lang"]):
        b = _bucket(str(i))
        split = "train" if b < 8000 else "val" if b < 9000 else "test"
        a = agg[split]
        a[0] += 1
        a[1] += int(nc)
        a[2].add(lang)
    assert set(got) == set(agg)
    for s, (n, chars, langs) in agg.items():
        r = got[s]
        assert (r["n_docs"], r["total_chars"], r["n_langs"]) == (
            n,
            chars,
            len(langs),
        )
