"""Round-11 bug hunt, md5-twin + brute-force-ANN family: pure-python
third implementations for the oracle-checkable md5 formulations whose
xxhash64 production twins got replays this round — plus the
brute-force cosine top-k baseline:

- simhash_pairs: 60-bit md5 signatures from explicit sign sums,
  exhaustive hamming<=3 pair set (proves the 15-bit pigeonhole
  blocking loses nothing, independently of both engines);
- rolling_hash_fingerprint: the chained md5/substring fold replayed
  token-for-token;
- cosine_topk: brute-force top-5 per sub-10 query id with the
  (cosine desc, vec_id) order.
"""

from __future__ import annotations

import hashlib
import math
import re

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _toks(text: str) -> list[str]:
    return re.sub(r"\s+", " ", str(text).strip().lower()).split(" ")


def _simhash60(text: str) -> int:
    sums = [0] * 60
    for tok in _toks(text):
        h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
        for j in range(60):
            sums[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j in range(60):
        if sums[j] > 0:
            sig |= 1 << j
    return sig


def test_simhash_pairs_matches_exhaustive_md5_python(spark, sf_dir):
    d = _pq(sf_dir, "documents")
    sigs = {int(i): _simhash60(t) for i, t in zip(d["doc_id"], d["text"])}
    ids = sorted(sigs)
    expect = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                expect[(a, b)] = ham
    rows = QUERIES["simhash_pairs"](spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got == expect
    assert expect


def _rolling_md5(text: str) -> str:
    acc = ""
    for tok in _toks(text):
        acc = hashlib.md5((acc + tok).encode("utf-8")).hexdigest()[:16]
    return acc


def test_rolling_hash_fingerprint_matches_python_fold(spark, sf_dir):
    rows = QUERIES["rolling_hash_fingerprint"](spark, sf_dir).collect()
    got = {r["doc_id"]: r["fingerprint"] for r in rows}
    d = _pq(sf_dir, "documents")
    expect = {
        int(i): _rolling_md5(t) for i, t in zip(d["doc_id"], d["text"])
    }
    assert got == expect


def test_cosine_topk_matches_python_bruteforce(spark, sf_dir):
    e = _pq(sf_dir, "embeddings")
    vecs = {
        int(i): [float(x) for x in v]
        for i, v in zip(e["vec_id"], e["embedding"])
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    norms = {i: math.sqrt(fold_dot(v, v)) for i, v in vecs.items()}
    expect = {}
    for qid in (i for i in vecs if i < 10):
        cand = sorted(
            (
                (
                    -fold_dot(vecs[qid], vecs[c])
                    / (norms[qid] * norms[c]),
                    c,
                )
                for c in vecs
                if c != qid
            ),
        )[:5]
        for negcos, c in cand:
            expect[(qid, c)] = -negcos
    rows = QUERIES["cosine_topk"](spark, sf_dir).collect()
    got = {(r["query_id"], r["vec_id"]): r["cosine"] for r in rows}
    assert set(got) == set(expect)
    for k, cos in expect.items():
        assert got[k] == pytest.approx(cos, abs=1e-6)
