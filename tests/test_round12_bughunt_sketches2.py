"""Round-12 third implementations, wave 3: the streaming quality
gate (Gopher rule arithmetic re-derived per document), the KMV
distinct sketch (Beyer et al. 2007 (k-1)/u_k estimator from hashlib
md5), and the bloom-filter decontamination probe (full 131072-bit /
3-hash construction replayed, INCLUDING its false positives — the
bloom's overcount is deterministic md5 arithmetic, so the replay
pins it exactly rather than bounding it).
"""

from __future__ import annotations

import hashlib
import re
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

STOPS = {"the", "a", "of", "and", "to"}
KMV_K, KMV_SPACE = 256, float(1 << 60)
BLOOM_BITS, BLOOM_K = 131072, 3
BUCKETS = 10_000


def _norm_tokens(text: str) -> list[str]:
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def test_stream_quality_exec_gopher_rule_replay(spark, sf_dir):
    got = {
        r["source"]: (r["n_docs"], r["n_pass"], r["pass_rate"])
        for r in QUERIES["stream_quality_exec"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    agg: dict = defaultdict(lambda: [0, 0])
    for src, text in zip(docs["source"], docs["text"]):
        toks = _norm_tokens(text)
        n = len(toks)
        sum_len = sum(len(t) for t in toks)
        n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
        stops = len(set(toks) & STOPS)
        p = (
            50 <= n <= 100_000
            and 3 * n <= sum_len <= 10 * n
            and 10 * n_alpha >= 8 * n
            and stops >= 2
        )
        a = agg[src]
        a[0] += 1
        a[1] += 1 if p else 0
    expect = {s: (nd, np_, np_ / nd) for s, (nd, np_) in agg.items()}
    assert set(got) == set(expect)
    for s, (nd, np_, rate) in expect.items():
        assert got[s][0] == nd and got[s][1] == np_, s
        assert got[s][2] == pytest.approx(rate, abs=1e-12), s


def test_kmv_distinct_k_minimum_values_replay(spark, sf_dir):
    got = {
        r["event_type"]: (r["kmv_estimate"], r["n_kept"])
        for r in QUERIES["kmv_distinct"](spark, sf_dir).collect()
    }
    e = pd.read_parquet(f"{sf_dir}/events.parquet")
    hashes: dict = defaultdict(set)
    exact: dict = defaultdict(set)
    for ty, uid in zip(e["event_type"], e["user_id"]):
        h = (
            int(hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16)
            / KMV_SPACE
        )
        hashes[ty].add(h)  # DISTINCT hash values — ties collapse
        exact[ty].add(int(uid))
    expect = {}
    for ty, hs in hashes.items():
        kept = sorted(hs)[:KMV_K]
        n_kept = len(kept)
        est = (
            float(n_kept)
            if n_kept < KMV_K
            else float(KMV_K - 1) / kept[-1]
        )
        expect[ty] = (est, n_kept)
    assert set(got) == set(expect)
    for ty, (est, n_kept) in expect.items():
        assert got[ty][1] == n_kept, ty
        assert got[ty][0] == pytest.approx(round(est, 6), abs=1e-6), ty
        # Beyer et al. accuracy contract: ~1/sqrt(k-2) relative error;
        # assert the loose 5-sigma envelope against the exact count
        n_true = len(exact[ty])
        assert abs(got[ty][0] - n_true) <= max(
            5 * n_true / (KMV_K - 2) ** 0.5, 2.0
        ), ty


def _shingles8(text: str) -> set[str]:
    toks = _norm_tokens(text)
    if len(toks) < 8:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}


def _bloom_bit(shingle: str, i: int) -> int:
    h = hashlib.md5(f"{i}|{shingle}".encode()).hexdigest()[:8]
    return int(h, 16) % BLOOM_BITS


def test_bloom_decontamination_full_bitset_replay(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_bloom_hits"], r["n_true_hits"])
        for r in QUERIES["bloom_decontamination"](spark, sf_dir).collect()
    }
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    is_bench = {
        int(d): int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
        % BUCKETS
        < 500
        for d in docs["doc_id"]
    }
    bench_shingles: set = set()
    for d, text in zip(docs["doc_id"], docs["text"]):
        if is_bench[int(d)]:
            bench_shingles |= _shingles8(text)
    bits = {
        _bloom_bit(s, i) for s in bench_shingles for i in range(BLOOM_K)
    }
    expect = {}
    for d, text in zip(docs["doc_id"], docs["text"]):
        if is_bench[int(d)]:
            continue
        sh = _shingles8(text)
        bloom = sum(
            1
            for s in sh
            if all(_bloom_bit(s, i) in bits for i in range(BLOOM_K))
        )
        true = sum(1 for s in sh if s in bench_shingles)
        if bloom > 0:
            expect[int(d)] = (len(sh), bloom, true)
    assert got == expect
    # the one-sided bloom contract, on every emitted doc
    for d, (_, bloom, true) in expect.items():
        assert bloom >= true, d
