"""Round-11 bug hunt, MinHash+LSH family: the from-the-spec pure-
python XXH64 (test_round11_bughunt_tokens_hash) unlocks a FULL
value-level replay of the flagship dedup pipeline — every stage of
minhash_lsh_dedup re-derived independently: word shingles, hashed
shingle sets, all 64 minhash functions (xxhash64 long+int seed
chains), the 16-band bucket hashes, the candidate join, and the
exact-Jaccard verify. Previously the xxhash64 stages were reachable
only through the two-engine oracle's exhaustive twin; this replays
the banded path itself, hash arithmetic included, and asserts the
100%-recall contract against an exhaustive python Jaccard pass.
"""

from __future__ import annotations

import re
from collections import defaultdict

import pandas as pd
import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.plans.queries import QUERIES

from tests.test_round11_bughunt_tokens_hash import (
    MASK,
    P1,
    P2,
    P3,
    P5,
    _fmix,
    _rotl,
    _signed,
    xxh64,
    xxh64_long,
)

N_HASHES, BANDS, ROWS_PER_BAND, THRESHOLD = 64, 16, 4, 0.35


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte block (Spark hashes IntegerType this way)."""
    h = ((seed & MASK) + P5 + 4) & MASK
    h ^= ((value & 0xFFFFFFFF) * P1) & MASK
    h = (_rotl(h, 23) * P2 + P3) & MASK
    return _fmix(h)


def test_pure_python_xxh64_int_matches_spark(spark):
    cases = [(0,), (1,), (-1,), (2**31 - 1,), (-(2**31),), (42,)]
    df = spark.createDataFrame(cases, "i int")
    got = {
        r["i"]: r["h"]
        for r in df.select("i", F.xxhash64("i").alias("h")).collect()
    }
    for (i,) in cases:
        assert got[i] == _signed(xxh64_int(i, 42)), i
    # the (long, int) seed chain the minhash functions use
    df2 = spark.createDataFrame([(7, 3), (-9, 0)], "h long, i int")
    got2 = {
        (r["h"], r["i"]): r["x"]
        for r in df2.select("h", "i", F.xxhash64("h", "i").alias("x")).collect()
    }
    for hh, ii in ((7, 3), (-9, 0)):
        assert got2[(hh, ii)] == _signed(xxh64_int(ii, xxh64_long(hh, 42)))


def _norm_toks(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", str(text).strip().lower())
    return t.split(" ")


def _shingles(text: str, n: int = 3) -> list[str]:
    toks = _norm_toks(text)
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks))]
    k = max(len(toks) - (n - 1), 1)
    out, seen = [], set()
    for g in grams[:k]:
        if g not in seen:
            seen.add(g)
            out.append(g)
    return out


def _hashed_set(text: str) -> set[int]:
    return {_signed(xxh64(s.encode("utf-8"), 42)) for s in _shingles(text)}


def _sig(hset: set[int]) -> list[int]:
    return [
        min(_signed(xxh64_int(i, xxh64_long(h, 42))) for h in hset)
        for i in range(N_HASHES)
    ]


def _buckets(sig: list[int]) -> list[tuple[int, int]]:
    out = []
    for b in range(BANDS):
        h = 42
        for v in sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]:
            h = xxh64_long(v, h)
        out.append((b, _signed(xxh64_int(b, h))))
    return out


def _jaccard(a: set[int], b: set[int]) -> float:
    ni = len(a & b)
    return ni / float(len(a) + len(b) - ni)


def test_minhash_lsh_dedup_full_pipeline_replay(spark, sf_dir):
    d = pd.read_parquet(f"{sf_dir}/documents.parquet")
    hsets = {int(i): _hashed_set(t) for i, t in zip(d["doc_id"], d["text"])}
    # banded candidates, exactly the engine's bucket arithmetic
    index: dict[tuple[int, int], list[int]] = defaultdict(list)
    for did in sorted(hsets):
        for key in _buckets(_sig(hsets[did])):
            index[key].append(did)
    cands = set()
    for members in index.values():
        for ai, a in enumerate(members):
            for b in members[ai + 1 :]:
                cands.add((min(a, b), max(a, b)))
    expect = {
        (a, b): _jaccard(hsets[a], hsets[b])
        for a, b in cands
        if _jaccard(hsets[a], hsets[b]) >= THRESHOLD
    }
    rows = QUERIES["minhash_lsh_dedup"](spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in rows}
    assert set(got) == set(expect)
    for k, j in expect.items():
        assert got[k] == pytest.approx(j, abs=1e-12)
    # the 100%-recall contract on the deterministic testdata: the
    # banded path loses nothing vs an exhaustive jaccard pass
    ids = sorted(hsets)
    exhaustive = {
        (a, b)
        for ai, a in enumerate(ids)
        for b in ids[ai + 1 :]
        if _jaccard(hsets[a], hsets[b]) >= THRESHOLD
    }
    assert set(got) == exhaustive
    assert exhaustive, "fixture should contain verified near-dup pairs"


def _plane(salt: int, plane: int, dim: int) -> list[float]:
    import hashlib

    return [
        1.0 if hashlib.md5(f"{salt}|{plane}|{j}".encode()).digest()[0] & 1
        else -1.0
        for j in range(dim)
    ]


def _hyper_bucket(v: list[float], planes: int, dim: int, salt: int) -> int:
    b = 0
    for p in range(planes):
        w = _plane(salt, p, dim)
        acc = 0.0
        for x, s in zip(v, w):  # same left-fold order as the SQL aggregate
            acc += x * s
        if acc >= 0:
            b += 1 << (planes - 1 - p)
    return b


def test_hyperplane_lsh_banded_path_replay(spark, sf_dir):
    """embedding_neardup_pairs' exhaustive-recall replay
    (test_round11_bughunt_cluster_graph) is blind to the blocking;
    this one re-derives the BLOCKING itself — md5 ±1 planes, the
    left-fold dot signs, big-endian bucket packing, the 6-table OR,
    then exact cosine — and must land on the identical pair set."""
    import math

    import pandas as pd

    e = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    aug = {}
    for vid, v in zip(e["vec_id"], e["embedding"]):
        vid = int(vid)
        base = [float(x) for x in v]
        aug[vid] = base
        aug[vid + 1_000_000] = [
            x * (1.0 + 0.002 * (((vid + i) % 7) - 3.0))
            for i, x in enumerate(base)
        ]
    dim = len(next(iter(aug.values())))
    index: dict[tuple[int, int], list[int]] = defaultdict(list)
    for vid in sorted(aug):
        for t in range(6):
            index[(t, _hyper_bucket(aug[vid], 10, dim, t))].append(vid)
    cands = set()
    for members in index.values():
        for ai, a in enumerate(members):
            for b in members[ai + 1 :]:
                cands.add((min(a, b), max(a, b)))
    norms = {i: math.sqrt(sum(x * x for x in v)) for i, v in aug.items()}
    expect = set()
    for a, b in cands:
        cos = sum(x * y for x, y in zip(aug[a], aug[b])) / (
            norms[a] * norms[b]
        )
        if cos >= 0.98:
            expect.add((a, b))
    rows = QUERIES["embedding_neardup_pairs"](spark, sf_dir).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == expect
    assert expect
