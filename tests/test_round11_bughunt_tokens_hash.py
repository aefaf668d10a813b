"""Round-11 bug hunt, tokenizer + hashing + packing family: pure-
python third implementations (r10 verdict task 5):

- a from-the-spec pure-python XXH64 (the public xxHash spec;
  constants and block structure from the published algorithm) checked
  against Spark's engine-native ``xxhash64`` on adversarial byte
  lengths — every tail path (0-7 trailing bytes, the 4-byte word,
  32-byte stripes) and multi-byte UTF-8;
- rolling_xxhash_fingerprint: the seed-chained token fold replayed
  end-to-end in python (rows-only query — this replay is its first
  value-level verification against anything);
- simhash_xxhash_pairs: signatures AND the pigeonhole-blocked pair
  set replayed exhaustively (hamming <= 3 over all doc pairs);
- bpe_merge_pairs: adjacent in-word char-pair counts from an explicit
  Counter with the (-n, pair) tie order;
- bpe_encode: the greedy lowest-rank merge loop replayed per word
  (rows-only query — first value-level cross-check);
- pack_sequences: shard prefix-sum + first-fit-decreasing bins
  replayed with explicit cumulative arithmetic (rows-only query).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.plans.queries import QUERIES

MASK = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _mix(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK
    return (_rotl(acc, 31) * P1) & MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & MASK
    h ^= h >> 29
    h = (h * P3) & MASK
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """XXH64 over bytes, from the published spec (little-endian)."""
    seed &= MASK
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK
        v2 = (seed + P2) & MASK
        v3 = seed
        v4 = (seed - P1) & MASK
        while i + 32 <= n:
            v1 = _mix(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _mix(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _mix(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _mix(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & MASK
        for v in (v1, v2, v3, v4):
            h = ((h ^ _mix(0, v)) * P1 + P4) & MASK
    else:
        h = (seed + P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h ^= _mix(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * P1) & MASK
        h = (_rotl(h, 23) * P2 + P3) & MASK
        i += 4
    while i < n:
        h ^= (data[i] * P5) & MASK
        h = (_rotl(h, 11) * P1) & MASK
        i += 1
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte block (Spark hashes LongType this way —
    equivalent to hashing the value's 8 little-endian bytes)."""
    h = ((seed & MASK) + P5 + 8) & MASK
    h ^= _mix(0, value & MASK)
    h = (_rotl(h, 27) * P1 + P4) & MASK
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark's xxhash64(string_col): XXH64 over the UTF-8 bytes."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", str(text).strip().lower())


def test_pure_python_xxh64_matches_spark_on_adversarial_bytes(spark):
    # every tail path: 0..40 byte lengths (covers 32-stripe entry,
    # 8-word, 4-word, and 1-byte tails), plus multi-byte UTF-8
    cases = ["", "a", "é世界", "x" * 31, "y" * 32, "z" * 33]
    cases += ["b" * n for n in range(2, 41, 3)]
    cases += ["token", "spaces  inside", "MiXeD"]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for c in cases:
        assert got[c] == spark_xxhash64_str(c), f"mismatch on {c!r}"


def test_pure_python_xxh64_matches_spark_on_seed_chain(spark):
    """xxhash64(string, long) chains: hash the string with seed 42,
    then the long with the result as seed — the fold step
    rolling_hash builds on."""
    cases = [("alpha", 0), ("alpha", -1), ("", 42), ("beta", 2**62)]
    df = spark.createDataFrame(cases, "s string, l long")
    got = {
        (r["s"], r["l"]): r["h"]
        for r in df.select(
            "s", "l", F.xxhash64("s", "l").alias("h")
        ).collect()
    }
    for s, l in cases:
        h1 = xxh64(s.encode("utf-8"), 42)
        assert got[(s, l)] == _signed(xxh64_long(l, h1))


def _rolling(text: str) -> int:
    acc = 0
    for tok in _norm(text).split(" "):
        h1 = xxh64(tok.encode("utf-8"), 42)
        acc = _signed(xxh64_long(acc, h1))
    return acc


def test_rolling_xxhash_fingerprint_matches_python_fold(spark, sf_dir):
    rows = QUERIES["rolling_xxhash_fingerprint"](spark, sf_dir).collect()
    got = {r["doc_id"]: r["rhash"] for r in rows}
    d = _pq(sf_dir, "documents")
    expect = {int(i): _rolling(t) for i, t in zip(d["doc_id"], d["text"])}
    assert got == expect


def _simhash(text: str) -> int:
    sums = [0] * 64
    for tok in _norm(text).split(" "):
        h = xxh64(tok.encode("utf-8"), 42)  # unsigned; bits identical
        for j in range(64):
            sums[j] += 1 if (h >> j) & 1 else -1
    sig = 0
    for j in range(64):
        if sums[j] > 0:
            sig |= 1 << j
    return sig


def test_simhash_xxhash_pairs_matches_exhaustive_python(spark, sf_dir):
    d = _pq(sf_dir, "documents")
    sigs = {int(i): _simhash(t) for i, t in zip(d["doc_id"], d["text"])}
    ids = sorted(sigs)
    expect = {}
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                expect[(a, b)] = ham
    rows = QUERIES["simhash_xxhash_pairs"](spark, sf_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in rows}
    assert got == expect
    assert expect, "fixture should contain at least one near-dup pair"


def _merge_counts(texts) -> Counter:
    counts: Counter = Counter()
    for t in texts:
        for w in _norm(t).split(" "):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    counts[w[i : i + 2]] += 1
    return counts


def test_bpe_merge_pairs_matches_python_counter(spark, sf_dir):
    d = _pq(sf_dir, "documents")
    counts = _merge_counts(d["text"])
    expect = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    rows = QUERIES["bpe_merge_pairs"](spark, sf_dir).collect()
    got = [(r["pair"], r["n"]) for r in rows]
    assert got == expect


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word)
    while len(syms) > 1:
        ranked = [
            (rank[(syms[i], syms[i + 1])], i)
            for i in range(len(syms) - 1)
            if (syms[i], syms[i + 1]) in rank
        ]
        if not ranked:
            break
        best = min(ranked)[0]
        pair = None
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and rank.get((syms[i], syms[i + 1])) == best
                and (pair is None or (syms[i], syms[i + 1]) == pair)
            ):
                pair = (syms[i], syms[i + 1])
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_python_greedy(spark, sf_dir):
    d = _pq(sf_dir, "documents")
    counts = _merge_counts(d["text"])
    top8 = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    rank = {(p[0], p[1]): i for i, (p, _) in enumerate(top8)}
    expect = {}
    for did, t in zip(d["doc_id"], d["text"]):
        words = _norm(t).split(" ")
        toks = ["|".join(_encode_word(w, rank)) for w in words]
        stream = " ".join(toks)
        expect[int(did)] = (
            len(words),
            sum(t.count("|") + 1 for t in toks),
            hashlib.md5(stream.encode()).hexdigest(),
        )
    rows = QUERIES["bpe_encode"](spark, sf_dir).collect()
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tokens_md5"])
        for r in rows
    }
    assert got == expect


def test_pack_sequences_matches_python_ffd(spark, sf_dir):
    d = _pq(sf_dir, "documents").sort_values("doc_id")
    shards: dict[int, list[tuple[int, int]]] = defaultdict(list)
    cum = 0
    for did, t in zip(d["doc_id"], d["text"]):
        n = len(str(t).split(" "))  # raw split(' '), empties kept
        shards[cum // 65536].append((int(did), n))
        cum += n
    expect = {}
    for shard, docs in shards.items():
        fills: list[int] = []
        assign: dict[int, int] = {}
        for did, n in sorted(docs, key=lambda x: (-x[1], x[0])):
            placed = next(
                (b for b, f in enumerate(fills) if f + n <= 256), -1
            )
            if placed < 0:
                placed = len(fills)
                fills.append(0)
            fills[placed] += n
            assign[did] = placed
        per_bin: Counter = Counter(assign.values())
        for b, cnt in per_bin.items():
            expect[(shard, b)] = (cnt, fills[b])
    rows = QUERIES["pack_sequences"](spark, sf_dir).collect()
    got = {
        (r["shard"], r["bin"]): (r["n_docs"], r["bin_fill"]) for r in rows
    }
    assert got == expect
