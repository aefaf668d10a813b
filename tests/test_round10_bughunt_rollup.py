"""Round-10 bug hunt, rollup-cascade + bloom family: the hypertable
minute→hour→day cascade checked against a DIRECT python day-level
aggregation (the lossless re-aggregation algebra), and the Bloom
decontamination probe replayed end-to-end through hashlib — bitset
construction, 3-bit membership (including the engine's exact false
positives), and the exact-membership tag.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

BLOOM_BITS = 131072
BLOOM_K = 3


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_hypertable_rollup_matches_direct_day_agg(spark, sf_dir):
    got = {
        str(r["bucket"]): r
        for r in QUERIES["hypertable_rollup"](spark, sf_dir).collect()
    }
    e = _pq(sf_dir, "events")
    agg: dict = defaultdict(lambda: [0, 0, None, None])
    for ts, v in zip(e["ts"], e["value"]):
        day = ts.normalize()
        q = _ha(v * 100)
        a = agg[day]
        a[0] += 1
        a[1] += q
        a[2] = q if a[2] is None else min(a[2], q)
        a[3] = q if a[3] is None else max(a[3], q)
    assert len(got) == len(agg)
    for day, (n, s, mn, mx) in agg.items():
        r = got[str(day)]
        assert (r["n"], r["sum_q"], r["min_q"], r["max_q"]) == (
            n,
            s,
            mn,
            mx,
        )
        assert r["avg"] == pytest.approx(s / n / 100, abs=1e-9)


def _shingles8(text: str) -> set[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    toks = t.split(" ") if t else [""]
    if len(toks) < 8:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + 8]) for i in range(len(toks) - 7)}


def _bloom_bits_of(s: str) -> list[int]:
    return [
        int(hashlib.md5(f"{i}|{s}".encode()).hexdigest()[:8], 16)
        % BLOOM_BITS
        for i in range(BLOOM_K)
    ]


def test_bloom_decontamination_matches_hashlib_bitset(spark, sf_dir):
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_bloom_hits"], r["n_true_hits"])
        for r in QUERIES["bloom_decontamination"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    shingles = {
        int(i): _shingles8(t) for i, t in zip(d["doc_id"], d["text"])
    }
    bench_docs = {
        i
        for i in shingles
        if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 10000
        < 500
    }
    bench = set().union(*(shingles[i] for i in bench_docs))
    bitset = set()
    for s in bench:
        bitset.update(_bloom_bits_of(s))
    expect = {}
    for i, sh in shingles.items():
        if i in bench_docs:
            continue
        hits = sum(
            1
            for s in sh
            if all(b in bitset for b in _bloom_bits_of(s))
        )
        true_hits = sum(1 for s in sh if s in bench)
        if hits > 0:
            expect[i] = (len(sh), hits, true_hits)
    assert got == expect
    # the gate's point: bloom hits dominate true hits (false positives
    # are visible, never false negatives)
    assert all(h >= t for _, h, t in expect.values())
