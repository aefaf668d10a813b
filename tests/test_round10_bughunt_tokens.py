"""Round-10 bug hunt, tokenizer-prep + corpus-dedup family:
pure-python third implementations from the sf0.001 parquet — chunk
spans by integer arithmetic, vocabulary coverage from an explicit
frequency sort, the blocking-key duplicate matrix with exact pair
combinatorics, language/source mixture shares, C4 line dedup over
non-overlapping 4-token segments, and Lee-et-al substring dedup with
explicit coverage intervals.
"""

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


def _norm_toks(text: str) -> list[str]:
    t = re.sub(r"\s+", " ", text.strip().lower())
    return t.split(" ") if t else [""]


def test_token_chunks_matches_integer_spans(spark, sf_dir):
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["start_tok"], r["end_tok"])
        for r in QUERIES["token_chunks"](spark, sf_dir).collect()
    )
    d = _pq(sf_dir, "documents")
    expect = []
    for i, t in zip(d["doc_id"], d["text"]):
        n = len(_norm_toks(t))
        for c in range((n + 127) // 128):
            expect.append((int(i), c, c * 128, min(c * 128 + 128, n)))
    assert got == sorted(expect)


def test_vocab_coverage_matches_frequency_sort(spark, sf_dir):
    rows = QUERIES["vocab_coverage"](spark, sf_dir).collect()
    got = {r["vocab_size"]: r for r in rows}
    d = _pq(sf_dir, "documents")
    counts = Counter(tok for t in d["text"] for tok in _norm_toks(t))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    running = 0
    cum = []
    for _, c in ranked:
        running += c
        cum.append(running)
    cov_col = [
        c
        for c in rows[0].asDict()
        if c not in ("vocab_size", "covered", "total_occurrences")
    ][0]
    for size in (4, 8, 16):
        r = got[size]
        assert r["covered"] == cum[size - 1]
        assert r["total_occurrences"] == total
        assert r[cov_col] == pytest.approx(
            cum[size - 1] / total, abs=1e-9
        )


def test_cross_source_dups_matches_pair_combinatorics(spark, sf_dir):
    got = {
        (r["source_a"], r["source_b"]): r["dup_pairs"]
        for r in QUERIES["cross_source_dups"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    blocks: dict = defaultdict(Counter)
    for s, t in zip(d["source"], d["text"]):
        toks = _norm_toks(t)
        key = hashlib.md5(" ".join(toks[:2]).encode()).hexdigest()
        blocks[key][s] += 1
    expect: Counter = Counter()
    for per_src in blocks.values():
        names = sorted(per_src)
        for ai, a in enumerate(names):
            ca = per_src[a]
            if ca >= 2:
                expect[(a, a)] += ca * (ca - 1) // 2
            for b in names[ai + 1 :]:
                expect[(a, b)] += ca * per_src[b]
    assert got == dict(expect)


def test_lang_source_mixture_matches_shares(spark, sf_dir):
    got = {
        (r["source"], r["lang"]): r
        for r in QUERIES["lang_source_mixture"](spark, sf_dir).collect()
    }
    d = _pq(sf_dir, "documents")
    cells: dict = defaultdict(lambda: [0, 0])
    totals: Counter = Counter()
    for s, l, nc in zip(d["source"], d["lang"], d["n_chars"]):
        cells[(s, l)][0] += 1
        cells[(s, l)][1] += int(nc)
        totals[s] += 1
    assert set(got) == set(cells)
    for (s, l), (n, chars) in cells.items():
        r = got[(s, l)]
        assert (r["n_docs"], r["n_chars"]) == (n, chars)
        assert r["doc_share"] == pytest.approx(
            round(n / totals[s], 6), abs=1e-9
        )


def test_line_dedup_matches_segment_filter(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["line_dedup"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    segs_per_doc: dict = {}
    freq: Counter = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        ts = t.split(" ")  # RAW split per the operator
        segs = [
            " ".join(ts[j * 4 : j * 4 + 4])
            for j in range((len(ts) + 3) // 4)
        ]
        segs_per_doc[int(i)] = segs
        freq.update(segs)
    dup = {s for s, c in freq.items() if c >= 2}
    for i, segs in segs_per_doc.items():
        kept = [s for s in segs if s not in dup]
        r = got[i]
        assert (r["n_kept"], r["n_dropped"]) == (
            len(kept),
            len(segs) - len(kept),
        )
        assert r["text_clean"] == " ".join(kept)


def test_substring_dedup_matches_coverage_intervals(spark, sf_dir):
    L = 5
    got = {r["doc_id"]: r for r in QUERIES["substring_dedup"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    wins_per_doc: dict = {}
    freq: Counter = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        ts = t.split(" ")
        wins = [
            " ".join(ts[j : j + L]) for j in range(len(ts) - L + 1)
        ]
        wins_per_doc[int(i)] = (ts, wins)
        freq.update(wins)
    dup = {w for w, c in freq.items() if c >= 2}
    for i, (ts, wins) in wins_per_doc.items():
        starts = [j for j, w in enumerate(wins) if w in dup]
        kept = [
            x
            for p, x in enumerate(ts)
            if not any(p - L + 1 <= st <= p for st in starts)
        ]
        r = got[i]
        assert r["n_tokens"] == len(ts)
        assert r["n_removed"] == len(ts) - len(kept)
        assert r["text_clean"] == " ".join(kept)
