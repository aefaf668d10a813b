"""Round-10 bug hunt, text-quality family: pure-python third
implementations from the sf0.001 parquet — add-1 unigram perplexity,
character entropy, the Gopher repetition metrics (explicit Counter
walks instead of the engine's sorted-run folds), MOSS winnowing
fingerprints via hashlib + explicit window minima, intra-doc bigram
run maxima, and the PII regex scrub replayed with Python re.
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


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _toks(text: str) -> list[str]:
    t = _norm(text)
    return t.split(" ") if t else [""]


def test_unigram_perplexity_matches_add1_lm(spark, sf_dir):
    got = {r["doc_id"]: r["ppl"] for r in QUERIES["unigram_perplexity"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    docs = {int(i): _toks(t) for i, t in zip(d["doc_id"], d["text"])}
    lm = Counter(t for toks in docs.values() for t in toks)
    total = sum(lm.values())
    vocab = len(lm)
    for i, toks in docs.items():
        qsum = sum(
            round(math.log((lm[t] + 1) / (total + vocab)) * 1e9)
            for t in toks
        )
        ppl = math.exp(-(qsum / 1e9) / len(toks))
        assert got[i] == pytest.approx(ppl, rel=1e-5), i


def test_char_entropy_matches_quantized_sum(spark, sf_dir):
    got = {r["doc_id"]: r["entropy"] for r in QUERIES["char_entropy"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    expect = {}
    for i, t in zip(d["doc_id"], d["text"]):
        s = _norm(t)
        if not s:
            continue
        counts = Counter(s)
        n = len(s)
        qsum = sum(
            round((c / n) * math.log(c / n) * 1e9)
            for c in counts.values()
        )
        expect[int(i)] = -qsum / 1e9
    assert set(got) == set(expect)
    for i, e_ in expect.items():
        assert got[i] == pytest.approx(e_, abs=1e-8), i


def _ngrams(toks, n):
    return [
        " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
    ]


def test_gopher_repetition_matches_counter_walk(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["gopher_repetition"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _toks(t)
        chars = max(len(_norm(t)), 1)
        g2 = Counter(_ngrams(toks, 2))
        g3 = Counter(_ngrams(toks, 3))
        top2 = max(
            (cnt * len(g) for g, cnt in g2.items()), default=0
        )
        dup3 = sum(
            cnt * len(g) for g, cnt in g3.items() if cnt >= 2
        )
        r = got[int(i)]
        assert (r["top2_chars"], r["dup3_chars"]) == (top2, dup3), i
        assert r["top2_ppm"] == top2 * 1_000_000 // chars
        assert r["dup3_ppm"] == dup3 * 1_000_000 // chars
        assert r["passes_repetition"] == (
            r["top2_ppm"] <= 200_000 and r["dup3_ppm"] <= 300_000
        )


def test_winnowing_matches_window_minima(spark, sf_dir):
    K, W = 3, 4
    got = {r["doc"]: r for r in QUERIES["winnowing_fingerprint"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    expect = {}
    for i, t in zip(d["doc_id"], d["text"]):
        grams = _ngrams(_toks(t), K)
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            for g in grams
        ]
        if len(hs) < W:
            continue
        mins = [min(hs[p : p + W]) for p in range(len(hs) - W + 1)]
        fp = list(dict.fromkeys(mins))  # array_distinct keeps order
        expect[int(i)] = (
            len(hs),
            len(fp),
            sum(h % 1000000007 for h in fp),
        )
    assert set(got) == set(expect)
    for i, (ng, nfp, fpsum) in expect.items():
        r = got[i]
        assert (r["n_grams"], r["n_fp"], r["fp_sum"]) == (ng, nfp, fpsum)


def test_doc_repetition_matches_bigram_runs(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["doc_repetition"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    for i, t in zip(d["doc_id"], d["text"]):
        ts = t.split(" ")  # RAW split, per the query (no normalize)
        bgs = [f"{ts[j]} {ts[j + 1]}" for j in range(len(ts) - 1)]
        r = got[int(i)]
        assert (r["n_tokens"], r["n_distinct"]) == (
            len(ts),
            len(set(ts)),
        )
        assert r["max_bigram_count"] == (
            max(Counter(bgs).values()) if bgs else 0
        )


def test_pii_redaction_matches_python_re(spark, sf_dir):
    got = {r["bucket"]: r for r in QUERIES["pii_redaction"](spark, sf_dir).collect()}
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\+\d{1,2} \d{3}-\d{3}-\d{4}")
    d = _pq(sf_dir, "documents")
    agg: dict = defaultdict(lambda: [0, 0, 0])
    for i, t in zip(d["doc_id"], d["text"]):
        t2 = (
            f"{t} contact user{i}@mail{i % 7}.example "
            f"or +1 415-555-{i % 10000:04d} today"
        )
        e_ = len(email.findall(t2))
        p_ = len(phone.findall(t2))
        red = phone.sub("<PHONE>", email.sub("<EMAIL>", t2))
        a = agg[int(i) % 10]
        a[0] += e_
        a[1] += p_
        a[2] += len(red)
    assert set(got) == set(agg)
    for b, (e_, p_, rc) in agg.items():
        r = got[b]
        assert (r["n_emails"], r["n_phones"], r["redacted_chars"]) == (
            e_,
            p_,
            rc,
        )
