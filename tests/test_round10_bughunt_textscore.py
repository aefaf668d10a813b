"""Round-10 bug hunt, text-scoring family: pure-python third
implementations from the sf0.001 parquet — the Gopher rule flags in
explicit integer arithmetic, stopword-scoring language ID with the
documented tie-break cascade, the composite quality score, text_stats
(incl. md5 fingerprint and the BPE-ish regex count), corpus word
counts, and smoothed tf-idf top terms.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

STOPWORDS = {
    "en": ["a", "and", "in", "is", "it", "of", "the", "to"],
    "de": ["das", "der", "die", "ein", "ist", "nicht", "und", "zu"],
    "fr": ["est", "et", "la", "le", "les", "que", "un", "une"],
    "es": ["el", "es", "la", "los", "que", "un", "una", "y"],
    "it": ["che", "di", "e", "gli", "il", "la", "un", "una"],
}
TOKEN_PATTERN = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def _pq(sf_dir, table):
    return pd.read_parquet(f"{sf_dir}/{table}.parquet")


def _norm(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip().lower())


def _toks(text: str) -> list[str]:
    t = _norm(text)
    return t.split(" ") if t else [""]


def test_gopher_rules_matches_integer_arithmetic(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["gopher_rules"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    for i, t in zip(d["doc_id"], d["text"]):
        norm = _norm(t)
        toks = _toks(t)
        n = len(toks)
        sum_len = len(norm) - n + 1
        n_alpha = sum(1 for tok in toks if re.search(r"[a-z]", tok))
        stop_distinct = len(
            set(toks) & {"the", "a", "of", "and", "to"}
        )
        r = got[int(i)]
        assert r["n_words"] == n
        assert r["mean_word_len"] == pytest.approx(sum_len / n, abs=1e-12)
        assert r["rule_word_count"] == (50 <= n <= 100_000)
        assert r["rule_mean_word_len"] == (3 * n <= sum_len <= 10 * n)
        assert r["rule_alpha_fraction"] == (10 * n_alpha >= 8 * n)
        assert r["rule_stopwords"] == (stop_distinct >= 2)
        assert r["passes_gopher"] == (
            r["rule_word_count"]
            and r["rule_mean_word_len"]
            and r["rule_alpha_fraction"]
            and r["rule_stopwords"]
        )


def test_lang_id_matches_stopword_argmax(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["lang_id"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    order = list(STOPWORDS)
    for i, t in zip(d["doc_id"], d["text"]):
        toks = _toks(t)
        scores = {
            lang: sum(1 for tok in toks if tok in set(ws))
            for lang, ws in STOPWORDS.items()
        }
        best = max(scores.values())
        pred = next(l for l in order if scores[l] == best)
        r = got[int(i)]
        for lang in order:
            assert r[f"score_{lang}"] == scores[lang], (i, lang)
        assert r["lang_pred"] == pred, i


def test_quality_score_matches_composite(spark, sf_dir):
    got = {r["doc_id"]: r["quality_score"] for r in QUERIES["quality_score"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    en = set(STOPWORDS["en"])
    for i, t in zip(d["doc_id"], d["text"]):
        norm = _norm(t)
        toks = _toks(t)
        n = len(toks)
        pr = (len(t) - len(re.sub(r"[^\w\s]", "", t))) / len(t)
        sw = sum(1 for tok in toks if tok in en) / n
        mean_wl = len(norm) / n
        score = (
            0.4 * min(1.0, n / 100.0)
            + 0.3 * (1.0 - min(1.0, pr * 5.0))
            + 0.2 * min(1.0, sw * 10.0)
            + (0.1 if 3.0 <= mean_wl <= 8.0 else 0.0)
        )
        assert got[int(i)] == pytest.approx(score, abs=1e-9), i


def test_text_stats_matches_definitions(spark, sf_dir):
    got = {r["doc_id"]: r for r in QUERIES["text_stats"](spark, sf_dir).collect()}
    d = _pq(sf_dir, "documents")
    en = set(STOPWORDS["en"])
    for i, t in zip(d["doc_id"], d["text"]):
        norm = _norm(t)
        toks = _toks(t)
        r = got[int(i)]
        assert r["n_chars"] == len(t)
        assert r["n_ws_tokens"] == len(toks)
        assert r["n_bpe_tokens"] == len(TOKEN_PATTERN.findall(t))
        pr = (len(t) - len(re.sub(r"[^\w\s]", "", t))) / len(t)
        assert r["punct_ratio"] == pytest.approx(pr, abs=1e-12)
        sw = sum(1 for tok in toks if tok in en) / len(toks)
        assert r["stopword_ratio"] == pytest.approx(sw, abs=1e-12)
        assert r["fingerprint"] == hashlib.md5(norm.encode()).hexdigest()


def test_wordcount_top50_matches_counter(spark, sf_dir):
    got = [
        (r["token"], r["cnt"])
        for r in QUERIES["wordcount_top50"](spark, sf_dir).collect()
    ]
    d = _pq(sf_dir, "documents")
    counts = Counter(tok for t in d["text"] for tok in _toks(t))
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert got == expect


def test_tfidf_top_terms_matches_smoothed_idf(spark, sf_dir):
    got = defaultdict(list)
    for r in QUERIES["tfidf_top_terms"](spark, sf_dir).collect():
        got[r["doc_id"]].append((r["rank"], r["term"], r["tfidf"]))
    d = _pq(sf_dir, "documents")
    n_docs = len(d)
    tf: dict = {}
    df_: Counter = Counter()
    for i, t in zip(d["doc_id"], d["text"]):
        c = Counter(_toks(t))
        tf[int(i)] = c
        for tok in c:
            df_[tok] += 1
    for i, c in tf.items():
        scored = sorted(
            (
                (
                    -cnt * (math.log((n_docs + 1) / (df_[tok] + 1)) + 1.0),
                    tok,
                )
                for tok, cnt in c.items()
            )
        )[:3]
        expect = [
            (rk, tok, round(-s, 6))
            for rk, (s, tok) in enumerate(scored, start=1)
        ]
        mine = sorted(got[i])
        assert [(rk, tok) for rk, tok, _ in mine] == [
            (rk, tok) for rk, tok, _ in expect
        ], i
        for (_, _, g), (_, _, e) in zip(mine, expect):
            assert g == pytest.approx(e, abs=1e-6)
