"""Text-analysis operators over the documents table (engine extension —
the reference has no text processing; these are the LLM-training-data
operators the 100 TB posture requires).

All JVM-side expressions (no Python UDFs): language-ID via stopword-hit
scoring, quality scoring from length/punct/stopword ratios, token
counting (whitespace + BPE-ish regex), md5 fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.functions.text import (
    STOPWORDS,
    bpe_ish_token_count,
    fingerprint,
    normalize_text,
    punct_ratio,
    ws_token_count,
    ws_tokens,
)


def _hits(text_col: Column, words: list[str]) -> Column:
    """# tokens (with duplicates) of ``text_col`` in ``words``."""
    return F.size(F.filter(ws_tokens(text_col), lambda t: t.isin(*words)))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document stats: char/token counts, punctuation and stopword
    ratios, deterministic fingerprint."""
    c = F.col(text_col)
    en_hits = _hits(c, STOPWORDS["en"])
    n_ws = ws_token_count(c)
    return docs.select(
        "doc_id",
        F.length(c).alias("n_chars"),
        n_ws.alias("n_ws_tokens"),
        bpe_ish_token_count(c).alias("n_bpe_tokens"),
        punct_ratio(c).alias("punct_ratio"),
        (en_hits / n_ws.cast("double")).alias("stopword_ratio"),
        fingerprint(c).alias("fingerprint"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: stopword-hit score per language, argmax
    with a fixed tie-break order (en > de > fr > es > it)."""
    c = F.col(text_col)
    scores = {lang: _hits(c, words) for lang, words in STOPWORDS.items()}
    langs = list(STOPWORDS)  # tie-break order
    expr = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            # >= for languages later in tie-break order, > would flip ties
            term = (
                scores[lang] >= scores[other]
                if langs.index(other) > langs.index(lang)
                else scores[lang] > scores[other]
            )
            cond = term if cond is None else (cond & term)
        expr = (
            F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
        )
    out_cols = [F.col("doc_id")] + [
        scores[lang].alias(f"score_{lang}") for lang in langs
    ]
    return docs.select(*out_cols, expr.otherwise(F.lit(langs[0])).alias("lang_pred"))


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: token-count saturation, low
    punctuation, healthy stopword density, sane mean word length."""
    c = F.col(text_col)
    n_ws = ws_token_count(c)
    sw = _hits(c, STOPWORDS["en"]) / n_ws.cast("double")
    pr = punct_ratio(c)
    mean_wl = F.length(normalize_text(c)).cast("double") / n_ws.cast("double")
    score = (
        0.4 * F.least(F.lit(1.0), n_ws.cast("double") / 100.0)
        + 0.3 * (1.0 - F.least(F.lit(1.0), pr * 5.0))
        + 0.2 * F.least(F.lit(1.0), sw * 10.0)
        + 0.1 * F.when((mean_wl >= 3.0) & (mean_wl <= 8.0), 1.0).otherwise(0.0)
    )
    return docs.select("doc_id", score.alias("quality_score"))
