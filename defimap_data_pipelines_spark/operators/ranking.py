"""Relevance-ranking operators over the documents corpus (engine
extension: training-data curation needs per-document term salience for
topic filtering and retrieval-style quality checks).

Both operators stay entirely in built-in JVM expressions: tokenize with
split, one explode to postings, map-side-combined counts, broadcast
joins for the tiny term-statistics dimensions. No Python in the hot
path; document-frequency tables are O(vocabulary) and broadcast.

Determinism: scores are doubles built from integer counts via identical
expression trees in Spark and the DuckDB oracle (ln over int ratios),
so per-row values reproduce bit-for-bit; ranking ties break on the
term/doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.functions.text import ws_tokens


def _postings(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, token) one row per token OCCURRENCE (not distinct)."""
    return docs.select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("token")
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k terms per document by tf-idf.

    tf = raw occurrence count in the doc; idf = ln((N+1)/(df+1)) + 1
    (smoothed — never zero, so rare-term docs still rank). Returns
    (doc_id, term, tfidf, rank) with rank 1..k per doc, ties broken by
    term ascending.

    One explode + two count aggregations; df and N are corpus-bounded
    (vocabulary-sized / scalar) and broadcast onto the tf frame, so the
    only full-data shuffle is the (doc_id, token) count.
    """
    post = _postings(docs, text_col)
    tf = post.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df_tbl = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_tbl = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "token")
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "doc_id",
            F.col("token").alias("term"),
            (
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                    + F.lit(1.0)
                )
            ).alias("_score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", F.round("_score", 6).alias("tfidf"), "rank")
    )


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top: int = 20,
) -> DataFrame:
    """BM25 relevance of each document to a bag-of-terms query; top-N
    docs by score (ties broken by doc_id).

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); the classic Robertson
    formulation. Doc length is the whitespace token count; avgdl is a
    corpus scalar (broadcast).

    The query-term postings are filtered BEFORE the tf count, so the
    shuffled volume is only the matching occurrences — at 100 TB the
    token filter prunes scan output by ~|terms|/|vocab|.
    """
    post = _postings(docs, text_col).filter(F.col("token").isin(terms))
    tf = post.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    lens = docs.select(
        "doc_id", F.size(ws_tokens(F.col(text_col))).cast("long").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).crossJoin(
        lens.agg(F.avg("dl").alias("avgdl"))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(df_tbl), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            # integer-quantized per-term contribution: the per-doc sum
            # is order-free so Spark and the oracle agree bit-for-bit
            F.round(
                idf * F.col("tf") * (1.0 + k1) / denom * 1_000_000.0
            )
            .cast("long")
            .alias("_q"),
        )
    )
    scored = per_term.groupBy("doc_id").agg(
        (F.sum("_q") / 1_000_000.0).alias("bm25")
    )
    # top-N FIRST via sort+limit (TakeOrderedAndProject: per-partition
    # partial top-k, no single-partition shuffle), then rank the tiny
    # result — a global row_number window over the full frame would
    # funnel every doc through one task at scale
    head = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(top)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return head.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "doc_id", "bm25", "rank"
    )


def unigram_perplexity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, ppl): perplexity of each document under the corpus's
    own add-1-smoothed unigram language model — the classic
    CCNet/C4-style quality signal (template spam and gibberish sit far
    from the corpus distribution; typical prose scores low).

    p(t) = (count(t) + 1) / (total_tokens + vocab);
    ppl(d) = exp(-mean over d's tokens of ln p(t)).

    One postings explode feeds both the LM counts and the scoring join;
    the join is keyed by token (frequent-token skew is AQE's skew-join
    case). Per-token ln p terms are integer-quantized (1e9) so the
    per-doc mean is order-free and oracle-exact.
    """
    post = _postings(docs, text_col)
    lm = post.groupBy("token").agg(F.count(F.lit(1)).alias("_c"))
    tot = lm.agg(
        F.sum("_c").cast("long").alias("_t"),
        F.count(F.lit(1)).cast("long").alias("_v"),
    )
    term = F.round(
        F.log((F.col("_c") + 1) / (F.col("_t") + F.col("_v")).cast("double"))
        * 1_000_000_000.0
    ).cast("long")
    scored = (
        post.join(lm, "token")
        .crossJoin(F.broadcast(tot))
        .select("doc_id", term.alias("_q"))
    )
    return scored.groupBy("doc_id").agg(
        F.round(
            F.exp(
                -(F.sum("_q") / 1_000_000_000.0) / F.count(F.lit(1))
            ),
            6,
        ).alias("ppl")
    )


def vocab_ids(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    with_running_total: bool = False,
) -> DataFrame:
    """Frequency-ranked vocabulary with DENSE integer ids — the
    tokenizer-training precursor (id 0 = most frequent token; ties
    break lexicographically).

    A naive ROW_NUMBER() OVER (ORDER BY count DESC) funnels the whole
    vocabulary through one task; this uses the same two-pass parallel
    prefix sum as token sharding (packing.global_cumsum) over the
    composite order (count desc, token asc): range-partition the
    counted vocab, rank within partitions in parallel, offset by the
    per-partition totals (numPartitions longs on the driver). Exact,
    layout-independent, and the heavy corpus tokenization stays one
    map-side-combined groupBy.

    ``with_running_total=True`` adds a ``running_occurrences`` column
    (inclusive cumsum of n_occurrences in token_id order) riding the
    SAME prefix-sum pass as the rank — multi-column global_cumsum, so
    vocab_coverage costs zero extra shuffles over vocab_ids.
    """
    from defimap_data_pipelines_spark.operators.packing import global_cumsum

    counts = (
        _postings(docs, text_col)
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    vals = ["_one", "n_occurrences"] if with_running_total else "_one"
    outs = ["_rank", "running_occurrences"] if with_running_total else "_rank"
    ranked = global_cumsum(
        counts.withColumn("_one", F.lit(1).cast("long")),
        [F.col("n_occurrences").desc(), F.col("token").asc()],
        vals,
        out=outs,
    )
    cols = [
        (F.col("_rank") - 1).cast("long").alias("token_id"),
        F.col("token"),
        F.col("n_occurrences"),
    ]
    if with_running_total:
        cols.append(F.col("running_occurrences").cast("long"))
    return ranked.select(*cols)


def bigram_perplexity(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_trans, ppl): per-document perplexity under the
    corpus's own add-1-smoothed BIGRAM language model — the next rung
    up from unigram_perplexity's CCNet-style signal. A unigram LM
    scores word CHOICE; the bigram LM scores word ORDER, so shuffled
    or templated text that fools the unigram filter (right words,
    wrong sequence) scores high here.

        p(w_i | w_{i-1}) = (count(w_{i-1} w_i) + 1)
                           / (count(w_{i-1} ·) + V)
        ppl(d) = exp(-mean over d's transitions of ln p)

    with V the corpus unigram vocabulary. Same determinism discipline
    as the unigram operator: each transition's ln p is quantized to
    integer nano-units before the per-doc mean, so the accumulation
    is order-free and the oracle replays it exactly.

    Shape: ONE bigram-postings explode feeds the LM counts (gram
    groupBy), the prefix totals (re-aggregated FROM the gram counts,
    never a second corpus pass), and the scoring join; V comes from a
    distinct-first-token count of the same frame. The scoring join is
    keyed by gram — frequent-bigram skew is AQE's skew-join case.
    Documents with < 2 tokens have no transitions and are absent.
    """
    from defimap_data_pipelines_spark.functions.text import ws_tokens
    from defimap_data_pipelines_spark.operators.textops import (
        _counted_ngrams,
    )

    post = docs.select(
        "doc_id",
        F.explode(
            _counted_ngrams(ws_tokens(F.col(text_col)), 2)
        ).alias("gram"),
    )
    # lm is vocab^2-bounded and feeds both the prefix re-aggregation
    # and the scoring join — cache it so the corpus-wide gram count
    # happens once (the bigram_lift one-pass lesson).
    lm = post.groupBy("gram").agg(
        F.count(F.lit(1)).cast("long").alias("_cb")
    ).cache()
    pref = lm.groupBy(
        F.split(F.col("gram"), " ")[0].alias("_w")
    ).agg(F.sum("_cb").alias("_cp"))
    # V counts the full unigram vocabulary: every token is the FIRST
    # token of some position's context except document-final tokens,
    # so derive V from a distinct-token count of the token explode —
    # shared-scan with the bigram explode via one cached counts frame
    # would be overkill here: the vocab frame is tiny and the extra
    # aggregate reuses lm/pref, not the corpus.
    toks = docs.select(
        F.explode(ws_tokens(F.col(text_col))).alias("_t")
    )
    v = toks.agg(F.countDistinct("_t").cast("long").alias("_v"))
    term = F.round(
        F.log(
            (F.col("_cb") + 1)
            / (F.col("_cp") + F.col("_v")).cast("double")
        )
        * 1_000_000_000.0
    ).cast("long")
    scored = (
        post.join(lm, "gram")
        .withColumn("_w", F.split(F.col("gram"), " ")[0])
        .join(pref, "_w")
        .crossJoin(F.broadcast(v))
        .select("doc_id", term.alias("_q"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_trans"),
        F.round(
            F.exp(-(F.sum("_q") / 1_000_000_000.0) / F.count(F.lit(1))),
            6,
        ).alias("ppl"),
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top: int = 20,
) -> DataFrame:
    """Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of N ranked lists: score(d) = sum over lists of 1/(k + rank_d).
    The standard hybrid-search combiner — BM25 and embedding rankers
    disagree on scale but agree on order, so fuse on RANKS.

    Each reciprocal is a pure function of an INTEGER rank, quantized
    to nano-units before the sum (round(1e9/(k+rank))), so the fused
    score is an exact integer both engines aggregate order-free —
    float RRF sums would be engine-order-dependent. k=60 per the
    paper.

    Input frames carry (id_col, rank_col in 1..top_n); output
    (id, rrf_nano, in_lists, rank) for the top rows, ranked by
    (rrf_nano DESC, id). Top-N via sort+limit first
    (TakeOrderedAndProject), then the tiny head is row_numbered —
    no global window over the full candidate set (the bm25_scores
    pattern).

    Scale shape: each input list is already small (top-N per
    ranker); the union/groupBy is over O(N * top_n) rows regardless
    of corpus size — fusion cost is independent of the 100 TB scan
    behind each ranker.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col).alias("id"),
            F.round(1_000_000_000.0 / (F.lit(k) + F.col(rank_col)))
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    fused = u.groupBy("id").agg(
        F.sum("_c").alias("rrf_nano"),
        F.count(F.lit(1)).cast("long").alias("in_lists"),
    )
    head = fused.orderBy(
        F.col("rrf_nano").desc(), F.col("id").asc()
    ).limit(top)
    w = Window.orderBy(F.col("rrf_nano").desc(), F.col("id").asc())
    return head.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(
        F.col("id").alias(id_col), "rrf_nano", "in_lists", "rank"
    )


def itemcf_topk(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    k: int = 5,
    max_basket: int = 64,
    item_filter=None,
) -> DataFrame:
    """Item-item collaborative filtering: top-k most-similar items by
    co-occurrence cosine sim(i,j) = c_ij / sqrt(c_i * c_j), the
    classic Sarwar et al. (WWW'01) item-based recommender on implicit
    baskets.

    c_ij (baskets containing both) and c_i (baskets containing i)
    are exact int64 counts, so the cosine is one double expression of
    exact ints — identical both engines, rank-stable with the
    (sim DESC, j ASC) tie-break.

    Scale: the pair generation is the basket self-join — quadratic in
    BASKET SIZE, not corpus size. ``max_basket`` drops
    pathological mega-baskets before the join (the standard itemCF
    blowup cap; a basket with 10k items contributes 1e8 pairs and no
    signal). ``item_filter`` (a Column predicate on the LEFT item)
    prunes pair generation to the items being recommended FOR —
    applied before the join, not after the count.
    """
    bp = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = bp.groupBy("b").agg(F.count(F.lit(1)).alias("_sz"))
    bp = (
        bp.join(
            sizes.filter(F.col("_sz") <= max_basket).select("b"), "b"
        )
    ).cache()  # three consumers: left pairs, right pairs, item counts
    ci = bp.groupBy("i").agg(F.count(F.lit(1)).cast("long").alias("c"))
    left = bp.select("b", F.col("i").alias("li"))
    if item_filter is not None:
        left = left.filter(item_filter(F.col("li")))
    pairs = (
        left.join(bp.select("b", F.col("i").alias("rj")), "b")
        .filter(F.col("li") != F.col("rj"))
        .groupBy(F.col("li").alias("i"), F.col("rj").alias("j"))
        .agg(F.count(F.lit(1)).cast("long").alias("cij"))
    )
    # item-count joins deliberately carry NO broadcast hint: the dim
    # is catalog-sized (could be 1e8 items at 100 TB) — AQE broadcasts
    # it when it is actually small, shuffles when it is not
    scored = (
        pairs.join(
            ci.select(F.col("i").alias("_ii"), F.col("c").alias("ci")),
            F.col("i") == F.col("_ii"),
        )
        .join(
            ci.select(F.col("i").alias("_jj"), F.col("c").alias("cj")),
            F.col("j") == F.col("_jj"),
        )
        .select(
            "i",
            "j",
            "cij",
            F.round(
                F.col("cij").cast("double")
                / F.sqrt(
                    F.col("ci").cast("double") * F.col("cj")
                ),
                9,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("i").orderBy(
        F.col("sim").desc(), F.col("j").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def decayed_popularity(
    df: DataFrame,
    key_col: str,
    day_col: str,
    half_life_days: int = 7,
    max_shift: int = 30,
) -> DataFrame:
    """Exponentially time-decayed popularity per key — the
    "trending" score every recsys/feed ranker maintains: an event
    ``a`` days before the corpus's latest day contributes
    2^(max_shift - min(a div half_life_days, max_shift)), i.e. full
    weight 2^30 for the current half-life bucket, halving per bucket
    and flooring at 1. ALL-INTEGER weights, so the sum is exact and
    order-independent (no float decay drift, no RNG) — the same
    discipline as the md5 sampling family. Returns (key, n_events,
    score) ordered by score desc.

    One scalar max-day aggregate broadcast onto the scan, then one
    map-side-combinable groupBy — no windows, no per-event state.
    Int64 headroom: each event contributes up to 2^max_shift = 2^30,
    so the per-key score sum hits int64 max at ~2^33 (~8.6e9)
    full-weight events per key — outside ANSI mode the wrap would be
    silent. Mitigation before that scale: lower max_shift (weights
    shrink 2x per step) or shard hot keys.
    Incremental twin: per-bucket partial sums shift right as days
    roll over, so a daily job can maintain the score by re-scaling
    yesterday's buckets — noted, not implemented."""
    ref = df.agg(F.max(day_col).alias("_mx"))
    j = df.crossJoin(F.broadcast(ref))
    w = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {max_shift} - "
        f"CAST(least(((_mx - {day_col}) div {half_life_days}),"
        f" {max_shift}) AS INT))"
    )
    return (
        j.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(w).cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "key")
    )
