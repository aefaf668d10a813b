"""Hand-built edge-case tests for the round-3 operators (corpus-wide
line dedup, mixture resampling, dense vocabulary ids). Oracle
equivalence is covered by test_oracle_parity; these pin the semantics
on tiny known inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.dedup import line_dedup
from defimap_data_pipelines_spark.operators.ranking import vocab_ids
from defimap_data_pipelines_spark.operators.sampling import (
    hash_bucket,
    mixture_resample,
)


def test_line_dedup_drops_corpus_boilerplate(spark):
    docs = spark.createDataFrame(
        [
            (1, "intro one. COOKIE BANNER. body a"),
            (2, "intro two. COOKIE BANNER. body b"),
            (3, "standalone text only"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in line_dedup(docs, sep=". ", max_count=2).collect()
    }
    assert out[1].n_dropped == 1 and out[2].n_dropped == 1
    assert out[1].text_clean == "intro one. body a"
    assert out[2].text_clean == "intro two. body b"
    assert out[3].n_dropped == 0
    assert out[3].text_clean == "standalone text only"


def test_line_dedup_document_fully_boilerplate(spark):
    docs = spark.createDataFrame(
        [(1, "SAME"), (2, "SAME"), (3, "unique line")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in line_dedup(docs, max_count=2).collect()}
    # every line of docs 1/2 is corpus-repeated -> empty reassembly
    assert out[1].n_kept == 0 and out[1].text_clean == ""
    assert out[2].n_kept == 0 and out[2].text_clean == ""
    assert out[3].n_kept == 1


def test_line_dedup_token_segments_preserve_order(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x y a b z w q")],
        ["doc_id", "text"],
    )
    # 2-token segments: doc1 = [a b][c d][e f][g]; doc2 = [x y][a b][z w][q]
    out = {
        r.doc_id: r
        for r in line_dedup(docs, max_count=2, tokens_per_line=2).collect()
    }
    assert out[1].n_dropped == 1 and out[2].n_dropped == 1
    assert out[1].text_clean == "c d e f g"
    assert out[2].text_clean == "x y z w q"


def test_mixture_resample_copy_counts(spark):
    docs = spark.createDataFrame(
        [(i, "up" if i % 2 == 0 else "down") for i in range(200)],
        ["doc_id", "source"],
    )
    out = mixture_resample(
        docs, strata="source", key="doc_id", rates={"up": 2.5, "down": 0.5}
    )
    rows = out.collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.copy)
    # every 'up' doc appears 2 or 3 times with dense copy numbering
    for doc_id, copies in by_doc.items():
        assert sorted(copies) == list(range(len(copies)))
        if doc_id % 2 == 0:
            assert len(copies) in (2, 3)
        else:
            assert len(copies) == 1
    n_up = sum(1 for r in rows if r.source == "up")
    n_down = sum(1 for r in rows if r.source == "down")
    # fractional parts follow the md5 bucket: ~50% of each stratum
    assert 200 <= n_up <= 300 and 30 <= n_down <= 70
    # deterministic: rerun is byte-identical
    again = mixture_resample(
        docs, strata="source", key="doc_id", rates={"up": 2.5, "down": 0.5}
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_mixture_resample_matches_hash_bucket_membership(spark):
    docs = spark.createDataFrame(
        [(i, "s") for i in range(50)], ["doc_id", "source"]
    )
    out = mixture_resample(
        docs, strata="source", key="doc_id", rates={"s": 0.3}
    )
    kept = {r.doc_id for r in out.collect()}
    expected = {
        r.doc_id
        for r in docs.select(
            "doc_id", hash_bucket(F.col("doc_id")).alias("b")
        ).collect()
        if r.b < 3000
    }
    assert kept == expected


def test_vocab_ids_rank_and_ties(spark):
    docs = spark.createDataFrame(
        [
            (1, "the the the cat cat dog"),
            (2, "the cat bee bee dog zoo"),
        ],
        ["doc_id", "text"],
    )
    out = {r.token: r for r in vocab_ids(docs, min_count=2).collect()}
    # counts: the=4, cat=3, bee=2, dog=2; zoo dropped (min_count)
    assert "zoo" not in out
    assert out["the"].token_id == 0
    assert out["cat"].token_id == 1
    # tie at 2: lexicographic bee < dog
    assert out["bee"].token_id == 2
    assert out["dog"].token_id == 3
    assert out["the"].n_occurrences == 4


def test_group_cap_equals_naive_window(spark):
    from pyspark.sql import Window

    from defimap_data_pipelines_spark.operators.sampling import (
        deterministic_group_cap,
    )

    # skewed: group 'hot' has 500 rows, others 3 each
    rows = [(f"d{i}", "hot") for i in range(500)] + [
        (f"x{g}{i}", f"g{g}") for g in range(5) for i in range(3)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = deterministic_group_cap(df, "source", "doc_id", k=7)
    naive = (
        df.withColumn(
            "rank_in_group",
            F.row_number().over(
                Window.partitionBy("source").orderBy(
                    F.md5(F.col("doc_id").cast("string")).asc(),
                    F.col("doc_id").asc(),
                )
            ),
        )
        .filter(F.col("rank_in_group") <= 7)
    )
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b
    # small groups (3 < k) keep all rows; hot group capped at exactly 7
    per_group = {}
    for _, src, _ in a:
        per_group[src] = per_group.get(src, 0) + 1
    assert per_group["hot"] == 7
    assert all(per_group[f"g{g}"] == 3 for g in range(5))


def test_substring_dedup_overlapping_spans(spark):
    from defimap_data_pipelines_spark.operators.dedup import substring_dedup

    shared = "one two three four five six"  # 6 tokens: windows overlap
    docs = spark.createDataFrame(
        [
            (1, f"intro {shared} tail1"),
            (2, f"{shared} tail2 words here"),
            (3, "totally different text entirely"),
            (4, "tiny"),  # shorter than the window: untouched
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in substring_dedup(docs, min_len=5, max_count=2).collect()
    }
    # the shared 6-token passage spans two overlapping 5-windows; all
    # six tokens are covered in both docs
    assert out[1].n_removed == 6 and out[1].text_clean == "intro tail1"
    assert out[2].n_removed == 6 and out[2].text_clean == "tail2 words here"
    assert out[3].n_removed == 0
    assert out[4].n_removed == 0 and out[4].text_clean == "tiny"


def test_gopher_rules_flags(spark):
    from defimap_data_pipelines_spark.operators.textops import gopher_rules

    # 100 words, mean word length 3.1 (>= 3)
    long_ok = "the cats sat upon a mat of wool and felt " * 10
    short = "the a of"  # 3 words -> fails word count
    no_stop = "alpha beta gamma delta " * 20  # no stopwords
    docs = spark.createDataFrame(
        [(1, long_ok), (2, short), (3, no_stop)], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in gopher_rules(docs).collect()}
    assert out[1].passes_gopher
    assert out[1].n_words == 100
    assert not out[2].rule_word_count and not out[2].passes_gopher
    assert not out[3].rule_stopwords and not out[3].passes_gopher
    # mean word length is an exact integer quotient
    assert out[2].mean_word_len == (len("the a of") - 2) / 3


def test_gopher_rules_integer_boundaries(spark):
    from defimap_data_pipelines_spark.operators.textops import gopher_rules

    # exactly 50 words of mean length exactly 3 -> both rules inclusive
    doc = " ".join(["the"] * 25 + ["cat"] * 24 + ["a"] * 1)
    docs = spark.createDataFrame([(1, doc)], ["doc_id", "text"])
    row = gopher_rules(docs).collect()[0]
    assert row.n_words == 50
    assert row.rule_word_count
    # sum_len = 25*3 + 24*3 + 1 = 148 < 150 -> mean < 3 -> fails
    assert not row.rule_mean_word_len


def test_bpe_merge_pairs_counts(spark):
    from defimap_data_pipelines_spark.operators.textops import (
        bpe_merge_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "aba aba"), (2, "ab cd")], ["doc_id", "text"]
    )
    out = {r.pair: r.n for r in bpe_merge_pairs(docs, top_k=10).collect()}
    # "aba" twice -> ab x2, ba x2; "ab" once -> ab; "cd" once
    assert out["ab"] == 3
    assert out["ba"] == 2
    assert out["cd"] == 1


def test_semdedup_prunes_within_cluster_only(spark):
    from defimap_data_pipelines_spark.operators.similarity import (
        semdedup_prune,
    )

    # two orthogonal directions -> two clusters; duplicates planted in
    # each direction must be pruned against their own cluster root
    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0] * (dim - 1) + [1.0]
    rows = [
        (1, e1), (2, [x * 2 for x in e1]),     # dup of 1
        (3, e2), (4, [x * 3 for x in e2]),     # dup of 3
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in semdedup_prune(
        emb, k=2, iters=2, tau=0.99).collect()}
    assert set(out) == {2, 4}
    assert out[2].dup_of == 1
    assert out[4].dup_of == 3
    assert abs(out[2].cosine - 1.0) < 1e-9


def test_quality_classifier_integer_exact_decision(spark):
    from defimap_data_pipelines_spark.operators.textops import (
        classifier_weights,
        quality_classifier,
    )
    import hashlib

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "hello hello hello")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_classifier(docs).collect()}
    w = classifier_weights()

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 256

    acc1 = w[bucket("hello")] + w[bucket("world")]
    assert out[1].keep == (acc1 >= 0)
    assert abs(out[1].logit - round(acc1 / 1e6 / 2, 6)) < 1e-12
    acc2 = 3 * w[bucket("hello")]
    assert out[2].keep == (acc2 >= 0)


def test_ann_recall_bounds(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import QUERIES

    rows = QUERIES["ann_recall_eval"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_at_5 == r.n_hits / 5.0


def test_pack_sequences_invariants(spark):
    from defimap_data_pipelines_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [(i, 10 + (i * 37) % 200) for i in range(300)] + [(999, 5000)],
        ["doc_id", "n_tok"],
    )
    rows = pack_sequences(
        docs, context=256, shard_budget=4096
    ).collect()
    # every doc packed exactly once
    assert sorted(r.doc_id for r in rows) == sorted(
        [i for i in range(300)] + [999]
    )
    fills: dict[tuple, int] = {}
    for r in rows:
        fills.setdefault((r.shard, r.bin), 0)
        fills[(r.shard, r.bin)] += r.n_tok
    for (shard, b), total in fills.items():
        members = [
            r for r in rows if (r.shard, r.bin) == (shard, b)
        ]
        # bin_fill is consistent with the members
        assert all(m.bin_fill == total for m in members)
        # no overfull bin unless it is a singleton oversized doc
        if total > 256:
            assert len(members) == 1 and members[0].n_tok > 256
    # deterministic: rerun identical regardless of input partitioning
    again = pack_sequences(
        docs.repartition(7), context=256, shard_budget=4096
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dedup_keep_best_prefers_quality(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import QUERIES

    rows = QUERIES["dedup_keep_best"](spark, sf_dir).collect()
    assert len(rows) > 0
    by_comp: dict[int, list] = {}
    for r in rows:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1  # exactly one survivor per cluster
        best = keepers[0]
        # survivor has max quality (doc_id tiebreak)
        for m in members:
            assert (m.quality, -m.doc_id) <= (best.quality, -best.doc_id)


def test_ks_drift_matches_scipy_formula(spark, sf_dir):
    """The integer-exact KS statistic equals a direct numpy
    recomputation of sup|F_a - F_b| on the same data."""
    import numpy as np

    from defimap_data_pipelines_spark.plans.queries import QUERIES, read_table

    row = QUERIES["ks_drift"](spark, sf_dir).collect()[0]
    ev = (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "value")
        .collect()
    )
    a = np.sort([r.value for r in ev if r.event_type == "click"])
    b = np.sort([r.value for r in ev if r.event_type == "purchase"])
    pooled = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(a, pooled, side="right") / len(a)
    fb = np.searchsorted(b, pooled, side="right") / len(b)
    ks = np.max(np.abs(fa - fb))
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.ks_stat - round(ks, 6)) <= 2e-6
