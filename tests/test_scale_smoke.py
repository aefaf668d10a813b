"""Scale smoke: the curation pipeline on a corpus ~10x the sf0.1
documents table, with adversarial dup structure (one giant exact-dup
group and a near-clique of near-dups). Not a benchmark — an existence
proof that the operators hold their shape (bounded rounds, no driver
blowup, correct survivor accounting) beyond the oracle-checked SFs.

Fixture note: unique docs are built token-unique on purpose (id-derived
numbers dominate each text). A long SHARED phrase across hundreds of
thousands of docs would legitimately blow up LSH band collisions —
banding presumes sub-threshold pairs are rare, which Zipfian real
corpora satisfy and a copy-pasted template corpus does not; that
regime's answer is the exact-dup and line-dedup passes that run FIRST
in clean_corpus (and do catch the template group here).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_UNIQUE = 50_000
N_EXACT_DUPS = 12_000  # one giant identical-text group
N_NEAR_CLIQUE = 300  # pairwise-similar docs (shared long template)


def _numword(col, mult: int, mod: int):
    """id-derived pseudo-word, e.g. w473x — unique-ish across docs."""
    return F.concat(F.lit("w"), (col * mult % mod).cast("string"), F.lit("x"))


@pytest.fixture(scope="module")
def big_docs(spark):
    i = F.col("id")
    words = [
        _numword(i, m, 1_000_003)
        for m in (7919, 104729, 611953, 15485863, 32452843, 49979687)
    ]
    uniq = spark.range(N_UNIQUE).select(
        F.concat(F.lit("u"), i).alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("doc body"),
            *words,
            F.lit("tail"),
            i.cast("string"),
            *[_numword(i + 1, m, 999983) for m in (7919, 104729, 611953)],
        ).alias("text"),
    )
    exact = spark.range(N_EXACT_DUPS).select(
        F.concat(F.lit("e"), i).alias("doc_id"),
        F.lit(
            "identical boilerplate document body the quick brown fox"
            " jumps over the lazy dog repeated verbatim across the corpus"
        ).alias("text"),
    )
    near = spark.range(N_NEAR_CLIQUE).select(
        F.concat(F.lit("n"), i).alias("doc_id"),
        F.concat(
            F.lit(
                "shared template prefix with many common tokens one two"
                " three four five six seven eight nine ten eleven twelve"
                " thirteen fourteen fifteen sixteen seventeen eighteen "
            ),
            i.cast("string"),
        ).alias("text"),
    )
    return uniq.unionByName(exact).unionByName(near)


def test_curation_holds_at_10x(spark, big_docs):
    from defimap_data_pipelines_spark.operators.corpus import clean_corpus

    survivors = clean_corpus(
        big_docs, min_quality=0.0, jaccard_threshold=0.5, use_minhash=True
    )
    ids = survivors.select("doc_id").cache()
    # the exact-dup group collapses to 1 canonical; the near-clique
    # collapses to ~1 (min-label propagation over its pair graph);
    # unique docs survive
    assert ids.filter(F.col("doc_id").startswith("e")).count() == 1
    assert ids.filter(F.col("doc_id").startswith("n")).count() == 1
    n_u = ids.filter(F.col("doc_id").startswith("u")).count()
    assert n_u == N_UNIQUE, n_u


def test_components_bounded_on_giant_clique(spark, big_docs):
    """The near-clique's pair graph is dense (choose(300,2) ~ 45k
    edges) but diameter 1 — BSP must label it in a bounded handful of
    rounds, and star contraction must agree."""
    from defimap_data_pipelines_spark.operators.dedup import (
        minhash_lsh_candidates,
    )
    from defimap_data_pipelines_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    near = big_docs.filter(F.col("doc_id").startswith("n"))
    pairs = minhash_lsh_candidates(near, threshold=0.5)
    # force the BSP loop (the size gate would route 45k edges to the
    # driver union-find fast path) — this test is about BSP round
    # bounds on dense components
    bsp = connected_components(
        pairs, "doc_a", "doc_b", max_iter=6, small_graph_edges=0
    )
    comps = bsp.select("component").distinct().count()
    assert comps == 1
    star = connected_components_star(pairs, "doc_a", "doc_b")
    a = sorted(map(tuple, bsp.collect()))
    b = sorted(map(tuple, star.collect()))
    assert a == b


def test_packing_holds_at_scale(spark):
    """Sequence packing over 500k docs (~100M tokens): shard count and
    per-shard state stay bounded, no bin overfills, every doc packs
    exactly once — the applyInPandas escape hatch holding its shape
    well past the oracle-checked SFs."""
    from defimap_data_pipelines_spark.operators.packing import (
        pack_sequences,
    )

    docs = spark.range(500_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 400 + 16).cast("long").alias("n_tok"),
    )
    packed = pack_sequences(docs, context=2048, shard_budget=1 << 18)
    stats = packed.groupBy("shard", "bin").agg(
        F.max("bin_fill").alias("fill"),
        F.sum("n_tok").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    bad = stats.filter(
        (F.col("fill") > 2048) | (F.col("fill") != F.col("total"))
    ).count()
    assert bad == 0  # no doc exceeds the context in this fixture
    assert packed.count() == 500_000
    n_shards = packed.select("shard").distinct().count()
    # ~108M tokens / 262144-token shards
    assert 300 <= n_shards <= 500, n_shards
