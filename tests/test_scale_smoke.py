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


# ---------------------------------------------------------------------------
# ANN path at 10x sf0.1 (round-3 verdict item 6)
# ---------------------------------------------------------------------------

N_BULK = 18_000
N_CLUSTERS = 40
CLUSTER_SIZE = 50  # 40*50 = 2_000 planted near-dups; total 20k = 10x sf0.1
DIM = 64


@pytest.fixture(scope="module")
def big_vecs(spark):
    """20k deterministic 64-dim vectors: 18k spread 'bulk' vectors plus
    40 adversarial near-dup clusters of 50 members each (members are a
    1e-3 perturbation of their centroid -> within-cluster cosine
    ~0.999998, far above the 0.98 dedup threshold; the clusters are
    the worst case for bucket skew because every member lands in the
    same bucket in every table)."""
    i = F.col("id")
    bulk = spark.range(N_BULK).select(
        i.alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}),"
            " j -> sin((id + 1) * (j + 1) * 1.3))"
        ).alias("embedding"),
    )
    planted = spark.range(N_CLUSTERS * CLUSTER_SIZE).select(
        (F.lit(N_BULK) + i).alias("vec_id"),
        (i % N_CLUSTERS).alias("cluster"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}),"
            f" j -> sin((id % {N_CLUSTERS} + 1) * (j + 3) * 0.7)"
            "      + 0.001 * sin((id + 1) * (j + 11)))"
        ).alias("embedding"),
    )
    return bulk, planted


def test_ann_lsh_pairs_hold_at_10x(spark, big_vecs):
    """cosine_pairs_lsh at 10x sf0.1: (a) recall vs the exact within-
    cluster ground truth, (b) the candidate workload stays inside the
    |V|^2*tables/2^planes envelope from the docstring plus the planted
    clusters' quadratic term — i.e. LSH is actually filtering, not
    degenerating toward the cartesian."""
    from defimap_data_pipelines_spark.operators.similarity import (
        cosine_from_norms,
        cosine_pairs_lsh,
        l2_norm,
        lsh_bucket,
    )

    bulk, planted = big_vecs
    vectors = bulk.unionByName(planted.drop("cluster")).localCheckpoint()
    n_vecs = vectors.count()
    assert n_vecs == N_BULK + N_CLUSTERS * CLUSTER_SIZE

    # exact ground truth: within-cluster pairs at cosine >= 0.98
    # (49k pairs — exact is affordable because truth is cluster-local)
    p = planted.select("vec_id", "cluster", "embedding",
                       l2_norm(F.col("embedding")).alias("n"))
    a = p.select(F.col("vec_id").alias("id_a"), "cluster",
                 F.col("embedding").alias("va"), F.col("n").alias("na"))
    b = p.select(F.col("vec_id").alias("id_b"), "cluster",
                 F.col("embedding").alias("vb"), F.col("n").alias("nb"))
    truth = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            cosine_from_norms(
                F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.98)
    )
    n_truth = truth.count()
    assert n_truth >= N_CLUSTERS * CLUSTER_SIZE * (CLUSTER_SIZE - 1) // 2 * 0.99

    num_planes, num_tables = 10, 6
    found = cosine_pairs_lsh(
        vectors, threshold=0.98, num_planes=num_planes,
        num_tables=num_tables, dim=DIM,
    )
    hits = truth.join(found, ["id_a", "id_b"], "left_semi").count()
    recall = hits / n_truth
    # docstring: miss probability < 1e-11 per pair at s >= 0.98
    assert recall >= 0.999, f"recall {recall:.4f} ({hits}/{n_truth})"

    # candidate workload bound: sum over (table, bucket) of C(n, 2)
    # — what the bucket self-join actually feeds the verifier
    buckets = vectors.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(t).alias("table"),
                    lsh_bucket("embedding", num_planes, DIM, salt=t)
                    .alias("bucket"),
                )
                for t in range(num_tables)
            ])
        ).alias("tb")
    ).select("tb.table", "tb.bucket")
    cand_work = (
        buckets.groupBy("table", "bucket")
        .count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    uniform_envelope = n_vecs**2 / 2 * num_tables / 2**num_planes
    planted_term = (
        N_CLUSTERS * CLUSTER_SIZE * (CLUSTER_SIZE - 1) // 2 * num_tables
    )
    # 3x slack: sin-derived vectors are deterministic, not uniform on
    # the sphere, so buckets skew somewhat; the assertion is that the
    # workload stays ORDERS below the n^2/2 = 200M cartesian
    bound = 3 * (uniform_envelope + planted_term)
    assert cand_work <= bound, (cand_work, bound)
    assert cand_work <= 0.05 * n_vecs**2 / 2


def test_ann_lsh_topk_recall_at_10x(spark, big_vecs):
    """lsh_topk at 10x: planted queries must retrieve within-cluster
    neighbors (their true top-k by construction) at >= 0.98 recall."""
    from defimap_data_pipelines_spark.operators.similarity import lsh_topk

    bulk, planted = big_vecs
    corpus = bulk.unionByName(planted.drop("cluster")).localCheckpoint()
    queries = planted.filter(F.col("vec_id") % 20 == 0).drop("cluster")
    n_q = queries.count()
    assert n_q >= 90

    k = 5
    out = lsh_topk(queries, corpus, k=k, num_planes=6, num_tables=8, dim=DIM)
    member = planted.select("vec_id", "cluster")
    labeled = (
        out.join(member.withColumnRenamed("vec_id", "query_id")
                 .withColumnRenamed("cluster", "qc"), "query_id")
        .join(member.withColumnRenamed("cluster", "nc"), "vec_id", "left")
    )
    n_good = labeled.filter(F.col("nc") == F.col("qc")).count()
    recall = n_good / (n_q * k)
    assert recall >= 0.98, f"top-k recall {recall:.4f}"


def test_prefix_sum_machinery_at_10x(spark):
    """The two-pass parallel prefix sum (token shards, vocab ranks,
    epoch shuffle positions) at 600k rows — closed-form exactness and
    layout-independence across partition counts, far beyond the
    oracle-checked SFs."""
    from defimap_data_pipelines_spark.operators.packing import (
        assign_token_shards,
        global_cumsum,
    )
    from defimap_data_pipelines_spark.operators.sampling import epoch_shuffle

    n = 600_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).cast("long").alias("n_tok"),
    )
    # exact closed form regardless of how the range partitioner cuts
    for parts in (8, 32, 127):
        cum = global_cumsum(docs, "doc_id", "n_tok", out="c",
                            num_partitions=parts)
        last = cum.orderBy(F.col("doc_id").desc()).limit(1).collect()[0]
        expect = sum(i % 97 + 1 for i in range(n))
        assert last.c == expect, parts

    # shard assignment: contiguity + budget bounds hold at volume
    sharded = assign_token_shards(docs, "n_tok", budget=100_000)
    stats = sharded.groupBy("shard").agg(
        F.sum("n_tok").alias("t"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.count(F.lit(1)).alias("c"),
    ).orderBy("shard").collect()
    for i, r in enumerate(stats[:-1]):
        assert r.t >= 100_000 - 97  # every non-final shard ~full
        assert r.hi < stats[i + 1].lo  # shards are contiguous id ranges
        assert r.hi - r.lo + 1 == r.c  # and gap-free

    # epoch shuffle: a permutation at volume, shards contiguous
    pos = epoch_shuffle(docs.select("doc_id"), epoch=7, shard_size=4096)
    agg = pos.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("position").alias("d"),
        F.min("position").alias("mn"),
        F.max("position").alias("mx"),
    ).collect()[0]
    assert (agg.n, agg.d, agg.mn, agg.mx) == (n, n, 0, n - 1)


def test_star_contraction_adversarial_skew_chain_plus_clique(spark):
    """The graph twin of the curation smoke (round-4 verdict item):
    one giant near-clique (the skewed dup-cluster shape — extreme
    degree concentration) fused to a 20k-node chain (extreme
    DIAMETER, where min-label BSP would need 20k rounds), plus a 30k-
    spoke hub. Star contraction must label all of it in O(log^2 n)
    rounds — measured, not assumed: the stats hook records the actual
    round count — and the labels have closed forms to compare
    against (no oracle engine needed)."""
    from defimap_data_pipelines_spark.operators.graph import (
        connected_components_star,
    )

    n_chain, k_clique, n_spokes = 20_000, 250, 30_000
    chain = spark.range(n_chain - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    # clique ids live ABOVE the chain and attach to chain node 777,
    # so the whole thing is ONE component with min id 0 and diameter
    # ~20k; spokes form a second component rooted at its hub.
    c0 = 1_000_000
    clique = (
        spark.range(k_clique)
        .select((F.col("id") + c0).alias("src"))
        .crossJoin(
            spark.range(k_clique).select((F.col("id") + c0).alias("dst"))
        )
        .filter(F.col("src") < F.col("dst"))
    )
    bridge = spark.createDataFrame([(777, c0)], "src long, dst long")
    h0 = 2_000_000
    hub = spark.range(n_spokes).select(
        F.lit(h0).alias("src"), (F.col("id") + h0 + 1).alias("dst")
    )
    edges = chain.unionByName(clique).unionByName(bridge).unionByName(hub)

    stats: dict = {}
    # Catalyst's UnionBase.rewriteConstraints trips a "key not found"
    # internal error here (Spark 4.1): the LocalRelation bridge + the
    # u!=v filter feed a localCheckpoint whose LogicalRDD carries
    # stale origin constraints into the star-contraction self-unions.
    # Minimal 8-line repro + fix-detection canary live in
    # tests/test_catalyst_union_bug.py; drop this workaround when that
    # canary reports the bug fixed. Constraint propagation is an
    # optimizer nicety, not a correctness input.
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    try:
        labels = connected_components_star(
            edges, max_iter=25, stats=stats
        ).cache()
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    # O(log^2 n) in the worst case; in practice distance-halving gives
    # ~log2(20k) ~ 15. A loose 20 still rules out O(diameter) by 1000x.
    assert stats["rounds"] <= 20, stats
    # closed-form labels: chain+clique -> 0, hub star -> h0
    comp_sizes = {
        r.component: r.n
        for r in labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert comp_sizes == {
        0: n_chain + k_clique,
        h0: n_spokes + 1,
    }, stats
    mislabeled = labels.filter(
        (
            (F.col("node") < n_chain)
            | ((F.col("node") >= c0) & (F.col("node") < c0 + k_clique))
        )
        & (F.col("component") != 0)
    ).count()
    assert mislabeled == 0


def test_round5_sketch_and_sampling_ops_hold_at_volume(spark):
    """KMV at 100k distinct keys (estimate inside 3-sigma), weighted
    sampling at 400k drawn rows, and the Morton projection over a
    1M-point grid — the round-5 operators well past the
    oracle-checked SFs."""
    from defimap_data_pipelines_spark.operators.sampling import (
        weighted_sample,
    )
    from defimap_data_pipelines_spark.operators.sketches import (
        KMV_K,
        kmv_distinct_by,
    )
    from defimap_data_pipelines_spark.operators.zorder import z_value

    # KMV: 100k distinct -> relative error ~ 1/sqrt(k-2) ~ 6.3%
    keys = spark.range(100_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    est = kmv_distinct_by(keys, "g", "k").collect()[0].kmv_estimate
    assert abs(est - 100_000) / 100_000 < 3 / (KMV_K - 2) ** 0.5, est

    # weighted sampling: 100k rows, weights 1..8 -> ~450k drawn rows,
    # heavy rows (w=8, 1/8th of rows) should take the clear majority
    docs = spark.range(100_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 8 + 1).alias("w")
    )
    got = weighted_sample(docs, "doc_id", "w", n=1000).collect()
    assert len(got) == 1000
    heavy = sum(1 for r in got if r.w >= 7)
    # E[w>=7 share] = 15/36 ~ 0.417 of inclusion mass; 0.30 is a guard
    assert heavy >= 300, heavy

    # z-order: bijective over a 1024x1024 grid (20-bit codes)
    n = 1024
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"),
        (F.col("id") / n).cast("long").alias("y"),
    )
    stats = grid.select(z_value("x", "y", 10).alias("z")).agg(
        F.countDistinct("z").alias("d"), F.max("z").alias("mx")
    ).collect()[0]
    assert (stats.d, stats.mx) == (n * n, n * n - 1)
