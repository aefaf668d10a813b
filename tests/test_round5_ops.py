"""Round-5 operator tests: gzipped WARC members, persisted model
artifacts, and the skewed-graph scale smoke."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.test_round4_ops import _fixture_warc


# ---------------------------------------------------------------------------
# .warc.gz — per-record gzip members (the Common Crawl wire format)
# ---------------------------------------------------------------------------


def _fixture_warc_gz() -> tuple[bytes, list[int]]:
    """The plain fixture's three records as three gzip members;
    returns (container, member_offsets)."""
    from defimap_data_pipelines_spark.sources.warc import (
        gzip_member_bytes,
        warc_record_bytes,
    )

    records = [
        warc_record_bytes("warcinfo", b"software: test-crawler"),
        warc_record_bytes(
            "response",
            b"<html><body>hello crawl</body></html>",
            target_uri="https://example.com/a",
            content_type="application/http; msgtype=response",
        ),
        warc_record_bytes(
            "response",
            bytes(range(256)) * 4,
            target_uri="https://example.com/b",
            content_type="application/octet-stream",
        ),
    ]
    members = [gzip_member_bytes(r) for r in records]
    offsets, pos = [], 0
    for m in members:
        offsets.append(pos)
        pos += len(m)
    return b"".join(members), offsets


def test_parse_warc_gz_matches_plain_and_keeps_member_offsets():
    from defimap_data_pipelines_spark.sources.warc import (
        parse_warc_bytes,
        parse_warc_gz_bytes,
    )

    gz, offsets = _fixture_warc_gz()
    plain_recs = parse_warc_bytes(_fixture_warc())
    gz_recs = parse_warc_gz_bytes(gz)
    assert len(gz_recs) == len(plain_recs) == 3
    for p, g, off in zip(plain_recs, gz_recs, offsets):
        assert g["record_offset"] == off  # COMPRESSED member offset
        for k in ("warc_type", "target_uri", "content_length", "payload"):
            assert g[k] == p[k]


def test_parse_warc_gz_salvage_on_truncation_and_corruption():
    from defimap_data_pipelines_spark.sources.warc import parse_warc_gz_bytes

    gz, offsets = _fixture_warc_gz()
    # cut inside the LAST member: strict raises, salvage keeps 2
    cut = gz[: offsets[2] + 5]
    with pytest.raises((ValueError, Exception)):
        parse_warc_gz_bytes(cut)
    assert [r["warc_type"] for r in parse_warc_gz_bytes(cut, strict=False)] \
        == ["warcinfo", "response"]
    # corrupt a byte mid-member-2: salvage keeps only member 1
    bad = bytearray(gz)
    bad[offsets[1] + 20] ^= 0xFF
    salvaged = parse_warc_gz_bytes(bytes(bad), strict=False)
    assert [r["warc_type"] for r in salvaged] == ["warcinfo"]


def test_parse_warc_gz_multi_record_member_tolerated():
    """Spec says one record per member, but a whole-file-gzipped WARC
    (one giant member) must still parse — all records share offset 0."""
    from defimap_data_pipelines_spark.sources.warc import (
        gzip_member_bytes,
        parse_warc_auto,
    )

    whole = gzip_member_bytes(_fixture_warc())
    recs = parse_warc_auto(whole)
    assert len(recs) == 3
    assert all(r["record_offset"] == 0 for r in recs)


# ---------------------------------------------------------------------------
# persisted model artifacts (pipelines/models.py)
# ---------------------------------------------------------------------------


def test_centroid_roundtrip_bitexact_and_identical_assignments(
    spark, tmp_path, sf_dir
):
    from defimap_data_pipelines_spark.operators.clustering import (
        assign_clusters,
        kmeans_fit,
        update_centroids,
    )
    from defimap_data_pipelines_spark.pipelines.models import ModelStore
    from defimap_data_pipelines_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    fitted = update_centroids(
        kmeans_fit(emb, k=4, iters=1, keep_vec=True)
    )
    store = ModelStore(str(tmp_path / "models"))
    store.save_centroids(fitted, "cb")
    loaded = store.load_centroids(spark, "cb")
    orig = {r.cluster: r.c for r in fitted.collect()}
    back = {r.cluster: r.c for r in loaded.collect()}
    assert orig == back  # bit-exact doubles through parquet
    a = sorted(
        (r.vec_id, r.cluster) for r in assign_clusters(v, fitted).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster) for r in assign_clusters(v, loaded).collect()
    )
    assert a == b


def test_bloom_roundtrip_and_validation(spark, tmp_path):
    from defimap_data_pipelines_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_K,
        bloom_build,
    )
    from defimap_data_pipelines_spark.pipelines.models import ModelStore

    keys = spark.range(300).select(
        F.concat(F.lit("tok"), F.col("id")).alias("tok")
    )
    words = bloom_build(keys, "tok")
    store = ModelStore(str(tmp_path / "models"))
    store.save_bloom(spark, words, "bl", BLOOM_BITS, BLOOM_K)
    loaded, bits, k = store.load_bloom(spark, "bl")
    assert loaded == words and bits == BLOOM_BITS and k == BLOOM_K
    with pytest.raises(Exception):
        store.load_bloom(spark, "missing")


def test_cms_roundtrip_identical_estimates(spark, tmp_path):
    from defimap_data_pipelines_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )
    from defimap_data_pipelines_spark.pipelines.models import ModelStore

    toks = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 37)).alias("token")
    )
    counters = cms_counters(toks)
    store = ModelStore(str(tmp_path / "models"))
    store.save_cms(counters, "cms", depth=4, width=1024)
    loaded, depth, width = store.load_cms(spark, "cms")
    assert (depth, width) == (4, 1024)
    probes = spark.createDataFrame([("t0",), ("t5",)], "token string")
    a = sorted(map(tuple, cms_estimate(counters, probes).collect()))
    b = sorted(map(tuple, cms_estimate(loaded, probes).collect()))
    assert a == b


def test_fit_or_load_skips_refit(spark, tmp_path):
    from defimap_data_pipelines_spark.pipelines.models import (
        ModelStore,
        fit_or_load_frame,
    )

    store = ModelStore(str(tmp_path / "models"))
    calls = []

    def fit():
        calls.append(1)
        return spark.createDataFrame([(1, 2.0)], "cluster int, v double")

    first = fit_or_load_frame(store, spark, "art", fit)
    second = fit_or_load_frame(store, spark, "art", fit)
    assert len(calls) == 1  # second call loaded, did not refit
    assert first.collect() == second.collect()


def test_read_warc_mixed_plain_and_gz_directory(spark, tmp_path):
    from defimap_data_pipelines_spark.sources.warc import read_warc

    gz, _ = _fixture_warc_gz()
    (tmp_path / "seg0.warc").write_bytes(_fixture_warc())
    (tmp_path / "seg1.warc.gz").write_bytes(gz)
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 6
    binary = [r for r in rows
              if r.content_type == "application/octet-stream"]
    assert len(binary) == 2
    assert all(bytes(r.payload) == bytes(range(256)) * 4 for r in binary)


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------


def test_kmv_estimate_accuracy_and_exact_small_groups(spark):
    from defimap_data_pipelines_spark.operators.sketches import (
        kmv_distinct_by,
    )

    # group "big": 5000 distinct keys (sketch path, k=256);
    # group "small": 40 distinct keys (exact path)
    big = spark.range(5000).select(
        F.lit("big").alias("g"), F.col("id").alias("k")
    )
    small = spark.range(40).select(
        F.lit("small").alias("g"), (F.col("id") + 900000).alias("k")
    )
    # duplicates must not shift the estimate (DISTINCT hash set)
    dupes = big.limit(1000)
    out = {
        r.g: (r.kmv_estimate, r.n_kept)
        for r in kmv_distinct_by(
            big.unionByName(small).unionByName(dupes), "g", "k"
        ).collect()
    }
    assert out["small"] == (40.0, 40)
    est, kept = out["big"]
    assert kept == 256
    # k=256 -> std error ~1/sqrt(254) ~ 6.3%; 20% is a 3-sigma guard
    assert abs(est - 5000) / 5000 < 0.20, est


def test_kmv_sketches_merge(spark):
    """Union of two days' kept-hash sets, re-taking the k minima,
    must equal the sketch of the union — the mergeability property
    that makes KMV a rollup primitive."""
    from defimap_data_pipelines_spark.operators.sketches import (
        kmv_distinct_by,
        kmv_hash,
    )

    k = 64
    day1 = spark.range(2000).select(
        F.lit("g").alias("g"), F.col("id").alias("key")
    )
    day2 = spark.range(1500, 3500).select(
        F.lit("g").alias("g"), F.col("id").alias("key")
    )
    both = kmv_distinct_by(day1.unionByName(day2), "g", "key", k=k)
    merged_hashes = (
        day1.select(kmv_hash(F.col("key")).alias("h"))
        .unionByName(day2.select(kmv_hash(F.col("key")).alias("h")))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    u_k = max(r.h for r in merged_hashes.collect())
    est_merged = (k - 1) / u_k
    est_direct = both.collect()[0].kmv_estimate
    assert abs(est_merged - est_direct) < 1e-9


# ---------------------------------------------------------------------------
# Z-order layout
# ---------------------------------------------------------------------------


def test_z_value_is_a_bijection_on_the_grid(spark):
    from defimap_data_pipelines_spark.operators.zorder import z_value

    n = 64  # 6 bits/dim
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    z = grid.select(z_value("x", "y", 6).alias("z"))
    stats = z.agg(
        F.countDistinct("z").alias("d"),
        F.min("z").alias("mn"),
        F.max("z").alias("mx"),
    ).collect()[0]
    assert (stats.d, stats.mn, stats.mx) == (n * n, 0, n * n - 1)


def test_zorder_buckets_cover_tight_squares(spark):
    """On a full 128x128 grid, each aligned z-bucket of 2^10 codes is
    exactly one 32x32 square — the rectangle-tightness invariant that
    makes min/max pruning work on BOTH dimensions."""
    from defimap_data_pipelines_spark.operators.zorder import z_value

    n = 128
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    z = grid.select("x", "y", z_value("x", "y", 7).alias("z"))
    rects = (
        z.groupBy(F.expr("z div 1024").alias("b"))
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    )
    assert len(rects) == 16
    for r0 in rects:
        assert r0.c == 1024
        assert (r0.x1 - r0.x0 + 1, r0.y1 - r0.y0 + 1) == (32, 32)


def test_zorder_layout_files_beat_single_column_sort(spark):
    """The measured point of the operator: range-partitioning on the
    Morton code gives every file a bounded (x, y) rectangle, while a
    plain x-sort leaves y unconstrained (full-range y in every file)."""
    from defimap_data_pipelines_spark.operators.zorder import (
        zorder_file_stats,
        zorder_layout,
    )

    n = 128
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    laid = zorder_layout(grid, "x", "y", n_files=16, bits=7)
    stats = zorder_file_stats(laid, "x", "y").collect()
    assert sum(r.n_rows for r in stats) == n * n
    area = sum(
        (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) for r in stats
    )
    # x-sorted baseline: 16 files x (8 x-values * full y range) = n*n
    # per file rectangle-area totalling 16*128*8 = n*n... each file's
    # y span is the FULL 128. Z-order files straddle at most a few
    # quadrants: total rectangle area stays within 4x the data area,
    # vs 8x-128x for one-dimensional sorts when predicates hit y.
    assert area <= 4 * n * n, area
    worst_y_span = max(r.y_max - r.y_min + 1 for r in stats)
    assert worst_y_span <= n // 2, worst_y_span


# ---------------------------------------------------------------------------
# curation-state persistence (resume from disk, not memory)
# ---------------------------------------------------------------------------


def test_curation_state_survives_parquet_roundtrip(spark, tmp_path, sf_dir):
    """Batch 1 -> SAVE state to parquet -> LOAD -> batch 2 must equal
    cure-from-scratch — the durable twin of
    test_incremental_clean_corpus_equals_batch, proving a daily job
    can resume from disk without re-reading historical text."""
    from defimap_data_pipelines_spark.operators.corpus import (
        CurationState,
        clean_corpus,
        clean_corpus_incremental,
    )
    from defimap_data_pipelines_spark.pipelines.models import ModelStore

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    batch = {r.doc_id for r in clean_corpus(docs).select("doc_id").collect()}

    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    cut = ids[len(ids) // 2]
    store = ModelStore(str(tmp_path / "models"))

    _, state = clean_corpus_incremental(
        docs.filter(F.col("doc_id") < cut), None
    )
    state.save(store)
    del state  # everything batch 2 sees comes from parquet

    reloaded = CurationState.load(store, spark)
    survivors, _ = clean_corpus_incremental(
        docs.filter(F.col("doc_id") >= cut), reloaded
    )
    inc = {r.doc_id for r in survivors.collect()}
    assert inc == batch, (
        f"{len(inc)} vs {len(batch)}; "
        f"only-inc={sorted(inc - batch)[:5]} "
        f"only-batch={sorted(batch - inc)[:5]}"
    )


# ---------------------------------------------------------------------------
# Gopher repetition rules
# ---------------------------------------------------------------------------


def test_gopher_repetition_closed_forms(spark):
    from defimap_data_pipelines_spark.operators.textops import (
        gopher_repetition,
    )

    docs = spark.createDataFrame(
        [
            # "spam ham " * 30 -> one dominant bigram
            (1, ("spam ham " * 30).strip()),
            # varied text, no repeated 3-gram (long enough that one
            # bigram stays under the 20% coverage threshold)
            (2, "the quick brown fox jumps over a lazy dog near town "
                "while birds sing and rivers run through quiet green "
                "valleys under pale morning light"),
            # shorter than 2 tokens -> zero grams, zero ratios
            (3, "single"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_repetition(docs).collect()}
    assert len(out) == 4
    # doc 1: norm has 60 tokens alternating spam/ham; "spam ham"
    # occurs 30 times (8 chars each) out of 269 chars -> heavily
    # repeated, fails both rules
    r1 = out[1]
    assert r1.top2_chars == 30 * len("spam ham")
    assert not r1.passes_repetition
    assert r1.dup3_ppm > 300_000
    # doc 2: every gram unique -> dup3 = 0, top2 = one bigram's chars
    r2 = out[2]
    assert r2.dup3_chars == 0
    text2 = (
        "the quick brown fox jumps over a lazy dog near town "
        "while birds sing and rivers run through quiet green "
        "valleys under pale morning light"
    )
    w = text2.split()
    assert r2.top2_chars == max(
        len(a) + 1 + len(b) for a, b in zip(w, w[1:])
    )
    assert r2.passes_repetition
    # short/empty docs: all zeros, pass
    for d in (3, 4):
        assert (out[d].top2_chars, out[d].dup3_chars) == (0, 0)
        assert out[d].passes_repetition


def test_kmv_overlap_tracks_exact_jaccard(spark):
    """Two synthetic sources with known 1/3 shingle overlap: the KMV
    estimate must land within sketch error of the exact Jaccard."""
    from defimap_data_pipelines_spark.plans.queries import QUERIES

    # build a documents-shaped frame: sources X and Y share 1000 of
    # their 3000 distinct "shingle carriers" (each doc = unique text)
    import pandas as pd

    rows = []
    for i in range(2000):
        rows.append((i, f"alpha token{i} beta gamma{i} delta", "en", "X", 0))
    for i in range(1000, 3000):
        rows.append(
            (10_000 + i, f"alpha token{i} beta gamma{i} delta", "en", "Y", 0)
        )
    docs = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
        )
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        docs.write.parquet(f"{td}/documents.parquet")
        out = {
            (r.source_a, r.source_b): r.jaccard_est
            for r in QUERIES["kmv_source_overlap"](spark, td).collect()
        }
    est = out[("X", "Y")]
    # exact J: docs share ids 1000..1999 -> shared shingles; each doc
    # contributes 3 distinct 3-gram shingles, doc-unique except via
    # token{i}/gamma{i}, so J = 1000/3000
    assert abs(est - 1 / 3) < 0.10, est


# ---------------------------------------------------------------------------
# exact-arithmetic weighted sampling (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_draw_is_max_of_w_hashes(spark):
    import hashlib

    from defimap_data_pipelines_spark.operators.sampling import (
        weighted_sample,
    )

    docs = spark.createDataFrame(
        [(7, 3), (8, 1)], "doc_id long, weight long"
    )
    rows = {r.doc_id: r.draw
            for r in weighted_sample(docs, "doc_id", "weight", n=2).collect()}

    def u(key, j):
        return int(hashlib.md5(f"{key}|{j}".encode()).hexdigest()[:15], 16)

    assert rows[7] == max(u(7, j) for j in (1, 2, 3))
    assert rows[8] == u(8, 1)


def test_weighted_sample_favors_heavy_rows_and_clamps(spark):
    from defimap_data_pipelines_spark.operators.sampling import (
        weighted_sample,
    )

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, F.lit(8)).otherwise(F.lit(1)).alias("w"),
    )
    got = weighted_sample(docs, "doc_id", "w", n=100).collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    # E[heavy] ~ 88 of 100 under 8:1 odds; 70 is a deep-tail guard
    assert heavy >= 70, heavy
    # zero/negative weights clamp to 1, not a descending sequence
    weird = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 1)], "doc_id long, w long"
    )
    out = weighted_sample(weird, "doc_id", "w", n=3).collect()
    assert len(out) == 3 and all(r.draw > 0 for r in out)


# ---------------------------------------------------------------------------
# adaptive (CMS-detected) skew join
# ---------------------------------------------------------------------------


def test_adaptive_salted_join_equals_plain_join_and_salts_hot(spark):
    from defimap_data_pipelines_spark.operators.skew import (
        adaptive_salted_join,
    )

    # one white-hot key (0: 5000 rows) + 200 cold keys (5 rows each)
    hot = spark.range(5000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(1000).select(
        (F.col("id") % 200 + 1).alias("k"), F.col("id").alias("v")
    )
    big = hot.unionByName(cold)
    dim = spark.range(201).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("attr")
    )
    out = adaptive_salted_join(big, dim, "k", buckets=8, hot_threshold=1000)
    direct = big.join(dim, "k")
    a = sorted(map(tuple, out.select("k", "v", "attr").collect()))
    b = sorted(map(tuple, direct.select("k", "v", "attr").collect()))
    assert a == b and len(a) == 6000
    # the hot key really spreads: its rows occupy >1 salt bucket
    from defimap_data_pipelines_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    est = cms_estimate(
        cms_counters(big.select(F.col("k").alias("token")),
                     depth=4, width=1024),
        dim.select(F.col("k").alias("token")),
        depth=4, width=1024,
    )
    hot_keys = {r.token for r in est.filter(
        F.col("cms_estimate") >= 1000).collect()}
    assert 0 in hot_keys  # CMS one-sided error: the hot key is found
    assert len(hot_keys) < 20  # and cold keys mostly stay cold


# ---------------------------------------------------------------------------
# overlapping document chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_coverage_and_overlap(spark):
    from defimap_data_pipelines_spark.operators.textops import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(150))),  # 3 chunks
            (2, " ".join(f"w{i}" for i in range(64))),   # exactly one
            (3, "short doc"),                            # one partial
        ],
        "doc_id long, text string",
    )
    rows = sorted(
        (r.doc_id, r.chunk_id, r.n_chunk_tokens)
        for r in chunk_documents(docs, size=64, stride=48).collect()
    )
    # doc 1: chunks at offsets 0/48/96 -> sizes 64, 64, 54;
    # coverage: last chunk reaches token 149; overlap = 16
    assert [t for t in rows if t[0] == 1] == [
        (1, 0, 64), (1, 1, 64), (1, 2, 54)
    ]
    assert [t for t in rows if t[0] == 2] == [(2, 0, 64)]
    assert [t for t in rows if t[0] == 3] == [(3, 0, 2)]


# ---------------------------------------------------------------------------
# BPE encode (the apply half)
# ---------------------------------------------------------------------------


def test_bpe_encode_lossless_priority_and_counts(spark):
    from defimap_data_pipelines_spark.operators.textops import bpe_encode

    docs = spark.createDataFrame(
        [(1, "abc abab banana"), (2, "zzz")],
        "doc_id long, text string",
    )
    # rank 0 beats rank 1 even though both match "abc"
    merges = [("a", "b"), ("ab", "c"), ("a", "n"), ("b", "an")]
    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    import hashlib

    # abc -> [ab, c] -> [abc]; abab -> [ab, ab];
    # banana -> b,an,an,a -> b|an|an|a (no (an,an)/(b,an-first) rule:
    # (b,an) merges the FIRST adjacent pair) -> ban|an|a
    expect_words = ["abc", "ab|ab", "ban|an|a"]
    stream = " ".join(expect_words)
    assert out[1].tokens_md5 == hashlib.md5(stream.encode()).hexdigest()
    assert out[1].n_words == 3
    assert out[1].n_tokens == 1 + 2 + 3
    # no applicable merges: pure chars, lossless
    assert out[2].n_tokens == 3
    assert out[2].tokens_md5 == hashlib.md5(b"z|z|z").hexdigest()


def test_bpe_encode_registered_query_runs(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import QUERIES

    out = QUERIES["bpe_encode"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 500
    # merging can only reduce token counts below char counts
    assert all(r.n_tokens >= r.n_words for r in rows)
    assert all(len(r.tokens_md5) == 32 for r in rows)


# ---------------------------------------------------------------------------
# snapshot diff (CDC without a change log)
# ---------------------------------------------------------------------------


def test_diff_snapshots_closed_forms_and_null_sentinels(spark):
    from defimap_data_pipelines_spark.pipelines.incremental import (
        diff_snapshots,
    )

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10),     # unchanged -> dropped
            (2, "B", 20),     # changed
            (3, "", 30),      # NULL -> '' must register as changed
            (5, "e", 50),     # added
        ],                    # 4 deleted
        "k long, s string, v long",
    )
    got = sorted(
        (r.k, r.change_type) for r in diff_snapshots(old, new, ["k"]).collect()
    )
    assert got == [
        (2, "changed"), (3, "changed"), (4, "deleted"), (5, "added")
    ]
    # compare_cols subset: v-only diff sees no change in row 2/3
    got_v = sorted(
        (r.k, r.change_type)
        for r in diff_snapshots(old, new, ["k"], compare_cols=["v"]).collect()
    )
    assert got_v == [(4, "deleted"), (5, "added")]


# ---------------------------------------------------------------------------
# robust stats: MAD outliers, sampled quantiles
# ---------------------------------------------------------------------------


def test_bottomk_sample_quantiles_accuracy_and_merge(spark):
    from defimap_data_pipelines_spark.operators.quantiles import (
        bottomk_sample_quantiles,
    )

    # uniform 0..99999 -> sample quantiles near the population's
    df = spark.range(100_000).select(
        F.col("id").alias("k"), F.col("id").cast("double").alias("v")
    )
    got = {
        r.q: r.quantile
        for r in bottomk_sample_quantiles(
            df, "k", "v", [0.1, 0.5, 0.9], k=2048
        ).collect()
    }
    for q, v in got.items():
        assert abs(v / 100_000 - q) < 0.05, (q, v)  # ~3/sqrt(2048)

    # merge property: bottom-k of (A ∪ B) == re-take k minima of the
    # two sides' bottom-k samples
    import hashlib

    a = list(range(0, 60_000))
    b = list(range(40_000, 100_000))

    def bott(ids, k):
        return sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i) for i in ids
        )[:k]

    whole = bott(range(100_000), 2048)
    merged = sorted(set(bott(a, 2048)) | set(bott(b, 2048)))[:2048]
    assert whole == merged


def test_mad_outliers_flags_planted_spikes(spark):
    from defimap_data_pipelines_spark.plans.queries import QUERIES
    import tempfile

    base = spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.lit("t").alias("event_type"),
        F.current_timestamp().alias("ts"),
        F.col("id").alias("user_id"),
        # tight cluster around 10 with 5 planted 1000x spikes
        F.when(F.col("id") < 5, F.lit(10_000.0))
        .otherwise(10.0 + (F.col("id") % 7).cast("double") / 10.0)
        .alias("value"),
        F.lit("{}").alias("props"),
    )
    with tempfile.TemporaryDirectory() as td:
        base.write.parquet(f"{td}/events.parquet")
        out = QUERIES["mad_outliers"](spark, td).collect()[0]
    assert out.n == 1000
    assert out.n_outliers == 5  # exactly the planted spikes
    assert abs(out.med - 10.3) < 0.5


# ---------------------------------------------------------------------------
# grouped k-means (one model per group, single pass)
# ---------------------------------------------------------------------------


def test_grouped_kmeans_single_group_matches_single_model(spark, sf_dir):
    """With one group, the join+min-struct formulation must pick the
    exact assignments of the literal-centroid single-model path."""
    from defimap_data_pipelines_spark.operators.clustering import (
        kmeans_fit,
        kmeans_fit_grouped,
    )
    from defimap_data_pipelines_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings").withColumn(
        "g1", F.lit(0)
    )
    single = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_fit(emb, k=4, iters=2).collect()
    }
    grouped = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_fit_grouped(emb, "g1", k=4, iters=1).collect()
    }
    # kmeans_fit(iters=2) = 2 assign+update rounds, final assignment is
    # the 2nd round's; kmeans_fit_grouped(iters=1) = 1 update round +
    # final assignment — the SAME trajectory point
    assert grouped == single


def test_grouped_kmeans_groups_are_independent(spark, sf_dir):
    """Fitting labels together must equal fitting each label alone —
    groups share passes, never state."""
    from defimap_data_pipelines_spark.operators.clustering import (
        kmeans_fit_grouped,
    )
    from defimap_data_pipelines_spark.sources.parquet import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    lab = sorted(r.label for r in emb.select("label").distinct().collect())[0]
    together = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_fit_grouped(emb, "label", k=3, iters=1)
        .filter(F.col("label") == lab)
        .collect()
    }
    alone = {
        r.vec_id: (r.cluster, r.dist)
        for r in kmeans_fit_grouped(
            emb.filter(F.col("label") == lab), "label", k=3, iters=1
        ).collect()
    }
    assert together == alone


# ---------------------------------------------------------------------------
# quantized EWMA (order-dependent recursion, oracle-able)
# ---------------------------------------------------------------------------


def test_ewma_quantized_closed_form_and_negative_trunc(spark):
    from defimap_data_pipelines_spark.operators.rolling import (
        ewma_quantized,
    )

    df = spark.createDataFrame(
        [(1, 1, 4.0), (1, 2, 2.0), (1, 3, -3.0), (2, 1, -1.0)],
        "k long, o long, v double",
    )
    got = {(r.k, r.o): r.ewma_q
           for r in ewma_quantized(df, "k", "o", "v").collect()}
    # micro-units: e1=4e6; e2=(2e6+4e6)/2=3e6; e3=(-3e6+3e6)/2=0
    assert got[(1, 1)] == 4_000_000
    assert got[(1, 2)] == 3_000_000
    assert got[(1, 3)] == 0
    assert got[(2, 1)] == -1_000_000
    # trunc-vs-floor: odd negative sums round toward zero
    df2 = spark.createDataFrame(
        [(9, 1, -0.000001), (9, 2, -0.000002)], "k long, o long, v double"
    )
    got2 = {r.o: r.ewma_q
            for r in ewma_quantized(df2, "k", "o", "v").collect()}
    # (-2 + -1) = -3; trunc(-3/2) = -1 (floor would give -2)
    assert got2[2] == -1


# ---------------------------------------------------------------------------
# deterministic label propagation
# ---------------------------------------------------------------------------


def test_label_propagation_two_cliques_converge(spark):
    from defimap_data_pipelines_spark.operators.graph import (
        label_propagation,
    )

    # two 5-cliques bridged by one weak edge: after 2 synchronous
    # rounds each clique coalesces on its min label; the bridge can't
    # outvote 4 internal neighbors
    edges = []
    for base in (0, 100):
        for a in range(5):
            for b in range(a + 1, 5):
                edges.append((base + a, base + b))
    edges.append((4, 100))
    df = spark.createDataFrame(edges, "src long, dst long")
    sym = df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = {r.node: r.label
              for r in label_propagation(sym, rounds=2).collect()}
    assert all(labels[n] == 0 for n in range(5))
    assert all(labels[100 + n] == 100 for n in range(5))
