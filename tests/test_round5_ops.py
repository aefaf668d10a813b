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
