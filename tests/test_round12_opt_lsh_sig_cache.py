"""r12 optimization: cosine_pairs_lsh computes its plane-projection
signatures ONCE into a bounded cached frame shared by both self-join
sides. These tests pin that the cache changes nothing about the
output and that the registry releases what it registered."""

from __future__ import annotations

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.similarity import (
    cosine_pairs,
    cosine_pairs_lsh,
    release_lsh_sig_caches,
)


def _vectors(spark, n=40, dim=8):
    # two exact-duplicate clusters planted in deterministic noise
    rows = []
    for i in range(n):
        base = [((i * 7 + j * 3) % 11) / 11.0 + 0.1 for j in range(dim)]
        rows.append((i, base))
    rows.append((1000, rows[0][1]))  # twin of vec 0
    rows.append((1001, rows[1][1]))  # twin of vec 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_sig_cache_output_matches_exact_verifier(spark):
    v = _vectors(spark)
    got = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs_lsh(
            v, threshold=0.999, num_planes=6, num_tables=8, dim=8
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_pairs(v, threshold=0.999).collect()
    }
    # planted twins must be present, and LSH (exact verify) never
    # emits a pair the exhaustive path would not
    assert (0, 1000) in got and (1, 1001) in got
    assert got <= exact


def test_release_lsh_sig_caches_releases_registered(spark):
    v = _vectors(spark, n=10)
    release_lsh_sig_caches()  # drain anything left by other tests
    cosine_pairs_lsh(v, threshold=0.99, num_planes=6, dim=8).collect()
    assert release_lsh_sig_caches() >= 1
    # idempotent: nothing left to release
    assert release_lsh_sig_caches() == 0
