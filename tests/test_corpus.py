"""Corpus curation: connected components vs a python union-find oracle;
clean_corpus end-to-end invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.corpus import clean_corpus, dedup_clusters
from defimap_data_pipelines_spark.operators.dedup import ngram_jaccard_pairs
from defimap_data_pipelines_spark.sources.parquet import read_table


def test_dedup_clusters_match_union_find(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.35).cache()
    got = {
        r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()
    }

    # python union-find oracle
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    plist = [(r.doc_a, r.doc_b) for r in pairs.collect()]
    for a, b in plist:
        union(a, b)
    want = {x: find(x) for x in parent}
    # normalize roots to the min member of each component
    comp: dict[int, list[int]] = {}
    for x, r in want.items():
        comp.setdefault(r, []).append(x)
    want_min = {x: min(members) for r, members in comp.items() for x in members}
    assert got == want_min


def test_dedup_clusters_synthetic_chain(spark):
    """A chain a-b-c-d collapses to one component even though a and d
    never share an edge (transitivity)."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clean_corpus_invariants(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").cache()
    out = clean_corpus(
        docs, min_quality=0.3, jaccard_threshold=0.35, use_minhash=False
    ).cache()
    n_in, n_out = docs.count(), out.count()
    assert 0 < n_out < n_in
    # surviving set has no near-dup pair above threshold
    leftover = ngram_jaccard_pairs(out, threshold=0.35)
    assert leftover.count() == 0
    # idempotent: cleaning the cleaned corpus removes nothing
    again = clean_corpus(
        out, min_quality=0.3, jaccard_threshold=0.35, use_minhash=False
    )
    assert again.count() == n_out


def test_clean_corpus_with_injected_shingles_identical(spark, sf_dir):
    """Narrowing a full-corpus hashed-shingle frame to the survivors
    yields exactly the survivor-only pairs: clean_corpus(hashed=...)
    must return the same surviving doc set as the self-computed path."""
    from defimap_data_pipelines_spark.operators.corpus import clean_corpus
    from defimap_data_pipelines_spark.operators.dedup import (
        doc_shingles,
        hashed_shingles,
    )
    from defimap_data_pipelines_spark.sources.parquet import read_table

    docs = read_table(spark, sf_dir, "documents")
    base = {
        r.doc_id
        for r in clean_corpus(
            docs, min_quality=0.3, jaccard_threshold=0.35
        ).select("doc_id").collect()
    }
    injected = {
        r.doc_id
        for r in clean_corpus(
            docs,
            min_quality=0.3,
            jaccard_threshold=0.35,
            hashed=hashed_shingles(doc_shingles(docs)),
        ).select("doc_id").collect()
    }
    assert base == injected and len(base) > 0
