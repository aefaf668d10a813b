"""Deduplication operators for the documents table (engine extension:
LLM-training-data pipeline, 100 TB posture).

- exact_dedup: hash-groupBy on the normalized-text fingerprint. One
  shuffle on the hash; at scale the fingerprint is computed scan-side
  and the groupBy is the only wide stage.
- ngram_jaccard_pairs: EXACT near-dup pairs via distinct word-shingle
  inverted index self-join — the scalable exact formulation
  (shingle -> docs postings; pairs only materialize for docs sharing a
  shingle). Intersections/unions are integer counts, so results are
  engine-reproducible.
- minhash_lsh_candidates: the approximate scale path. Per doc: k minhash
  values (xxhash64 with k salts over distinct shingles), banded into
  b bands; docs sharing a band bucket become candidates; candidates are
  verified with exact Jaccard. At 100 TB the band-bucket join replaces
  the quadratic blowup with collision groups.
- simhash64: 64-bit simhash from token hashes; near-dups = pairs within
  Hamming distance d (joined on rotated prefix buckets).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.functions.text import fingerprint, word_shingles


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (normalized) documents.

    Returns (fingerprint, canonical_id, n_dups); canonical = min doc_id.
    """
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, _sh: array<string>) distinct word n-grams per doc."""
    return docs.select(
        "doc_id", word_shingles(F.col(text_col), n).alias("_sh")
    )


def shingle_postings(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) postings with distinct shingles per doc."""
    return docs.select(
        "doc_id", F.explode(word_shingles(F.col(text_col), n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (doc_a < doc_b).

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct word n-grams.

    Candidate generation uses PREFIX FILTERING (Chaudhuri et al. /
    PPJoin family): order each doc's shingles by global document
    frequency ascending; two docs with jaccard >= t MUST collide within
    their first |d| - ceil(t*|d|) + 1 shingles. Joining only the
    prefixes removes the frequent-shingle quadratic blowup; candidates
    are then verified exactly with array_intersect. Result-identical to
    the naive full inverted-index join.
    """
    sh = shingles if shingles is not None else doc_shingles(docs, text_col, n).cache()
    post = sh.select("doc_id", F.explode("_sh").alias("shingle"))
    freq = post.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))

    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    sizes = post.groupBy("doc_id").agg(F.count(F.lit(1)).alias("nsh"))
    prefix_len = F.col("nsh") - F.ceil(F.lit(threshold) * F.col("nsh")) + 1
    prefix = (
        post.join(freq, "shingle")
        .join(F.broadcast(sizes), "doc_id")
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= prefix_len)
        .select("doc_id", "shingle")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    staged = (
        cand.join(
            F.broadcast(
                sh.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sa"))
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sh.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sb"))
            ),
            "doc_b",
        )
        # size-ratio prefilter: jaccard>=t implies t*max(|a|,|b|) <= min
        .filter(
            (F.size("_sa") >= F.lit(threshold) * F.size("_sb"))
            & (F.size("_sb") >= F.lit(threshold) * F.size("_sa"))
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("_ni"),
            F.size("_sa").alias("_na"),
            F.size("_sb").alias("_nb"),
        )
    )
    jac = staged.select(
        "doc_a",
        "doc_b",
        (
            F.col("_ni") / (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("double")
        ).alias("jaccard"),
    )
    return jac.filter(F.col("jaccard") >= threshold)


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, sig: array<bigint>) minhash signatures.

    h_i(shingle) = xxhash64(shingle, salt_i); sig[i] = min over the
    doc's distinct shingles. Entirely per-row JVM expressions
    (transform + array_min) — zero shuffle; the scan parallelizes the
    whole computation.
    """
    # explode once, aggregate num_hashes mins: map-side partial
    # aggregation collapses to |docs| * num_hashes before the shuffle.
    # (A per-row transform() formulation looks cheaper but Catalyst's
    # projection collapse re-inlines the shingle array into all 64
    # lambdas — 30x slower in practice.)
    src = shingles if shingles is not None else doc_shingles(docs, text_col, n)
    sh = src.select("doc_id", F.explode("_sh").alias("shingle"))
    aggs = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"_h{i}")
        for i in range(num_hashes)
    ]
    return (
        sh.groupBy("doc_id")
        .agg(*aggs)
        .select(
            "doc_id",
            F.array(*[F.col(f"_h{i}") for i in range(num_hashes)]).alias("sig"),
        )
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs via MinHash+LSH banding, verified with exact
    Jaccard (returns doc_a, doc_b, jaccard >= threshold).

    rows-per-band r = num_hashes/bands; candidate iff some band's
    signature slice matches exactly (hash-join on (band, band_hash)).
    """
    r = num_hashes // bands
    sigs = minhash_signatures(docs, text_col, n, num_hashes, shingles=shingles)
    band_ids = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                band_ids,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(",", F.slice(F.col("sig"), b * r + 1, r)), b
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    left = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    right = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    cand = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    # verify candidates with exact jaccard: join the two shingle arrays
    # onto each candidate pair and intersect per-row (no re-shuffle of
    # the postings index; candidates are a small fraction of pairs)
    sh = shingles if shingles is not None else doc_shingles(docs, text_col, n)
    staged = (
        cand.join(
            F.broadcast(
                sh.select(F.col("doc_id").alias("doc_a"), F.col("_sh").alias("_sa"))
            ),
            "doc_a",
        )
        .join(
            F.broadcast(
                sh.select(F.col("doc_id").alias("doc_b"), F.col("_sh").alias("_sb"))
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("_sa", "_sb")).alias("_ni"),
            F.size("_sa").alias("_na"),
            F.size("_sb").alias("_nb"),
        )
    )
    verified = staged.select(
        "doc_a",
        "doc_b",
        (
            F.col("_ni") / (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("double")
        ).alias("jaccard"),
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document from whitespace-token xxhash64s.

    bit_j(sig) = 1 iff sum over tokens of sign(bit_j(h(token))) > 0.
    Stays JVM-side: explode tokens -> per-bit +-1 contributions via
    bit arithmetic -> groupBy sum -> reassemble.
    """
    from defimap_data_pipelines_spark.functions.text import ws_tokens

    toks = docs.select(
        "doc_id", F.explode(ws_tokens(F.col(text_col))).alias("tok")
    )
    h = F.xxhash64("tok")
    # literal 64-expr array: shift amounts must be Python ints
    bit_contribs = F.array(
        *[
            F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            for j in range(64)
        ]
    )
    exploded = toks.select("doc_id", F.posexplode(bit_contribs).alias("j", "c"))
    bits = exploded.groupBy("doc_id", "j").agg(F.sum("c").alias("s"))
    return bits.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius.

    Block on 16-bit chunks (pigeonhole: d<=3 pairs share at least one of
    4 chunks), then verify the Hamming distance with bit_count.
    """
    sigs = simhash64(docs, text_col)
    blocked = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("chunk"),
                        F.shiftright(F.col("simhash"), k * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("ck"),
    ).select("doc_id", "simhash", "ck.chunk", "ck.key")
    a = blocked.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"), "chunk", "key"
    )
    b = blocked.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"), "chunk", "key"
    )
    pairs = (
        a.join(b, ["chunk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
