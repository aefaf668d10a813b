"""Count-min sketch over token streams (engine extension).

The HLL query (plans/queries.py::hll_distinct_users) covers distinct
counting; this module adds the FREQUENCY sketch: a count-min sketch
whose (depth x width) counter grid is built with one map-side-combined
groupBy, answering point frequency queries with the classic
``min over depth rows`` upper bound. Hash functions are md5-derived
(the repo's cross-engine determinism rule — memory:
spark-plan-construction-costs / build-loop-workflow), so the whole
sketch, including its collision errors, replays exactly in a DuckDB
oracle.

At 100 TB: the token stream never materializes per-token rows beyond
the exploded scan; the sketch itself is depth*width counters (KBs),
so estimation joins broadcast. This is how you answer "how often does
this n-gram appear corpus-wide" for millions of probes without a
second corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 64


def _cms_bucket(token, row: int, width: int):
    """Row-``row`` bucket: first 8 md5 hex chars of ``row|token``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(row)), token)), 1, 8
        ),
        16,
        10,
    )
    return (h.cast("long") % width).cast("int")


def cms_bucket_sql(token_expr: str, row: int, width: int = WIDTH) -> str:
    """DuckDB twin of :func:`_cms_bucket` for oracle SQL."""
    return (
        f"CAST(('0x' || substr(md5('{row}|' || {token_expr}), 1, 8))::BIGINT"
        f" % {width} AS INTEGER)"
    )


def cms_counters(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) counters from a token stream
    (one input row per token OCCURRENCE — or, with ``weight_col``, one
    row per DISTINCT token carrying its occurrence count: the cell
    sums are identical, so a pipeline that already aggregated exact
    counts feeds the pre-reduced frame and skips a second corpus
    pass). One explode to ``depth`` (row, bucket) cells per input row,
    one map-side-combined groupBy; output is at most depth*width rows
    regardless of corpus size."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = tokens.select(
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_bucket(F.col(token_col), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    )
    return cells.groupBy("rb.row", "rb.bucket").agg(
        F.sum("_w").cast("long").alias("c")
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``probes``: min over the sketch's
    depth rows of the probed cells. The sketch side is tiny (<=
    depth*width rows) and broadcasts; estimate >= true count always
    (one-sided error — the test pins both bounds)."""
    cells = probes.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_bucket(F.col(token_col), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(token_col, "rb.row", "rb.bucket")
    return (
        cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").cast("long").alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Bloom filter (set-membership sketch) — the decontamination scale path
# ---------------------------------------------------------------------------

#: 2^17 bits: at the tested corpus scales the bench shingle set loads
#: the filter to a few percent, so the k=3 false-positive rate is
#: ~1e-4 and the probe output is dominated by TRUE contamination.
#: The filter travels as a hex STRING literal (bits/4 chars = 32 KB)
#: — one string constant in the plan, NOT a bits/64-element array
#: literal, which at this size would flirt with Janino's 64 KB method
#: limit (the measured codegen cliff in functions/vector.py).
BLOOM_BITS = 131072
BLOOM_K = 3


def _bloom_bit(key, i: int, bits: int = BLOOM_BITS):
    """i-th bloom bit position of ``key``: md5-derived, like _cms_bucket."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(i)), key)), 1, 8
        ),
        16,
        10,
    )
    return (h.cast("long") % bits).cast("int")


def bloom_bit_sql(key_expr: str, i: int, bits: int = BLOOM_BITS) -> str:
    """DuckDB twin of :func:`_bloom_bit` for oracle SQL."""
    return (
        f"CAST(('0x' || substr(md5('{i}|' || {key_expr}), 1, 8))::BIGINT"
        f" % {bits} AS INTEGER)"
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> str:
    """Aggregate a key set into a bloom bitset, returned as a HEX
    string of bits/4 nibbles (bit b lives in nibble b//4 at in-nibble
    position b%4). The distributed part is one groupBy over nibble
    ids (at most bits/4 groups); the driver packs the nibble masks
    into the string — like the k-means/IVF codebooks, small enough to
    inline as a plan literal so the probe is a pure projection."""
    nibbles = (
        keys.select(
            F.explode(
                F.array(
                    *[_bloom_bit(F.col(key_col), i, bits) for i in range(k)]
                )
            ).alias("bit")
        )
        .select(
            (F.col("bit") / 4).cast("int").alias("nib"),
            F.expr("shiftleft(1, CAST(bit % 4 AS INT))").alias("mask"),
        )
        .groupBy("nib")
        .agg(F.bit_or("mask").alias("m"))
    )
    got = {r["nib"]: r["m"] for r in nibbles.collect()}
    return "".join(format(got.get(i, 0), "x") for i in range(bits // 4))


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: str,
    out: str = "bloom_hit",
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership probe against an inlined bloom bitset: true iff ALL
    k bits are set. The bitset is ONE string constant in the plan
    (32 KB at the default size — a single UTF8String, no per-element
    codegen), probed with substring+conv; parsed as one SQL
    expression (the plan-construction lesson), zero shuffles."""
    assert len(bloom) == bits // 4
    checks = []
    for i in range(k):
        bit = (
            f"CAST(conv(substring(md5(concat_ws('|', '{i}', `{key_col}`)),"
            f" 1, 8), 16, 10) AS BIGINT) % {bits}"
        )
        nib = (
            f"conv(substring('{bloom}',"
            f" CAST(({bit}) DIV 4 AS INT) + 1, 1), 16, 10)"
        )
        checks.append(
            f"(shiftright(CAST({nib} AS INT),"
            f" CAST(({bit}) % 4 AS INT)) & 1) = 1"
        )
    return df.withColumn(out, F.expr(" AND ".join(checks)))
