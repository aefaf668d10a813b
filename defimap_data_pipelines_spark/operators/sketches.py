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

from pyspark.sql import Column, DataFrame
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
#: The filter travels as a bits/64-element array<bigint> LITERAL
#: (2048 longs) that constant-folds to one ArrayData with O(1)
#: element_at — NOT a hex string probed via substring(pos, 1), which
#: is O(position) per call (UTF8 character indexing) and measured 13×
#: slower (26 s vs 2 s at sf0.1; see bloom_probe's docstring). The
#: Janino 64 KB cliff applies to generated CODE, not folded constant
#: DATA, so thousands of array elements are safe.
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
) -> list[int]:
    """Aggregate a key set into a bloom bitset of bits/64 longs (bit b
    lives in word b//64 at in-word position b%64). The distributed
    part is one groupBy over word ids (at most bits/64 groups); like
    the k-means/IVF codebooks the result is small enough to inline as
    a plan literal so the probe is a pure projection."""
    words = (
        keys.select(
            F.explode(
                F.array(
                    *[_bloom_bit(F.col(key_col), i, bits) for i in range(k)]
                )
            ).alias("bit")
        )
        .select(
            (F.col("bit") / 64).cast("int").alias("word"),
            # shiftleft's numBits arg must be a Column-in-SQL: the
            # PySpark helper only takes a literal int
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("m"))
    )
    got = {r["word"]: r["m"] for r in words.collect()}
    return [got.get(w, 0) for w in range(bits // 64)]


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: list[int],
    out: str = "bloom_hit",
    bits: int = BLOOM_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership probe against an inlined bloom bitset: true iff ALL
    k bits are set, parsed as ONE SQL expression (the
    plan-construction lesson), zero shuffles.

    Representation lesson (measured at sf0.1): the bitset must be an
    array<bigint> LITERAL — all 2048 elements are foldable, so
    Catalyst's ConstantFolding collapses the CreateArray into a single
    ArrayData constant and element_at is O(1). The tempting hex-STRING
    constant is quadratic poison instead: substring() on a UTF8String
    is O(position) (character indexing scans bytes), so probing a
    32 KB string literal cost ~26 s where this form costs ~2 s. And
    per-element Column construction (2048 F.lit calls) would pay the
    usual py4j tax — one parsed string, folded once, is the shape."""
    assert len(bloom) == bits // 64
    arr = "array(" + ",".join(f"{w}L" for w in bloom) + ")"
    checks = []
    for i in range(k):
        bit = (
            f"CAST(conv(substring(md5(concat_ws('|', '{i}', `{key_col}`)),"
            f" 1, 8), 16, 10) AS BIGINT) % {bits}"
        )
        checks.append(
            f"(shiftright(element_at({arr}, CAST(({bit}) DIV 64 AS INT) + 1),"
            f" CAST(({bit}) % 64 AS INT)) & 1L) = 1L"
        )
    return df.withColumn(out, F.expr(" AND ".join(checks)))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct-count sketch — the oracle-able
# alternative to HyperLogLog
# ---------------------------------------------------------------------------

#: 2^60: kmv_hash keeps 15 md5 hex chars = 60 uniform bits. Fits a
#: BIGINT exactly, so both engines parse the identical integer before
#: the one double division.
KMV_SPACE = float(1 << 60)

KMV_K = 256


def kmv_hash(key) -> Column:
    """Uniform [0,1) hash of ``key``: first 60 md5 bits / 2^60. The
    md5-replay determinism contract (operators/sampling.py) — DuckDB
    computes the bit-identical double from the same hex substring, so
    a SKETCH becomes value-hash-checkable, which approx_count_distinct
    (HLL, engine-private registers) never is."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        / F.lit(KMV_SPACE)
    )


def kmv_hash_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`kmv_hash`."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))"
        f"::BIGINT / {KMV_SPACE!r})"
    )


def kmv_distinct_by(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group approximate distinct count with exact-arithmetic
    determinism: keep each group's k smallest distinct key hashes;
    estimate = (k-1)/u_k where u_k is the k-th smallest (exact count
    when the group holds fewer than k distinct keys).

    Scale shape: ONE shuffle — distinct (group, hash) pairs partially
    aggregate map-side, then a rank window per group keeps k rows.
    The sketch per group is k doubles regardless of group size, and
    sketches MERGE (union the hash sets, re-take the k smallest), so
    partial sketches from daily partitions roll up without rescanning
    history — the property that makes KMV a warehouse primitive.
    Estimator: Beyer et al., "On Synopses for Distinct-Value
    Estimation Under Multiset Operations" (SIGMOD'07), unbiased
    (k-1)/u_k form.
    """
    from pyspark.sql import Window

    h = (
        df.select(F.col(group_col).alias("g"), kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("h")
    ranked = h.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return ranked.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.max("h").alias("u_k"),
    ).select(
        F.col("g").alias(group_col),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise((F.lit(float(k - 1))) / F.col("u_k"))
        .alias("kmv_estimate"),
        "n_kept",
    )


def ams_hash_bits(key) -> Column:
    """60-bit integer from one md5 of ``key`` (the kmv_hash parse) —
    each bit is an independent ±1 sign source for AMS estimators.
    ONE md5 + ONE hex parse per row regardless of estimator count;
    deriving 16 signs from 16 separate md5 calls measured ~6x slower
    at sf0.1 (7.6 s -> 1.3 s min-of-3 after this change).
    """
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def ams_sign(bits: Column, j: int) -> Column:
    """±1 sign for estimator ``j``: bit j of the shared hash word."""
    return 2 * F.shiftright(bits, j).bitwiseAND(F.lit(1)) - 1


def ams_hash_bits_sql(key_expr: str) -> str:
    """DuckDB twin of :func:`ams_hash_bits`."""
    return (
        f"(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 15))"
        "::BIGINT)"
    )


def ams_sign_sql(bits_expr: str, j: int) -> str:
    """DuckDB twin of :func:`ams_sign`."""
    return f"(2 * ((({bits_expr}) >> {j}) & 1) - 1)"


def ams_f2(
    df: DataFrame,
    key_col: str,
    estimators: int = 16,
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy,
    STOC'96): F2 = sum over keys of count^2 — the self-join size, the
    number every join planner wants before it commits to a shuffle.

    Each estimator j keeps ONE counter: Y_j = (sum over ROWS of
    s_j(key))^2, where s_j is a ±1 hash sign. E[Y_j] = F2 exactly,
    and crucially the inner sum needs NO per-key groupBy — the
    sketch collapses the heaviest aggregation in the engine into k
    scan-side integer expressions in a single agg. Zero shuffles
    beyond the scalar collect; at 100 TB this is one pass with a
    k-int state, merging across partitions by addition (linear
    sketch, same mergeability as CMS).

    Everything is exact int64 (signs are ±1, sums and squares of
    sums), so the estimate replays bit-for-bit in the oracle. The
    estimate is the mean of the k squares; relative error ~
    sqrt(2/estimators) (35% at k=16 — this is a planner hint, not an
    accountant; raise k quadratically for precision). All k signs
    slice out of ONE md5 word per row (estimators <= 60).

    Returns one row: (estimators, f2_est, f2_exact, rel_err) — the
    exact F2 is computed alongside (one groupBy) so the query itself
    certifies the estimate, the same est-vs-exact contract as
    kmv_distinct.
    """
    if not 1 <= estimators <= 60:
        raise ValueError("estimators must be in [1, 60] (md5 bits)")
    bitted = df.select(ams_hash_bits(F.col(key_col)).alias("_h"))
    sums = bitted.agg(
        *[
            F.sum(ams_sign(F.col("_h"), j)).cast("long").alias(f"_y{j}")
            for j in range(estimators)
        ]
    )
    # headroom (r8): each sign-sum y_j is ~n, so y_j^2 — and the
    # exact F2 sum(c^2) with one hot key — are ROWS-SQUARED-scaled:
    # both compute in decimal(38,0) (oracle: HUGEINT); f2_exact,
    # itself rows-squared, emits as double on both engines.
    y_total = None
    for j in range(estimators):
        sq = F.col(f"_y{j}").cast("decimal(38,0)") * F.col(f"_y{j}")
        y_total = sq if y_total is None else y_total + sq
    est = y_total.cast("double") / estimators
    exact = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
        .agg(
            F.sum(
                F.col("_c").cast("decimal(38,0)") * F.col("_c")
            ).alias("f2_exact")
        )
    )
    return (
        sums.crossJoin(F.broadcast(exact))
        .select(
            F.lit(estimators).cast("int").alias("estimators"),
            F.round(est, 6).alias("f2_est"),
            F.col("f2_exact").cast("double").alias("f2_exact"),
            F.round(
                F.abs(est - F.col("f2_exact").cast("double"))
                / F.col("f2_exact").cast("double"),
                9,
            ).alias("rel_err"),
        )
    )


def ams_sign_sums(
    df: DataFrame,
    key_col: str,
    estimators: int = 16,
) -> DataFrame:
    """Long-form AMS state: one (j, y) row per estimator with
    y_j = sum of ±1 signs over rows. This IS the sketch — linear in
    the data, so two states merge by summing y per j (the CMS-grid
    mergeability contract, k integers instead of a grid), which is
    what the streaming maintenance job persists.
    """
    if not 1 <= estimators <= 60:
        raise ValueError("estimators must be in [1, 60] (md5 bits)")
    bitted = df.select(ams_hash_bits(F.col(key_col)).alias("_h"))
    flat = bitted.agg(
        *[
            F.sum(ams_sign(F.col("_h"), j)).cast("long").alias(f"_y{j}")
            for j in range(estimators)
        ]
    )
    return flat.select(
        F.posexplode(
            F.array(*[F.col(f"_y{j}") for j in range(estimators)])
        ).alias("j", "y")
    ).select(F.col("j").cast("int").alias("j"), "y")


def ams_f2_from_sums(sums: DataFrame) -> DataFrame:
    """Close an (j, y) AMS state into the F2 estimate: mean of y^2."""
    return sums.agg(
        F.count(F.lit(1)).cast("int").alias("estimators"),
        F.round(
            F.sum(F.col("y") * F.col("y")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("f2_est"),
    )


def trailing_distinct_kmv(
    df: DataFrame,
    day_col: str,
    key_col: str,
    window_days: int = 7,
    k: int = 256,
) -> DataFrame:
    """Trailing-window distinct counts ("7-day active users per day")
    via MERGEABLE per-day KMV sketches — the sliding-sketch pattern
    that replaces the quadratic day-spine x history range join with
    k doubles per day.

    Per day: the k smallest distinct key hashes (one shuffle,
    partial-aggregated). Per trailing window: union the <= window * k
    hashes, re-take the k smallest (KMV's closure under union — the
    Beyer et al. SIGMOD'07 multiset-operations property), estimate
    (k-1)/u_k, exact when fewer than k distinct survive. All window
    math happens on the O(days) per-day frame; the raw table is
    scanned once.

    Every hash is the md5-replayable kmv_hash, so the ESTIMATE —
    not just the exact twin — is value-hash-checkable cross-engine.

    Calendar semantics: a RANGE frame over the integer day number
    (missing days do not silently stretch the window — the ROWS-frame
    bug every hand-rolled trailing metric ships once).

    Returns (day, exact_distinct, kmv_estimate, rel_err). The exact
    column runs the range join both engines can afford at test scale;
    at 100 TB drop it and keep the sketch — that asymmetry is the
    operator's reason to exist.
    """
    from pyspark.sql import Window

    pairs = df.select(
        F.col(day_col).alias("day"), F.col(key_col).alias("key")
    ).distinct().cache()  # feeds the sketch AND the exact twin
    hashed = pairs.select(
        "day",
        F.datediff(
            F.col("day"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("dnum"),
        kmv_hash(F.col("key")).alias("h"),
    )
    wday = Window.partitionBy("day").orderBy("h")
    per_day = (
        hashed.withColumn("_rn", F.row_number().over(wday))
        .filter(F.col("_rn") <= k)
        .groupBy("day", "dnum")
        .agg(F.sort_array(F.collect_list("h")).alias("arr"))
    )
    wtrail = Window.orderBy("dnum").rangeBetween(-(window_days - 1), 0)
    merged = per_day.withColumn(
        "ms",
        F.slice(
            F.array_sort(
                F.array_distinct(
                    F.flatten(F.collect_list("arr").over(wtrail))
                )
            ),
            1,
            k,
        ),
    )
    est = F.when(
        F.size(F.col("ms")) < k, F.size(F.col("ms")).cast("double")
    ).otherwise(
        F.lit(float(k - 1)) / F.element_at(F.col("ms"), k)
    )
    sketch = merged.select("day", "dnum", est.alias("kmv_estimate"))
    spine = per_day.select("day", "dnum")
    expairs = pairs.select(
        F.datediff(
            F.col("day"), F.lit("1970-01-01").cast("date")
        ).cast("long").alias("pnum"),
        "key",
    )
    exact = (
        spine.join(
            expairs,
            (F.col("pnum") >= F.col("dnum") - (window_days - 1))
            & (F.col("pnum") <= F.col("dnum")),
        )
        .groupBy("day")
        .agg(F.count_distinct(F.col("key")).cast("long").alias(
            "exact_distinct"
        ))
    )
    return (
        sketch.join(exact, "day")
        .select(
            "day",
            "exact_distinct",
            F.round("kmv_estimate", 9).alias("kmv_estimate"),
            F.round(
                F.abs(
                    F.col("kmv_estimate")
                    - F.col("exact_distinct").cast("double")
                )
                / F.col("exact_distinct"),
                9,
            ).alias("rel_err"),
        )
    )
