"""User-journey operators: multi-touch attribution and concurrency.

Completes the event-analytics family (sessionize / event_funnel /
top_event_paths in plans/queries.py): attribution answers "which
channel gets credit for this conversion", peak concurrency answers
"how many sessions were live at the worst moment" — the capacity-
planning number a per-hour rollup undercounts (a session wholly
inside an hour never shows in hourly actives).

Both are exact-integer by construction: attribution splits 10000
basis points per conversion with a largest-remainder rule (so total
credit ALWAYS sums to 10000 x conversions — an auditable invariant,
not a float approximation), and the concurrency sweep is a +1/-1
prefix sum over integer microsecond timestamps.

Scale posture: attribution joins touches to conversions per user_id
(partition-friendly; the 7-day lookback bounds the per-conversion
fan-out). The sweep is two-level — endpoint deltas partition by DAY
for the running sum, and sessions that span midnight enter later
days as an O(spanning-sessions) carry-in aggregate — so no global
ordered window ever exists (the single-partition trap the naive
sweep-line falls into).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000


def attribute_linear(
    conversions: DataFrame,
    touches: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_col: str = "event_type",
    lookback_days: int = 7,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion splits 10000
    basis points equally across the user's touches in the preceding
    ``lookback_days`` (touch strictly before the conversion, within
    the window); a conversion with no touches credits the synthetic
    ``(direct)`` channel. Returns per-channel
    (channel, n_touches, credit_bp, conversions_credited).

    Integer-exact split: each touch gets 10000 div k, and the
    10000 mod k remainder goes one point each to the most RECENT
    touches (recency rank by ts desc, id desc — deterministic, and
    the sensible tie policy: later touches are closer to intent).
    sum(credit_bp) == 10000 * count(conversions) ALWAYS — assert it
    in tests, it's the operator's contract.
    """
    c = conversions.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_cus"),
        F.col(id_col).alias("_cid"),
    )
    t = touches.select(
        F.col(user_col).alias("_u"),
        F.unix_micros(F.col(ts_col)).alias("_tus"),
        F.col(id_col).alias("_tid"),
        F.col(channel_col).alias("_ch"),
    )
    lb = F.lit(lookback_days * US_PER_DAY)
    joined = c.join(
        t,
        (c["_u"] == t["_u"])
        & (t["_tus"] < c["_cus"])
        & (t["_tus"] >= c["_cus"] - lb),
        "left",
    ).select(c["_u"], "_cid", "_tus", "_tid", "_ch")
    wk = Window.partitionBy("_cid")
    wr = Window.partitionBy("_cid").orderBy(
        F.col("_tus").desc(), F.col("_tid").desc()
    )
    credited = joined.select(
        F.coalesce(F.col("_ch"), F.lit("(direct)")).alias("channel"),
        F.count("_tid").over(wk).alias("_k"),
        F.row_number().over(wr).alias("_rn"),
        F.col("_tid").isNotNull().alias("_is_touch"),
    ).withColumn(
        "credit_bp",
        F.when(F.col("_k") == 0, F.lit(10000)).otherwise(
            F.expr("10000 div _k")
            + F.when(F.col("_rn") <= F.expr("10000 % _k"), 1).otherwise(0)
        ).cast("long"),
    )
    return credited.groupBy("channel").agg(
        F.sum(F.when(F.col("_is_touch"), 1).otherwise(0))
        .cast("long")
        .alias("n_touches"),
        F.sum("credit_bp").alias("credit_bp"),
        F.round(F.sum("credit_bp").cast("double") / 10000.0, 9).alias(
            "conversions_credited"
        ),
    )


def peak_concurrency(
    sessions: DataFrame,
    start_col: str = "session_start_us",
    end_col: str = "session_end_us",
) -> DataFrame:
    """Per-day peak number of simultaneously-active sessions, from a
    sessions frame with integer-microsecond [start, end] inclusive
    bounds. Returns (day, carry_in, peak) with day as a DATE.

    Sweep line, two-level so it scales: each session emits +1 at
    start_us and -1 at end_us + 1 (half-open, so back-to-back
    sessions that share a boundary microsecond never double-count);
    deltas partition by calendar day, and a per-day running sum —
    ordered by (ts, delta) with -1 before +1, so the peak counts
    only truly-overlapping sessions — tracks the day's net live
    count. Sessions alive across a midnight contribute a
    constant carry-in to each later day they span, folded in as a
    plain aggregate. The daily peak is carry_in + max running sum
    (clamped below at the carry, for days whose first delta is a
    -1). Max-of-prefix is tie-order-independent: equal (ts, delta)
    keys form monotone runs, so the run's extreme is reached at its
    block edge whatever the intra-block order.
    """
    s = sessions.select(
        F.col(start_col).alias("_s"), (F.col(end_col) + 1).alias("_e")
    )
    deltas = s.select(
        F.col("_s").alias("ts"), F.lit(1).alias("d")
    ).unionAll(s.select(F.col("_e").alias("ts"), F.lit(-1).alias("d")))
    deltas = deltas.withColumn("day", F.expr(f"ts div {US_PER_DAY}"))
    # carry-in: a session [s, e) adds +1 to every day after its
    # start day up to and including its end day.
    spans = (
        s.select(
            F.expr(f"_s div {US_PER_DAY}").alias("d0"),
            F.expr(f"(_e - 1) div {US_PER_DAY}").alias("d1"),
        )
        .filter(F.col("d1") > F.col("d0"))
        .select(
            F.explode(
                F.sequence(F.col("d0") + 1, F.col("d1"))
            ).alias("day")
        )
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("carry_in"))
    )
    wrun = Window.partitionBy("day").orderBy("ts", "d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    daily = (
        deltas.withColumn("run", F.sum("d").over(wrun))
        .groupBy("day")
        .agg(F.max("run").cast("long").alias("peak_delta"))
    )
    # full outer: a day wholly inside one long session has carry-in
    # but no deltas at all — it must still report peak = carry_in.
    out = daily.join(spans, "day", "full").select(
        "day",
        F.coalesce("carry_in", F.lit(0)).cast("long").alias("carry_in"),
        F.greatest(
            F.coalesce("carry_in", F.lit(0)).cast("long"),
            F.coalesce("carry_in", F.lit(0)).cast("long")
            + F.coalesce("peak_delta", F.lit(0)),
        ).alias("peak"),
    )
    return out.select(
        F.date_add(F.lit("1970-01-01").cast("date"), F.col("day").cast("int")).alias("day"),
        "carry_in",
        "peak",
    )


def shapley_attribution(
    df: DataFrame,
    user_col: str,
    channel_col: str,
    conv_col,
    channels: list[str],
) -> DataFrame:
    """Exact Shapley-value channel attribution over exposure SETS:
    each user contributes their set of touched channels and a
    converted flag; coalition value v(S) = conversion rate of users
    whose exposure set is exactly S (0 for unobserved sets); the
    Shapley value of channel c averages its marginal contribution
    v(S+c) - v(S) over all orderings — the game-theoretic
    attribution that last-touch and linear (attribute_linear) only
    approximate. Returns (channel, shapley, share): shapley in
    conversion-probability units (their sum telescopes to
    v(all) - v(empty), the efficiency axiom the test pins), share
    the positive-part normalization marketers report.

    ``channels`` must be the sorted full channel list (max 16 — the
    2^k coalition frame is built with a literal range and k*2^(k-1)
    marginal pairs; at k = 16 that is 0.5M tiny rows, still nothing).
    The heavy part — per-user exposure masks — is one bit_or groupBy
    over raw events. Coalition rates ride as TRUNCATED nano-unit
    divisions (vq = conv*1e9 div users, engine-exact); factorial
    weights stay integer by deferring the /k! to the very end.
    """
    k = len(channels)
    if not 1 <= k <= 16:
        raise ValueError("channels must have 1..16 entries")
    bit = None
    for i, ch in enumerate(channels):
        term = F.when(F.col(channel_col) == ch, F.lit(1 << i))
        bit = term if bit is None else bit.when(
            F.col(channel_col) == ch, F.lit(1 << i)
        )
    bit = bit.otherwise(F.lit(0)).cast("long")
    users = (
        df.select(
            F.col(user_col).alias("u"),
            bit.alias("_b"),
            F.when(conv_col, 1).otherwise(0).cast("long").alias("_c"),
        )
        .groupBy("u")
        .agg(
            F.expr("bit_or(_b)").alias("mask"),
            F.max("_c").alias("conv"),
        )
        # units with NO touches are unattributable; keeping them
        # hands the empty coalition their (often perfect) conversion
        # rate and drags every marginal negative (measured at sf0.1:
        # purchase-only days made all four Shapley values < 0)
        .filter(F.col("mask") != 0)
    )
    vmask = users.groupBy("mask").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    spark = df.sparkSession
    coal = spark.range(1 << k).select(F.col("id").alias("s"))
    v = coal.join(
        vmask, coal["s"] == vmask["mask"], "left"
    ).select(
        "s",
        F.coalesce(
            F.expr("n_conv * 1000000000 div n_users"), F.lit(0)
        ).alias("vq"),
    )
    # factorial weights w(s) = |s|! * (k-1-|s|)!  (defer /k!)
    fact = [1] * (k + 1)
    for i in range(1, k + 1):
        fact[i] = fact[i - 1] * i
    warr = ", ".join(
        str(fact[s] * fact[k - 1 - s]) for s in range(k)
    )
    chan = spark.createDataFrame(
        [(i, ch) for i, ch in enumerate(channels)], "ci long, channel string"
    )
    pairs = (
        v.alias("lo")
        .crossJoin(F.broadcast(chan))
        .filter(F.expr("(lo.s & shiftleft(1, ci)) = 0"))
        .join(
            v.alias("hi"),
            F.expr("hi.s = lo.s + shiftleft(1, ci)"),
        )
        .select(
            "channel",
            (
                F.expr(f"element_at(array({warr}), "
                       "cast(bit_count(lo.s) + 1 as int))")
                * (F.col("hi.vq") - F.col("lo.vq"))
            ).alias("_w"),
        )
    )
    phi = pairs.groupBy("channel").agg(F.sum("_w").alias("_phi"))
    scale = float(fact[k]) * 1e9
    tot = phi.agg(
        F.sum(F.when(F.col("_phi") > 0, F.col("_phi")).otherwise(F.lit(0))).alias("_pos")
    )
    return (
        phi.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.round(F.col("_phi").cast("double") / scale, 9).alias(
                "shapley"
            ),
            F.round(
                F.when(F.col("_phi") > 0, F.col("_phi"))
                .otherwise(F.lit(0))
                .cast("double")
                / F.when(F.col("_pos") > 0, F.col("_pos")).cast(
                    "double"
                ),
                9,
            ).alias("share"),
        )
    )


def _journey_transitions(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_cols: list[str],
    conv_type: str,
) -> DataFrame:
    """(a, b, c): integer transition counts of the journey chain —
    start -> first touch, touch -> touch, touch -> conv at the FIRST
    ``conv_type`` event (the journey ends there), last touch -> null
    for never-converting users. One window pass per user."""
    w = Window.partitionBy("_u").orderBy(*[F.col(c) for c in ts_cols])
    base = events.select(
        F.col(user_col).alias("_u"),
        F.col(type_col).alias("_t"),
        *[F.col(c) for c in ts_cols],
    ).withColumn(
        "_nconv",
        F.sum(F.when(F.col("_t") == conv_type, 1).otherwise(0)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    # keep events up to and including the first conversion
    pre = base.filter(
        (F.col("_nconv") == 0)
        | ((F.col("_nconv") == 1) & (F.col("_t") == conv_type))
    )
    stepped = pre.withColumn("_prev", F.lag("_t").over(w)).withColumn(
        "_next", F.lead("_t").over(w)
    )
    steps = stepped.select(
        F.coalesce(F.col("_prev"), F.lit("start")).alias("a"),
        F.when(F.col("_t") == conv_type, F.lit("conv"))
        .otherwise(F.col("_t"))
        .alias("b"),
    )
    tails = stepped.filter(
        F.col("_next").isNull() & (F.col("_t") != conv_type)
    ).select(F.col("_t").alias("a"), F.lit("null").alias("b"))
    return (
        steps.unionAll(tails)
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def markov_removal_attribution(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_cols: list[str],
    conv_type: str,
    channels: list[str],
    rounds: int = 12,
    nano: int = 1_000_000_000,
) -> DataFrame:
    """Markov removal-effect attribution (the Anderl/Becker "Markov
    chain attribution" standard): model journeys as a first-order
    chain with absorbing states conv/null, compute the start->conv
    absorption probability by value iteration, then for each channel
    recompute it with that channel REMOVED (every hop into it
    redirected to null); the channel's credit is how much conversion
    collapses without it. Returns (channel, p_full, p_removed,
    removal_effect = 1 - p_removed/p_full, share) — share normalizes
    removal effects to 1 like the Shapley variant's.

    Removal = forcing V(channel) = 0 in the iteration (a redirected
    hop contributes the null state's zero value and row totals keep
    the mass). Everything integer: V rides nano units with truncated
    division per hop (engine-exact; leak <= states nano-units/round,
    documented). The raw event table is touched once, to build the
    counts.

    Scale posture (the collect-tiny-codebooks discipline,
    docs/SCALE_NOTES.md): the transition table is O(states^2) where
    states = |event-type vocab| + 3 sentinels — a few dozen rows at
    ANY corpus size, because its cardinality is the type vocabulary,
    not the event volume. Only the count aggregation is distributed;
    the (k+1)-chain x ``rounds`` value iteration runs driver-side on
    the collected counts (pure non-negative int arithmetic, so
    Python ``//`` == the engines' truncating ``div`` bit-for-bit)
    and the k+1-row result re-enters Spark via createDataFrame. The
    r6-judged alternative — 12 unrolled DataFrame join rounds — cost
    39.8 s at sf0.1 purely in Catalyst plan analysis (each round
    nests all predecessors); this form costs ~1 s and its Spark-side
    final expressions are unchanged, so the DuckDB oracle
    (MARKOV_REMOVAL_SQL) needs no edit.
    """
    cnt = _journey_transitions(
        events, user_col, type_col, ts_cols, conv_type
    )
    trows = cnt.collect()
    if len(trows) > 100_000:
        raise ValueError(
            "transition table exceeds the driver-side gate "
            f"({len(trows)} rows): state vocabulary is not tiny; "
            "this operator assumes |event types| is bounded"
        )
    trans = [(row["a"], row["b"], int(row["c"])) for row in trows]
    rtot: dict[str, int] = {}
    for a, _b, c in trans:
        rtot[a] = rtot.get(a, 0) + c
    spark = events.sparkSession
    p_rows = []
    for chain, removed in [("full", None)] + [(ch, ch) for ch in channels]:
        v = {"conv": nano}
        for _ in range(rounds):
            nv: dict[str, int] = {}
            for a, b, c in trans:
                if removed is not None and b == removed:
                    continue
                vb = v.get(b)
                if vb is None:
                    continue
                # all operands non-negative -> floor == trunc == div
                nv[a] = nv.get(a, 0) + (vb * c) // rtot[a]
            nv.pop("conv", None)
            nv["conv"] = nano
            v = nv
        if "start" in v:
            p_rows.append((chain, int(v["start"])))
    pmap = dict(p_rows)
    schema = (
        "channel string, p_full double, p_removed double, "
        "removal_effect double, share double"
    )
    if "full" not in pmap:
        # degenerate corpus with no journeys at all: the joined form
        # produced an empty frame here; preserve that contract
        return spark.createDataFrame([], schema)
    # _pf is an exact integer — inline it as a literal instead of a
    # broadcast crossJoin; the normalizing total rides a whole-frame
    # window sum instead of a second crossJoin. All double math and
    # every ROUND stay Spark expressions, identical to the oracle's.
    pf = F.lit(pmap["full"]).cast("long")
    p = spark.createDataFrame(
        [r for r in p_rows if r[0] != "full"], "channel string, _p long"
    )
    re = p.select(
        "channel",
        "_p",
        (
            F.lit(1.0)
            - F.col("_p").cast("double")
            / F.when(pf > 0, pf).cast("double")
        ).alias("_re"),
    )
    req = (
        F.when(F.col("_re") > 0, F.round(F.col("_re") * 1e9))
        .otherwise(F.lit(0))
        .cast("long")
    )
    tre = F.sum(req).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return re.select(
        "channel",
        F.round(pf.cast("double") / nano, 9).alias("p_full"),
        F.round(F.col("_p").cast("double") / nano, 9).alias(
            "p_removed"
        ),
        F.round(F.col("_re"), 9).alias("removal_effect"),
        F.round(
            req.cast("double")
            / F.when(tre > 0, tre).cast("double"),
            9,
        ).alias("share"),
    )
