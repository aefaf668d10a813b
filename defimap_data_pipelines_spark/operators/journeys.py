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
