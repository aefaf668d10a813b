"""Incremental transform mode (SURVEY.md §4 "incrementality").

The reference recomputes every derived table from INITIAL_DATE daily
(WRITE_TRUNCATE, aave_transform.py:235 et al.) — O(history) work per
day. The GOTK recurrence only needs O(1) state per strategy:

    state  = (first_asset_price, first_liquidity_index,
              cum_reward_q  [exact bigint micro-units],
              prev_end_day_investment)
    cap_t  = P / p0 * li_t / li0 * p_t
    q_t    = round(cap_t * rate_t / ap_t * 1e6)
    edi_t  = (Q_{t-1} + q_t)/1e6 * ap_t + cap_t
    pc_t   = edi_t / prev_edi - 1

so a day's update joins the new raw rows against the state table,
emits the new GOTK rows, and writes back the advanced state — no
history scan. The quantized reward total makes the incremental path
EXACTLY equal to the batch recompute (integer accumulation is
associative), which test_incremental.py asserts row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.config import INITIAL_PRINCIPAL, QUANT_SCALE


def initial_gotk_state(raw_history: DataFrame) -> DataFrame:
    """Bootstrap per-name state from history (one batch GOTK pass).

    Returns (name, p0, li0, cumq, prev_edi, last_date).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("name").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    capital = (
        F.lit(INITIAL_PRINCIPAL)
        / F.first("asset_price").over(wcum)
        * F.col("liquidity_index")
        / F.first("liquidity_index").over(wcum)
        * F.col("asset_price")
    )
    df = raw_history.select(
        "date",
        "name",
        F.first("asset_price").over(wcum).alias("p0"),
        F.first("liquidity_index").over(wcum).alias("li0"),
        (F.col("aave_apy") / 365 / 100).alias("rate"),
        capital.alias("cap"),
        F.col("aave_price").alias("ap"),
    )
    q = F.round(F.col("cap") * F.col("rate") / F.col("ap") * float(QUANT_SCALE)).cast(
        "long"
    )
    df = df.withColumn("cumq", F.sum(q).over(wcum))
    edi = F.col("cumq") / float(QUANT_SCALE) * F.col("ap") + F.col("cap")
    df = df.withColumn("edi", edi)
    last = Window.partitionBy("name").orderBy(F.col("date").desc())
    return (
        df.withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .select(
            "name",
            "p0",
            "li0",
            "cumq",
            F.col("edi").alias("prev_edi"),
            F.col("date").alias("last_date"),
        )
    )


def incremental_gotk_step(
    state: DataFrame, new_raw: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Advance one day: (state, day's raw rows) -> (gotk rows, state').

    ``new_raw`` holds exactly one row per name (the new date). Names
    unseen in the state start a fresh series (p0/li0 from their first
    row, prev_edi = INITIAL_PRINCIPAL).
    """
    joined = new_raw.join(F.broadcast(state), "name", "left")
    p0 = F.coalesce(F.col("p0"), F.col("asset_price"))
    li0 = F.coalesce(F.col("li0"), F.col("liquidity_index"))
    cumq_prev = F.coalesce(F.col("cumq"), F.lit(0).cast("long"))
    prev_edi = F.coalesce(
        F.col("prev_edi"), F.lit(INITIAL_PRINCIPAL).cast("double")
    )

    cap = (
        F.lit(INITIAL_PRINCIPAL)
        / p0
        * F.col("liquidity_index")
        / li0
        * F.col("asset_price")
    )
    rate = F.col("aave_apy") / 365 / 100
    q = F.round(cap * rate / F.col("aave_price") * float(QUANT_SCALE)).cast("long")
    cumq = cumq_prev + q
    edi = cumq / float(QUANT_SCALE) * F.col("aave_price") + cap

    step = joined.select(
        "date",
        "name",
        p0.alias("p0"),
        li0.alias("li0"),
        cumq.alias("cumq"),
        prev_edi.alias("start_day_investment"),
        edi.alias("end_day_investment"),
    )
    gotk_rows = step.select(
        "date",
        "name",
        "start_day_investment",
        "end_day_investment",
        (F.col("end_day_investment") / F.col("start_day_investment") - 1).alias(
            "percent_change"
        ),
    )
    updated = step.select(
        "name",
        "p0",
        "li0",
        "cumq",
        F.col("end_day_investment").alias("prev_edi"),
        F.col("date").alias("last_date"),
    )
    # names with no row today keep their state (a gap day must not
    # reset a strategy's series)
    untouched = state.join(new_raw.select("name"), "name", "left_anti")
    return gotk_rows, updated.unionByName(untouched)


def initial_tvl_state(raw_history: DataFrame) -> DataFrame:
    """(name, prev_tvl, last_date) from the latest history row."""
    from pyspark.sql import Window

    last = Window.partitionBy("name").orderBy(F.col("date").desc())
    return (
        raw_history.withColumn("_rn", F.row_number().over(last))
        .filter(F.col("_rn") == 1)
        .select(
            "name",
            (F.col("atoken_supply") * F.col("asset_price")).alias("prev_tvl"),
            F.col("date").alias("last_date"),
        )
    )


def incremental_tvl_step(
    state: DataFrame, new_raw: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Advance TVL one day (W5 self-defaulting lag carried as state)."""
    joined = new_raw.join(F.broadcast(state), "name", "left")
    tvl = F.col("atoken_supply") * F.col("asset_price")
    prev = F.coalesce(F.col("prev_tvl"), tvl)
    change = tvl - prev
    pct = (
        F.coalesce(
            change / F.when(tvl == 0, F.lit(None)).otherwise(tvl), F.lit(0.0)
        )
        * 100
    )
    rows = joined.select(
        "date",
        "name",
        tvl.alias("tvl"),
        change.alias("change_tvl"),
        pct.alias("percent_change"),
    )
    new_state = joined.select(
        "name", tvl.alias("prev_tvl"), F.col("date").alias("last_date")
    )
    untouched = state.join(new_raw.select("name"), "name", "left_anti")
    return rows, new_state.unionByName(untouched)
