"""Trailing returns (aave_transform.py:170-216) and compounded return
(aave_transform.py:413-443).

The reference composes SIX full GOTK subqueries (1d/1m/3m/6m/1y/ytd) over
overlapping date ranges — six scans of the raw table (SURVEY.md §4 calls
this out as the anti-pattern not to replicate). ``trailing_returns``
computes the GOTK machinery ONCE from the earliest needed start date and
re-bases each period arm algebraically:

    capital_s(t) = capital_b(t) * P / capital_b(s)
    reward_s(t)  = (P / capital_b(s)) * (C(t) - C(s-))      [C = cum contrib]
    edi_s(t)     = (P / capital_b(s)) * ((C(t)-C(s-)) * aave_price_t
                                          + capital_b(t))

where b is the common base date and P = 10000. The reward cumsum is
quantized to integer micro-units (see operators/growth.py), so
C(t) - C(s-) is an exact bigint subtraction and the whole rebase is
bit-deterministic. One shuffle by ``name`` total, instead of six.

``trailing_returns_naive`` keeps the reference's literal 6-subquery
shape for differential testing.

Period coverage rule (aave_transform.py:192-194): a period's
percent_change is NULL unless the window's first available date equals
the exact period start.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.config import (
    INITIAL_PRINCIPAL,
    QUANT_SCALE,
    TRAILING_PERIODS,
)
from defimap_data_pipelines_spark.operators.growth import growth_of_10k


def period_starts(ds: str) -> list[tuple[str, str, bool]]:
    """(period, start_date, enforce_coverage_rule) for a given ds."""
    d = dt.date.fromisoformat(ds)
    out = [
        (p, (d - dt.timedelta(days=days)).isoformat(), True)
        for p, days in TRAILING_PERIODS
    ]
    out.append(("ytd", dt.date(d.year, 1, 1).isoformat(), False))
    return out


def gotk_base(
    raw: DataFrame, start_date: str | None = None, end_date: str | None = None
) -> DataFrame:
    """Shared GOTK machinery from a common base date.

    Returns (date, name, cap, ap, q, Q): capital from the base start,
    aave_price, quantized reward contribution and its running total.
    With no dates, covers the full history (the incremental-mode
    substrate — pipelines/incremental.py persists this frame).
    """
    w = Window.partitionBy("name").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df = raw
    if start_date is not None and end_date is not None:
        df = df.filter(F.col("date").between(F.lit(start_date), F.lit(end_date)))
    elif end_date is not None:
        df = df.filter(F.col("date") <= F.lit(end_date))
    capital = (
        F.lit(INITIAL_PRINCIPAL)
        / F.first("asset_price").over(wcum)
        * F.col("liquidity_index")
        / F.first("liquidity_index").over(wcum)
        * F.col("asset_price")
    )
    df = df.select(
        "date",
        "name",
        (F.col("aave_apy") / 365 / 100).alias("reward_rate"),
        capital.alias("cap"),
        F.col("aave_price").alias("ap"),
    )
    contrib = F.col("cap") * F.col("reward_rate") / F.col("ap")
    df = df.select(
        "date", "name", "cap", "ap",
        F.round(contrib * float(QUANT_SCALE)).cast("long").alias("q"),
    )
    return df.withColumn("cumq", F.sum("q").over(wcum))


def _rebased_arm(
    base: DataFrame, period: str, start: str, ds: str, coverage_rule: bool
) -> DataFrame:
    w = Window.partitionBy("name").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sliced = base.filter(F.col("date").between(F.lit(start), F.lit(ds)))
    qprev = F.first("cumq").over(wcum) - F.first("q").over(wcum)
    edi = (F.lit(INITIAL_PRINCIPAL) / F.first("cap").over(wcum)) * (
        (F.col("cumq") - qprev) / float(QUANT_SCALE) * F.col("ap") + F.col("cap")
    )
    df = sliced.select(
        "date",
        "name",
        F.first("date").over(wcum).alias("first_date"),
        edi.alias("end_day_investment"),
    )
    sdi = F.coalesce(
        F.lag("end_day_investment").over(w), F.lit(INITIAL_PRINCIPAL)
    )
    pc = F.col("end_day_investment") / sdi - 1
    if coverage_rule:
        pc = F.when(F.col("first_date") == F.lit(start).cast("date"), pc)
    return df.select(
        "date",
        F.lit(period).alias("period"),
        "name",
        pc.alias("percent_change"),
    )


def trailing_returns(raw: DataFrame, ds: str) -> DataFrame:
    """Single-scan trailing returns: (date, period, name, percent_change)."""
    starts = period_starts(ds)
    base_start = min(s for _, s, _ in starts)
    # cache: UNION branches don't share subplans in Spark, so without
    # this each of the 6 arms would recompute the base windows
    base = gotk_base(raw, base_start, ds).cache()
    arms = [_rebased_arm(base, p, s, ds, rule) for p, s, rule in starts]
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def trailing_returns_naive(raw: DataFrame, ds: str) -> DataFrame:
    """Reference-literal 6-subquery trailing returns (for testing)."""
    w = Window.partitionBy("name").orderBy("date")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    arms = []
    for period, start, rule in period_starts(ds):
        g = growth_of_10k(raw, start, ds)
        pc = F.col("percent_change")
        if rule:
            pc = F.when(
                F.first("date").over(wcum) == F.lit(start).cast("date"), pc
            )
        arms.append(
            g.select(
                "date", F.lit(period).alias("period"), "name",
                pc.alias("percent_change"),
            )
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def compounded_return(trailing: DataFrame) -> DataFrame:
    """Cumulative compounded return per (period, name) series:
    EXP(SUM(LOG(pc+1)) OVER (PARTITION BY period ORDER BY date)) - 1
    (aave_transform.py:413-426; `name` added to the partition since the
    reference ran per-strategy tables)."""
    w = Window.partitionBy("period", "name").orderBy("date")
    return trailing.withColumn(
        "value",
        F.exp(F.sum(F.log(F.col("percent_change") + 1)).over(w)) - 1,
    )
