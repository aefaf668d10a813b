"""Query registry: every implemented operator exposed as a named query.

Each entry pairs a Spark callable ``(spark, sf_dir) -> DataFrame`` with a
DuckDB-dialect oracle SQL string computing the same result on the same
parquet tables (driver contract, __spark_entry__.py). Entries whose
semantics are not SQL-expressible set oracle to None (driver records a
rows-only check).

Determinism contract (see plans/domain.py): per-row float expressions use
identical expression trees in both dialects (IEEE-deterministic);
order-sensitive accumulations are quantized to exact integers;
variance-family aggregates are rounded at 9 dp; money sums go through
integer cents. Column names are aliased identically on both sides — the
driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.config import INITIAL_PRINCIPAL
from defimap_data_pipelines_spark.operators.growth import growth_of_10k
from defimap_data_pipelines_spark.operators.tvl import tvl
from defimap_data_pipelines_spark.plans.domain import RAW_SERIES_SQL, orders_raw_series
from defimap_data_pipelines_spark.sources.parquet import read_table

SparkQuery = Callable[[SparkSession, str], DataFrame]

# Fixed analysis date for ds-parameterized queries (orders span
# 1995-01-01 .. 2001-08-01 in the testdata at every SF).
DS = "2001-08-01"

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def r(col, n=6):
    """Deterministic output rounding (see module docstring)."""
    return F.round(col, n)


# --------------------------------------------------------------------------
# Domain analytics (reference parity): GOTK / total return / TVL
# --------------------------------------------------------------------------

_GOTK_CORE_SQL = f"""
    SELECT date,
           name,
           COALESCE(LAG(end_day_investment) OVER wn, {INITIAL_PRINCIPAL})
               AS start_day_investment,
           end_day_investment,
           end_day_investment
               / COALESCE(LAG(end_day_investment) OVER wn, {INITIAL_PRINCIPAL}) - 1
               AS percent_change
    FROM (
        SELECT date, name,
               end_day_aave_reward * aave_price + end_day_capital
                   AS end_day_investment
        FROM (
            SELECT date, name,
                   SUM(CAST(ROUND(end_day_capital * reward_rate / aave_price
                                  * 1000000.0) AS BIGINT)) OVER wncum
                       / 1000000.0 AS end_day_aave_reward,
                   end_day_capital,
                   aave_price
            FROM (
                SELECT date, name,
                       aave_apy / 365 / 100 AS reward_rate,
                       {INITIAL_PRINCIPAL} / FIRST_VALUE(asset_price) OVER wncum
                           * liquidity_index
                           / FIRST_VALUE(liquidity_index) OVER wncum
                           * asset_price AS end_day_capital,
                       aave_price
                FROM raw_data
                WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                                 ROWS UNBOUNDED PRECEDING)
            )
            WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                             ROWS UNBOUNDED PRECEDING)
        )
    )
    WINDOW wn AS (PARTITION BY name ORDER BY date ASC)
"""

GOTK_SQL = f"WITH raw_data AS ({RAW_SERIES_SQL}) {_GOTK_CORE_SQL}"


@register("gotk", GOTK_SQL)
def q_gotk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-of-$10k (W1+W2+W3 windows; aave_transform.py:93-130)."""
    return growth_of_10k(orders_raw_series(spark, sf_dir))


TOTAL_RETURN_SQL = f"""
    WITH raw_data AS ({RAW_SERIES_SQL})
    SELECT date,
           name,
           end_day_investment
               / COALESCE(LAG(end_day_investment) OVER wm, {INITIAL_PRINCIPAL}) - 1
               AS percent_change
    FROM (
        SELECT date, name,
               end_day_aave_reward * aave_price + end_day_capital
                   AS end_day_investment
        FROM (
            SELECT date, name,
                   SUM(CAST(ROUND(end_day_capital * reward_rate / aave_price
                                  * 1000000.0) AS BIGINT)) OVER wmcum
                       / 1000000.0 AS end_day_aave_reward,
                   end_day_capital,
                   aave_price
            FROM (
                SELECT date, name,
                       aave_apy / 365 / 100 AS reward_rate,
                       {INITIAL_PRINCIPAL} / FIRST_VALUE(asset_price) OVER wmcum
                           * liquidity_index
                           / FIRST_VALUE(liquidity_index) OVER wmcum
                           * asset_price AS end_day_capital,
                       aave_price
                FROM raw_data
                WINDOW wmcum AS (PARTITION BY name, strftime(date, '%Y-%m')
                                 ORDER BY date ASC ROWS UNBOUNDED PRECEDING)
            )
            WINDOW wmcum AS (PARTITION BY name, strftime(date, '%Y-%m')
                             ORDER BY date ASC ROWS UNBOUNDED PRECEDING)
        )
    )
    WINDOW wm AS (PARTITION BY name, strftime(date, '%Y-%m') ORDER BY date ASC)
"""


@register("total_return", TOTAL_RETURN_SQL)
def q_total_return(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly-reset total return (W4; aave_transform.py:133-167)."""
    return growth_of_10k(orders_raw_series(spark, sf_dir), monthly=True)


TVL_SQL = f"""
    WITH raw_data AS ({RAW_SERIES_SQL})
    SELECT date,
           name,
           tvl,
           tvl - COALESCE(LAG(tvl) OVER wn, tvl) AS change_tvl,
           COALESCE((tvl - COALESCE(LAG(tvl) OVER wn, tvl)) / NULLIF(tvl, 0), 0)
               * 100 AS percent_change
    FROM (
        SELECT date, name, atoken_supply * asset_price AS tvl
        FROM raw_data
        WHERE date <= DATE '{DS}'
    )
    WINDOW wn AS (PARTITION BY name ORDER BY date ASC)
"""


@register("tvl", TVL_SQL)
def q_tvl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TVL with self-defaulting LAG (W5; aave_transform.py:245-269)."""
    return tvl(orders_raw_series(spark, sf_dir), DS)


# --------------------------------------------------------------------------
# Domain analytics: trailing returns, compounded return, benchmarks
# --------------------------------------------------------------------------

def _trailing_base_sql(base_start: str, ds: str) -> str:
    """Shared GOTK machinery CTE for the rebased trailing arms
    (mirror of operators/trailing.gotk_base)."""
    return f"""
        SELECT date, name, cap, ap, q, SUM(q) OVER wncum AS cumq
        FROM (
            SELECT date, name, cap, ap,
                   CAST(ROUND(cap * reward_rate / ap * 1000000.0) AS BIGINT) AS q
            FROM (
                SELECT date, name,
                       aave_apy / 365 / 100 AS reward_rate,
                       {INITIAL_PRINCIPAL} / FIRST_VALUE(asset_price) OVER wncum
                           * liquidity_index
                           / FIRST_VALUE(liquidity_index) OVER wncum
                           * asset_price AS cap,
                       aave_price AS ap
                FROM raw_data
                WHERE date BETWEEN DATE '{base_start}' AND DATE '{ds}'
                WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                                 ROWS UNBOUNDED PRECEDING)
            )
        )
        WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                         ROWS UNBOUNDED PRECEDING)
    """


def _trailing_arm_sql(period: str, start: str, ds: str, coverage_rule: bool) -> str:
    # window names are suffixed per arm: DuckDB scopes WINDOW clauses
    # across parenthesized UNION ALL branches
    wn, wncum = f"wn_{period}", f"wncum_{period}"
    pc = (
        f"end_day_investment / COALESCE(LAG(end_day_investment) OVER {wn}, "
        f"{INITIAL_PRINCIPAL}) - 1"
    )
    if coverage_rule:
        pc = f"CASE WHEN first_date = DATE '{start}' THEN {pc} ELSE NULL END"
    return f"""
        SELECT date, '{period}' AS period, name, {pc} AS percent_change
        FROM (
            SELECT date, name,
                   FIRST_VALUE(date) OVER {wncum} AS first_date,
                   {INITIAL_PRINCIPAL} / FIRST_VALUE(cap) OVER {wncum}
                       * ((cumq - (FIRST_VALUE(cumq) OVER {wncum}
                                   - FIRST_VALUE(q) OVER {wncum})) / 1000000.0
                          * ap + cap) AS end_day_investment
            FROM base
            WHERE date BETWEEN DATE '{start}' AND DATE '{ds}'
            WINDOW {wncum} AS (PARTITION BY name ORDER BY date ASC
                             ROWS UNBOUNDED PRECEDING)
        )
        WINDOW {wn} AS (PARTITION BY name ORDER BY date ASC)
    """


def trailing_sql(ds: str) -> str:
    from defimap_data_pipelines_spark.operators.trailing import period_starts

    starts = period_starts(ds)
    base_start = min(s for _, s, _ in starts)
    arms = " UNION ALL ".join(
        f"({_trailing_arm_sql(p, s, ds, rule)})" for p, s, rule in starts
    )
    return (
        f"WITH raw_data AS ({RAW_SERIES_SQL}), "
        f"base AS ({_trailing_base_sql(base_start, ds)}) {arms}"
    )


TRAILING_SQL = trailing_sql(DS)


@register("trailing_return", TRAILING_SQL)
def q_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-period trailing returns from ONE scan (O3 + W6 rebase;
    aave_transform.py:170-216, SURVEY.md §4 scan-sharing)."""
    from defimap_data_pipelines_spark.operators.trailing import trailing_returns

    return trailing_returns(orders_raw_series(spark, sf_dir), DS)


RETURN_1Y_SQL = f"""
    WITH t AS ({TRAILING_SQL}),
    c AS (
        SELECT date, period, name,
               EXP(SUM(LN(percent_change + 1)) OVER
                   (PARTITION BY period, name ORDER BY date ASC)) - 1 AS value
        FROM t
    )
    SELECT name,
           ROUND(CASE WHEN MAX(CASE WHEN period = '1y' THEN value END) = 0.0
                      THEN MAX(CASE WHEN period = 'ytd' THEN value END)
                      ELSE MAX(CASE WHEN period = '1y' THEN value END)
                 END, 9) AS return_1y
    FROM c
    WHERE date = DATE '{DS}' AND period IN ('1y', 'ytd')
    GROUP BY name
"""


@register("return_1y", RETURN_1Y_SQL)
def q_return_1y(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compounded 1y return with ytd fallback (A7+A8;
    aave_transform.py:413-443)."""
    from defimap_data_pipelines_spark.operators.trailing import (
        compounded_return,
        trailing_returns,
    )

    t = trailing_returns(orders_raw_series(spark, sf_dir), DS)
    c = compounded_return(t).filter(
        (F.col("date") == F.lit(DS).cast("date"))
        & F.col("period").isin("1y", "ytd")
    )
    v1y = F.max(F.when(F.col("period") == "1y", F.col("value")))
    vytd = F.max(F.when(F.col("period") == "ytd", F.col("value")))
    # r9: the cumulative SUM(LN(..)) window accumulates in engine-specific
    # order (sequential vs segment tree) — round away the ulp noise
    return c.groupBy("name").agg(
        F.round(F.when(v1y == 0.0, vytd).otherwise(v1y), 9).alias("return_1y")
    )


CAPITAL_GOTK_SQL = f"""
    WITH raw_data AS ({RAW_SERIES_SQL})
    SELECT date, name,
           COALESCE(LAG(end_day_investment) OVER wn, {INITIAL_PRINCIPAL})
               AS start_day_investment,
           end_day_investment,
           end_day_investment
               / COALESCE(LAG(end_day_investment) OVER wn, {INITIAL_PRINCIPAL}) - 1
               AS percent_change
    FROM (
        SELECT date, name,
               {INITIAL_PRINCIPAL} / FIRST_VALUE(asset_price) OVER wncum
                   * liquidity_index
                   / FIRST_VALUE(liquidity_index) OVER wncum
                   * asset_price AS end_day_investment
        FROM raw_data
        WHERE name = '1-URGENT'
        WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                         ROWS UNBOUNDED PRECEDING)
    )
    WINDOW wn AS (PARTITION BY name ORDER BY date ASC)
"""


@register("benchmark_capital_gotk", CAPITAL_GOTK_SQL)
def q_benchmark_capital(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stablecoin-branch benchmark: capital-only GOTK
    (aave_transform.py:43-62). '1-URGENT' stands in for aave_usdc."""
    from defimap_data_pipelines_spark.operators.growth import capital_gotk

    raw = orders_raw_series(spark, sf_dir).filter(F.col("name") == "1-URGENT")
    return capital_gotk(raw)


PRICE_GOTK_SQL = f"""
    WITH token_price AS (
        SELECT CAST(o_orderdate AS DATE) AS date,
               'wbtc' AS name,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   / COUNT(*) / 100.0 AS price_usd
        FROM orders
        WHERE o_orderpriority = '5-LOW'
        GROUP BY 1, 2
    )
    SELECT date, name, start_day_investment, end_day_investment,
           CASE WHEN start_day_investment = 0 THEN NULL
                ELSE (end_day_investment - start_day_investment)
                     / start_day_investment
           END AS percent_change
    FROM (
        SELECT date, name,
               COALESCE(LAG(end_day_investment) OVER wn, {INITIAL_PRINCIPAL})
                   AS start_day_investment,
               end_day_investment
        FROM (
            SELECT date, name,
                   ({INITIAL_PRINCIPAL} / FIRST_VALUE(price_usd) OVER wncum)
                       * price_usd AS end_day_investment
            FROM token_price
            WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                             ROWS UNBOUNDED PRECEDING)
        )
        WINDOW wn AS (PARTITION BY name ORDER BY date ASC)
    )
"""


@register("benchmark_price_gotk", PRICE_GOTK_SQL)
def q_benchmark_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatile-branch benchmark: price-only GOTK with SAFE_DIVIDE
    percent change (aave_transform.py:63-89)."""
    from defimap_data_pipelines_spark.operators.growth import price_gotk

    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "5-LOW"
    )
    price = o.groupBy(
        F.to_date("o_orderdate").alias("date"), F.lit("wbtc").alias("name")
    ).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            / F.count(F.lit(1))
            / 100.0
        ).alias("price_usd")
    )
    return price_gotk(price)


INTERPOLATE_SQL = f"""
    WITH gappy AS (
        SELECT date, name,
               CASE WHEN CAST(aave_apy AS BIGINT) % 7 = 3 THEN NULL
                    ELSE asset_price END AS asset_price
        FROM ({RAW_SERIES_SQL})
    ),
    idxed AS (
        SELECT date, name, asset_price,
               ROW_NUMBER() OVER (PARTITION BY name ORDER BY date ASC) AS _idx
        FROM gappy
    )
    SELECT date, name,
           CASE WHEN asset_price IS NOT NULL THEN asset_price
                WHEN prev_v IS NULL THEN NULL
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v)
                     * ((_idx - prev_i) / (next_i - prev_i))
           END AS asset_price
    FROM (
        SELECT date, name, asset_price, _idx,
               LAST_VALUE(asset_price IGNORE NULLS) OVER wprev AS prev_v,
               LAST_VALUE(CASE WHEN asset_price IS NOT NULL THEN _idx END
                          IGNORE NULLS) OVER wprev AS prev_i,
               FIRST_VALUE(asset_price IGNORE NULLS) OVER wnext AS next_v,
               FIRST_VALUE(CASE WHEN asset_price IS NOT NULL THEN _idx END
                           IGNORE NULLS) OVER wnext AS next_i
        FROM idxed
        WINDOW wprev AS (PARTITION BY name ORDER BY date ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wnext AS (PARTITION BY name ORDER BY date ASC
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
"""


@register("interpolate_linear", INTERPOLATE_SQL)
def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-based linear interpolation of gaps (P15;
    aave_extract.py:686-694 — pandas interpolate(method='linear',
    limit_direction='forward') re-expressed distributed)."""
    from defimap_data_pipelines_spark.operators.cleaning import interpolate_linear

    raw = orders_raw_series(spark, sf_dir).select(
        "date",
        "name",
        F.when(
            F.col("aave_apy").cast("long") % 7 == 3, F.lit(None)
        ).otherwise(F.col("asset_price")).alias("asset_price"),
    )
    return interpolate_linear(raw, ["asset_price"])
