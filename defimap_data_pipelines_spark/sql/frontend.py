"""Spark-SQL-dialect formulations of the core operators.

The DataFrame API is the primary surface; this module proves the same
semantics are reachable through ``spark.sql`` for users who prefer SQL
(the reference's native tongue was BigQuery SQL). The text mirrors
aave_transform.py:93-130 with the engine's partitioned-window +
quantized-accumulation conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from defimap_data_pipelines_spark.config import INITIAL_PRINCIPAL
from defimap_data_pipelines_spark.plans.domain import orders_raw_series

GOTK_SPARK_SQL = f"""
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
                                  * 1000000.0, 0) AS BIGINT)) OVER wncum
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
                FROM raw_series
                WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                                 ROWS UNBOUNDED PRECEDING)
            )
            WINDOW wncum AS (PARTITION BY name ORDER BY date ASC
                             ROWS UNBOUNDED PRECEDING)
        )
    )
    WINDOW wn AS (PARTITION BY name ORDER BY date ASC)
"""


def register_raw_series_view(spark: SparkSession, sf_dir: str) -> None:
    orders_raw_series(spark, sf_dir).createOrReplaceTempView("raw_series")


def sql_gotk(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_raw_series_view(spark, sf_dir)
    return spark.sql(GOTK_SPARK_SQL)
