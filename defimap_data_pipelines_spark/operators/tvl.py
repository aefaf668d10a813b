"""TVL analytics (aave_transform.py:245-269).

tvl = atoken_supply * asset_price; change vs previous day with
self-defaulting LAG (W5: IFNULL(LAG(tvl), tvl)) and NULLIF-guarded
percent change. Windows partitioned by ``name`` (SURVEY.md §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tvl(raw: DataFrame, ds: str | None = None) -> DataFrame:
    w = Window.partitionBy("name").orderBy("date")
    df = raw
    if ds is not None:
        df = df.filter(F.col("date") <= F.lit(ds))
    df = df.select(
        "date", "name", (F.col("atoken_supply") * F.col("asset_price")).alias("tvl")
    )
    prev = F.coalesce(F.lag("tvl").over(w), F.col("tvl"))
    change = F.col("tvl") - prev
    pct = (
        F.coalesce(
            change / F.when(F.col("tvl") == 0, F.lit(None)).otherwise(F.col("tvl")),
            F.lit(0.0),
        )
        * 100
    )
    return df.select(
        "date",
        "name",
        "tvl",
        change.alias("change_tvl"),
        pct.alias("percent_change"),
    )
