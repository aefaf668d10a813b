"""Declared schemas (StructType constants), enforced on write.

Mirrors the reference's explicit BigQuery schema declarations:
- RAW_SCHEMA: aave_extract.py:45-55
- GOTK_SCHEMA: aave_transform.py:228-234
- TVL_SCHEMA: aave_transform.py:275-281
- PRE_TOTAL_RETURN_SCHEMA: aave_transform.py:300-304
- PRE_TRAILING_RETURN_SCHEMA: aave_transform.py:329-334
- PRE_RISK_SCHEMA: aave_transform.py:499-513
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


RAW_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("stake_apy", T.DoubleType()),
    ("aave_apy", T.DoubleType()),
    ("total_apy", T.DoubleType()),
    ("liquidity_index", T.DoubleType()),
    ("atoken_supply", T.DoubleType()),
    ("asset_price", T.DoubleType()),
    ("aave_price", T.DoubleType()),
)

TOKEN_PRICE_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("price_usd", T.DoubleType()),
)

GOTK_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("start_day_investment", T.DoubleType()),
    ("end_day_investment", T.DoubleType()),
    ("percent_change", T.DoubleType()),
)

TVL_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("tvl", T.DoubleType()),
    ("change_tvl", T.DoubleType()),
    ("percent_change", T.DoubleType()),
)

PRE_TOTAL_RETURN_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("percent_change", T.DoubleType()),
)

PRE_TRAILING_RETURN_SCHEMA = _struct(
    ("date", T.DateType()),
    ("period", T.StringType()),
    ("name", T.StringType()),
    ("percent_change", T.DoubleType()),
)

PRE_RISK_SCHEMA = _struct(
    ("date", T.DateType()),
    ("name", T.StringType()),
    ("sd", T.DoubleType()),
    ("return_1y", T.DoubleType()),
    ("sharpe", T.DoubleType()),
    ("alpha", T.DoubleType()),
    ("beta", T.DoubleType()),
    ("r_square", T.DoubleType()),
    ("max_drawdown", T.DoubleType()),
    ("peak_date", T.DateType()),
    ("valley_date", T.DateType()),
    ("duration", T.LongType()),
)

# Datamart serving tables (aave_load.py:41-51, 95, 103-104, 140)
STRATEGY_SCHEMA = _struct(
    ("id", T.StringType()),
    ("slug", T.StringType()),
    ("tvl", T.DoubleType()),
    ("apr", T.DoubleType()),
)

# Multimodal: opaque binary payload + typed metadata (engine extension).
MEDIA_SCHEMA = _struct(
    ("media_id", T.LongType()),
    ("kind", T.StringType()),  # image | audio | video
    ("payload", T.BinaryType()),
    (
        "meta",
        T.StructType(
            [
                T.StructField("width", T.IntegerType(), True),
                T.StructField("height", T.IntegerType(), True),
                T.StructField("duration_ms", T.LongType(), True),
                T.StructField("mime", T.StringType(), True),
            ]
        ),
    ),
)
