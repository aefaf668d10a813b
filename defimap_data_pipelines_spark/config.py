"""Reference constants and engine configuration.

Constants mirror the reference pipeline's declared configuration:
- INITIAL_PRINCIPAL / INITIAL_DATE: aave_transform.py:25-26
- RAY / SECONDS_PER_YEAR: aave_extract.py:34-36
- STABLECOINS: Airflow Variable "stablecoins" (aave_transform.py:37) —
  selects the benchmark branch (aave_transform.py:41-90)
- dataset names: aave_transform.py:28-34 (BigQuery datasets become
  partitioned tables under a single lakehouse root here)
"""

from __future__ import annotations

INITIAL_PRINCIPAL = 10_000
INITIAL_DATE = "2022-01-01"

RAY = 10**27
SECONDS_PER_YEAR = 31_536_000

# Benchmark-branch selector (reference reads this from an Airflow Variable).
STABLECOINS = ["usdc", "usdt", "dai", "busd", "tusd", "usdp", "gusd", "frax"]

# Logical table names (one partitioned table each; the reference used a
# BigQuery dataset with one table per strategy — here `name` is a partition
# column, see SURVEY.md §1.3).
TOKEN_PRICE_TABLE = "token_price"
RAW_TABLE = "raw_data"
GOTK_TABLE = "growth_of_10k"
TVL_TABLE = "tvl"
PRE_TOTAL_RETURN_TABLE = "pre_total_return"
PRE_TRAILING_RETURN_TABLE = "pre_trailing_return"
PRE_RISK_TABLE = "pre_risk"

# Trailing-return periods: aave_transform.py:171
TRAILING_PERIODS: list[tuple[str, int]] = [
    ("1d", 1),
    ("1m", 30),
    ("3m", 90),
    ("6m", 180),
    ("1y", 365),
]

# Fixed-point scale used when an order-sensitive float accumulation must be
# bit-reproducible across engines/runs (see operators/growth.py docstring).
QUANT_SCALE = 1_000_000
