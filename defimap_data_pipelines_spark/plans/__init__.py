"""Composed analytic plans: domain series builders and generic queries."""

from defimap_data_pipelines_spark.plans.domain import (  # noqa: F401
    RAW_SERIES_SQL,
    orders_raw_series,
)
