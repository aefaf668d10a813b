"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in
``defimap_data_pipelines_spark/plans/queries.py``; this module is the
thin driver-facing adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from defimap_data_pipelines_spark.plans import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: growth-of-$10k window analytics on sf0.001."""
    return _registry.QUERIES["gotk"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect oracle SQL per query (omitted => rows-only check)."""
    return dict(_registry.ORACLE)
