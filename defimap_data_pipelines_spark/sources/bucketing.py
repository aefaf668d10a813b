"""Bucketed tables: pre-shuffled, co-located joins (100 TB posture).

At scale the fact-fact joins (lineitem x orders here; raw x raw in the
domain) dominate shuffle cost. Bucketing both sides by the join key at
write time makes the join a zero-exchange zip of co-located buckets —
the Spark-native equivalent of the co-partitioned table layouts
warehouse engines use. Verified by tests/test_scale_layout.py, which
asserts the bucketed join plan contains no Exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
