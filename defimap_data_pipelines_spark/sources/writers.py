"""Writers: partitioned parquet sinks with idempotent range re-load.

The reference's idempotency pattern (SURVEY.md S10) is
delete-date-range-then-append (aave_extract.py:702-716,
aave_transform.py:484-497). The Spark-native equivalent is dynamic
partition overwrite: write the recomputed range with
``partitionOverwriteMode=dynamic`` so only the partitions present in the
new data are replaced — re-running a range is a no-op-equivalent, and at
100 TB only the touched ``(name, date)`` partitions rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("name",),
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def idempotent_replace_range(
    df: DataFrame,
    path: str,
    partition_cols: list[str] = ("name", "date"),
) -> None:
    """Replace exactly the partitions present in ``df`` (S10 semantics).

    Equivalent to BigQuery DELETE-range + WRITE_APPEND, and to Delta's
    ``replaceWhere``, but expressed with vanilla parquet dynamic
    partition overwrite so it has no library dependency.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:  # pragma: no cover - needs a live database
    """Datamart sink (aave_load.py:73-84 et al. -> df.write.jdbc)."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties or {})


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:  # pragma: no cover - needs a live database
    """Dimension lookup read (aave_load.py:41-51); callers broadcast it."""
    return spark.read.jdbc(url=url, table=table, properties=properties or {})
