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
) -> DataFrame:
    """Dimension lookup read (aave_load.py:41-51); callers broadcast it."""
    return spark.read.jdbc(url=url, table=table, properties=properties or {})


def execute_jdbc(spark: SparkSession, url: str, statements: list[str]) -> None:
    """Run raw DDL/DML statements on a JDBC database via the driver
    JVM's DriverManager — the side-channel the reference's load DAG
    needs beyond frame writes: keyed DELETEs before append
    (aave_load.py:73-78, 108-113, 147-152) and single-row dimension
    UPDATEs (aave_load.py:121-128, 160-167). Statement strings are
    driver-composed from trusted pipeline values (strategy ids/slugs),
    mirroring the reference's f-string SQL.

    Works against any JDBC URL on the Spark classpath; tests use
    embedded Derby (shipped with Spark)."""
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            for s in statements:
                st.execute(s)
        finally:
            st.close()
    finally:
        conn.close()


def delete_then_append_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    key_col: str,
    properties: dict[str, str] | None = None,
) -> None:
    """The reference's datamart idempotency unit (S12): DELETE every
    row whose ``key_col`` appears in ``df``, then append ``df`` —
    re-running a load replaces its own slice exactly
    (aave_load.py:73-84). The key set is tiny by contract (strategy
    ids), so the distinct-collect is a scalar driver fetch."""
    keys = [r[0] for r in df.select(key_col).distinct().collect()]
    if keys:
        quoted = ", ".join("'" + str(k).replace("'", "''") + "'" for k in keys)
        execute_jdbc(
            df.sparkSession,
            url,
            [f"DELETE FROM {table} WHERE {key_col} IN ({quoted})"],
        )
    write_jdbc(df, url, table, mode="append", properties=properties)
