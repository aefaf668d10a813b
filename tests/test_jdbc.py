"""End-to-end JDBC datamart serving path against embedded Derby.

The reference's load DAG targets a live Postgres datamart
(aave_load.py:41-168): read the strategy dimension, delete-then-append
each derived table keyed by strategy_id, and UPDATE the dimension's
latest-value columns. No external database exists in this sandbox, but
Spark ships the Derby embedded JDBC driver on its classpath — so this
module exercises the REAL JDBC path (write_jdbc / read_jdbc /
execute_jdbc / delete_then_append_jdbc) end to end: DDL, run_load,
read-back, idempotent re-run, and the single-row dimension UPDATE.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.pipelines.ingest import (
    date_range_frame,
    sample_chain_state,
)
from defimap_data_pipelines_spark.pipelines.load import (
    jdbc_datamart_writer,
    run_load,
)
from defimap_data_pipelines_spark.pipelines.transform import run_transform
from defimap_data_pipelines_spark.sources.writers import (
    delete_then_append_jdbc,
    execute_jdbc,
    read_jdbc,
    write_jdbc,
)

DDL = [
    # Explicit VARCHAR columns: Spark's Derby dialect maps StringType
    # to CLOB on auto-create, and Derby forbids CLOB in equality
    # predicates — the DELETE/UPDATE keys must be comparable types.
    """CREATE TABLE strategy (
        id VARCHAR(36), slug VARCHAR(64), tvl DOUBLE, apr DOUBLE)""",
    """CREATE TABLE strategy_growth (
        date DATE, name VARCHAR(64), start_day_investment DOUBLE,
        end_day_investment DOUBLE, percent_change DOUBLE,
        strategy_id VARCHAR(36))""",
    """CREATE TABLE strategy_tvl (
        date DATE, name VARCHAR(64), tvl DOUBLE, change_tvl_daily DOUBLE,
        change_tvl_monthly DOUBLE, change_tvl_yearly DOUBLE,
        strategy_id VARCHAR(36))""",
    """CREATE TABLE strategy_apr (
        timestamp DATE, name VARCHAR(64), value DOUBLE,
        strategy_id VARCHAR(36))""",
]


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    url = f"jdbc:derby:{tmp_path_factory.mktemp('datamart')}/db;create=true"
    execute_jdbc(spark, url, DDL)
    execute_jdbc(
        spark,
        url,
        [
            "INSERT INTO strategy VALUES ('id-1', 'aave_usdc', 0.0, 0.0)",
            "INSERT INTO strategy VALUES ('id-2', 'aave_wbtc', 0.0, 0.0)",
        ],
    )
    return url


@pytest.fixture(scope="module")
def tables(spark):
    dates = date_range_frame(
        spark, "2023-01-01", "2023-03-31", ["aave_usdc", "aave_wbtc"]
    )
    bronze = sample_chain_state(dates).cache()
    out = run_transform(bronze, ds="2023-03-31", start_date="2023-01-01")
    return bronze, out


def test_write_then_read_jdbc_roundtrip(spark, derby_url, tables):
    bronze, out = tables
    df = out["tvl"].na.drop().select("date", "name", "tvl")
    write_jdbc(
        df.withColumn("strategy_id", F.lit("id-0"))
        .withColumn("change_tvl_daily", F.lit(0.0))
        .withColumn("change_tvl_monthly", F.lit(0.0))
        .withColumn("change_tvl_yearly", F.lit(0.0))
        .select(
            "date", "name", "tvl", "change_tvl_daily",
            "change_tvl_monthly", "change_tvl_yearly", "strategy_id",
        ),
        derby_url,
        "strategy_tvl",
    )
    back = read_jdbc(spark, derby_url, "strategy_tvl").filter(
        F.col("strategy_id") == "id-0"
    )
    assert back.count() == df.count()
    # clean up the probe slice so the run_load assertions see only
    # their own rows
    execute_jdbc(
        spark, derby_url,
        ["DELETE FROM strategy_tvl WHERE strategy_id = 'id-0'"],
    )


def _lower(df):
    # Derby reports identifiers uppercased; Row field access is
    # case-sensitive even though Spark SQL resolution is not
    return df.toDF(*[c.lower() for c in df.columns])


def test_run_load_against_real_jdbc_is_idempotent(spark, derby_url, tables):
    bronze, out = tables
    dim = _lower(read_jdbc(spark, derby_url, "strategy"))
    write = jdbc_datamart_writer(derby_url)

    run_load(out["growth_of_10k"], out["tvl"], bronze, dim, write)
    counts1 = {
        t: read_jdbc(spark, derby_url, t).count()
        for t in ["strategy_growth", "strategy_tvl", "strategy_apr"]
    }
    assert all(c > 0 for c in counts1.values())

    # the reference re-runs the DAG daily: delete-then-append keyed by
    # strategy_id must leave exactly one copy (aave_load.py:73-84)
    run_load(out["growth_of_10k"], out["tvl"], bronze, dim, write)
    counts2 = {
        t: read_jdbc(spark, derby_url, t).count()
        for t in ["strategy_growth", "strategy_tvl", "strategy_apr"]
    }
    assert counts2 == counts1

    # latest-value UPDATE semantics (S13, aave_load.py:121-128): the
    # strategy dimension's tvl/apr columns now hold the max-date values
    dim2 = {
        r["slug"]: r
        for r in _lower(read_jdbc(spark, derby_url, "strategy")).collect()
    }
    latest_tvl = {
        r["name"]: r["tvl"]
        for r in out["tvl"]
        .groupBy("name")
        .agg(F.max_by("tvl", "date").alias("tvl"))
        .collect()
    }
    latest_apr = {
        r["name"]: r["total_apy"]
        for r in bronze.groupBy("name")
        .agg(F.max_by("total_apy", "date").alias("total_apy"))
        .collect()
    }
    for slug in ["aave_usdc", "aave_wbtc"]:
        assert dim2[slug]["tvl"] == pytest.approx(latest_tvl[slug])
        assert dim2[slug]["apr"] == pytest.approx(latest_apr[slug])


def test_delete_then_append_replaces_only_own_keys(spark, derby_url):
    probe = spark.createDataFrame(
        [("2023-01-01", "x", 1.0, "id-A"), ("2023-01-01", "y", 2.0, "id-B")],
        ["timestamp", "name", "value", "strategy_id"],
    ).withColumn("timestamp", F.col("timestamp").cast("date"))
    delete_then_append_jdbc(probe, derby_url, "strategy_apr", "strategy_id")
    # re-load only id-A with a new value: id-B must survive untouched
    probe_a = spark.createDataFrame(
        [("2023-01-02", "x", 9.0, "id-A")],
        ["timestamp", "name", "value", "strategy_id"],
    ).withColumn("timestamp", F.col("timestamp").cast("date"))
    delete_then_append_jdbc(probe_a, derby_url, "strategy_apr", "strategy_id")
    rows = {
        r["strategy_id"]: r["value"]
        for r in _lower(read_jdbc(spark, derby_url, "strategy_apr"))
        .filter(F.col("strategy_id").isin("id-A", "id-B"))
        .collect()
    }
    assert rows == {"id-A": 9.0, "id-B": 2.0}
    execute_jdbc(
        spark, derby_url,
        ["DELETE FROM strategy_apr WHERE strategy_id IN ('id-A', 'id-B')"],
    )
