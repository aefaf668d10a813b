"""As-of join vs naive range join; salted agg vs direct; approximate
aggregates within tolerance; CSV bronze round-trip (reference S6/S7)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.asof import asof_join
from defimap_data_pipelines_spark.operators.skew import salted_agg
from defimap_data_pipelines_spark.sources.parquet import read_table


def test_asof_join_matches_naive_range_join(spark, sf_dir):
    e = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value",
        F.unix_micros("ts").alias("ts_us"),
    ).cache()
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts_us").alias("p_ts"),
        F.col("value").alias("pv"),
    )
    got = {
        r.event_id: r.pv_asof
        for r in asof_join(
            e, purchases.select(F.col("p_user").alias("user_id"),
                                F.col("p_ts").alias("ts_us"), "pv"),
            on=["user_id"], ts_col="ts_us", value_cols=["pv"],
        ).collect()
    }
    # naive O(n*m) range join + max_by — the semantic spec
    naive = (
        e.join(
            purchases,
            (e.user_id == purchases.p_user) & (purchases.p_ts <= e.ts_us),
            "left",
        )
        .groupBy("event_id")
        .agg(F.max_by("pv", F.struct("p_ts", "pv")).alias("pv"))
    )
    want = {r.event_id: r.pv for r in naive.collect()}
    assert len(got) == len(want)
    mism = [k for k in want if got.get(k) != want[k]]
    assert not mism, f"{len(mism)} as-of mismatches, e.g. {mism[:3]}"


def test_salted_agg_equals_direct(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    direct = {
        (r.l_returnflag, r.l_linestatus): (r.cents, r.n)
        for r in l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.l_linestatus): (r.cents, r.n)
        for r in salted_agg(
            l,
            keys=["l_returnflag", "l_linestatus"],
            sums={"cents": F.round(F.col("l_extendedprice") * 100).cast("long")},
            count_alias="n",
            buckets=8,
        ).collect()
    }
    assert salted == direct


def test_approx_count_distinct_tolerance(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders")
    exact = o.select(F.countDistinct("o_custkey")).first()[0]
    approx = o.select(F.approx_count_distinct("o_custkey", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.05


def test_percentile_approx_brackets_exact(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    exact = l.select(F.expr("percentile(l_extendedprice, 0.5)")).first()[0]
    approx = l.select(
        F.percentile_approx("l_extendedprice", 0.5, 10000)
    ).first()[0]
    assert abs(approx - exact) / exact < 0.02


def test_csv_bronze_roundtrip(spark, sf_dir, tmp_path):
    """S6/S7: the reference's bronze tier is CSV; verify schema-stable
    write/read through the declared RAW_SCHEMA."""
    from defimap_data_pipelines_spark.pipelines.ingest import (
        date_range_frame,
        sample_chain_state,
    )
    from defimap_data_pipelines_spark.schemas import RAW_SCHEMA

    bronze = sample_chain_state(
        date_range_frame(spark, "2022-01-01", "2022-01-31", ["aave_usdc"])
    )
    path = str(tmp_path / "bronze_csv")
    bronze.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(RAW_SCHEMA).option("header", True).csv(path)
    assert back.count() == 31
    assert back.schema == RAW_SCHEMA
    a = {str(r.date): r.total_apy for r in bronze.collect()}
    b = {str(r.date): r.total_apy for r in back.collect()}
    assert a == b


def test_ivf_topk_recall(spark, sf_dir):
    from defimap_data_pipelines_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 10)
    brute = {(r.query_id, r.vec_id) for r in cosine_topk(q, emb, k=5).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(q, emb, k=5, num_centroids=8, n_probe=4).collect()
    }
    assert len(approx & brute) / len(brute) >= 0.4


def test_rolling_hash_order_sensitive(spark):
    from defimap_data_pipelines_spark.functions.text import rolling_hash

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.h for r in df.select(
        "doc_id", rolling_hash(F.col("text")).alias("h")).collect()}
    assert out[1] == out[3]          # identical text -> identical hash
    assert out[1] != out[2]          # permuted tokens -> different hash
