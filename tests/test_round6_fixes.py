"""Regression tests for the round-6 verdict/advice fixes:

- ewma_quantized: duplicate order keys must raise (not return
  partition-layout-dependent output) — r5 verdict finding #2.
- khop_reach: src/dst column parameters like every sibling graph
  operator — r5 verdict finding #3 / advice #4.
- assign_shards: shard names containing quotes must not break (or
  inject into) the parsed SQL expression — advice #3.
- apportion_largest_remainder: zero total weight fails loudly instead
  of emitting NULL allocations — advice #2.
- fit_or_load_frame: only PATH_NOT_FOUND means "not fitted"; any
  other load error propagates instead of silently refitting and
  overwriting the artifact — advice #5.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ewma_duplicate_order_raises(spark):
    from defimap_data_pipelines_spark.operators.rolling import (
        ewma_quantized,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)],
        "k string, o int, x double",
    )
    with pytest.raises(Exception, match="duplicate order"):
        ewma_quantized(df, "k", "o", "x").collect()


def test_ewma_unique_order_still_exact(spark):
    from defimap_data_pipelines_spark.operators.rolling import (
        ewma_quantized,
    )

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, -3.0)],
        "k string, o int, x double",
    )
    rows = {
        r["o"]: r["ewma_q"]
        for r in ewma_quantized(df, "k", "o", "x").collect()
    }
    # e1=1e6; e2=(2e6+1e6) div 2 = 1.5e6; e3=(-3e6+1.5e6) div 2 =
    # trunc(-0.75e6) = -750000
    assert rows == {1: 1_000_000, 2: 1_500_000, 3: -750_000}


def test_khop_reach_custom_columns(spark):
    from defimap_data_pipelines_spark.operators.graph import khop_reach

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "frm int, tto int"
    )
    seeds = spark.createDataFrame([(1,)], "s int")
    out = khop_reach(edges, seeds, hops=2, src="frm", dst="tto")
    got = {(r["hop"], r["reach"]) for r in out.collect()}
    assert got == {(1, 1), (2, 2)}


def test_assign_shards_quoted_name(spark):
    from defimap_data_pipelines_spark.operators.sharding import (
        assign_shards,
    )

    shards = ["it's-a", "plain"]
    d = spark.range(50).select(F.col("id").alias("k"))
    out = assign_shards(d, "k", shards)
    vals = {r["shard"] for r in out.collect()}
    assert vals <= set(shards) and len(vals) == 2


def test_apportion_zero_total_raises(spark):
    from defimap_data_pipelines_spark.operators.sharding import (
        apportion_largest_remainder,
    )

    cells = spark.createDataFrame(
        [("a", 0), ("b", 0)], "name string, weight long"
    )
    out = apportion_largest_remainder(cells, 10, order_cols=["name"])
    with pytest.raises(Exception, match="total weight"):
        out.collect()


def test_fit_or_load_propagates_non_path_errors(spark, tmp_path):
    from pyspark.errors import AnalysisException

    from defimap_data_pipelines_spark.pipelines.models import (
        ModelStore,
        fit_or_load_frame,
    )

    store = ModelStore(str(tmp_path / "store"))
    calls = []

    def fit():
        calls.append(1)
        return spark.range(3).select(F.col("id").alias("x"))

    # missing artifact -> fits once, then loads without refitting
    a = fit_or_load_frame(store, spark, "art", fit)
    assert a.count() == 3 and calls == [1]
    b = fit_or_load_frame(store, spark, "art", fit)
    assert b.count() == 3 and calls == [1]

    # any OTHER load failure must propagate, not trigger a refit
    def boom(spark_, name):
        raise AnalysisException("[UNABLE_TO_ACQUIRE] simulated corrupt store")

    store.load_frame = boom  # type: ignore[method-assign]
    with pytest.raises(AnalysisException, match="UNABLE_TO_ACQUIRE"):
        fit_or_load_frame(store, spark, "art", fit)
    assert calls == [1]
