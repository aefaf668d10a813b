"""Incremental GOTK == full-history batch recompute, row for row.

The exact-integer reward accumulation makes the daily O(1)-state update
bit-equal to the reference's full recompute — this is the proof that
incremental mode can replace the daily WRITE_TRUNCATE without any
result drift.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.growth import growth_of_10k
from defimap_data_pipelines_spark.pipelines.incremental import (
    incremental_gotk_step,
    initial_gotk_state,
)
from defimap_data_pipelines_spark.plans.domain import orders_raw_series


def test_incremental_equals_batch(spark, sf_dir):
    raw = orders_raw_series(spark, sf_dir).filter(
        F.col("date").between("2001-06-01", "2001-07-31")
    ).cache()
    split = "2001-07-20"
    history = raw.filter(F.col("date") <= split)
    future_dates = sorted(
        r.date for r in raw.filter(F.col("date") > split)
        .select("date").distinct().collect()
    )

    state = initial_gotk_state(history)
    got_rows = []
    for d in future_dates:
        day = raw.filter(F.col("date") == F.lit(str(d)))
        rows, state = incremental_gotk_step(state, day)
        # materialize both: state feeds the next loop iteration
        got_rows.extend(rows.collect())
        state = spark.createDataFrame(state.collect(), state.schema)

    batch = {
        (r.name, str(r.date)): r
        for r in growth_of_10k(raw).filter(F.col("date") > split).collect()
    }
    assert len(got_rows) == len(batch)
    for r in got_rows:
        b = batch[(r.name, str(r.date))]
        assert r.end_day_investment == pytest.approx(
            b.end_day_investment, rel=0, abs=0
        ), (r.name, r.date)
        assert r.start_day_investment == b.start_day_investment
        assert r.percent_change == b.percent_change


def test_incremental_tvl_equals_batch(spark, sf_dir):
    from defimap_data_pipelines_spark.operators.tvl import tvl
    from defimap_data_pipelines_spark.pipelines.incremental import (
        incremental_tvl_step,
        initial_tvl_state,
    )

    raw = orders_raw_series(spark, sf_dir).filter(
        F.col("date").between("2001-07-01", "2001-07-31")
    ).cache()
    split = "2001-07-25"
    state = initial_tvl_state(raw.filter(F.col("date") <= split))
    future_dates = sorted(
        r.date for r in raw.filter(F.col("date") > split)
        .select("date").distinct().collect()
    )
    got = []
    for d in future_dates:
        rows, state = incremental_tvl_step(
            state, raw.filter(F.col("date") == F.lit(str(d)))
        )
        got.extend(rows.collect())
        state = spark.createDataFrame(state.collect(), state.schema)

    batch = {
        (r.name, str(r.date)): r
        for r in tvl(raw).filter(F.col("date") > split).collect()
    }
    assert len(got) == len(batch)
    for r in got:
        b = batch[(r.name, str(r.date))]
        assert r.tvl == b.tvl and r.change_tvl == b.change_tvl
        assert r.percent_change == b.percent_change
