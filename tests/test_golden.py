"""Golden end-to-end regression: the full ingest -> transform pipeline
over the deterministic synthetic chain produces pinned values.

These numbers were produced by the oracle-validated implementation; any
drift in window semantics, quantization, or risk math between rounds
shows up here before it shows up in the driver's gate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.pipelines.ingest import (
    date_range_frame,
    sample_chain_state,
)
from defimap_data_pipelines_spark.pipelines.transform import run_transform

GOLDEN_GOTK = {
    "aave_usdc": (10230.894611, -0.001850828),
    "aave_wbtc": (10184.700975, -0.0006080383),
}
GOLDEN_RISK = {
    "aave_usdc": (0.0790397081, 0.22525111, -0.0098160656, "2023-05-15", "2023-05-22", 7),
    "aave_wbtc": (0.0785845598, 0.18592016, -0.0096486247, "2023-02-06", "2023-02-07", 1),
}
GOLDEN_TVL = {"aave_usdc": 1052598.0678, "aave_wbtc": 1035671.8193}


@pytest.fixture(scope="module")
def tables(spark):
    bronze = sample_chain_state(
        date_range_frame(spark, "2022-01-01", "2023-06-30", ["aave_usdc", "aave_wbtc"])
    ).cache()
    return run_transform(bronze, ds="2023-06-30", start_date="2022-01-01")


def test_golden_gotk(tables):
    rows = {
        r.name: r
        for r in tables["growth_of_10k"]
        .filter(F.col("date") == "2023-06-30")
        .collect()
    }
    for name, (edi, pc) in GOLDEN_GOTK.items():
        assert rows[name].end_day_investment == pytest.approx(edi, abs=1e-5)
        assert rows[name].percent_change == pytest.approx(pc, abs=1e-9)


def test_golden_risk(tables):
    rows = {r.name: r for r in tables["pre_risk"].collect()}
    for name, (sd, sharpe, mdd, peak, valley, dur) in GOLDEN_RISK.items():
        r = rows[name]
        assert r.sd == pytest.approx(sd, abs=1e-9)
        assert r.sharpe == pytest.approx(sharpe, abs=1e-7)
        assert r.max_drawdown == pytest.approx(mdd, abs=1e-9)
        assert str(r.peak_date) == peak
        assert str(r.valley_date) == valley
        assert r.duration == dur


def test_golden_tvl(tables):
    rows = {
        r.name: r.tvl
        for r in tables["tvl"].filter(F.col("date") == "2023-06-30").collect()
    }
    for name, tvl in GOLDEN_TVL.items():
        assert rows[name] == pytest.approx(tvl, abs=1e-3)
