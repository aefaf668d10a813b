"""Round-10 bug hunt capstone #2 — the FLAGSHIP: growth-of-$10k
replayed in pure python from the raw series, following the reference
contract step by step (first-value capital rebase, quantized reward
accrual, reward*price + capital, LAG/IFNULL percent change). The
golden tests pin two end values on a synthetic chain; this checks
EVERY row of the registered flagship query against an independent
walk of the same raw frame.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from defimap_data_pipelines_spark.plans.queries import QUERIES

QUANT_SCALE = 1_000_000
PRINCIPAL = 10_000.0


def _ha(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def test_gotk_matches_python_walk(spark, sf_dir):
    from defimap_data_pipelines_spark.plans.queries import (
        orders_raw_series,
    )

    raw = orders_raw_series(spark, sf_dir).select(
        "date", "name", "asset_price", "liquidity_index",
        "aave_apy", "aave_price",
    ).collect()
    got = {
        (r["name"], str(r["date"])): r
        for r in QUERIES["gotk"](spark, sf_dir).collect()
    }
    series: dict = defaultdict(list)
    for r in raw:
        series[r["name"]].append(r)
    total = 0
    for name, rows in series.items():
        rows.sort(key=lambda r: r["date"])
        p0 = rows[0]["asset_price"]
        li0 = rows[0]["liquidity_index"]
        reward_q = 0
        prev_edi = None
        for r in rows:
            capital = (
                PRINCIPAL
                / p0
                * r["liquidity_index"]
                / li0
                * r["asset_price"]
            )
            rate = r["aave_apy"] / 365 / 100
            contrib = capital * rate / r["aave_price"]
            reward_q += _ha(contrib * QUANT_SCALE)
            edi = (reward_q / QUANT_SCALE) * r["aave_price"] + capital
            sdi = PRINCIPAL if prev_edi is None else prev_edi
            g = got[(name, str(r["date"]))]
            assert g["start_day_investment"] == pytest.approx(
                sdi, rel=1e-12
            )
            assert g["end_day_investment"] == pytest.approx(
                edi, rel=1e-12
            )
            assert g["percent_change"] == pytest.approx(
                edi / sdi - 1, abs=1e-12
            )
            prev_edi = edi
            total += 1
    assert total == len(got)
