"""Round-9 bug-hunt FINDING, fixed in round 10 — now pinned as a
cross-engine AGREEMENT contract.

The quantized value-block substrates (roc_auc / pr_auc / lift_gains /
mannwhitney_pairs / kruskal_wallis / wasserstein_drift) rank blocks
with a window over vq. A NULL score used to form its own block, and
the engines PLACED it differently: Spark windows default NULLS FIRST
for ASC, DuckDB defaults NULLS LAST — every non-null block's
cumulative offset shifted by the null count on one engine only,
silently skewing the statistic (measured in r9: AUC 0.25 vs 0.5 on a
6-row fixture; docs/ROUND9_NOTES.md §15).

The r10 fix drops NULL scores at every substrate (sklearn convention:
a row without a score cannot be ranked) and mirrors
``WHERE value IS NOT NULL`` into the oracle texts. This file replaces
the r9 tripwire (which asserted the DIVERGENCE) with the real
contract: on a null-containing events table, every registered query
of the family produces IDENTICAL results on Spark and DuckDB, and
roc_auc matches the hand-computed nulls-dropped answer.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SCORE_COLUMNS = {
    "events": ["value"],
    "documents": ["n_chars"],
    "lineitem": ["l_extendedprice", "l_quantity", "l_discount"],
    "orders": ["o_totalprice"],
}

SUBSTRATE_QUERIES = [
    "roc_auc",
    "pr_auc",
    "lift_gains",
    "mannwhitney_u",
    "kruskal_wallis",
    "wasserstein_drift",
]

_ROWS = [
    (1.0, "purchase"),
    (2.0, "view"),
    (None, "purchase"),
    (3.0, "view"),
    (None, "view"),
    (1.0, "view"),
]


@pytest.fixture(scope="module")
def null_events_dir(tmp_path_factory):
    """sf0.001 events with every 7th value NULLed — the legal-but-
    previously-divergent input shape."""
    d = tmp_path_factory.mktemp("null_events")
    df = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    df.loc[df.index % 7 == 0, "value"] = np.nan
    df.to_parquet(d / "events.parquet", index=False)
    return str(d)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSTRATE_QUERIES)
def test_substrate_queries_agree_cross_engine_with_nulls(
    spark, null_events_dir, name
):
    """Each substrate query, run EXACTLY as registered, on an events
    table with NULL scores: Spark == DuckDB (both drop nulls)."""
    from defimap_data_pipelines_spark.plans.queries import ORACLE, QUERIES

    got = _normalize(QUERIES[name](spark, null_events_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet("
        f"'{null_events_dir}/events.parquet')"
    )
    exp = _normalize(con.execute(ORACLE[name]).fetchdf())
    assert list(got.columns) == list(exp.columns), (name, got.columns)
    assert len(got) == len(exp), (name, len(got), len(exp))
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(
                got[c].to_numpy(dtype=float),
                exp[c].to_numpy(dtype=float),
                rtol=0,
                atol=1e-9,
                equal_nan=True,
            ), (name, c)
        else:
            assert got[c].astype(str).tolist() == exp[c].astype(
                str
            ).tolist(), (name, c)


def test_roc_auc_drops_nulls_hand_check(spark):
    """The 6-row r9 fixture, nulls dropped by hand: rows (1,pos),
    (1,neg),(2,neg),(3,neg) -> n1=1, n0=3, positive's average rank
    1.5 -> AUC = (1.5 - 1) / 3 = 1/6. Neither engine's OLD number
    (Spark 0.25 / DuckDB 0.5) — the substrate now computes the
    sklearn-convention statistic, not a null-placement artifact."""
    from defimap_data_pipelines_spark.operators.evalmetrics import roc_auc

    df = spark.createDataFrame(_ROWS, "value double, event_type string")
    got = roc_auc(df, F.col("event_type") == "purchase", "value").collect()[0]
    assert got["n_pos"] == 1 and got["n_neg"] == 3
    assert math.isclose(got["auc"], 1.0 / 6.0, abs_tol=1e-9)


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_generated_score_columns_are_null_free(sf):
    """Data-shape documentation (no longer a correctness precondition
    since the null-drop fix): every column used as a quantized
    ranking score is null-free in the generated tables."""
    for table, cols in SCORE_COLUMNS.items():
        df = pd.read_parquet(
            f"/root/testdata/{sf}/{table}.parquet", columns=cols
        )
        for c in cols:
            assert int(df[c].isna().sum()) == 0, (sf, table, c)
