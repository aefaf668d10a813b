"""Round-9 bug-hunt FINDING, pinned as an executable contract.

The quantized value-block substrates (roc_auc / mannwhitney_pairs /
kruskal_wallis / wasserstein's cumulative windows) rank blocks with an
ASCENDING window over vq. A NULL score forms its own block, and the
engines PLACE it differently: Spark windows default NULLS FIRST for
ASC, DuckDB defaults NULLS LAST — every non-null block's cumulative
offset shifts by the null count on one engine only, silently skewing
the statistic (measured: AUC 0.25 vs 0.5 on a 6-row fixture).

NULL scores are malformed metric input (sklearn raises on NaN), the
generated test tables are null-free in every score column (asserted
below), and DESC substrates (pr_auc, lift_gains) agree because both
engines default NULLS LAST under DESC. The family-wide fix — drop
null scores in _score_blocks and its siblings, mirrored into the
oracle texts — is scheduled with the r10 window rotation (the helpers
are shared by non-window queries, so the r9 freshness discipline
blocks the code change this round; see docs/ROUND9_NOTES.md §15).

The divergence assertion below is a deliberate tripwire: applying the
r10 fix flips it, forcing whoever lands the fix to retire this
contract in the same commit.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SCORE_COLUMNS = {
    "events": ["value"],
    "documents": ["n_chars"],
    "lineitem": ["l_extendedprice", "l_quantity", "l_discount"],
    "orders": ["o_totalprice"],
}

_ROWS = [
    (1.0, "purchase"),
    (2.0, "view"),
    (None, "purchase"),
    (3.0, "view"),
    (None, "view"),
    (1.0, "view"),
]


def test_null_scores_diverge_until_r10_fix(spark):
    """Tripwire: Spark and DuckDB disagree on NULL-score AUC today.
    When the r10 null-drop fix lands this test FAILS — update the
    substrate contract (and delete this test) in that commit."""
    from defimap_data_pipelines_spark.operators.evalmetrics import roc_auc
    from defimap_data_pipelines_spark.plans.queries import ORACLE

    df = spark.createDataFrame(_ROWS, "value double, event_type string")
    got = roc_auc(df, F.col("event_type") == "purchase", "value").collect()[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({v if v is not None else 'NULL'}, '{t}')" for v, t in _ROWS
        )
        + ") t(value, event_type)"
    )
    oracle = con.execute(ORACLE["roc_auc"]).fetchall()[0]
    assert got["auc"] != oracle[2], (
        "NULL-score placement now agrees cross-engine — the r10 fix "
        "landed; retire this tripwire and the notes contract"
    )


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_generated_score_columns_are_null_free(sf):
    """The contract's precondition where parity actually runs: every
    column used as a quantized ranking score is null-free in the
    generated tables at every tested SF."""
    for table, cols in SCORE_COLUMNS.items():
        df = pd.read_parquet(
            f"/root/testdata/{sf}/{table}.parquet", columns=cols
        )
        for c in cols:
            assert int(df[c].isna().sum()) == 0, (sf, table, c)
