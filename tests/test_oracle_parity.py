"""Oracle-differential tests: every registered query vs DuckDB, exact.

This mirrors the driver's correctness gate (row count + columns + exact
values after sorting) at sf0.001 for speed; tools/parity.py runs the
same check at sf0.01.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from defimap_data_pipelines_spark.plans.queries import ORACLE, QUERIES
from defimap_data_pipelines_spark.sources.parquet import TESTDATA_TABLES


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE:
        assert len(sdf) >= 0  # rows-only contract: must run
        return
    odf = duck.execute(ORACLE[name]).df()
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b), f"rowcount {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            mism = (av.fillna(-9e99) != bv.fillna(-9e99)).sum()
        else:
            mism = (av.astype(str) != bv.astype(str)).sum()
        assert mism == 0, f"col {c}: {mism}/{len(a)} value mismatches"


def test_no_decimal_columns_in_any_oracle_output(duck):
    """Structural guard for the round-3 driver failure class.

    DuckDB's SUM over BIGINT returns HUGEINT (arrow decimal128(38,0)),
    which value-compares equal to Spark's int64 but hashes differently in
    the driver's dtype-sensitive value hash — r3 lost 4 window slots to
    exactly this.  Every oracle SQL must CAST such aggregates so that NO
    oracle result schema contains a decimal column, ever.
    """
    offenders = {}
    for name, sql in sorted(ORACLE.items()):
        schema = duck.execute(sql).arrow().schema
        decs = [f"{f.name}:{f.type}" for f in schema if str(f.type).startswith("decimal")]
        if decs:
            offenders[name] = decs
    assert not offenders, f"oracle SQL emits decimal columns: {offenders}"
