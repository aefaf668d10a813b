"""Local replica of the driver's correctness gate.

Runs each registered query on Spark AND its oracle SQL on DuckDB at a
given SF dir, then compares row count, column names/dtypes, and exact
values (rows sorted by all columns, columns sorted by name) — mirroring
the driver's order-insensitive value hash.

Usage: python tools/parity.py [--vanilla] [--window] [sf_dir] [query ...]\n  --window: run exactly the driver's 50-query checked window
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

from defimap_data_pipelines_spark.session import get_spark
from defimap_data_pipelines_spark.plans.queries import ORACLE, QUERIES
from defimap_data_pipelines_spark.sources.parquet import TESTDATA_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if df[c].dtype == object:
            # date objects -> iso strings for stable sorting
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, spark, con, sf_dir: str) -> bool:
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE:
        print(f"  {name}: rows-only ({len(sdf)} rows) — no oracle")
        return True
    odf = con.execute(ORACLE[name]).df()
    a, b = normalize(sdf), normalize(odf)
    ok = True
    if list(a.columns) != list(b.columns):
        print(f"  {name}: COLUMN MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        return False
    if len(a) != len(b):
        print(f"  {name}: ROWCOUNT MISMATCH spark={len(a)} duck={len(b)}")
        ok = False
    if ok:
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                eq = (av.fillna(-9e99) == bv.fillna(-9e99))
            else:
                eq = av.astype(str) == bv.astype(str)
            bad = (~eq).sum()
            if bad:
                ok = False
                idx = (~eq).idxmax()
                print(
                    f"  {name}: col '{c}' {bad}/{len(a)} mismatches; "
                    f"first at row {idx}: spark={av[idx]!r} duck={bv[idx]!r}"
                )
    print(f"  {name}: {'OK' if ok else 'FAIL'} ({len(a)} rows, {len(a.columns)} cols)")
    return ok


def vanilla_spark():
    """A driver-like session: default configs, no engine overrides.

    The driver runs queries() under its own plain SparkSession, so any
    behavior that depends on get_spark()'s config tuning (e.g. parquet
    TIMESTAMP_NTZ inference) passes locally but fails the gate. Running
    parity with --vanilla replicates the driver's environment.
    """
    import os

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return (
        SparkSession.builder.appName("parity-vanilla")
        .master(f"local[{cpus}]")
        .getOrCreate()
    )


def main() -> int:
    argv = list(sys.argv[1:])
    use_vanilla = "--vanilla" in argv
    if use_vanilla:
        argv.remove("--vanilla")
    use_window = "--window" in argv
    if use_window:
        argv.remove("--window")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    if use_window:
        # exactly the driver's checked surface: the first 50 registered
        names = list(QUERIES)[:50]
    else:
        names = argv[1:] or list(QUERIES)
    spark = vanilla_spark() if use_vanilla else get_spark("parity")
    con = duck_connect(sf_dir)
    fails = [n for n in names if not compare(n, spark, con, sf_dir)]
    print(f"\n{len(names) - len(fails)}/{len(names)} queries match at {sf_dir}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
