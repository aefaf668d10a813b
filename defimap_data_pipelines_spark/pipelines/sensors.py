"""Table-availability sensors and the sensed cross-pipeline join —
the Spark-side equivalent of the reference's Airflow orchestration
edges (SURVEY.md §2 S14 ExternalTaskSensor/TriggerDagRunOperator,
aave_extract.py:762-809 / aave_transform.py:556-585, and J3, the
cross-DAG "join" at aave_transform.py:556-577).

The reference expresses "transform may start once raw_data and
token_price are fresh" as two sensors poking every 120 s with an
1800 s timeout (aave_extract.py:768-770). In a Spark-first design the
same dependency is usually a SINGLE job DAG (lineage explicit, no
sensors — SURVEY §4), or a Structured Streaming file source that
simply processes data as it lands (the streaming twin,
streaming/jobs.py). This module covers the remaining case — separate
jobs coordinating through storage — with the same poke/timeout
semantics:

- ``wait_for_table``: poll until a parquet path exists AND an
  optional freshness predicate over its content holds (the
  reference's "is ds present upstream" check). Clock and sleep are
  injected so tests drive time; the default cadence is the
  reference's 120 s / 1800 s.
- ``sensed_join``: J3 as a function — wait for both upstream tables'
  freshness for a given ds, then return the transform's join frame.
  The "join" the reference performs across DAGs via sensors becomes
  an actual Spark join guarded by the same availability contract.

Orchestration-shaped IO, not engine operators — no DuckDB oracle;
covered by tests/test_sensors_abi.py.
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SensorTimeout(TimeoutError):
    pass


def _readable(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception as e:  # PATH_NOT_FOUND / empty dir
        if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
            return None
        raise


def wait_for_table(
    spark: SparkSession,
    path: str,
    predicate: Callable[[DataFrame], bool] | None = None,
    poke_interval: float = 120.0,
    timeout: float = 1800.0,
    clock: Callable[[], float] = _time.monotonic,
    sleep: Callable[[float], None] = _time.sleep,
) -> DataFrame:
    """Block until ``path`` reads as parquet and ``predicate(df)``
    (if given) is true; returns the DataFrame. Raises SensorTimeout
    after ``timeout`` seconds of poking every ``poke_interval`` —
    the reference's reschedule-mode sensor contract."""
    deadline = clock() + timeout
    while True:
        df = _readable(spark, path)
        if df is not None and (predicate is None or predicate(df)):
            return df
        if clock() >= deadline:
            raise SensorTimeout(
                f"sensor timed out after {timeout}s waiting for {path}"
            )
        sleep(poke_interval)


def fresh_through(ds: str, date_col: str = "date"):
    """Freshness predicate factory: the table contains rows at or
    beyond ``ds`` — the reference sensors' "upstream ran for this
    ds" condition."""

    def pred(df: DataFrame) -> bool:
        row = df.agg(
            F.max(F.col(date_col).cast("date")).alias("mx")
        ).collect()[0]
        return row["mx"] is not None and str(row["mx"]) >= ds

    return pred


def sensed_join(
    spark: SparkSession,
    raw_path: str,
    price_path: str,
    ds: str,
    on: str = "date",
    how: str = "inner",
    poke_interval: float = 120.0,
    timeout: float = 1800.0,
    clock: Callable[[], float] = _time.monotonic,
    sleep: Callable[[float], None] = _time.sleep,
) -> DataFrame:
    """J3: wait for BOTH upstream tables to be fresh through ``ds``,
    then return their join — the cross-DAG dependency expressed as
    one guarded Spark job. Sensors share one deadline (the reference
    chains two sensors inside one DAG-run SLA)."""
    deadline_left = timeout
    t0 = clock()
    raw = wait_for_table(
        spark, raw_path, fresh_through(ds), poke_interval, timeout,
        clock, sleep,
    )
    deadline_left = max(0.0, timeout - (clock() - t0))
    price = wait_for_table(
        spark, price_path, fresh_through(ds), poke_interval,
        deadline_left, clock, sleep,
    )
    return raw.join(price, on=on, how=how)
