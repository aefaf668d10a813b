"""As-of (point-in-time) join — engine extension.

The reference's J2 alignment (benchmark vs strategy series,
aave_transform.py:366-369) only ever needs equi-joins because both
series share a daily grid; a real point-in-time store (its blockchain
reads are exactly that, SURVEY.md §1.1) needs an as-of join. Spark has
no built-in; the scalable formulation used here is the classic
union-and-carry trick:

  union left probes and right states tagged by a marker, sort each key
  group by (ts, marker), and carry the right payload forward with
  last(ignorenulls) over the cumulative frame. One shuffle on the key,
  no range-join explosion, and skew behaves like any window by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right ``value_cols`` —
    latest with right.ts <= left.ts (``direction="backward"``, the
    point-in-time read) or earliest with right.ts >= left.ts
    (``"forward"``, the what-happened-next probe) — per ``on`` key.

    Right rows sort before left rows at equal timestamps (marker 0 < 1),
    so an exactly-simultaneous state is visible to the probe in either
    direction. Forward is the same union-and-carry scan over a
    descending timestamp order. Ties on the boundary timestamp resolve
    to the max value (last in value-ascending carry order) both ways.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.lit(1).alias("_marker"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts_col),
        F.lit(0).alias("_marker"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in on and c != ts_col:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.unionByName(r, allowMissingColumns=False)
    ts_order = (
        F.col(ts_col).asc() if direction == "backward" else F.col(ts_col).desc()
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            ts_order,
            F.col("_marker").asc(),
            *[F.col(f"_v_{c}").asc_nulls_first() for c in value_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(
            f"{c}{suffix}", F.last(f"_v_{c}", ignorenulls=True).over(w)
        )
    return u.filter(F.col("_marker") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in value_cols]
    )
