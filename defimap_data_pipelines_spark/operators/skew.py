"""Skew-handling aggregation helpers (100 TB posture).

AQE's skew-join splitting covers joins; skewed GROUP BY keys (one
strategy or one user dominating) still funnel into one reducer. The
classic fix is salting: aggregate on (key, salt) first (spreading the
hot key over ``buckets`` reducers), then combine the partials. Works
for any algebraic aggregate; exposed here for sum/count/min/max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, Column] | None = None,
    count_alias: str | None = None,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``sums``: output alias -> input expression (summed exactly in both
    phases). ``count_alias``: add a row count. Deterministic salt
    (hash of all columns) so results are reproducible.
    """
    sums = sums or {}
    salt = (F.xxhash64(*[F.col(c) for c in df.columns]) % buckets).alias("_salt")
    phase1 = df.select(*keys, salt, *[e.alias(f"_s_{a}") for a, e in sums.items()])
    partial_aggs = [F.sum(f"_s_{a}").alias(f"_p_{a}") for a in sums]
    if count_alias:
        partial_aggs.append(F.count(F.lit(1)).alias("_p_cnt"))
    partial = phase1.groupBy(*keys, "_salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"_p_{a}").alias(a) for a in sums]
    if count_alias:
        final_aggs.append(F.sum("_p_cnt").alias(count_alias))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-proof equi-join: salt the big side, replicate the small side.

    AQE's skew splitting only kicks in post-shuffle and only for
    sort-merge joins; when one key holds a double-digit share of the
    fact table, pre-salting guarantees the hot key spreads over
    ``buckets`` tasks regardless of strategy. The big side gets a
    deterministic per-row salt; the small side is exploded ``buckets``×
    (fine — it is the small side) so every (key, salt) pair finds its
    match. Inner-join semantics on ``key``.
    """
    # pmod, not %: Spark's % keeps the sign of xxhash64, and a negative
    # salt would never meet the replicated side's 0..buckets-1 range
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), buckets)
    )
    replicated = small.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return salted_big.join(replicated, [key, "_salt"]).drop("_salt")
