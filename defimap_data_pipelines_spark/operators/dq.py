"""Declarative data-quality checks (constraint validation).

The reference enforces schema at load time (explicit BQ schemas,
aave_extract.py:717-727) but has no content assertions; any real
warehouse needs them, and at 100 TB each check must be a single
aggregation or anti join — never a collect. Each check returns a
one-row (check, table, violations) frame; ``run_checks`` unions them
so a whole suite is one job with independent, parallel branches.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _result(check: str, table: str, violations: Column) -> Column:
    return F.struct(
        F.lit(check).alias("check"),
        F.lit(table).alias("table"),
        violations.cast("long").alias("violations"),
    )


def check_unique(df: DataFrame, keys: list[str], table: str) -> DataFrame:
    """Rows beyond the first per key tuple (0 = key is unique)."""
    v = F.count(F.lit(1)) - F.count_distinct(*[F.col(k) for k in keys])
    return df.agg(
        _result(f"unique({', '.join(keys)})", table, v).alias("r")
    ).select("r.*")


def check_not_null(df: DataFrame, col: str, table: str) -> DataFrame:
    v = F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
    return df.agg(
        _result(f"not_null({col})", table, F.coalesce(v, F.lit(0))).alias("r")
    ).select("r.*")


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, table: str
) -> DataFrame:
    v = F.sum(F.when(~F.col(col).between(lo, hi), 1).otherwise(0))
    return df.agg(
        _result(
            f"range({col} in [{lo}, {hi}])", table, F.coalesce(v, F.lit(0))
        ).alias("r")
    ).select("r.*")


def check_referential(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    table: str,
) -> DataFrame:
    """Orphaned child rows (anti join against the parent key set)."""
    orphans = child.join(
        parent.select(F.col(parent_key)),
        child[child_key] == parent[parent_key],
        "left_anti",
    )
    return orphans.agg(
        _result(
            f"fk({child_key} -> {parent_key})", table, F.count(F.lit(1))
        ).alias("r")
    ).select("r.*")


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union a suite into one (check, table, violations) report."""
    return reduce(lambda a, b: a.unionByName(b), checks)


def k_anonymity_risk(
    df: DataFrame,
    qi_cols: list,
    report_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity risk profile over quasi-identifier columns — the
    data-governance gate before a table leaves the pipeline: any QI
    combination shared by fewer than ``k`` rows re-identifies its
    members. Groups rows by the full QI tuple, then reports per
    ``report_col``: total rows, QI group count, groups below k, rows
    in those groups, and reident_risk = small-group rows / rows.

    Two map-side-combinable aggregations (rows -> QI cells -> report
    groups), exact integer counts, one float division at the end.
    The QI cell frame is the privacy artifact itself — bounded by
    the QI domain product, not row count."""
    cells = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    rep = cells.groupBy(F.col(report_col).alias("segment")).agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
        .cast("long")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("n_rows_small"),
    )
    return rep.select(
        "segment",
        "n_rows",
        "n_groups",
        "n_small_groups",
        "n_rows_small",
        F.round(
            F.col("n_rows_small").cast("double") / F.col("n_rows"), 9
        ).alias("reident_risk"),
    ).orderBy("segment")
