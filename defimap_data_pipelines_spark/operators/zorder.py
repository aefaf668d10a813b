"""Z-order (Morton-curve) multidimensional clustering — the data-
skipping layout operator (engine extension; Delta's OPTIMIZE ZORDER,
re-expressed as pure Spark).

Parquet data skipping prunes row groups via min/max footer stats, but
stats are only tight for the SORT column — sort by ``user_id`` and a
``value`` predicate still reads every file. Interleaving the bits of
both dimensions into one Morton code and range-partitioning on it
gives every file a tight min/max RECTANGLE in (x, y) space, so
predicates on EITHER dimension prune (the classic multidimensional
clustering result; Morton 1966, and the layout behind Delta/Iceberg
z-ordering).

Everything here is integer arithmetic on JVM-side expressions — the
z-value is one folded ``F.expr`` projection (the plan-construction
lesson: one parsed SQL string, not 2*bits py4j Column calls), the
layout is one range shuffle, and the bit-twiddling replays exactly in
a DuckDB oracle, so file-level locality is value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (z-value spans 2*ZBITS bits). 16 bits/dim keeps
#: the interleave at 32 terms per dimension — well inside codegen
#: limits — and 65536 buckets/dim is finer than any practical file
#: count, so layout quality is bounded by the partitioner, not the
#: code.
ZBITS = 16


def _interleave_terms(expr: str, bits: int, offset: int, div: str) -> str:
    """SUM of ((expr >> i) & 1) << (2i + offset), spelled with integer
    division/modulo only so one template serves both dialects
    (``div``: Spark's ``div`` vs DuckDB's ``//``)."""
    terms = [
        f"((({expr}) {div} {1 << i}) % 2) * {1 << (2 * i + offset)}"
        for i in range(bits)
    ]
    return " + ".join(terms)


def z_value_sql(x_expr: str, y_expr: str, bits: int = ZBITS,
                dialect: str = "spark") -> str:
    """The Morton interleave of two ``bits``-bit non-negative ints as
    a SQL string. ``dialect``: 'spark' (uses ``div``) or 'duck'
    (uses ``//``); arithmetic is otherwise identical, which is the
    whole cross-engine determinism argument."""
    div = "div" if dialect == "spark" else "//"
    return (
        "("
        + _interleave_terms(x_expr, bits, 0, div)
        + " + "
        + _interleave_terms(y_expr, bits, 1, div)
        + ")"
    )


def z_value(x_expr: str, y_expr: str, bits: int = ZBITS) -> Column:
    """Morton code Column for Spark (both inputs must already be
    non-negative and < 2^bits — mask/bucket upstream)."""
    return F.expr(z_value_sql(x_expr, y_expr, bits, dialect="spark"))


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = ZBITS,
) -> DataFrame:
    """Cluster ``df`` for two-dimensional data skipping: adds
    ``zval`` and range-partitions into ``n_files`` partitions sorted
    by it — written as-is, every parquet file's (x, y) min/max
    rectangle is tight, so a filter on either column prunes files.

    One range shuffle (sampling pass + exchange), the same cost as a
    plain sort-by-one-column layout — the extra skipping dimension is
    free at write time. Callers hand the result straight to
    ``write.parquet``; tests assert the rectangle-tightness invariant
    via zorder_file_stats instead of eyeballing footers."""
    with_z = df.withColumn("zval", z_value(x_col, y_col, bits))
    return with_z.repartitionByRange(n_files, "zval").sortWithinPartitions(
        "zval"
    )


def zorder_file_stats(laid_out: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Per-partition (= per output file) min/max of both dimensions —
    the footer stats a parquet writer would record, computed without
    writing. The data-skipping win is visible as the sum of per-file
    rectangle areas being far below n_files * full-space area."""
    return (
        laid_out.withColumn("file_id", F.spark_partition_id())
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.min(x_col).alias("x_min"),
            F.max(x_col).alias("x_max"),
            F.min(y_col).alias("y_min"),
            F.max(y_col).alias("y_max"),
        )
    )
