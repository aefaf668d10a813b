"""Count-min sketch over token streams (engine extension).

The HLL query (plans/queries.py::hll_distinct_users) covers distinct
counting; this module adds the FREQUENCY sketch: a count-min sketch
whose (depth x width) counter grid is built with one map-side-combined
groupBy, answering point frequency queries with the classic
``min over depth rows`` upper bound. Hash functions are md5-derived
(the repo's cross-engine determinism rule — memory:
spark-plan-construction-costs / build-loop-workflow), so the whole
sketch, including its collision errors, replays exactly in a DuckDB
oracle.

At 100 TB: the token stream never materializes per-token rows beyond
the exploded scan; the sketch itself is depth*width counters (KBs),
so estimation joins broadcast. This is how you answer "how often does
this n-gram appear corpus-wide" for millions of probes without a
second corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPTH = 4
WIDTH = 64


def _cms_bucket(token, row: int, width: int):
    """Row-``row`` bucket: first 8 md5 hex chars of ``row|token``."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(row)), token)), 1, 8
        ),
        16,
        10,
    )
    return (h.cast("long") % width).cast("int")


def cms_bucket_sql(token_expr: str, row: int, width: int = WIDTH) -> str:
    """DuckDB twin of :func:`_cms_bucket` for oracle SQL."""
    return (
        f"CAST(('0x' || substr(md5('{row}|' || {token_expr}), 1, 8))::BIGINT"
        f" % {width} AS INTEGER)"
    )


def cms_counters(
    tokens: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (row, bucket, c) counters from a token stream
    (one input row per token OCCURRENCE — or, with ``weight_col``, one
    row per DISTINCT token carrying its occurrence count: the cell
    sums are identical, so a pipeline that already aggregated exact
    counts feeds the pre-reduced frame and skips a second corpus
    pass). One explode to ``depth`` (row, bucket) cells per input row,
    one map-side-combined groupBy; output is at most depth*width rows
    regardless of corpus size."""
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    cells = tokens.select(
        w.alias("_w"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_bucket(F.col(token_col), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    )
    return cells.groupBy("rb.row", "rb.bucket").agg(
        F.sum("_w").cast("long").alias("c")
    )


def cms_estimate(
    counters: DataFrame,
    probes: DataFrame,
    token_col: str = "token",
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``probes``: min over the sketch's
    depth rows of the probed cells. The sketch side is tiny (<=
    depth*width rows) and broadcasts; estimate >= true count always
    (one-sided error — the test pins both bounds)."""
    cells = probes.select(
        token_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("row"),
                        _cms_bucket(F.col(token_col), r, width).alias(
                            "bucket"
                        ),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(token_col, "rb.row", "rb.bucket")
    return (
        cells.join(F.broadcast(counters), ["row", "bucket"])
        .groupBy(token_col)
        .agg(F.min("c").cast("long").alias("cms_estimate"))
    )
