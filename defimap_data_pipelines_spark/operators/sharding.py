"""Stable shard assignment and exact budget apportionment.

Two placement primitives a large curation pipeline needs around its
writers and samplers:

- Rendezvous (highest-random-weight) hashing assigns every key to the
  shard with the largest keyed hash. Unlike ``hash(key) % N`` — where
  changing N remaps almost EVERY key — adding a shard under HRW moves
  exactly the keys whose new-shard hash beats all old ones: an expected
  1/(N+1) fraction, and every moved key lands ON the new shard. That is
  the property that lets a 100 TB dataset grow its shard count without
  rewriting N-1/N of the files (Thaler & Ravishankar 1996, the scheme
  behind consistent bucket placement in most object stores).

- Largest-remainder (Hamilton) apportionment turns fractional
  proportional quotas into an EXACT integer allocation: floor every
  quota, then hand the leftover units to the largest remainders. The
  result sums to the budget exactly — the property samplers need when
  "take 1M documents proportional to source size" must mean exactly
  1M, not 1M±rounding.

Both are md5-exact (the sampling.py determinism contract), so a DuckDB
oracle replays assignments bit-for-bit. The reference has no
counterpart surface (greenfield per SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Default shard names for the registered query: zero-padded so shard
#: string order == numeric order (deterministic tie-break both engines).
DEFAULT_SHARDS = [f"shard-{i:02d}" for i in range(16)]


def _shard_array_sql(shards: list[str]) -> str:
    # Shard names are interpolated into a parsed SQL expression:
    # double any single quote (the SQL escape) so a name like
    # "it's-a" can't break the expression or inject syntax from a
    # caller-supplied shard list.
    inner = ", ".join("'" + s.replace("'", "''") + "'" for s in shards)
    return f"array({inner})"


def assign_shards(
    df: DataFrame,
    key_col: str,
    shards: list[str] | None = None,
    out_col: str = "shard",
) -> DataFrame:
    """All input columns + ``out_col`` = the highest-random-weight
    shard of ``key_col``: argmax over shards of the first 60 md5 bits
    of ``key || '|' || shard``. Emitted as ONE parsed SQL expression —
    N py4j column builds per row expression is the plan-construction
    cost the codebase measures against — and the argmax is array_max
    over (hash, shard) structs, so the (impossible in practice,
    60-bit) tie breaks toward the larger shard name in both engines.

    Scan-side per-row projection: no shuffle, no UDF, whole-stage
    codegen keeps it JVM-side. |shards| hashes per row is the HRW
    cost model; for thousands of shards prefer a two-level scheme
    (HRW over shard groups, then within), not needed at 16-256.
    """
    shards = shards or DEFAULT_SHARDS
    arr = _shard_array_sql(shards)
    expr = (
        f"array_max(transform({arr}, s -> struct("
        f"CAST(conv(substring(md5(concat(CAST(`{key_col}` AS STRING), '|', s)),"
        f" 1, 15), 16, 10) AS BIGINT) AS h, s AS shard))).shard"
    )
    return df.withColumn(out_col, F.expr(expr))


def apportion_largest_remainder(
    cells: DataFrame,
    budget: int,
    weight_col: str = "weight",
    order_cols: list[str] | None = None,
    out_col: str = "alloc",
) -> DataFrame:
    """Hamilton apportionment of an integer ``budget`` across the rows
    of ``cells`` proportional to ``weight_col`` (non-negative
    integers): alloc = floor(budget*w/W), then +1 to the
    ``budget - sum(floor)`` largest remainders (ties broken by
    ``order_cols`` ascending). Exact integer arithmetic throughout —
    sum(alloc) == budget ALWAYS, and a zero-remainder cell never
    receives a bonus unit (the number of leftover units equals the sum
    of fractional parts, which only positive remainders contribute to).

    The input is a pre-aggregated cells frame — one row per
    (source, lang, ...) GROUP, i.e. O(groups), not O(rows) — so the
    two unpartitioned windows (global weight total, remainder rank)
    are single-task by design, the same bounded-frame contract as the
    collected codebooks. Do NOT point this at a row-grained frame;
    aggregate first.
    """
    order_cols = order_cols or [
        c for c in cells.columns if c != weight_col
    ]
    w = F.col(weight_col).cast("long")
    total = F.sum(w).over(Window.partitionBy())
    base = cells.select(
        "*",
        F.expr(f"CAST({budget} AS BIGINT) * `{weight_col}`").alias("_num"),
        total.alias("_tot"),
    ).select(
        "*",
        # Zero total weight (empty corpus / all-zero cells) would make
        # `_num div _tot` NULL and silently void the sum(alloc)==budget
        # invariant — fail loudly in-plan instead (costs nothing when
        # the total is positive; the frame is O(groups) by contract).
        F.expr(
            "CASE WHEN _tot <= 0 THEN CAST(raise_error("
            "'apportion_largest_remainder: total weight must be > 0 "
            "(got zero/negative — empty or all-zero-weight cells)') "
            "AS BIGINT) ELSE _num div _tot END"
        ).alias("_floor"),
        F.expr("_num % _tot").alias("_rem"),
    )
    rank = F.row_number().over(
        Window.partitionBy().orderBy(
            F.col("_rem").desc(), *[F.col(c).asc() for c in order_cols]
        )
    )
    leftover = F.lit(budget) - F.sum("_floor").over(Window.partitionBy())
    out = base.select(
        "*",
        rank.alias("_rk"),
        leftover.alias("_left"),
    ).select(
        *[c for c in cells.columns],
        (
            F.col("_floor")
            + F.when(
                (F.col("_rk") <= F.col("_left")) & (F.col("_rem") > 0),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias(out_col),
    )
    return out
