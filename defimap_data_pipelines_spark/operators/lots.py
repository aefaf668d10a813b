"""FIFO lot matching: cost-basis allocation without iteration.

The bookkeeping primitive under realized-PnL, wash-sale, and
inventory-consumption reports (the reference's domain is strategy
accounting — `defimap-data-pipelines` computes growth/returns over
trade-derived series; this answers "WHICH buy paid for this sell").
The textbook algorithm is a sequential queue — pop the oldest open
lot until the sell is filled — which distributes terribly. The
closed form: put buys and sells on the same per-key cumulative-
quantity axis; buy lot i occupies the interval
[cum_qty(i-1), cum_qty(i)) and sell j occupies its own cumulative
interval, and FIFO matches exactly the pairs whose intervals
overlap, with matched quantity = interval-overlap length. One
windowed prefix sum per side plus one per-key interval join replaces
the queue, and every quantity decision is integer arithmetic.

Scale posture: both prefix-sum windows and the interval join
partition by the lot key, so parallelism is per-key; within a key
the overlap predicate touches O(buys + sells) truly-overlapping
pairs (each sell spans a contiguous run of lots), never the
quadratic all-pairs. Skewed keys (one asset with millions of trades)
are the same shape as any skewed-window workload — the per-key sort
is the cost, not the join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fifo_match(
    buys: DataFrame,
    sells: DataFrame,
    key_col: str,
    qty_col: str,
    order_cols: list[str],
    price_cents_col: str | None = None,
) -> DataFrame:
    """Match each sell against buy lots first-in-first-out within
    ``key_col``. Both inputs need an integer-valued ``qty_col`` and a
    deterministic total order given by ``order_cols`` (ties would
    make "first in" engine-dependent — pass enough columns to break
    them). Returns one row per (buy lot, sell) match:
    (key, buy_ord.., sell_ord.., matched_qty[, cost_cents]) where
    cost_cents = matched_qty * the buy lot's ``price_cents_col``.

    A sell larger than the remaining lots matches only up to the
    total bought quantity; the unmatched remainder simply has no row
    (callers reconcile by comparing sum(matched_qty) to sold
    quantity).
    """
    def cumline(df: DataFrame, prefix: str) -> DataFrame:
        w = (
            Window.partitionBy("_k")
            .orderBy(*[f"_{prefix}o{i}" for i in range(len(order_cols))])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        hi = F.sum("_q").over(w)
        return df.select(
            "*",
            hi.alias(f"_{prefix}hi"),
            (hi - F.col("_q")).alias(f"_{prefix}lo"),
        )

    def prep(df: DataFrame, prefix: str) -> DataFrame:
        cols = [
            F.col(key_col).alias("_k"),
            F.col(qty_col).cast("long").alias("_q"),
            *[
                F.col(c).alias(f"_{prefix}o{i}")
                for i, c in enumerate(order_cols)
            ],
        ]
        if prefix == "b" and price_cents_col is not None:
            cols.append(F.col(price_cents_col).alias("_pc"))
        return cumline(df.select(*cols), prefix)

    b = prep(buys, "b")
    s = prep(sells, "s")
    matched = b.join(
        s,
        (b["_k"] == s["_k"])
        & (b["_bhi"] > s["_slo"])
        & (b["_blo"] < s["_shi"]),
    ).select(
        b["_k"].alias(key_col),
        *[
            b[f"_bo{i}"].alias(f"buy_{c}")
            for i, c in enumerate(order_cols)
        ],
        *[
            s[f"_so{i}"].alias(f"sell_{c}")
            for i, c in enumerate(order_cols)
        ],
        (
            F.least(b["_bhi"], s["_shi"])
            - F.greatest(b["_blo"], s["_slo"])
        ).alias("matched_qty"),
        *(
            [(
                (
                    F.least(b["_bhi"], s["_shi"])
                    - F.greatest(b["_blo"], s["_slo"])
                )
                * b["_pc"]
            ).alias("cost_cents")]
            if price_cents_col is not None
            else []
        ),
    )
    return matched


def fifo_realized_summary(
    buys: DataFrame,
    sells: DataFrame,
    key_col: str,
    qty_col: str,
    order_cols: list[str],
    price_cents_col: str,
) -> DataFrame:
    """Per-key rollup of ``fifo_match``: (key, bought_qty, sold_qty,
    matched_qty, realized_cost, avg_cost) with costs in dollars
    (cents stay integer through the sums; two final divides).
    sold_qty can exceed matched_qty when sells outrun the book —
    the difference is the short/unreconciled quantity."""
    m = fifo_match(
        buys, sells, key_col, qty_col, order_cols, price_cents_col
    )
    per_key = m.groupBy(key_col).agg(
        F.sum("matched_qty").alias("matched_qty"),
        F.sum("cost_cents").alias("_cc"),
    )
    bq = buys.groupBy(F.col(key_col)).agg(
        F.sum(F.col(qty_col).cast("long")).alias("bought_qty")
    )
    sq = sells.groupBy(F.col(key_col)).agg(
        F.sum(F.col(qty_col).cast("long")).alias("sold_qty")
    )
    return (
        bq.join(sq, key_col, "inner")
        .join(per_key, key_col, "left")
        .select(
            key_col,
            "bought_qty",
            "sold_qty",
            F.coalesce("matched_qty", F.lit(0)).cast("long").alias(
                "matched_qty"
            ),
            F.round(
                F.coalesce(F.col("_cc"), F.lit(0)).cast("double") / 100.0,
                9,
            ).alias("realized_cost"),
            F.round(
                F.col("_cc").cast("double")
                / F.when(F.col("matched_qty") > 0, F.col("matched_qty"))
                / 100.0,
                9,
            ).alias("avg_cost"),
        )
    )
