"""Plan audit: prints a one-line physical-plan summary per registered
query (exchanges, join strategies, pushdown, scan width) so plan
regressions are visible at a glance.

Usage: python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

from defimap_data_pipelines_spark.session import get_spark
from defimap_data_pipelines_spark.plans.queries import QUERIES


def summarize(name: str, spark, sf_dir: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    # execute first: AQE's pre-execution plan string has no codegen
    # spans and no final shuffle decisions (isFinalPlan=false)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # keep only the final adaptive plan — the trailing "Initial Plan"
    # section would double-count exchanges/joins
    plan = plan.split("== Initial Plan ==")[0]
    # match within one line only: Spark truncates long plan lines, which
    # can swallow the closing '>' and make a greedy match overrun
    scans = re.findall(r"ReadSchema: struct<([^\n>]*)", plan)
    widths = ",".join(str(len(s.split(","))) for s in scans) or "-"
    codegen_ids = set(re.findall(r"\*\((\d+)\)", plan))
    return (
        f"{name:28s} exchanges={plan.count('Exchange'):2d} "
        f"bhj={plan.count('BroadcastHashJoin')} "
        f"smj={plan.count('SortMergeJoin')} "
        f"codegen={len(codegen_ids)} "
        f"scan_widths={widths}"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("explain-audit")
    for n in names:
        try:
            print(summarize(n, spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{n:28s} ERROR {str(e)[:80]}")


if __name__ == "__main__":
    main()
