"""Capture .explain("formatted") output per query into plans/<round>/ (default r13, override $PLANS_ROUND).

Usage: python tools/capture_plans.py <suffix> <query> [query ...]

Writes plans/<round>/<query>_<suffix>.txt for each query (the judge's
plan-claim evidence files; suffix is "before" or "after").
"""

from __future__ import annotations

import os
import sys

from defimap_data_pipelines_spark.session import get_spark
from defimap_data_pipelines_spark.plans.queries import QUERIES


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    for n in names:
        df = QUERIES[n](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{n}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
