"""End-to-end pipeline demo: ingest (synthetic chain) -> bronze ->
clean -> silver -> transform -> gold -> datamart extracts, all
materialized as partitioned parquet under an output root.

Usage: python tools/run_pipeline.py [out_dir] [ds]
"""

from __future__ import annotations

import sys

from defimap_data_pipelines_spark.session import get_spark
from defimap_data_pipelines_spark.pipelines.ingest import (
    clean_bronze,
    date_range_frame,
    sample_chain_state,
)
from defimap_data_pipelines_spark.pipelines.load import run_load
from defimap_data_pipelines_spark.pipelines.transform import (
    run_transform,
    write_derived,
)
from defimap_data_pipelines_spark.sources.writers import idempotent_replace_range


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/defimap_pipeline_demo"
    ds = sys.argv[2] if len(sys.argv) > 2 else "2023-06-30"
    spark = get_spark("pipeline-demo")

    strategies = ["aave_usdc", "aave_wbtc"]
    dates = date_range_frame(spark, "2022-01-01", ds, strategies)
    bronze = sample_chain_state(dates)
    idempotent_replace_range(bronze, f"{out}/bronze", ["name"])
    print(f"bronze: {spark.read.parquet(f'{out}/bronze').count()} rows")

    silver = clean_bronze(spark.read.parquet(f"{out}/bronze"))
    idempotent_replace_range(silver, f"{out}/silver", ["name"])
    print(f"silver: {spark.read.parquet(f'{out}/silver').count()} rows")

    tables = run_transform(
        spark.read.parquet(f"{out}/silver"), ds=ds, start_date="2022-01-01"
    )
    write_derived(tables, f"{out}/gold")
    for name in tables:
        n = spark.read.parquet(f"{out}/gold/{name}").count()
        print(f"gold/{name}: {n} rows")

    dim = spark.createDataFrame(
        [(f"id-{i}", s, 0.0, 0.0) for i, s in enumerate(strategies)],
        ["id", "slug", "tvl", "apr"],
    )
    run_load(
        spark.read.parquet(f"{out}/gold/growth_of_10k"),
        spark.read.parquet(f"{out}/gold/tvl"),
        spark.read.parquet(f"{out}/silver"),
        dim,
        write=lambda df, table: df.write.mode("overwrite").parquet(
            f"{out}/datamart/{table}"
        ),
    )
    for t in ["strategy_growth", "strategy_tvl", "strategy_apr"]:
        print(f"datamart/{t}: {spark.read.parquet(f'{out}/datamart/{t}').count()} rows")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
