"""End-to-end training-data curation demo: documents parquet ->
quality filter + exact/near dedup -> split -> token shards ->
packed context windows, materialized as partitioned parquet plus a
dataset-card JSON.

The LLM-data twin of tools/run_pipeline.py: what a user runs to turn
a raw crawl table into training shards with this engine.

Usage: python tools/run_curation.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.operators.corpus import (
    clean_corpus,
    curation_report,
)
from defimap_data_pipelines_spark.operators.packing import (
    assign_token_shards,
    pack_sequences,
)
from defimap_data_pipelines_spark.operators.sampling import (
    split_column,
)
from defimap_data_pipelines_spark.operators.textops import (
    lang_id,
)
from defimap_data_pipelines_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/defimap_curation_demo"
    spark = get_spark("curation-demo")

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_input = docs.count()

    report = curation_report(docs).collect()[0].asDict()
    survivors = clean_corpus(docs).cache()

    langs = lang_id(survivors).select("doc_id", "lang_pred")
    tagged = (
        survivors.join(langs, "doc_id")
        .withColumn(
            "split",
            split_column(
                F.col("doc_id"), {"train": 0.9, "val": 0.05, "test": 0.05}
            ),
        )
        .withColumn(
            "n_tok", F.size(F.split("text", " ")).cast("long")
        )
    )

    train = tagged.filter(F.col("split") == "train")
    # assign_token_shards keeps the input columns — text rides along
    sharded = assign_token_shards(train, "n_tok", budget=65536)
    (
        sharded.write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out, "train_shards"))
    )
    packed = pack_sequences(
        train.select("doc_id", "n_tok"), context=2048, shard_budget=65536
    )
    packed.write.mode("overwrite").parquet(os.path.join(out, "packed_bins"))
    for split in ("val", "test"):
        tagged.filter(F.col("split") == split).drop("n_tok").write.mode(
            "overwrite"
        ).parquet(os.path.join(out, split))

    card = {
        "source": sf_dir,
        "n_input": n_input,
        "curation_funnel": report,
        "splits": {
            r["split"]: r["n"]
            for r in tagged.groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
        "train_tokens": train.agg(F.sum("n_tok")).collect()[0][0],
        "n_train_shards": sharded.select("shard").distinct().count(),
        "n_packed_bins": packed.select("shard", "bin").distinct().count(),
        "langs": {
            r["lang_pred"]: r["n"]
            for r in tagged.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        },
    }
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "dataset_card.json"), "w") as f:
        json.dump(card, f, indent=2, default=str)
    print(json.dumps(card, indent=2, default=str))
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
