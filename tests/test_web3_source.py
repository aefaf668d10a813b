"""The web3_rpc Python DataSource vs the mapInPandas ingest adapter:
same sampler, same grid -> identical rows, through both the batch
reader (partition-planned date chunks) and the streaming reader
(day-grain microbatches under Trigger.AvailableNow)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from defimap_data_pipelines_spark.pipelines.ingest import (
    date_block_dimension,
    date_range_frame,
    sample_chain_state,
    synthetic_sampler,
)
from defimap_data_pipelines_spark.sources.web3_source import register

START, END = "2023-01-01", "2023-02-15"
NAMES = ["strat_a", "strat_b"]


def _source_df(spark, **extra):
    register(spark)
    r = (
        spark.read.format("web3_rpc")
        .option("start", START)
        .option("end", END)
        .option("names", ",".join(NAMES))
    )
    for k, v in extra.items():
        r = r.option(k, v)
    return r.load()


def _ingest_df(spark):
    grid = date_range_frame(spark, START, END, NAMES)
    blocks = date_block_dimension(grid)

    # block-aware signature; state itself is block-independent in the
    # synthetic sampler (as in the DataSource, which samples by day)
    def sampler(name: str, date_iso: str, block: int) -> dict:
        return synthetic_sampler(name, date_iso)

    sampled = sample_chain_state(grid, sampler, blocks=blocks)
    return sampled.join(F.broadcast(blocks), "date").select(
        "date", "name", "block", *[c for c in sampled.columns if c not in ("date", "name")]
    )


def test_batch_source_equals_ingest_adapter(spark):
    a = sorted(map(tuple, _source_df(spark).collect()))
    b = sorted(map(tuple, _ingest_df(spark).collect()))
    assert len(a) == 46 * 2
    assert a == b


def test_partition_planning(spark):
    from defimap_data_pipelines_spark.sources.web3_source import (
        Web3RpcReader,
    )

    r = Web3RpcReader(
        {
            "start": START,
            "end": END,
            "names": ",".join(NAMES),
            "days_per_partition": "10",
        }
    )
    parts = r.partitions()
    assert len(parts) == 5  # ceil(46 / 10)
    spans = [(p.end_ord - p.start_ord) for p in parts]
    assert sum(spans) == 46 and max(spans) == 10
    # contiguity, no overlap
    for prev, nxt in zip(parts, parts[1:]):
        assert prev.end_ord == nxt.start_ord


def test_stream_source_equals_batch(spark):
    register(spark)
    stream = (
        spark.readStream.format("web3_rpc")
        .option("start", START)
        .option("end", END)
        .option("names", ",".join(NAMES))
        .load()
    )
    with tempfile.TemporaryDirectory() as d:
        q = (
            stream.writeStream.format("memory")
            .queryName("w3s")
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("w3s").collect()))
    want = sorted(map(tuple, _source_df(spark).collect()))
    assert got == want
