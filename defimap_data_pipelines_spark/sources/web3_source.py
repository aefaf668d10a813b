"""`web3_rpc` — a Spark 4 Python DataSource for chain point-reads.

The ingest pipeline (pipelines/ingest.py) expresses the reference's
web3/Etherscan extract loop (aave_extract.py:585-646) as mapInPandas
over a (date, name) grid. This module exposes the SAME sampling as a
first-class source format, the idiomatic Spark 4 way to say "this
external system is a table":

    spark.dataSource.register(Web3RpcDataSource)
    df = (spark.read.format("web3_rpc")
          .option("start", "2023-01-01").option("end", "2023-03-01")
          .option("names", "strat_a,strat_b")
          .load())

Partition planning happens in ``partitions()``: the date range splits
into ``days_per_partition`` chunks, each an independent task — on a
cluster, 3 years x 50 strategies fans out to ~150 parallel RPC
streams, vs the reference's single sequential Airflow worker. The
per-day block is resolved INSIDE the owning partition (one resolver
call per day, the reference's getblocknobytime contract) so no driver
bottleneck and no cross-partition coordination.

``web3_rpc`` also implements ``streamReader``: offsets are day
indices, each microbatch covers the newly elapsed days — the
readStream twin of the daily extract DAG (checkpointable, replayable).

The chain client is the deterministic synthetic sampler in this
container (no web3 installed); a production build swaps
``_SAMPLER``/``_RESOLVER`` for real RPC closures. Everything else —
planning, schema, partition shape — is the production surface.
"""

from __future__ import annotations

from datetime import date as _date
from datetime import timedelta

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from defimap_data_pipelines_spark.pipelines.ingest import (
    synthetic_block_resolver,
    synthetic_sampler,
    with_retries,
)

_SAMPLER = synthetic_sampler
_RESOLVER = synthetic_block_resolver

_SCHEMA_DDL = (
    "date DATE, name STRING, block BIGINT, stake_apy DOUBLE, "
    "aave_apy DOUBLE, total_apy DOUBLE, liquidity_index DOUBLE, "
    "atoken_supply DOUBLE, asset_price DOUBLE, aave_price DOUBLE"
)


class DateRangePartition(InputPartition):
    def __init__(self, start_ord: int, end_ord: int, names: list[str]):
        self.start_ord = start_ord  # inclusive ordinal day
        self.end_ord = end_ord  # exclusive
        self.names = names


def _read_days(start_ord: int, end_ord: int, names: list[str]):
    """Yield sampled rows for [start_ord, end_ord) x names."""
    sample = with_retries(_SAMPLER, tries=13, sleep=lambda s: None)
    resolve = with_retries(_RESOLVER, tries=5, sleep=lambda s: None)
    for ordinal in range(start_ord, end_ord):
        d = _date.fromordinal(ordinal)
        iso = d.isoformat()
        block = int(resolve(iso))
        for name in names:
            s = sample(name, iso)
            yield (
                d,
                name,
                block,
                s["stake_apy"],
                s["aave_apy"],
                round(s["stake_apy"] + s["aave_apy"], 3),
                s["liquidity_index"],
                s["atoken_supply"],
                s["asset_price"],
                s["aave_price"],
            )


class Web3RpcReader(DataSourceReader):
    def __init__(self, options):
        self.start = _date.fromisoformat(options["start"])
        self.end = _date.fromisoformat(options["end"])  # inclusive
        self.names = [n for n in options["names"].split(",") if n]
        self.days_per_partition = int(options.get("days_per_partition", "31"))

    def partitions(self):
        out = []
        lo = self.start.toordinal()
        hi = self.end.toordinal() + 1
        step = self.days_per_partition
        for o in range(lo, hi, step):
            out.append(DateRangePartition(o, min(o + step, hi), self.names))
        return out

    def read(self, partition: DateRangePartition):
        yield from _read_days(
            partition.start_ord, partition.end_ord, partition.names
        )


class Web3RpcStreamReader(DataSourceStreamReader):
    """Day-grain micro-batches: offset = next unread ordinal day."""

    def __init__(self, options):
        self.start = _date.fromisoformat(options["start"])
        # bounded replay for tests; a live feed would track the chain tip
        self.end = _date.fromisoformat(options["end"])
        self.names = [n for n in options["names"].split(",") if n]

    def initialOffset(self):
        return {"ordinal": self.start.toordinal()}

    def latestOffset(self):
        return {"ordinal": self.end.toordinal() + 1}

    def partitions(self, start, end):
        return [
            DateRangePartition(o, o + 1, self.names)
            for o in range(start["ordinal"], end["ordinal"])
        ]

    def read(self, partition: DateRangePartition):
        yield from _read_days(
            partition.start_ord, partition.end_ord, partition.names
        )

    def commit(self, end):
        pass


class Web3RpcDataSource(DataSource):
    @classmethod
    def name(cls):
        return "web3_rpc"

    def schema(self):
        return _SCHEMA_DDL

    def reader(self, schema: StructType):
        return Web3RpcReader(self.options)

    def streamReader(self, schema: StructType):
        return Web3RpcStreamReader(self.options)


def register(spark) -> None:
    """Register the source on a session (idempotent)."""
    spark.dataSource.register(Web3RpcDataSource)
