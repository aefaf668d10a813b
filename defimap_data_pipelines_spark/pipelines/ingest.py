"""Ingestion: the extract DAG re-expressed (SURVEY.md §3.1).

The reference's per-day sequential loop of web3/Etherscan calls
(aave_extract.py:585-646) becomes a ``mapInPandas`` over a (date, name)
frame: Spark partitions the dates, each task batch-samples chain state
through an injected sampler, and the result lands in the bronze table.
Retry/backoff (aave_extract.py:41-42,96-116: 13 retries, exponential
backoff capped at 64s) lives inside the sampler adapter, not the engine.

The chain client is injected so tests (and this container, which has no
web3) use a deterministic synthetic sampler; a production deployment
passes one that holds an RPC connection per executor task.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.schemas import RAW_SCHEMA

Sampler = Callable[[str, str], dict]  # (name, date_iso) -> column dict
BlockResolver = Callable[[str], int]  # date_iso -> block number


def exponential_backoff(attempt: int, cap: float = 64.0) -> float:
    """Backoff schedule mirroring aave_extract.py:41-42 (sans jitter)."""
    return min(2 ** (attempt - 1), cap)


def with_retries(fn: Callable, tries: int = 13, sleep=time.sleep):
    """Retry wrapper mirroring aave_extract.py:96-116."""

    def wrapped(*args, **kwargs):
        for attempt in range(1, tries + 1):
            try:
                return fn(*args, **kwargs)
            except Exception:
                if attempt == tries:
                    raise
                sleep(exponential_backoff(attempt))

    return wrapped


def synthetic_sampler(name: str, date_iso: str) -> dict:
    """Deterministic fake chain state (tests / this container).

    NB: uses zlib.crc32, not Python hash() — str hashing is randomized
    per process, which would make the synthetic bronze irreproducible.
    """
    import zlib

    seed = zlib.crc32(f"{name}|{date_iso}".encode()) & 0xFFFF
    return {
        "stake_apy": round(0.5 + (seed % 750) / 100.0, 3),
        "aave_apy": round((seed % 300) / 100.0, 3),
        "liquidity_index": 1.0 + (seed % 1000) / 1e6,
        "atoken_supply": 1e6 + seed,
        "asset_price": 1.0 + (seed % 97) / 1e4,
        "aave_price": 50.0 + (seed % 773) / 100.0,
    }


def synthetic_block_resolver(date_iso: str) -> int:
    """Deterministic fake date->block mapping (tests / this container):
    ~7150 blocks/day from a fixed genesis plus a small crc32 jitter.
    The jitter (< inter-day gap) keeps the mapping strictly increasing
    in date, matching Etherscan's closest-after contract."""
    import zlib
    from datetime import date as _date

    d = _date.fromisoformat(str(date_iso)[:10])
    days = (d - _date(2015, 7, 30)).days
    return 1 + days * 7150 + (zlib.crc32(str(date_iso)[:10].encode()) % 1000)


def date_block_dimension(
    dates: DataFrame,
    resolver: BlockResolver = synthetic_block_resolver,
    retries: int = 5,
) -> DataFrame:
    """The (date, block) dimension (S3): one resolver call per DISTINCT
    date, built once per ingest run and joined into every per-strategy
    sample pass — the reference resolves a block per day via Etherscan
    getblocknobytime with 5 retries (aave_extract.py:146-168) and
    accumulates the daily dimension frame (aave_extract.py:499-509).

    Output is one row per day — tiny at any scale; callers broadcast
    it into the sampling grid (see sample_chain_state ``blocks=``).
    """
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("date", T.DateType()),
            T.StructField("block", T.LongType()),
        ]
    )

    def resolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        do_resolve = with_retries(resolver, tries=retries, sleep=lambda s: None)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "date": pdf["date"],
                    "block": [do_resolve(str(d)) for d in pdf["date"]],
                }
            )

    return dates.select("date").distinct().mapInPandas(resolve, schema)


def sample_chain_state(
    dates: DataFrame,
    sampler: Sampler = synthetic_sampler,
    retries: int = 13,
    blocks: DataFrame | None = None,
) -> DataFrame:
    """(date, name) frame -> RAW_SCHEMA frame via batched point reads.

    Each partition's rows are sampled inside one Arrow batch; Spark's
    partitioning of the dates frame is the unit of parallelism (the
    reference looped sequentially on one Airflow worker).

    ``blocks``: optional (date, block) dimension
    (:func:`date_block_dimension`). When given it is broadcast-joined
    into the grid and the sampler is called as ``sampler(name,
    date_iso, block)`` — the reference samples contract state AT the
    day's resolved block, not at latest (aave_extract.py:552-571).
    """
    with_blocks = blocks is not None
    if with_blocks:
        dates = dates.select("date", "name").join(
            F.broadcast(blocks.select("date", "block")), "date"
        )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        do_sample = with_retries(sampler, tries=retries, sleep=lambda s: None)
        for pdf in batches:
            rows = []
            blocks_seq = pdf["block"] if with_blocks else [None] * len(pdf)
            for date, name, block in zip(pdf["date"], pdf["name"], blocks_seq):
                if with_blocks:
                    state = do_sample(name, str(date), int(block))
                else:
                    state = do_sample(name, str(date))
                total = round(state["stake_apy"] + state["aave_apy"], 3)
                rows.append(
                    {
                        "date": date,
                        "name": name,
                        "stake_apy": state["stake_apy"],
                        "aave_apy": state["aave_apy"],
                        "total_apy": total,
                        "liquidity_index": state["liquidity_index"],
                        "atoken_supply": state["atoken_supply"],
                        "asset_price": state["asset_price"],
                        "aave_price": state["aave_price"],
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RAW_SCHEMA.fields])

    cols = ["date", "name", "block"] if with_blocks else ["date", "name"]
    return dates.select(*cols).mapInPandas(sample, RAW_SCHEMA)


def clean_bronze(bronze: DataFrame) -> DataFrame:
    """Bronze -> silver cleaning (aave_extract.py:684-694): fillna(0) on
    {aave_apy, liquidity_index}, linear-interpolate the other floats."""
    from defimap_data_pipelines_spark.operators.cleaning import (
        fillna_zero,
        interpolate_linear,
    )

    df = fillna_zero(bronze, ["aave_apy", "liquidity_index"])
    return interpolate_linear(
        df, ["stake_apy", "total_apy", "atoken_supply", "asset_price", "aave_price"]
    )


def date_range_frame(spark, start: str, end: str, names: list[str]) -> DataFrame:
    """Daily (date, name) grid — the ingestion driver table."""
    dates = spark.sql(
        f"SELECT explode(sequence(DATE '{start}', DATE '{end}')) AS date"
    )
    names_df = spark.createDataFrame([(n,) for n in names], ["name"])
    return dates.crossJoin(F.broadcast(names_df))
