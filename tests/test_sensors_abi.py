"""S4 / S14 / J3 coverage (SURVEY.md §2): ABI 3-level cache with
EIP-1967 proxy resolution, table-availability sensors with the
reference's poke/timeout contract, and the sensed cross-pipeline
join. IO/orchestration-shaped — pytest-verified (no DuckDB oracle),
like the other S-row sources/sinks."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from defimap_data_pipelines_spark.pipelines.abi_cache import (
    EIP1967_IMPLEMENTATION_SLOT,
    AbiCache,
    resolve_implementation,
)
from defimap_data_pipelines_spark.pipelines.sensors import (
    SensorTimeout,
    fresh_through,
    sensed_join,
    wait_for_table,
)

IMPL = "0x" + "ab" * 20
PROXY = "0x" + "cd" * 20


def _storage(address: str, slot: str) -> str:
    assert slot == EIP1967_IMPLEMENTATION_SLOT
    if address == PROXY:
        return "0x" + IMPL[2:].rjust(64, "0")
    return "0x" + "0" * 64


def test_resolve_implementation_proxy_and_plain():
    assert resolve_implementation(_storage, PROXY) == IMPL
    # zero slot -> the address is its own implementation
    assert resolve_implementation(_storage, IMPL) == IMPL


def test_abi_cache_levels(tmp_path):
    fetches = []

    def fetcher(address: str) -> list:
        fetches.append(address)
        return [{"name": f"fn_{address[-4:]}", "type": "function"}]

    cache = AbiCache(str(tmp_path), fetcher, _storage)
    a1 = cache.get_abi(IMPL)
    assert fetches == [IMPL]
    # memory hit: no new fetch
    assert cache.get_abi(IMPL) == a1
    assert fetches == [IMPL]
    assert cache.stats["memory"] == 1
    # bucket hit: a fresh process (new AbiCache) reads the file, no
    # upstream call
    cache2 = AbiCache(str(tmp_path), fetcher, _storage)
    assert cache2.get_abi(IMPL) == a1
    assert fetches == [IMPL]
    assert cache2.stats["bucket"] == 1
    assert os.path.exists(tmp_path / f"{IMPL.lower()}.json")


def test_abi_cache_proxy_fetches_implementation(tmp_path):
    fetches = []

    def fetcher(address: str) -> list:
        fetches.append(address)
        return [{"impl": address}]

    cache = AbiCache(str(tmp_path), fetcher, _storage)
    abi = cache.get_abi(PROXY, proxy=True)
    # fetched for the implementation, cached under the proxy key
    assert fetches == [IMPL]
    assert abi == [{"impl": IMPL}]
    assert cache.get_abi(PROXY) == abi and fetches == [IMPL]


def test_abi_cache_retries_upstream(tmp_path):
    calls = {"n": 0}

    def flaky(address: str) -> list:
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("rpc hiccup")
        return [{"ok": True}]

    naps = []
    cache = AbiCache(str(tmp_path), flaky, sleep=naps.append)
    assert cache.get_abi(IMPL) == [{"ok": True}]
    assert calls["n"] == 3
    assert naps == [1, 2]  # the reference's exponential schedule


def test_abi_cache_proxy_requires_storage_reader(tmp_path):
    cache = AbiCache(str(tmp_path), lambda a: [])
    with pytest.raises(ValueError, match="storage_reader"):
        cache.get_abi(PROXY, proxy=True)


class FakeClock:
    """Injected clock+sleep: sleeping advances time and can trigger
    side effects (a table 'landing' mid-poke)."""

    def __init__(self):
        self.t = 0.0
        self.on_sleep = None
        self.naps = []

    def clock(self) -> float:
        return self.t

    def sleep(self, s: float) -> None:
        self.naps.append(s)
        self.t += s
        if self.on_sleep is not None:
            self.on_sleep()


def _write(spark, path, dates):
    spark.createDataFrame(
        [(d, 1.0) for d in dates], "date string, v double"
    ).select(
        F.col("date").cast("date").alias("date"), "v"
    ).write.mode("overwrite").parquet(path)


def test_sensor_succeeds_when_table_lands_mid_poke(spark, tmp_path):
    path = str(tmp_path / "raw")
    fc = FakeClock()

    def land():
        if fc.t >= 240:  # lands on the second poke
            _write(spark, path, ["2024-01-02"])

    fc.on_sleep = land
    df = wait_for_table(
        spark,
        path,
        fresh_through("2024-01-02"),
        poke_interval=120,
        timeout=1800,
        clock=fc.clock,
        sleep=fc.sleep,
    )
    assert df.count() == 1
    assert fc.naps == [120, 120]


def test_sensor_freshness_gate_blocks_stale_table(spark, tmp_path):
    path = str(tmp_path / "stale")
    _write(spark, path, ["2024-01-01"])  # exists but not fresh enough
    fc = FakeClock()
    with pytest.raises(SensorTimeout):
        wait_for_table(
            spark,
            path,
            fresh_through("2024-01-02"),
            poke_interval=120,
            timeout=600,
            clock=fc.clock,
            sleep=fc.sleep,
        )
    assert fc.naps == [120] * 5


def test_sensed_join_waits_for_both_then_joins(spark, tmp_path):
    raw, price = str(tmp_path / "raw"), str(tmp_path / "price")
    _write(spark, raw, ["2024-01-02"])
    fc = FakeClock()

    def land():
        if fc.t >= 120:
            _write(spark, price, ["2024-01-02"])

    fc.on_sleep = land
    out = sensed_join(
        spark,
        raw,
        price,
        "2024-01-02",
        poke_interval=120,
        timeout=1800,
        clock=fc.clock,
        sleep=fc.sleep,
    )
    assert out.count() == 1  # joined on the shared date
