"""Contract-ABI loading with a 3-level cache and EIP-1967 proxy
resolution — the Spark-side equivalent of the reference's
`get_lendingpool_abi` / `get_incentive_abi` / `get_atoken_abi`
(aave_extract.py:172-208, 211-247, 258-316; SURVEY.md §2 S4).

Levels, in probe order, mirroring memory -> GCS bucket -> Etherscan:

1. in-process dict (one fetch per JVM/driver lifetime),
2. a bucket path (any directory-like store; written through plain
   file IO here, through an object-store client in production — the
   cache FORMAT is one JSON text file per contract address, exactly
   the reference's layout),
3. the upstream fetcher (Etherscan in the reference) — injected as a
   callable, wrapped in the shared exponential-backoff retry
   (pipelines/ingest.py::with_retries, the aave_extract.py:96-116
   schedule), deterministic synthetic in this container.

Proxy contracts resolve FIRST: EIP-1967 stores the implementation
address at storage slot keccak256("eip1967.proxy.implementation")-1
(aave_extract.py:38-40,285-288); ``resolve_implementation`` reads that
slot through an injected storage reader and the ABI is fetched for
the implementation, cached under the PROXY address (the key callers
hold). The reference has a latent bug here — `get_atoken_supply`
passes a BigQuery client where `get_atoken_abi` expects a w3 handle
(aave_extract.py:467 vs :258-262), only safe while the GCS cache
hits; this module makes the dependency explicit by taking the storage
reader as a typed argument, so the mistake cannot type-check quietly.

Config loading, not an engine operator — no DuckDB oracle; covered by
tests/test_sensors_abi.py.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from defimap_data_pipelines_spark.pipelines.ingest import with_retries

# keccak256("eip1967.proxy.implementation") - 1, the ERC-1967 slot
EIP1967_IMPLEMENTATION_SLOT = (
    "0x360894a13ba1a3210667c828492db98dca3e2076cc3735a920a3ca505d382bbc"
)


def resolve_implementation(
    storage_reader: Callable[[str, str], str], address: str
) -> str:
    """Implementation address behind an EIP-1967 proxy: read the
    standard slot; a zero word means ``address`` is not a proxy and
    is its own implementation. The low 20 bytes of the 32-byte slot
    value are the address."""
    word = storage_reader(address, EIP1967_IMPLEMENTATION_SLOT)
    raw = word[2:] if word.startswith("0x") else word
    raw = raw.rjust(64, "0")
    impl = raw[-40:]
    if set(impl) == {"0"}:
        return address
    return "0x" + impl


class AbiCache:
    """3-level ABI cache. ``fetcher(address) -> list`` is the
    upstream (retry-wrapped on construction); ``storage_reader`` is
    the chain storage probe used for proxy resolution (both injected
    so tests run against deterministic synthetics, the
    web3_source._SAMPLER convention)."""

    def __init__(
        self,
        bucket_dir: str,
        fetcher: Callable[[str], list],
        storage_reader: Callable[[str, str], str] | None = None,
        tries: int = 13,
        sleep=None,
    ):
        self.bucket_dir = bucket_dir.rstrip("/")
        os.makedirs(self.bucket_dir, exist_ok=True)
        kw = {} if sleep is None else {"sleep": sleep}
        self._fetch = with_retries(fetcher, tries=tries, **kw)
        self._storage_reader = storage_reader
        self._mem: dict[str, list] = {}
        self.stats = {"memory": 0, "bucket": 0, "upstream": 0}

    def _bucket_path(self, address: str) -> str:
        return os.path.join(self.bucket_dir, f"{address.lower()}.json")

    def get_abi(self, address: str, proxy: bool = False) -> list:
        """The ABI for ``address``; with ``proxy=True`` the EIP-1967
        implementation is resolved and fetched, but the cache key
        stays the proxy address (what callers hold)."""
        key = address.lower()
        if key in self._mem:
            self.stats["memory"] += 1
            return self._mem[key]
        p = self._bucket_path(key)
        if os.path.exists(p):
            self.stats["bucket"] += 1
            with open(p) as f:
                abi = json.load(f)
            self._mem[key] = abi
            return abi
        self.stats["upstream"] += 1
        target = address
        if proxy:
            if self._storage_reader is None:
                raise ValueError(
                    "proxy resolution requires a storage_reader"
                )
            target = resolve_implementation(self._storage_reader, address)
        abi = self._fetch(target)
        with open(p, "w") as f:
            json.dump(abi, f)
        self._mem[key] = abi
        return abi
