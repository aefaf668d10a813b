"""Bounded DataFrame-cache registry.

Operators that return a LAZY frame over a ``.cache()``-ed scan
(containment_pairs' shingle frame, group_centroid_similarity's
centroid frame) must keep the cache alive past the call — but a
caller invoking the operator in a loop would otherwise accumulate
pinned frames until memory pressure. The registry keeps at most
``bound`` live caches per registry (oldest-first unpersist: an
already-collected result loses nothing; a still-lazy one silently
recomputes, never goes wrong) and ``release()`` gives eager callers
a targeted handle that doesn't nuke unrelated caches the way
``spark.catalog.clearCache()`` does.

Thread-safe (r10 ADVICE): registry mutations are lock-guarded so
concurrent driver threads (e.g. a thread-pooled backfill calling the
operator per shard) can't race append/pop into an over-bound registry
or a double-unpersist. ``unpersist`` itself runs OUTSIDE the lock —
it can block on the JVM and needs no registry state.

First landed for containment_pairs in r10
(reference parity anchor: /root/reference behavior is cache-free —
this is a Spark-execution-model concern with no reference analogue);
generalized here in r11 so group_centroid_similarity's cross-side
cache gets the same semantics (r10 verdict task 3).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame


class BoundedCacheRegistry:
    """Keeps at most ``bound`` cached frames; evicts oldest-first."""

    def __init__(self, bound: int = 4) -> None:
        self.bound = bound
        self._lock = threading.Lock()
        self._frames: list[DataFrame] = []

    def register(self, df: DataFrame) -> DataFrame:
        """Track ``df`` (already ``.cache()``-ed); evict past bound."""
        with self._lock:
            self._frames.append(df)
            evicted: list[DataFrame] = []
            while len(self._frames) > self.bound:
                evicted.append(self._frames.pop(0))
        for old in evicted:
            old.unpersist(blocking=False)
        return df

    def release(self) -> int:
        """Unpersist every held cache; returns how many were released.
        Each REGISTRY ENTRY is popped exactly once; registering the
        same DataFrame object twice yields two entries and two
        unpersist calls (harmless — Spark unpersist is idempotent)."""
        with self._lock:
            drained = list(self._frames)
            self._frames.clear()
        for cached in drained:
            cached.unpersist(blocking=False)
        return len(drained)

    def __len__(self) -> int:
        with self._lock:
            return len(self._frames)
