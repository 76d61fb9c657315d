"""Query-result caching layer (reference surface: cache services +
monitoring API).

The reference keeps TTL caches keyed by content hash — query embeddings,
document content, AI responses (``ai_cache_manager.py:60-120``,
TTLCache maxsize/ttl per type) — plus a monitoring API exposing hit/miss
statistics, clear, and expired-entry cleanup
(``apis/v1/cache_monitoring.py:20-247``).

Spark-native form: the cached value is a **persisted DataFrame** (the
cluster-wide materialization Spark already owns — StorageLevel replaces
Redis), keyed by a caller key hashed the same way the reference does.
TTL and LRU-bounded size govern unpersist; statistics come back as a
DataFrame so the monitoring surface is engine-shaped.

Scale note: persist() pins the result's partitions across executors —
the cache holds REFERENCES, nothing flows through the driver.  Eviction
(`unpersist`) is lazy-safe: in-flight readers of an evicted result fall
back to recomputation, never to wrong data.
"""

from __future__ import annotations

import hashlib
import time
from collections import OrderedDict
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

DEFAULT_MAXSIZE = 64
DEFAULT_TTL_S = 900.0  # reference ai_response_cache ttl=900


@dataclass
class _Entry:
    df: DataFrame
    expires_at: float


@dataclass
class CacheStats:
    """Hit/miss accounting, shaped like the reference's ``CacheStats``
    (``ai_cache_manager.py:38-47``)."""

    hit_count: int = 0
    miss_count: int = 0
    eviction_count: int = 0
    expired_count: int = 0

    @property
    def total_requests(self) -> int:
        return self.hit_count + self.miss_count

    @property
    def hit_rate(self) -> float:
        n = self.total_requests
        return round(self.hit_count / n, 4) if n else 0.0


@dataclass
class QueryResultCache:
    """TTL + size-bounded cache of persisted DataFrames.

    ``clock`` is injectable (tests pass a fake) and defaults to
    ``time.monotonic``.
    """

    maxsize: int = DEFAULT_MAXSIZE
    ttl_seconds: float = DEFAULT_TTL_S
    clock: Callable[[], float] = time.monotonic
    _entries: OrderedDict[str, _Entry] = field(default_factory=OrderedDict)
    _stats: CacheStats = field(default_factory=CacheStats)

    @staticmethod
    def cache_key(content: str, prefix: str = "") -> str:
        """Content-hash key, same scheme as the reference
        (``ai_cache_manager.py:88-91`` md5 of prefixed content)."""
        return prefix + hashlib.md5(content.encode("utf-8")).hexdigest()

    def get_or_compute(
        self, key: str, compute: Callable[[], DataFrame]
    ) -> DataFrame:
        """Return the cached persisted DataFrame for ``key``, computing,
        persisting, and storing it on miss.  Expired entries count as
        misses and are unpersisted."""
        now = self.clock()
        entry = self._entries.get(key)
        if entry is not None:
            if entry.expires_at > now:
                self._stats.hit_count += 1
                self._entries.move_to_end(key)  # LRU refresh
                return entry.df
            self._drop(key, expired=True)
        self._stats.miss_count += 1
        df = compute().persist()
        self._entries[key] = _Entry(df, now + self.ttl_seconds)
        while len(self._entries) > self.maxsize:
            oldest = next(iter(self._entries))
            self._drop(oldest, expired=False)
        return df

    def invalidate(self, key: str) -> bool:
        """Drop one entry (the reference invalidates per conversation on
        write, ``conversation_cache_service.py:150-175``)."""
        if key in self._entries:
            self._drop(key, expired=False, count_eviction=False)
            return True
        return False

    def clear(self) -> int:
        """Monitoring API ``clear_cache``: drop everything."""
        n = len(self._entries)
        for key in list(self._entries):
            self._drop(key, expired=False, count_eviction=False)
        return n

    def cleanup_expired(self) -> int:
        """Monitoring API ``cleanup_expired_caches``: drop entries past
        their TTL, return how many."""
        now = self.clock()
        stale = [k for k, e in self._entries.items() if e.expires_at <= now]
        for key in stale:
            self._drop(key, expired=True)
        return len(stale)

    def stats(self) -> CacheStats:
        return self._stats

    def stats_df(self, spark: SparkSession) -> DataFrame:
        """The monitoring surface (``get_cache_statistics``) as a
        DataFrame row."""
        s = self._stats
        return spark.createDataFrame(
            [
                (
                    len(self._entries),
                    s.hit_count,
                    s.miss_count,
                    s.eviction_count,
                    s.expired_count,
                    s.hit_rate,
                )
            ],
            "entries int, hit_count long, miss_count long, "
            "eviction_count long, expired_count long, hit_rate double",
        )

    def _drop(
        self, key: str, expired: bool, count_eviction: bool = True
    ) -> None:
        entry = self._entries.pop(key)
        entry.df.unpersist()
        if expired:
            self._stats.expired_count += 1
        elif count_eviction:
            self._stats.eviction_count += 1
