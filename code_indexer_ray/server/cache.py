"""Server-side searcher cache (reference ``server/cache/fts_index_cache.py``).

The reference caches loaded ``tantivy.Index`` objects server-wide with
TTL-based eviction (AC2), access-based TTL refresh (AC3), per-repository
isolation (AC4), thread safety (AC5), env-var configuration (AC6), cache
statistics (AC7) and a ``reload_on_access`` freshness option (AC8).  This
engine's equivalent expensive object is a warm :class:`IndexSearcher`
(manifest + dictionary slices + row-group indexes), so the cache holds
those, keyed by resolved index directory.

Freshness: generations here are immutable, so the reference's
``Index.reload()`` maps to a MANIFEST FINGERPRINT check — one ``stat`` of
the manifest per cache hit; when (mtime_ns, size) changed (in-place
republish), the searcher is rebuilt and counted in ``reload_count``.  Alias
pointer swaps are already handled above the cache by keying on the resolved
TARGET path (``repos.py``), so a swap faults in a miss naturally.

Long-running daemons (proxy fan-out over hundreds of repos, the global
registry's REST search) previously pinned every searcher forever in ad-hoc
dicts; this bounds them with TTL + LRU and makes the behavior observable.
"""

from __future__ import annotations

import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from ..index.manifest import MANIFEST_NAME

__all__ = [
    "SearcherCacheConfig",
    "SearcherCacheStats",
    "SearcherCache",
]


@dataclass
class SearcherCacheConfig:
    """TTL / size / freshness knobs (reference FTSIndexCacheConfig)."""

    ttl_minutes: float = 10.0
    cleanup_interval_seconds: float = 60.0
    max_entries: Optional[int] = None  # no limit by default
    reload_on_access: bool = True

    def __post_init__(self) -> None:
        if self.ttl_minutes <= 0:
            raise ValueError(f"TTL must be positive, got {self.ttl_minutes}")
        if self.cleanup_interval_seconds <= 0:
            raise ValueError(
                "Cleanup interval must be positive, got"
                f" {self.cleanup_interval_seconds}"
            )
        if self.max_entries is not None and self.max_entries < 1:
            raise ValueError(f"max_entries must be >= 1, got {self.max_entries}")

    @classmethod
    def from_env(cls) -> "SearcherCacheConfig":
        """CIDX_SEARCHER_CACHE_TTL_MINUTES / _MAX_ENTRIES /
        _RELOAD_ON_ACCESS (reference AC6 env externalization)."""
        raw_max = os.environ.get("CIDX_SEARCHER_CACHE_MAX_ENTRIES")
        return cls(
            ttl_minutes=float(
                os.environ.get("CIDX_SEARCHER_CACHE_TTL_MINUTES", "10")
            ),
            max_entries=int(raw_max) if raw_max else None,
            reload_on_access=os.environ.get(
                "CIDX_SEARCHER_CACHE_RELOAD_ON_ACCESS", "true"
            ).lower()
            in ("1", "true", "yes"),
        )


@dataclass
class SearcherCacheStats:
    cached_repositories: int
    hit_count: int
    miss_count: int
    eviction_count: int
    reload_count: int
    per_repository_stats: dict[str, dict[str, Any]] = field(default_factory=dict)

    @property
    def hit_ratio(self) -> float:
        total = self.hit_count + self.miss_count
        return self.hit_count / total if total else 0.0

    def to_dict(self) -> dict:
        return {
            "cached_repositories": self.cached_repositories,
            "hit_count": self.hit_count,
            "miss_count": self.miss_count,
            "eviction_count": self.eviction_count,
            "reload_count": self.reload_count,
            "hit_ratio": round(self.hit_ratio, 4),
            "per_repository_stats": self.per_repository_stats,
        }


class _Entry:
    __slots__ = (
        "searcher",
        "index_dir",
        "ttl_minutes",
        "created_at",
        "last_accessed",
        "access_count",
        "fingerprint",
    )

    def __init__(self, searcher, index_dir: str, ttl_minutes: float,
                 now: float, fingerprint):
        self.searcher = searcher
        self.index_dir = index_dir
        self.ttl_minutes = ttl_minutes
        self.created_at = now
        self.last_accessed = now
        self.access_count = 0
        self.fingerprint = fingerprint

    def record_access(self, now: float) -> None:
        self.last_accessed = now
        self.access_count += 1

    def is_expired(self, now: float) -> bool:
        return now > self.last_accessed + self.ttl_minutes * 60.0

    def ttl_remaining_seconds(self, now: float) -> float:
        return self.last_accessed + self.ttl_minutes * 60.0 - now


def _manifest_fingerprint(index_dir: str):
    try:
        st = os.stat(os.path.join(index_dir, MANIFEST_NAME))
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return None


class SearcherCache:
    """TTL + LRU cache of warm searchers with statistics.

    ``loader`` (constructor default or per-call override) builds the cached
    object for an index dir; the default constructs ``IndexSearcher(dir)``.
    All clock reads go through ``now_fn`` so tests drive time directly.
    """

    def __init__(
        self,
        config: SearcherCacheConfig | None = None,
        *,
        loader: Callable[[str], Any] | None = None,
        now_fn: Callable[[], float] = time.time,
    ):
        self.config = config or SearcherCacheConfig()
        self._loader = loader
        self._now_fn = now_fn
        self._cache: dict[str, _Entry] = {}
        self._lock = threading.RLock()
        self._hit_count = 0
        self._miss_count = 0
        self._eviction_count = 0
        self._reload_count = 0
        self._cleanup_thread: threading.Thread | None = None
        self._cleanup_stop = threading.Event()
        # per-key load locks: distinct dirs load in PARALLEL (the proxy's
        # cold fan-out), same-dir loads dedupe (reference AC5) — the
        # reference holds its one cache lock across loads, serializing
        # unrelated repos; at proxy scale that would make first-query
        # latency the SUM of per-repo load times instead of the max
        self._load_locks: dict[str, threading.Lock] = {}
        # opportunistic sweep stamp: TTL must evict IDLE entries too, not
        # only a re-accessed key, and most embedders never start the
        # background thread — so every get_or_load sweeps the whole map at
        # most once per cleanup_interval_seconds
        self._last_sweep = self._now_fn()

    # -- core --

    def _default_loader(self, index_dir: str):
        from ..query.engine import IndexSearcher

        return IndexSearcher(index_dir)

    def _lookup(self, key: str, load) -> Any | None:
        """Hit path under the cache lock; None = caller must load."""
        with self._lock:
            now = self._now_fn()
            if now - self._last_sweep >= self.config.cleanup_interval_seconds:
                self._last_sweep = now
                for k in [k for k, e in self._cache.items() if e.is_expired(now)]:
                    del self._cache[k]
                    self._eviction_count += 1
            entry = self._cache.get(key)
            if entry is None:
                return None
            if entry.is_expired(now):
                del self._cache[key]
                self._eviction_count += 1
                return None
            entry.record_access(now)
            self._hit_count += 1
            if self.config.reload_on_access:
                fp = _manifest_fingerprint(key)
                if fp != entry.fingerprint:
                    # in-place republish: rebuild on the spot
                    # (reference AC8 Index.reload())
                    entry.searcher = load(key)
                    entry.fingerprint = fp
                    self._reload_count += 1
            return entry.searcher

    def get_or_load(self, index_dir: str, loader: Callable[[str], Any] | None = None):
        key = os.path.abspath(index_dir)
        load = loader or self._loader or self._default_loader
        found = self._lookup(key, load)
        if found is not None:
            return found
        with self._lock:
            keylock = self._load_locks.setdefault(key, threading.Lock())
        with keylock:
            # another thread may have finished the same load while we waited
            found = self._lookup(key, load)
            if found is not None:
                return found
            searcher = load(key)  # outside the cache lock: parallel dirs
            with self._lock:
                self._miss_count += 1
                entry = _Entry(
                    searcher, key, self.config.ttl_minutes, self._now_fn(),
                    _manifest_fingerprint(key),
                )
                entry.record_access(self._now_fn())
                self._cache[key] = entry
                self._enforce_size_limit()
            return searcher

    def invalidate(self, index_dir: str) -> None:
        key = os.path.abspath(index_dir)
        with self._lock:
            if key in self._cache:
                del self._cache[key]
                self._eviction_count += 1

    def clear(self) -> None:
        with self._lock:
            self._eviction_count += len(self._cache)
            self._cache.clear()

    def _enforce_size_limit(self) -> None:
        # caller holds the lock; LRU by last_accessed (reference AC3A)
        if self.config.max_entries is None:
            return
        while len(self._cache) > self.config.max_entries:
            lru = min(self._cache, key=lambda k: self._cache[k].last_accessed)
            del self._cache[lru]
            self._eviction_count += 1

    def cleanup_expired(self) -> int:
        with self._lock:
            now = self._now_fn()
            expired = [k for k, e in self._cache.items() if e.is_expired(now)]
            for k in expired:
                del self._cache[k]
                self._eviction_count += 1
            return len(expired)

    # -- background cleanup (reference AC2 automatic eviction) --

    def start_background_cleanup(self) -> None:
        if self._cleanup_thread is not None and self._cleanup_thread.is_alive():
            return
        self._cleanup_stop.clear()

        def loop():
            while not self._cleanup_stop.is_set():
                try:
                    self.cleanup_expired()
                except Exception:  # pragma: no cover — cleanup must not die
                    pass
                self._cleanup_stop.wait(timeout=self.config.cleanup_interval_seconds)

        self._cleanup_thread = threading.Thread(
            target=loop, name="SearcherCacheCleanup", daemon=True
        )
        self._cleanup_thread.start()

    def stop_background_cleanup(self) -> None:
        if self._cleanup_thread is not None and self._cleanup_thread.is_alive():
            self._cleanup_stop.set()
            self._cleanup_thread.join(timeout=5)

    # -- observability (reference AC7) --

    def get_stats(self) -> SearcherCacheStats:
        with self._lock:
            now = self._now_fn()
            per_repo = {
                k: {
                    "access_count": e.access_count,
                    "last_accessed": e.last_accessed,
                    "created_at": e.created_at,
                    "ttl_remaining_seconds": round(e.ttl_remaining_seconds(now), 3),
                }
                for k, e in self._cache.items()
            }
            return SearcherCacheStats(
                cached_repositories=len(self._cache),
                hit_count=self._hit_count,
                miss_count=self._miss_count,
                eviction_count=self._eviction_count,
                reload_count=self._reload_count,
                per_repository_stats=per_repo,
            )
