"""Payload cache: large-content truncation with paged retrieval (reference
``server/cache/payload_cache.py``, Story #679 + #720).

The reference's problem: semantic search hits can carry whole-file content;
shipping megabytes per hit to an MCP client is waste.  Its fix: content
above ``preview_size_chars`` is parked in a SQLite cache under a UUID4
handle and the response carries ``{preview, cache_handle, has_more,
total_size}``; the client pages the full payload through a fetch endpoint
at ``max_fetch_size_chars`` per page.  Story #720 adds explicit-key storage
(``store_with_key``/``has_key``) for delegation-result caching.

Same schema and semantics here on stdlib ``sqlite3`` (WAL journal, handle/
content/created_at/total_size, created_at index for TTL cleanup), sync
instead of aiosqlite (the HTTP tier is thread-per-request).  Wired into the
HTTP server: ``/mget?truncate=true`` runs each doc's stored text through
``truncate_result`` and ``/payload?handle=…&page=N`` serves the pages.
"""

from __future__ import annotations

import math
import os
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass
from typing import Callable

__all__ = [
    "PayloadCacheConfig",
    "PayloadCache",
    "CacheNotFoundError",
    "CacheRetrievalResult",
]


class CacheNotFoundError(Exception):
    """Unknown handle or out-of-range page."""


@dataclass
class CacheRetrievalResult:
    content: str
    page: int
    total_pages: int
    has_more: bool


@dataclass
class PayloadCacheConfig:
    preview_size_chars: int = 2000
    max_fetch_size_chars: int = 5000
    cache_ttl_seconds: float = 900.0
    cleanup_interval_seconds: float = 60.0

    @classmethod
    def from_env(cls) -> "PayloadCacheConfig":
        cfg = cls()
        for attr, env in (
            ("preview_size_chars", "CIDX_PREVIEW_SIZE_CHARS"),
            ("max_fetch_size_chars", "CIDX_MAX_FETCH_SIZE_CHARS"),
            ("cache_ttl_seconds", "CIDX_CACHE_TTL_SECONDS"),
            ("cleanup_interval_seconds", "CIDX_CLEANUP_INTERVAL_SECONDS"),
        ):
            raw = os.environ.get(env)
            if raw:
                try:
                    setattr(cfg, attr, type(getattr(cfg, attr))(raw))
                except ValueError:
                    pass  # reference logs-and-defaults on bad values
        return cfg


class PayloadCache:
    """SQLite-backed content cache with UUID handles and pagination."""

    def __init__(
        self,
        db_path: str,
        config: PayloadCacheConfig | None = None,
        *,
        now_fn: Callable[[], float] = time.time,
    ):
        self.db_path = str(db_path)
        self.config = config or PayloadCacheConfig()
        self._now_fn = now_fn
        self._lock = threading.Lock()
        self._cleanup_thread: threading.Thread | None = None
        self._stop_cleanup = threading.Event()
        self.initialize()

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self.db_path)
        con.isolation_level = None
        return con

    def initialize(self) -> None:
        os.makedirs(os.path.dirname(os.path.abspath(self.db_path)), exist_ok=True)
        with self._conn() as db:
            db.execute("PRAGMA journal_mode=WAL")
            db.execute(
                """CREATE TABLE IF NOT EXISTS payload_cache (
                    handle TEXT PRIMARY KEY,
                    content TEXT NOT NULL,
                    created_at REAL NOT NULL,
                    total_size INTEGER NOT NULL
                )"""
            )
            db.execute(
                "CREATE INDEX IF NOT EXISTS idx_payload_cache_created_at"
                " ON payload_cache(created_at)"
            )

    # -- storage --

    def store(self, content: str) -> str:
        handle = str(uuid.uuid4())
        with self._lock, self._conn() as db:
            db.execute(
                "INSERT INTO payload_cache (handle, content, created_at, total_size)"
                " VALUES (?, ?, ?, ?)",
                (handle, content, self._now_fn(), len(content)),
            )
        return handle

    def store_with_key(self, key: str, content: str) -> None:
        """Explicit-key upsert (Story #720 delegation-result caching)."""
        with self._lock, self._conn() as db:
            db.execute(
                "INSERT OR REPLACE INTO payload_cache"
                " (handle, content, created_at, total_size) VALUES (?, ?, ?, ?)",
                (key, content, self._now_fn(), len(content)),
            )

    def has_key(self, key: str) -> bool:
        with self._conn() as db:
            row = db.execute(
                "SELECT COUNT(*) FROM payload_cache WHERE handle = ?", (key,)
            ).fetchone()
            return bool(row and row[0] > 0)

    # -- retrieval --

    def retrieve(self, handle: str, page: int = 0) -> CacheRetrievalResult:
        if page < 0:
            raise CacheNotFoundError(f"Invalid page number: {page}")
        with self._conn() as db:
            row = db.execute(
                "SELECT content, total_size, created_at FROM payload_cache"
                " WHERE handle = ?",
                (handle,),
            ).fetchone()
        if row is None:
            raise CacheNotFoundError(f"Cache handle not found: {handle}")
        content, total_size, created_at = row
        # TTL is enforced at READ time too, not only by the cleanup loop —
        # an expired handle must not resurrect between sweeps
        if created_at < self._now_fn() - self.config.cache_ttl_seconds:
            raise CacheNotFoundError(f"Cache handle not found: {handle}")
        page_size = self.config.max_fetch_size_chars
        total_pages = max(1, math.ceil(total_size / page_size))
        if page >= total_pages:
            raise CacheNotFoundError(
                f"Page {page} out of range for handle {handle} (total: {total_pages})"
            )
        start = page * page_size
        return CacheRetrievalResult(
            content=content[start : start + page_size],
            page=page,
            total_pages=total_pages,
            has_more=page < total_pages - 1,
        )

    def truncate_result(self, content: str) -> dict:
        """AC3: big content → preview + handle; small content passes whole."""
        if len(content) > self.config.preview_size_chars:
            return {
                "preview": content[: self.config.preview_size_chars],
                "cache_handle": self.store(content),
                "has_more": True,
                "total_size": len(content),
            }
        return {
            "preview": content,
            "cache_handle": None,
            "has_more": False,
            "total_size": len(content),
        }

    # -- TTL cleanup --

    def cleanup_expired(self) -> int:
        cutoff = self._now_fn() - self.config.cache_ttl_seconds
        with self._lock, self._conn() as db:
            cur = db.execute(
                "DELETE FROM payload_cache WHERE created_at < ?", (cutoff,)
            )
            return cur.rowcount

    def start_background_cleanup(self) -> None:
        if self._cleanup_thread is not None and self._cleanup_thread.is_alive():
            return
        self._stop_cleanup.clear()

        def loop():
            while not self._stop_cleanup.wait(self.config.cleanup_interval_seconds):
                try:
                    self.cleanup_expired()
                except Exception:  # pragma: no cover — cleanup must not die
                    pass

        self._cleanup_thread = threading.Thread(
            target=loop, daemon=True, name="PayloadCacheCleanup"
        )
        self._cleanup_thread.start()

    def stop_background_cleanup(self) -> None:
        self._stop_cleanup.set()
        if self._cleanup_thread is not None:
            self._cleanup_thread.join(timeout=2.0)

    def get_stats(self) -> dict:
        with self._conn() as db:
            n, total = db.execute(
                "SELECT COUNT(*), COALESCE(SUM(total_size), 0) FROM payload_cache"
            ).fetchone()
        return {"entries": n, "total_chars": total}
