"""Omni-search: pattern-selected cross-repository search (reference
``server/omni/``).

The reference's fourth federation mode, next to per-repo grouping
(``query/multi.py``), merged statistics (``fts_federated_global``) and the
proxy root (``query/proxy.py``): the caller names repositories by PATTERN
(exact alias, gitwildmatch wildcard, or regex), the service fans the query
across the matching registry aliases in a bounded thread pool with per-repo
error isolation and timeout, aggregates with one of the reference's two
modes, and parks the full result set in a TTL cursor cache so the client
pages without re-querying.

- ``RepoPatternMatcher`` (reference ``omni/repo_pattern_matcher.py``):
  a term with any of ``^$+|`` is a REGEX (searched, not anchored); any
  other term containing ``*?[]`` is a gitwildmatch pattern (our
  ``globmatch`` kernel — same pathspec semantics the reference uses);
  plain terms match exactly.  Union across patterns, input order
  preserved, bad regexes ignored (reference swallows them).
- ``ResultAggregator`` (reference ``omni/result_aggregator.py``):
  ``global`` = score-desc top-K across all repos (stable sort, so the
  repo-dict order breaks ties exactly as the reference's ``list.sort``
  does); ``per_repo`` = proportional allocation (ceil of the repo's share
  of the limit, floor 1, trimmed from the largest allocation until the
  budget fits) then round-robin interleave in repo order.
- ``OmniCache`` (reference ``omni/omni_cache.py``): uuid cursor → full
  result set, TTL + max-entries LRU, offset/limit pagination,
  ``get_metadata``/``get_stats``.

Scale note: the fan-out reuses the registry's TTL searcher cache
(``server/cache.py``) and each repo search is the engine's own bounded
top-k — nothing corpus-sized ever lands in the cursor cache (it holds at
most ``max_results_per_repo × matched_repos`` hit dicts).
"""

from __future__ import annotations

import math
import re
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import wait as futures_wait
from dataclasses import dataclass
from typing import Any, Callable, Optional

from .globmatch import matches_pattern

__all__ = [
    "RepoPatternMatcher",
    "ResultAggregator",
    "OmniCache",
    "OmniSearchConfig",
    "OmniSearchService",
]


class RepoPatternMatcher:
    """Filters repository aliases by wildcard/regex/exact patterns."""

    REGEX_OPERATORS = ("^", "$", "+", "|")

    def __init__(self, patterns: list[str], metacharacters: str = "*?[]^$+|"):
        self.patterns = list(patterns)
        self.metacharacters = metacharacters

    def is_pattern(self, text: str) -> bool:
        return any(c in text for c in self.metacharacters)

    def filter_repos(self, repos: list[str]) -> list[str]:
        if not self.patterns:
            return []
        matched: set[str] = set()
        for pattern in self.patterns:
            if self.is_pattern(pattern):
                if any(op in pattern for op in self.REGEX_OPERATORS):
                    try:
                        rx = re.compile(pattern)
                    except re.error:
                        continue  # reference ignores bad regexes
                    matched.update(r for r in repos if rx.search(r))
                else:
                    matched.update(
                        r for r in repos if matches_pattern(r, pattern)
                    )
            elif pattern in repos:
                matched.add(pattern)
        return [r for r in repos if r in matched]


class ResultAggregator:
    """``global`` top-K or ``per_repo`` proportional interleave."""

    def __init__(self, mode: str, limit: int):
        if mode not in ("global", "per_repo"):
            raise ValueError(
                f"Invalid aggregation mode: {mode}. Must be 'global' or 'per_repo'"
            )
        if limit < 0:
            raise ValueError(f"Limit must be non-negative, got {limit}")
        self.mode = mode
        self.limit = limit

    def aggregate(self, repo_results: dict[str, list[dict]]) -> list[dict]:
        if not repo_results or self.limit == 0:
            return []
        if self.mode == "global":
            return self._aggregate_global(repo_results)
        return self._aggregate_per_repo(repo_results)

    def _aggregate_global(self, repo_results: dict[str, list[dict]]) -> list[dict]:
        all_results = [
            {**r, "repository_alias": alias}
            for alias, rows in repo_results.items()
            for r in rows
        ]
        all_results.sort(key=lambda x: x.get("score", 0.0), reverse=True)
        return all_results[: self.limit]

    def _aggregate_per_repo(self, repo_results: dict[str, list[dict]]) -> list[dict]:
        non_empty = {k: v for k, v in repo_results.items() if v}
        if not non_empty:
            return []
        total = sum(len(v) for v in non_empty.values())
        # proportional share of the limit, ceil'd, floor 1, capped at the
        # repo's own result count
        alloc = {
            alias: min(max(1, int(math.ceil(len(rows) / total * self.limit))), len(rows))
            for alias, rows in non_empty.items()
        }
        # trim the largest allocation until the budget fits (reference loop)
        while sum(alloc.values()) > self.limit:
            top = max(alloc, key=lambda k: alloc[k])
            alloc[top] -= 1
            if alloc[top] == 0:
                del alloc[top]
        iters = {
            alias: iter(
                sorted(non_empty[alias], key=lambda x: x.get("score", 0.0), reverse=True)[:n]
            )
            for alias, n in alloc.items()
        }
        out: list[dict] = []
        while len(out) < self.limit and iters:
            for alias in list(iters):
                try:
                    r = next(iters[alias])
                except StopIteration:
                    del iters[alias]
                    continue
                out.append({**r, "repository_alias": alias})
                if len(out) >= self.limit:
                    break
        return out


class OmniCache:
    """uuid cursor → aggregated result set; TTL + max-entries LRU."""

    def __init__(
        self,
        ttl_seconds: float = 300.0,
        max_entries: int = 100,
        *,
        now_fn: Callable[[], float] = time.time,
    ):
        self.ttl_seconds = float(ttl_seconds)
        self.max_entries = int(max_entries)
        self._now_fn = now_fn
        self._cache: dict[str, dict] = {}
        self._lock = threading.RLock()
        self._hits = 0
        self._misses = 0

    def _evict(self) -> None:
        # caller holds the lock
        now = self._now_fn()
        dead = [k for k, e in self._cache.items() if now > e["expires_at"]]
        for k in dead:
            del self._cache[k]
        while len(self._cache) > self.max_entries:
            lru = min(self._cache, key=lambda k: self._cache[k]["last_accessed"])
            del self._cache[lru]

    def store_results(
        self, results: list[dict], query_params: Optional[dict] = None
    ) -> str:
        cursor = str(uuid.uuid4())
        now = self._now_fn()
        with self._lock:
            self._cache[cursor] = {
                "results": results,
                "query_params": query_params or {},
                "total_results": len(results),
                "expires_at": now + self.ttl_seconds,
                "last_accessed": now,
            }
            self._evict()
        return cursor

    def _entry(self, cursor: str) -> Optional[dict]:
        with self._lock:
            self._evict()
            e = self._cache.get(cursor)
            if e is None:
                self._misses += 1
                return None
            e["last_accessed"] = self._now_fn()
            self._hits += 1
            return e

    def get_results(
        self, cursor: str, offset: int = 0, limit: int = 10
    ) -> Optional[list[dict]]:
        e = self._entry(cursor)
        if e is None:
            return None
        results = e["results"]
        if offset >= len(results):
            return []
        return results[offset : offset + limit]

    def get_metadata(self, cursor: str) -> Optional[dict]:
        e = self._entry(cursor)
        if e is None:
            return None
        return {
            "total_results": e["total_results"],
            "query_params": e["query_params"],
        }

    def get_stats(self) -> dict[str, Any]:
        with self._lock:
            return {
                "entries": len(self._cache),
                "hit_count": self._hits,
                "miss_count": self._misses,
                "max_entries": self.max_entries,
                "ttl_seconds": self.ttl_seconds,
            }


@dataclass
class OmniSearchConfig:
    """Reference ``OmniSearchConfig`` knobs that apply here."""

    default_limit: int = 10
    max_limit: int = 100
    default_aggregation_mode: str = "global"
    max_workers: int = 8
    per_repo_timeout_seconds: float = 30.0
    max_results_per_repo: int = 50
    cache_ttl_seconds: float = 300.0
    cache_max_entries: int = 100
    pattern_metacharacters: str = "*?[]^$+|"


class OmniSearchService:
    """Pattern fan-out over the global registry's aliases.

    ``registry`` is a :class:`~code_indexer_ray.repos.GlobalRegistry`
    (aliases + refcounted searcher access); ``search_fn(alias, query,
    params)`` may override how one repo is searched (tests / proxy reuse).
    """

    def __init__(
        self,
        registry,
        config: OmniSearchConfig | None = None,
        *,
        search_fn: Callable[[str, str, dict], list[dict]] | None = None,
        access_filter=None,
    ):
        self.registry = registry
        self.config = config or OmniSearchConfig()
        #: optional AccessFilteringService (Story #707): with a user_id on
        #: the call, pattern-matched aliases are intersected with the user's
        #: accessible set BEFORE fan-out — the invisible-repo rule (no 403s,
        #: inaccessible repos neither searched nor mentioned)
        self.access_filter = access_filter
        self._search_fn = search_fn or (
            lambda alias, q, params: registry.search(alias, q, params)
        )
        self.cache = OmniCache(
            ttl_seconds=self.config.cache_ttl_seconds,
            max_entries=self.config.cache_max_entries,
        )

    def _aliases(self) -> list[str]:
        return [row["alias_name"] for row in self.registry.list_repos()]

    def search(
        self,
        repository_patterns: list[str],
        query: str,
        *,
        limit: Optional[int] = None,
        aggregation_mode: Optional[str] = None,
        user_id: Optional[str] = None,
        **params,
    ) -> dict:
        limit = self.config.default_limit if limit is None else limit
        limit = min(limit, self.config.max_limit)
        mode = aggregation_mode or self.config.default_aggregation_mode
        matcher = RepoPatternMatcher(
            repository_patterns, self.config.pattern_metacharacters
        )
        targets = matcher.filter_repos(self._aliases())
        if self.access_filter is not None and user_id is not None:
            targets = self.access_filter.filter_repo_listing(targets, user_id)
        if not targets:
            return {
                "cursor": self.cache.store_results([]),
                "total_results": 0,
                "total_repos_searched": 0,
                "results": [],
                "errors": {},
            }
        repo_results: dict[str, list[dict]] = {}
        errors: dict[str, str] = {}
        search_params = {"limit": self.config.max_results_per_repo, **params}
        # one wait() with a deadline bounds the WHOLE fan-out: per-future
        # result(timeout=) would accumulate timeouts sequentially, and a
        # `with ThreadPoolExecutor` exit joins hung threads — one wedged
        # repo would hang the call forever despite its recorded error
        ex = ThreadPoolExecutor(max_workers=min(len(targets), self.config.max_workers))
        try:
            futs = {
                ex.submit(self._search_fn, alias, query, dict(search_params)): alias
                for alias in targets
            }
            done, not_done = futures_wait(
                futs, timeout=self.config.per_repo_timeout_seconds
            )
            for fut in done:
                alias = futs[fut]
                exc = fut.exception()
                if exc is not None:  # per-repo isolation (reference)
                    errors[alias] = str(exc) or type(exc).__name__
                else:
                    repo_results[alias] = list(fut.result())[
                        : self.config.max_results_per_repo
                    ]
            for fut in not_done:
                errors[futs[fut]] = (
                    f"Search timeout after {self.config.per_repo_timeout_seconds}s"
                )
        finally:
            ex.shutdown(wait=False, cancel_futures=True)
        # the cursor parks the FULL consistently-ordered result set so
        # pagination actually advances (the reference caches its post-limit
        # list, which makes page 2 always empty — fixed here: aggregate with
        # the total budget, slice the first page for the response)
        total_avail = sum(len(v) for v in repo_results.values())
        full = ResultAggregator(mode=mode, limit=max(limit, total_avail)).aggregate(
            repo_results
        )
        cursor = self.cache.store_results(
            full, query_params={"query": query, "mode": mode, "limit": limit}
        )
        return {
            "cursor": cursor,
            "total_results": len(full),
            "total_repos_searched": len(repo_results),
            "results": full[:limit],
            "errors": errors,
        }

    def page(self, cursor: str, offset: int = 0, limit: int = 10):
        return self.cache.get_results(cursor, offset=offset, limit=limit)
