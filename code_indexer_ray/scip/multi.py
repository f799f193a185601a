"""Multi-repository code intelligence — SCIP queries fanned across repos.

Reference ``server/multi/scip_multi_service.py`` (``SCIPMultiService``,
Story ACs): thread-pool fan-out of definition / references / dependencies /
dependents / callchain over a list of repositories, per-repo error capture
(one broken repo never hides the rest), timeout enforcement, repos WITHOUT
a symbol index reported as ``skipped`` ("No SCIP index available"), and an
aggregated response with repository attribution + metadata
(``total_results`` / ``repos_searched`` / ``repos_with_results`` /
``execution_time_ms``).

Differences from the reference, documented:
- Result rows carry ``doc_id`` instead of ``file_path`` — this engine's
  occurrence address is the document id (hydrate to stored paths via
  ``mget``); ``column`` does not exist in the store layout.
- Timeouts use ONE ``wait()`` deadline for the whole batch instead of
  per-future ``result(timeout=...)`` inside ``as_completed`` — the
  reference's shape serializes worst-case waits and can join hung threads
  (the same defect class fixed in the omni tier's round-3 review).
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import ThreadPoolExecutor, wait
from typing import Callable, Optional

__all__ = ["SCIPMultiService"]


class SCIPMultiService:
    """Parallel SCIP operations over ``{repo_id: symbol_store_root}``.

    ``stores`` may also be a callable ``repo_id -> root | None`` (registry
    resolution); ``None``/missing roots are reported as skipped."""

    DEFAULT_REFERENCE_LIMIT = 100

    def __init__(
        self,
        stores: dict[str, str] | Callable[[str], Optional[str]],
        *,
        max_workers: int = 10,
        query_timeout_seconds: float = 30.0,
    ):
        self._resolve = stores if callable(stores) else stores.get
        self.max_workers = max_workers
        self.query_timeout_seconds = query_timeout_seconds
        self._pool = ThreadPoolExecutor(max_workers=max_workers)
        self._cache: dict[str, object] = {}
        self._locks: dict[str, threading.Lock] = {}
        self._cache_lock = threading.Lock()

    # -- store access (SymbolStore part caches are not thread-safe: one
    # lock per repo serializes ITS queries; distinct repos run in parallel) --

    def _store(self, repo_id: str):
        root = self._resolve(repo_id)
        if root is None:
            return None, None
        import os

        from .store import MANIFEST, SymbolStore

        if not os.path.exists(os.path.join(root, MANIFEST)):
            return None, None
        with self._cache_lock:
            lock = self._locks.setdefault(repo_id, threading.Lock())
            store = self._cache.get(repo_id)
        if store is None:
            with lock:
                with self._cache_lock:
                    store = self._cache.get(repo_id)
                if store is None:
                    store = SymbolStore(root)
                    with self._cache_lock:
                        self._cache[repo_id] = store
        return store, lock

    # -- operations (reference AC1-AC5) --

    def definition(self, repositories: list[str], symbol: str, **kw) -> dict:
        def op(store):
            t = store.definitions(symbol, limit=kw.get("limit"))
            return [
                {"doc_id": int(d), "line": int(ln), "symbol": symbol,
                 "kind": "definition"}
                for d, ln in zip(t["doc_id"].to_pylist(), t["line"].to_pylist())
            ]

        return self._run(repositories, op, "definition", kw.get("timeout_seconds"))

    def references(self, repositories: list[str], symbol: str, **kw) -> dict:
        limit = kw.get("limit") or self.DEFAULT_REFERENCE_LIMIT

        def op(store):
            t = store.references(symbol, limit=limit)
            return [
                {"doc_id": int(d), "line": int(ln), "symbol": symbol,
                 "kind": "reference", "context": c}
                for d, ln, c in zip(
                    t["doc_id"].to_pylist(), t["line"].to_pylist(),
                    t["caller"].to_pylist(),
                )
            ]

        return self._run(repositories, op, "references", kw.get("timeout_seconds"))

    def dependencies(self, repositories: list[str], symbol: str, **kw) -> dict:
        depth = kw.get("max_depth")

        def op(store):
            if depth and depth > 1:
                t = store.transitive_dependencies(symbol, max_depth=depth)
                return [
                    {"symbol": s, "kind": "dependency", "depth": int(d)}
                    for s, d in zip(t["sym"].to_pylist(), t["depth"].to_pylist())
                ]
            t = store.dependencies(symbol)
            return [
                {"symbol": s, "kind": "dependency", "n_calls": int(n)}
                for s, n in zip(t["callee"].to_pylist(), t["n_calls"].to_pylist())
            ]

        return self._run(repositories, op, "dependencies", kw.get("timeout_seconds"))

    def dependents(self, repositories: list[str], symbol: str, **kw) -> dict:
        depth = kw.get("max_depth")

        def op(store):
            if depth and depth > 1:
                t = store.analyze_impact(symbol, max_depth=depth)
                return [
                    {"symbol": s, "kind": "dependent", "depth": int(d)}
                    for s, d in zip(t["sym"].to_pylist(), t["depth"].to_pylist())
                ]
            t = store.dependents(symbol)
            return [
                {"symbol": s, "kind": "dependent", "n_calls": int(n)}
                for s, n in zip(t["caller"].to_pylist(), t["n_calls"].to_pylist())
            ]

        return self._run(repositories, op, "dependents", kw.get("timeout_seconds"))

    def callchain(
        self, repositories: list[str], from_symbol: str, to_symbol: str, **kw
    ) -> dict:
        depth = kw.get("max_depth") or 3

        def op(store):
            t = store.trace_call_chain(from_symbol, to_symbol, max_depth=depth)
            # the store already renders each chain as "a -> b -> c"
            return [
                {"symbol": chain, "kind": "callchain", "context": chain}
                for chain in t["chain"].to_pylist()
            ]

        return self._run(repositories, op, "callchain", kw.get("timeout_seconds"))

    # -- fan-out + aggregation (reference AC6-AC8) --

    def _run(
        self, repositories: list[str], op, name: str,
        timeout_seconds: float | None,
    ) -> dict:
        if not repositories:
            raise ValueError("Must specify at least one repository")
        t0 = time.time()
        timeout = (
            timeout_seconds if timeout_seconds is not None
            else self.query_timeout_seconds
        )
        results: dict[str, list[dict]] = {}
        errors: dict[str, str] = {}
        skipped: dict[str, str] = {}

        def one(repo_id: str):
            store, lock = self._store(repo_id)
            if store is None:
                return None
            with lock:
                return op(store)

        futures = {self._pool.submit(one, rid): rid for rid in repositories}
        # ONE deadline for the whole batch (ALL_COMPLETED default); a wedged
        # repo times out without joining its thread
        done, not_done = wait(futures, timeout=timeout)
        for fut in not_done:
            fut.cancel()
            errors[futures[fut]] = (
                f"Query timed out after {timeout}s. Consider reducing the "
                f"number of repositories or increasing timeout."
            )
        for fut in done:
            rid = futures[fut]
            try:
                out = fut.result()
            except Exception as e:  # noqa: BLE001 — per-repo isolation
                errors[rid] = f"SCIP {name} failed: {e}"
                continue
            if out is None:
                skipped[rid] = "No SCIP index available"
            else:
                results[rid] = out

        total = sum(len(v) for v in results.values())
        return {
            "results": results,
            "metadata": {
                "total_results": total,
                "repos_searched": len(results),
                "repos_with_results": sum(1 for v in results.values() if v),
                "execution_time_ms": int((time.time() - t0) * 1000),
            },
            "skipped": skipped,
            "errors": errors or None,
        }

    def close(self) -> None:
        self._pool.shutdown(wait=False, cancel_futures=True)
