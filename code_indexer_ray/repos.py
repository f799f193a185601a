"""Global repository registry — server-side "golden repos" (reference
``global_repos/``: ``alias_manager.py``, ``global_registry.py``,
``query_tracker.py``, ``cleanup_manager.py``, and the refresh flow of
``git_pull_updater.py`` / ``refresh_scheduler.py``).

The reference keeps a registry of centrally-indexed repositories, each
reachable through an ALIAS POINTER FILE: a tiny JSON naming the current
index directory.  A refresh builds the new index into a FRESH directory and
compare-and-swaps the pointer, so readers never see a half-built index; a
QUERY TRACKER refcounts in-flight queries per index path so the superseded
directory is deleted only after its last query drains (reference
cleanup_manager).  Registration enforces the ``-global`` suffix convention
and a reserved-name list.

Differences, by design:

- Cleanup is DETERMINISTIC, not a background thread: ``collect_garbage()``
  runs after each refresh and on demand.  The reference's 1 s polling loop
  exists because its queries are subprocesses; here queries are in-process
  and release their ref synchronously, so an explicit sweep is strictly
  more predictable (and testable) with the same guarantee.
- ``refresh`` takes a ``build_fn(out_dir)`` — the git-pull + reindex body
  is the caller's (CLI wires ``build_index``; tests plant corpora).

Scale: the registry holds alias → path rows (never corpus-sized state);
each repo is this engine's ordinary sharded index, so a registry over R
repos serves exactly like R independent indexes plus one JSON lookup.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from contextlib import contextmanager

from .index.manifest import MANIFEST_NAME, atomic_write_json

ALIASES_DIR = "_aliases"
REGISTRY_NAME = "registry.json"
BUILDS_DIR = "builds"

#: alias names reserved for engine features (reference RESERVED_GLOBAL_NAMES)
RESERVED_GLOBAL_NAMES: dict[str, str] = {
    "all-global": "the query-every-repo fan-out",
}


class ReservedNameError(ValueError):
    """Alias name is reserved for an engine feature."""


class RegistryError(RuntimeError):
    """Unknown alias / invalid registration / swap conflict."""


class AliasManager:
    """Alias pointer files: one JSON per alias naming the current index dir
    (reference alias_manager.py).  Writes are atomic-replace; ``swap_alias``
    is compare-and-swap on the current target and records the previous path
    for the cleanup sweep."""

    def __init__(self, aliases_dir: str):
        self.aliases_dir = aliases_dir
        os.makedirs(aliases_dir, exist_ok=True)

    def _path(self, alias: str) -> str:
        return os.path.join(self.aliases_dir, f"{alias}.json")

    def create_alias(self, alias: str, target_path: str,
                     repo_name: str | None = None) -> None:
        import time

        if repo_name is None:
            repo_name = (
                alias[: -len("-global")]
                if alias.lower().endswith("-global")
                else alias
            )
        now = time.time()
        atomic_write_json(
            self._path(alias),
            {
                "target_path": target_path,
                "created_at": now,
                "last_refresh": now,
                "repo_name": repo_name,
            },
        )

    def read(self, alias: str) -> dict | None:
        try:
            with open(self._path(alias)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def read_alias(self, alias: str) -> str | None:
        data = self.read(alias)
        return data["target_path"] if data else None

    def alias_exists(self, alias: str) -> bool:
        return os.path.exists(self._path(alias))

    def delete_alias(self, alias: str) -> None:
        try:
            os.unlink(self._path(alias))
        except FileNotFoundError:
            pass

    def update_refresh_timestamp(self, alias: str, ts: float | None = None) -> None:
        import time

        data = self.read(alias)
        if data is None:
            raise RegistryError(f"alias {alias} does not exist")
        data["last_refresh"] = time.time() if ts is None else ts
        atomic_write_json(self._path(alias), data)

    def swap_alias(self, alias: str, new_target: str, old_target: str) -> None:
        """CAS: the pointer must still name ``old_target`` (a concurrent
        refresh already moved it otherwise — reference raises the same)."""
        import time

        data = self.read(alias)
        if data is None:
            raise RegistryError(f"alias {alias} does not exist")
        if data["target_path"] != old_target:
            raise RegistryError(
                f"current target {data['target_path']!r} does not match "
                f"expected {old_target!r}"
            )
        now = time.time()
        data.update(
            target_path=new_target,
            previous_path=old_target,
            swapped_at=now,
            last_refresh=now,
        )
        atomic_write_json(self._path(alias), data)

    def get_previous_path(self, alias: str) -> str | None:
        data = self.read(alias)
        return data.get("previous_path") if data else None


class QueryTracker:
    """Thread-safe refcounts of in-flight queries per index path (reference
    query_tracker.py) — a refreshed-away index dir is deletable only at
    refcount zero."""

    def __init__(self):
        self._refs: dict[str, int] = {}
        self._lock = threading.Lock()

    def increment_ref(self, path: str) -> None:
        with self._lock:
            self._refs[path] = self._refs.get(path, 0) + 1

    def decrement_ref(self, path: str) -> None:
        with self._lock:
            n = self._refs.get(path, 0) - 1
            if n <= 0:
                self._refs.pop(path, None)
            else:
                self._refs[path] = n

    def get_ref_count(self, path: str) -> int:
        with self._lock:
            return self._refs.get(path, 0)

    @contextmanager
    def track_query(self, path: str):
        self.increment_ref(path)
        try:
            yield
        finally:
            self.decrement_ref(path)


class GlobalRegistry:
    """Registry root layout::

        <root>/registry.json        alias → {repo_name, repo_url, index_path, ...}
        <root>/_aliases/<a>.json    current-target pointer files
        <root>/builds/<a>/g%06d/    refresh generations (when refresh builds here)

    ``index_path`` in the registry is the ORIGINAL registration target;
    the alias pointer is the live one (they diverge after refreshes,
    exactly like the reference)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.aliases = AliasManager(os.path.join(root, ALIASES_DIR))
        self.tracker = QueryTracker()
        self._registry_path = os.path.join(root, REGISTRY_NAME)
        self._pending_cleanup: set[str] = set()
        # TTL+LRU searcher cache keyed by target path (reference
        # server/cache/fts_index_cache.py) — a long-lived registry daemon
        # over many aliases no longer pins every warm searcher forever
        from .server.cache import SearcherCache, SearcherCacheConfig

        self._searchers = SearcherCache(SearcherCacheConfig.from_env())
        self._lock = threading.Lock()
        # IndexSearcher's driver-side caches are not thread-safe; omni's
        # thread-pool fan-out can hand two aliases THE SAME cached searcher
        # when both resolve to one target path — serialize per target
        # (distinct targets still search in parallel)
        self._target_locks: dict[str, threading.Lock] = {}

    # -- registry file ------------------------------------------------------
    def _load(self) -> dict:
        try:
            with open(self._registry_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {}

    def _save(self, data: dict) -> None:
        atomic_write_json(self._registry_path, data)

    # -- registration -------------------------------------------------------
    def register(self, repo_name: str, alias_name: str, index_path: str,
                 repo_url: str | None = None, *,
                 allow_reserved: bool = False) -> dict:
        if not allow_reserved and alias_name in RESERVED_GLOBAL_NAMES:
            raise ReservedNameError(
                f"cannot register {alias_name!r}: reserved for "
                f"{RESERVED_GLOBAL_NAMES[alias_name]}"
            )
        if not alias_name.lower().endswith("-global"):
            raise ValueError(
                f"global repo alias must end with '-global' (case-insensitive), "
                f"got {alias_name!r}"
            )
        if not os.path.exists(os.path.join(index_path, MANIFEST_NAME)):
            raise RegistryError(f"{index_path} is not an index root (no manifest)")
        import time

        with self._lock:
            data = self._load()
            now = time.time()
            entry = {
                "repo_name": repo_name,
                "alias_name": alias_name,
                "repo_url": repo_url,
                "index_path": os.path.abspath(index_path),
                "created_at": now,
                "last_refresh": now,
            }
            data[alias_name] = entry
            self._save(data)
            self.aliases.create_alias(alias_name, os.path.abspath(index_path), repo_name)
        return entry

    def unregister(self, alias_name: str) -> None:
        with self._lock:
            data = self._load()
            if alias_name not in data:
                raise RegistryError(f"unknown alias: {alias_name}")
            del data[alias_name]
            self._save(data)
            self.aliases.delete_alias(alias_name)

    def get_repo(self, alias_name: str) -> dict | None:
        return self._load().get(alias_name)

    def list_repos(self) -> list[dict]:
        data = self._load()
        out = []
        for alias in sorted(data):
            entry = dict(data[alias])
            entry["target_path"] = self.aliases.read_alias(alias)
            out.append(entry)
        return out

    # -- query path ----------------------------------------------------------
    def resolve(self, alias_name: str) -> str:
        target = self.aliases.read_alias(alias_name)
        if target is None:
            raise RegistryError(f"unknown alias: {alias_name}")
        return target

    def searcher(self, alias_name: str, **kwargs):
        """IndexSearcher for the alias's CURRENT target, cached per target
        path — a swap naturally faults in a fresh searcher (the old one
        keeps serving queries already inside ``track_query``)."""
        from .query.engine import IndexSearcher

        target = self.resolve(alias_name)
        s = self._searchers.get_or_load(
            target, loader=lambda p: IndexSearcher(p, **kwargs)
        )
        return s, target

    def cache_stats(self) -> dict:
        """Searcher-cache statistics (reference cache AC7 monitoring)."""
        return self._searchers.get_stats().to_dict()

    def search(self, alias_name: str, q: str, params: dict | None = None,
               **searcher_kwargs) -> list[dict]:
        """REST-surface search against the alias's current index, refcounted
        so a concurrent refresh cannot delete the directory underneath it."""
        from .server.http import rest_search

        s, target = self.searcher(alias_name, **searcher_kwargs)
        with self._lock:
            tlock = self._target_locks.setdefault(target, threading.Lock())
        with tlock, self.tracker.track_query(target):
            return rest_search(s, q, dict(params or {}))

    # -- refresh + cleanup ----------------------------------------------------
    def next_build_dir(self, alias_name: str) -> str:
        base = os.path.join(self.root, BUILDS_DIR, alias_name)
        os.makedirs(base, exist_ok=True)
        gens = [int(g[1:]) for g in os.listdir(base)
                if g.startswith("g") and g[1:].isdigit()]
        return os.path.join(base, f"g{(max(gens) + 1 if gens else 0):06d}")

    def refresh(self, alias_name: str, build_fn) -> str:
        """Rebuild-and-swap (reference git_pull_updater flow): build the new
        index into a fresh generation dir, CAS the alias pointer, retire the
        old dir via the refcount-gated sweep.  Returns the new target."""
        old = self.resolve(alias_name)
        new = self.next_build_dir(alias_name)
        build_fn(new)
        if not os.path.exists(os.path.join(new, MANIFEST_NAME)):
            raise RegistryError(f"build_fn left no manifest in {new}")
        self.aliases.swap_alias(alias_name, new, old)
        with self._lock:
            data = self._load()
            if alias_name in data:
                import time

                data[alias_name]["last_refresh"] = time.time()
                self._save(data)
            self._searchers.invalidate(old)
            # only generations owned by this registry are deleted; a
            # registered-in-place index dir is the caller's property
            if os.path.abspath(old).startswith(
                os.path.abspath(os.path.join(self.root, BUILDS_DIR)) + os.sep
            ):
                self._pending_cleanup.add(old)
        self.collect_garbage()
        return new

    def get_pending_cleanups(self) -> set[str]:
        with self._lock:
            return set(self._pending_cleanup)

    def collect_garbage(self) -> list[str]:
        """Delete retired generation dirs whose query refcount has drained
        (reference cleanup_manager._process_cleanup_queue, minus the poll
        loop).  Never touches a path an alias currently points to."""
        current = {self.aliases.read_alias(e["alias_name"])
                   for e in self.list_repos()}
        deleted = []
        with self._lock:
            for path in sorted(self._pending_cleanup):
                if path in current or self.tracker.get_ref_count(path) > 0:
                    continue
                shutil.rmtree(path, ignore_errors=True)
                self._pending_cleanup.discard(path)
                deleted.append(path)
        return deleted


class RefreshScheduler:
    """Deterministic analog of the reference's timer thread
    (reference ``refresh_scheduler.py`` + ``update_strategy.py``).

    The reference runs a background thread that wakes every
    ``refresh_interval`` seconds, asks each repo's ``UpdateStrategy`` whether
    the source changed, and rebuild-and-swaps the changed ones.  Here the
    cycle is an explicit ``tick()`` the caller drives (server loop, cron,
    tests) — same decision table, no hidden thread:

    - not yet due (``now - last_refresh < interval``) → skipped
    - due, ``has_changes`` says no → ``last_refresh`` stamped, no rebuild
      (git_pull_updater's no-change fast path)
    - due and changed (or no predicate) → ``GlobalRegistry.refresh``
      (fresh generation dir, CAS pointer swap, refcount-gated GC)

    Per-alias locks serialize concurrent refreshes of the same repo exactly
    like the reference's ``_repo_locks``; distinct repos may tick from
    different threads.
    """

    def __init__(self, registry: GlobalRegistry, interval_s: float,
                 build_fn, has_changes=None):
        """``build_fn(alias, out_dir)`` rebuilds one repo's index;
        ``has_changes(alias, entry) -> bool`` is the UpdateStrategy probe
        (None = always rebuild when due)."""
        self.registry = registry
        self.interval_s = float(interval_s)
        self.build_fn = build_fn
        self.has_changes = has_changes
        self._alias_locks: dict[str, threading.Lock] = {}
        self._locks_lock = threading.Lock()

    def _lock_for(self, alias: str) -> threading.Lock:
        with self._locks_lock:
            lk = self._alias_locks.get(alias)
            if lk is None:
                lk = self._alias_locks[alias] = threading.Lock()
            return lk

    def due(self, now: float | None = None) -> list[str]:
        import time

        now = time.time() if now is None else now
        return [e["alias_name"] for e in self.registry.list_repos()
                if now - e.get("last_refresh", 0.0) >= self.interval_s]

    def tick(self, now: float | None = None) -> dict[str, str]:
        """Run one scheduler cycle; returns alias → action
        (``"refreshed"`` | ``"unchanged"`` | ``"skipped"``)."""
        import time

        now = time.time() if now is None else now
        actions: dict[str, str] = {}
        due = set(self.due(now))
        for entry in self.registry.list_repos():
            alias = entry["alias_name"]
            if alias not in due:
                actions[alias] = "skipped"
                continue
            with self._lock_for(alias):
                if self.has_changes is not None and not self.has_changes(
                    alias, entry
                ):
                    self.registry.aliases.update_refresh_timestamp(alias, now)
                    with self.registry._lock:
                        data = self.registry._load()
                        if alias in data:
                            data[alias]["last_refresh"] = now
                            self.registry._save(data)
                    actions[alias] = "unchanged"
                    continue
                self.registry.refresh(
                    alias, lambda out, _a=alias: self.build_fn(_a, out)
                )
                actions[alias] = "refreshed"
        return actions
