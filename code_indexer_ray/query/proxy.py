"""Proxy mode — one parent root managing many indexed repositories
(reference ``proxy/``: ``proxy_initializer.py``, ``config_manager.py``,
``parallel_executor.py``, ``query_aggregator.py``, ``command_validator.py``).

The reference's proxy is a parent directory whose config lists discovered
sub-repositories; proxied commands fan out per-repo in a bounded thread
pool (subprocess per repo there; a searcher per repo here), failures are
captured per-repo and never abort the others, and query aggregation is
Stories 3.2-3.4: merge every repo's hits, sort by score DESC, apply ONE
GLOBAL limit while preserving each hit's repository attribution.  Scores
stay REPO-LOCAL (each repo's own N/df/avgdl) — the interleave is
presentation-level, which makes proxy aggregation the third federation
mode next to :class:`~code_indexer_ray.query.multi.MultiIndexSearcher`'s
per-repo grouping and ``search_global``'s merged-statistics ranking.

Thread-per-repo is safe here because each worker thread touches only its
own repo's :class:`IndexSearcher` (driver-side caches are per-instance);
the GIL note from the shard-group experiment (engine.py) does not apply —
that regression was threads *inside one query's* numpy scoring, this is
the reference's own across-repos axis.

Scale: the proxy root is an orchestration object — its config holds repo
PATHS only (never corpus-sized state), and per-repo work is the existing
engine fan-out, so a proxy over R repos costs R parallel searches of
whatever each repo costs.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from ..index.manifest import MANIFEST_NAME, atomic_write_json
from .engine import IndexSearcher

PROXY_DIR = "_proxy"
CONFIG_NAME = "config.json"
MAX_WORKERS = 10  # reference parallel_executor.py MAX_WORKERS
#: proxied commands (reference command_validator.py's whitelist analog)
SUPPORTED_COMMANDS = ("search", "status")


class ProxyError(RuntimeError):
    """Proxy initialization / configuration failure."""


class NestedProxyError(ProxyError):
    """A proxy root may not live inside another proxy root."""


def _config_path(root: str) -> str:
    return os.path.join(root, PROXY_DIR, CONFIG_NAME)


def discover_repos(root: str) -> list[str]:
    """Root-relative paths of every index directory under ``root`` (a dir
    containing ``manifest.json``).  Walk order is sorted for determinism;
    discovered index dirs are not descended into (an index's internal
    layout is not a nested repo), and nested proxy roots are skipped."""
    found: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames.sort()
        if dirpath != root and MANIFEST_NAME in filenames:
            found.append(os.path.relpath(dirpath, root))
            dirnames[:] = []  # never treat index internals as repos
            continue
        if dirpath != root and PROXY_DIR in dirnames:
            dirnames[:] = []  # a nested proxy manages its own repos
    return sorted(found)


def _ancestor_proxy(root: str) -> str | None:
    cur = os.path.dirname(os.path.abspath(root))
    while True:
        if os.path.exists(_config_path(cur)):
            return cur
        parent = os.path.dirname(cur)
        if parent == cur:
            return None
        cur = parent


def init_proxy(root: str, *, force: bool = False) -> dict:
    """Create ``<root>/_proxy/config.json`` with the discovered repo list
    (reference ``ProxyInitializer.create_proxy_config`` + initial
    discovery).  Raises on re-init (unless ``force``) and when ``root``
    is already inside another proxy root."""
    anc = _ancestor_proxy(root)
    if anc is not None:
        raise NestedProxyError(f"{root} is inside the proxy root {anc}")
    cfg_path = _config_path(root)
    if os.path.exists(cfg_path) and not force:
        raise ProxyError(f"already initialized as proxy: {root}")
    cfg = {"proxy_mode": True, "discovered_repos": discover_repos(root)}
    os.makedirs(os.path.dirname(cfg_path), exist_ok=True)
    atomic_write_json(cfg_path, cfg)
    return cfg


def load_config(root: str) -> dict:
    cfg_path = _config_path(root)
    try:
        with open(cfg_path) as f:
            cfg = json.load(f)
    except OSError:
        raise ProxyError(f"not a proxy root (no {PROXY_DIR}/{CONFIG_NAME}): {root}") from None
    if not cfg.get("proxy_mode"):
        raise ProxyError(f"config at {cfg_path} is not a proxy config")
    return cfg


def refresh_proxy(root: str) -> dict:
    """Re-run discovery, replacing the stored repo list (reference
    ``ConfigManager.refresh_repositories``)."""
    load_config(root)  # must already be a proxy root
    cfg = {"proxy_mode": True, "discovered_repos": discover_repos(root)}
    atomic_write_json(_config_path(root), cfg)
    return cfg


def add_repo(root: str, rel_path: str) -> dict:
    """Explicitly register one repo (must exist, must be an index dir,
    must not already be registered)."""
    cfg = load_config(root)
    rel = os.path.normpath(rel_path)
    if rel in cfg["discovered_repos"]:
        raise ProxyError(f"repository already registered: {rel}")
    if not os.path.exists(os.path.join(root, rel, MANIFEST_NAME)):
        raise ProxyError(f"not an index directory (no {MANIFEST_NAME}): {rel}")
    cfg["discovered_repos"] = sorted(cfg["discovered_repos"] + [rel])
    atomic_write_json(_config_path(root), cfg)
    return cfg


def remove_repo(root: str, rel_path: str) -> dict:
    cfg = load_config(root)
    rel = os.path.normpath(rel_path)
    if rel not in cfg["discovered_repos"]:
        raise ProxyError(f"repository not registered: {rel}")
    cfg["discovered_repos"] = [r for r in cfg["discovered_repos"] if r != rel]
    atomic_write_json(_config_path(root), cfg)
    return cfg


def detect_mode_root(path: str) -> tuple[str, str]:
    """``(mode, root)`` for ``path`` — the mode plus the directory whose
    config/manifest decided it (``root`` is the input path itself when
    uninitialized).  Mode is one of ``"remote" | "proxy" | "index" |
    "uninitialized"`` (reference ``mode_detection/command_mode_detector.py``:
    commands auto-detect their operating mode from the config found at or
    above the target — nearest config wins, remote beats local at the same
    level, search bounded to 10 parent levels)."""
    from .remote import REMOTE_CONFIG_NAME

    cur = os.path.abspath(path)
    for _ in range(11):
        if os.path.exists(os.path.join(cur, REMOTE_CONFIG_NAME)):
            return "remote", cur
        if os.path.exists(_config_path(cur)):
            return "proxy", cur
        if os.path.exists(os.path.join(cur, MANIFEST_NAME)):
            return "index", cur
        parent = os.path.dirname(cur)
        if parent == cur:
            break
        cur = parent
    return "uninitialized", os.path.abspath(path)


def detect_mode(path: str) -> str:
    """Mode string only — see :func:`detect_mode_root`."""
    return detect_mode_root(path)[0]


class ProxySearcher:
    """Fan a query across every registered repo and interleave the hits.

    ``search`` returns ``(hits, errors)``: hits are dicts tagged with
    ``repository`` (the root-relative repo path), merged across repos,
    sorted by (round-9 score DESC, repository, doc_id) and cut to the
    GLOBAL ``limit``; ``errors`` maps failed repos to messages — one bad
    repo never hides the others' results (reference error isolation).
    ``ValueError`` (bad query / params) propagates: it would fail
    identically on every repo, so it is the caller's error."""

    def __init__(self, root: str, *, cache=None, **searcher_kwargs):
        self.root = root
        self.repos = list(load_config(root)["discovered_repos"])
        self._kwargs = searcher_kwargs
        # TTL+LRU searcher cache (reference server/cache/fts_index_cache.py):
        # repeated proxy queries reuse warm searchers; idle repos age out on
        # TTL instead of pinning memory for the daemon's lifetime.  Pass a
        # shared cache to pool searchers across proxy roots.
        if cache is None:
            from ..server.cache import SearcherCache, SearcherCacheConfig

            cache = SearcherCache(SearcherCacheConfig.from_env())
        self._cache = cache

    def _searcher(self, rel: str) -> IndexSearcher:
        return self._cache.get_or_load(
            os.path.join(self.root, rel),
            loader=lambda p: IndexSearcher(p, **self._kwargs),
        )

    def cache_stats(self) -> dict:
        """Searcher-cache statistics (reference cache AC7 monitoring)."""
        return self._cache.get_stats().to_dict()

    def _fan_out(self, fn) -> tuple[dict[str, object], dict[str, str]]:
        """Run ``fn(rel_path)`` per repo in a bounded thread pool,
        capturing per-repo failures (reference parallel_executor)."""
        results: dict[str, object] = {}
        errors: dict[str, str] = {}
        if not self.repos:
            return results, errors
        with ThreadPoolExecutor(max_workers=min(len(self.repos), MAX_WORKERS)) as ex:
            futs = {rel: ex.submit(fn, rel) for rel in self.repos}
            for rel, fut in futs.items():
                try:
                    results[rel] = fut.result()
                except json.JSONDecodeError as e:
                    # a repo's corrupt metadata is that repo's failure, not a
                    # caller error (JSONDecodeError subclasses ValueError)
                    errors[rel] = f"{type(e).__name__}: {e}"
                except ValueError:
                    raise  # caller error: identical on every repo
                except Exception as e:  # pragma: no cover - parity catch-all
                    errors[rel] = f"{type(e).__name__}: {e}"
        return results, errors

    def search(
        self,
        query_text: str,
        *,
        limit: int = 10,
        min_score: float | None = None,
        **kwargs,
    ) -> tuple[list[dict], dict[str, str]]:
        per_repo, errors = self._fan_out(
            lambda rel: self._searcher(rel).search(query_text, limit=limit, **kwargs)
        )
        merged: list[dict] = []
        for rel, rows in per_repo.items():
            for r in rows:
                if min_score is not None and r.get("score", 0.0) < min_score:
                    continue
                r["repository"] = rel
                merged.append(r)
        merged.sort(key=lambda r: (-round(r["score"], 9), r["repository"], r["doc_id"]))
        return (merged[:limit] if limit > 0 else merged), errors

    def status(self) -> tuple[list[dict], dict[str, str]]:
        """Per-repo manifest stats (the proxied ``status`` command)."""

        def one(rel: str) -> dict:
            m = self._searcher(rel).manifest
            return {
                "repository": rel,
                "num_docs": int(m.num_docs),
                "total_tokens": int(m.total_tokens),
                "num_shards": int(m.num_shards),
            }

        per_repo, errors = self._fan_out(one)
        return [per_repo[rel] for rel in self.repos if rel in per_repo], errors
