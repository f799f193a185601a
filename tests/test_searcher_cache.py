"""Server-side searcher cache (reference ``server/cache/fts_index_cache.py``):
TTL eviction with access refresh, manifest-fingerprint reload-on-access,
LRU size limit, stats, background cleanup — plus the proxy/registry wiring
over real indexes."""

from __future__ import annotations

import os
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.manifest import MANIFEST_NAME
from code_indexer_ray.server.cache import (
    SearcherCache,
    SearcherCacheConfig,
)


class Clock:
    def __init__(self, t=1_000.0):
        self.t = float(t)

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


class CountingLoader:
    def __init__(self):
        self.loads = []

    def __call__(self, path):
        self.loads.append(path)
        return f"searcher:{path}:{len(self.loads)}"


class TestConfig:
    def test_validation(self):
        with pytest.raises(ValueError):
            SearcherCacheConfig(ttl_minutes=0)
        with pytest.raises(ValueError):
            SearcherCacheConfig(cleanup_interval_seconds=0)
        with pytest.raises(ValueError):
            SearcherCacheConfig(max_entries=0)

    def test_from_env(self, monkeypatch):
        monkeypatch.setenv("CIDX_SEARCHER_CACHE_TTL_MINUTES", "2.5")
        monkeypatch.setenv("CIDX_SEARCHER_CACHE_MAX_ENTRIES", "3")
        monkeypatch.setenv("CIDX_SEARCHER_CACHE_RELOAD_ON_ACCESS", "false")
        cfg = SearcherCacheConfig.from_env()
        assert cfg.ttl_minutes == 2.5
        assert cfg.max_entries == 3
        assert cfg.reload_on_access is False


class TestSearcherCache:
    def _cache(self, tmp_path, **cfg):
        clk = Clock()
        loader = CountingLoader()
        cache = SearcherCache(
            SearcherCacheConfig(**cfg) if cfg else None, loader=loader, now_fn=clk
        )
        return cache, loader, clk, str(tmp_path)

    def test_hit_miss_counting(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path)
        s1 = cache.get_or_load(d)
        s2 = cache.get_or_load(d)
        assert s1 == s2 and len(loader.loads) == 1
        st = cache.get_stats()
        assert st.miss_count == 1 and st.hit_count == 1
        assert st.hit_ratio == 0.5
        assert st.cached_repositories == 1

    def test_ttl_eviction_and_access_refresh(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path, ttl_minutes=10)
        cache.get_or_load(d)
        clk.advance(9 * 60)
        cache.get_or_load(d)  # refreshes TTL (access-based, not created_at)
        clk.advance(9 * 60)
        cache.get_or_load(d)  # still a hit: 9 min since last access
        assert len(loader.loads) == 1
        clk.advance(10 * 60 + 1)
        cache.get_or_load(d)  # expired → evicted + reloaded
        assert len(loader.loads) == 2
        st = cache.get_stats()
        assert st.eviction_count == 1 and st.miss_count == 2

    def test_reload_on_access_fingerprint(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path)
        manifest = os.path.join(d, MANIFEST_NAME)
        with open(manifest, "w") as f:
            f.write("v1")
        cache.get_or_load(d)
        cache.get_or_load(d)
        assert len(loader.loads) == 1  # unchanged manifest → plain hit
        with open(manifest, "w") as f:
            f.write("v2-longer")  # in-place republish
        out = cache.get_or_load(d)
        assert len(loader.loads) == 2 and out.endswith(":2")
        st = cache.get_stats()
        assert st.reload_count == 1 and st.hit_count == 2  # reload is a HIT

    def test_reload_on_access_off(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path, reload_on_access=False)
        manifest = os.path.join(d, MANIFEST_NAME)
        with open(manifest, "w") as f:
            f.write("v1")
        cache.get_or_load(d)
        with open(manifest, "w") as f:
            f.write("v2-longer")
        cache.get_or_load(d)
        assert len(loader.loads) == 1  # stale by design

    def test_lru_size_limit(self, tmp_path):
        cache, loader, clk, _ = self._cache(tmp_path, max_entries=2)
        d = [str(tmp_path / f"r{i}") for i in range(3)]
        cache.get_or_load(d[0])
        clk.advance(1)
        cache.get_or_load(d[1])
        clk.advance(1)
        cache.get_or_load(d[0])  # refresh r0 → r1 is now LRU
        clk.advance(1)
        cache.get_or_load(d[2])  # evicts r1
        st = cache.get_stats()
        assert st.cached_repositories == 2 and st.eviction_count == 1
        keys = set(st.per_repository_stats)
        assert os.path.abspath(d[1]) not in keys
        assert {os.path.abspath(d[0]), os.path.abspath(d[2])} == keys

    def test_invalidate_and_clear(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path)
        cache.get_or_load(d)
        cache.invalidate(d)
        cache.get_or_load(d)
        assert len(loader.loads) == 2
        cache.clear()
        assert cache.get_stats().cached_repositories == 0
        assert cache.get_stats().eviction_count == 2

    def test_cleanup_expired(self, tmp_path):
        cache, loader, clk, _ = self._cache(tmp_path, ttl_minutes=1)
        cache.get_or_load(str(tmp_path / "a"))
        cache.get_or_load(str(tmp_path / "b"))
        clk.advance(61)
        assert cache.cleanup_expired() == 2
        assert cache.get_stats().cached_repositories == 0

    def test_per_repo_stats_fields(self, tmp_path):
        cache, loader, clk, d = self._cache(tmp_path, ttl_minutes=10)
        cache.get_or_load(d)
        clk.advance(60)
        cache.get_or_load(d)
        row = cache.get_stats().per_repository_stats[os.path.abspath(d)]
        assert row["access_count"] == 2
        assert row["ttl_remaining_seconds"] == pytest.approx(600.0)
        assert row["last_accessed"] == clk.t and row["created_at"] == clk.t - 60

    def test_parallel_distinct_loads_dedupe_same_key(self, tmp_path):
        """Same-dir concurrent loads collapse to one; distinct dirs don't
        block each other (per-key load locks)."""
        started, release = threading.Event(), threading.Event()
        loads = []

        def slow_loader(path):
            loads.append(path)
            if path.endswith("x"):  # only d1's load is stuck
                started.set()
                release.wait(timeout=10)
            return f"s:{path}"

        cache = SearcherCache(loader=slow_loader)
        d1, d2 = str(tmp_path / "x"), str(tmp_path / "y")
        t1 = threading.Thread(target=cache.get_or_load, args=(d1,))
        t1.start()
        started.wait(timeout=10)
        # while d1's load is stuck, d1 duplicate queues but d2 proceeds
        t1b = threading.Thread(target=cache.get_or_load, args=(d1,))
        t1b.start()
        out2 = []
        t2 = threading.Thread(target=lambda: out2.append(cache.get_or_load(d2)))
        t2.start()
        t2.join(timeout=10)
        assert out2 == [f"s:{d2}"]  # d2 finished while d1 was blocked
        release.set()
        t1.join(timeout=10)
        t1b.join(timeout=10)
        assert loads.count(os.path.abspath(d1)) == 1  # deduped

    def test_background_cleanup_thread(self, tmp_path):
        # real clock here: the thread waits on a real Event timeout
        cache = SearcherCache(
            SearcherCacheConfig(ttl_minutes=1 / 600.0, cleanup_interval_seconds=0.05),
            loader=CountingLoader(),
        )
        cache.get_or_load(str(tmp_path))
        cache.start_background_cleanup()
        try:
            deadline = time.time() + 5
            while time.time() < deadline:
                if cache.get_stats().cached_repositories == 0:
                    break
                time.sleep(0.02)
            assert cache.get_stats().cached_repositories == 0
        finally:
            cache.stop_background_cleanup()


# ---------------------------------------------------------------------------
# wiring: proxy fan-out + global registry over real indexes
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index

    tmp = tmp_path_factory.mktemp("sc")
    rng = np.random.default_rng(3)
    vocab = ["spark", "merge", "window", "batch"]
    dirs = []
    for r in range(2):
        rows = [
            {
                "doc_id": i,
                "text": " ".join(vocab[j] for j in rng.integers(0, 4, 10)),
                "lang": "en",
                "url": f"f{i}.py",
            }
            for i in range(40)
        ]
        src = str(tmp / f"c{r}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / f"repo{r}" )
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        dirs.append(idx)
    return str(tmp), dirs


@pytest.mark.usefixtures("ray_session")
class TestWiring:
    def test_proxy_uses_cache(self, two_indexes):
        from code_indexer_ray.query.proxy import ProxySearcher, init_proxy

        root, dirs = two_indexes
        init_proxy(root)
        p = ProxySearcher(root)
        hits, errors = p.search("spark", limit=5)
        assert hits and not errors
        st1 = p.cache_stats()
        assert st1["cached_repositories"] == 2 and st1["miss_count"] == 2
        p.search("merge", limit=5)
        st2 = p.cache_stats()
        assert st2["hit_count"] >= 2 and st2["miss_count"] == 2

    def test_registry_cache_reload_and_stats(self, two_indexes, tmp_path):
        from code_indexer_ray.repos import GlobalRegistry

        root, dirs = two_indexes
        reg = GlobalRegistry(str(tmp_path / "reg"))
        reg.register("alpha", "alpha-global", dirs[0])
        hits = reg.search("alpha-global", "spark", {"limit": 5})
        assert hits
        reg.search("alpha-global", "merge", {"limit": 5})
        st = reg.cache_stats()
        assert st["miss_count"] == 1 and st["hit_count"] == 1


class TestIdleSweep:
    def test_idle_entries_age_out_without_reaccess(self, tmp_path):
        """TTL evicts entries never touched again: any get_or_load sweeps
        the whole map once per cleanup interval (review fix — idle warm
        searchers used to stay pinned forever)."""
        clk = Clock()
        loader = CountingLoader()
        cache = SearcherCache(
            SearcherCacheConfig(ttl_minutes=1, cleanup_interval_seconds=60),
            loader=loader,
            now_fn=clk,
        )
        cache.get_or_load(str(tmp_path / "idle"))
        clk.advance(120)  # idle entry expired; interval elapsed
        cache.get_or_load(str(tmp_path / "other"))  # different key
        st = cache.get_stats()
        assert st.cached_repositories == 1
        assert os.path.abspath(str(tmp_path / "idle")) not in st.per_repository_stats
        assert st.eviction_count == 1
