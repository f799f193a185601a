"""Global repository registry (reference global_repos/): alias pointer
files with CAS swap, query refcounting, rebuild-and-swap refresh with
refcount-gated generation GC, deterministic refresh scheduler."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.index.manifest import MANIFEST_NAME
from code_indexer_ray.repos import (
    AliasManager,
    GlobalRegistry,
    QueryTracker,
    RefreshScheduler,
    RegistryError,
    ReservedNameError,
)


def _fake_index(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        f.write("{}")
    return path


def _write_corpus(path: str, texts: list[str]) -> str:
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "url": f"u/{i}"}
        for i, t in enumerate(texts)
    ]
    pq.write_table(pa.Table.from_pylist(rows), path)
    return path


class TestAliasManager:
    def test_create_read_delete(self, tmp_path):
        am = AliasManager(str(tmp_path / "aliases"))
        am.create_alias("web-global", "/idx/v0")
        assert am.alias_exists("web-global")
        assert am.read_alias("web-global") == "/idx/v0"
        # repo_name defaults to alias minus the -global suffix
        assert am.read("web-global")["repo_name"] == "web"
        am.delete_alias("web-global")
        assert am.read_alias("web-global") is None
        am.delete_alias("web-global")  # idempotent

    def test_swap_is_compare_and_swap(self, tmp_path):
        am = AliasManager(str(tmp_path / "aliases"))
        am.create_alias("web-global", "/idx/v0")
        am.swap_alias("web-global", "/idx/v1", "/idx/v0")
        assert am.read_alias("web-global") == "/idx/v1"
        assert am.get_previous_path("web-global") == "/idx/v0"
        # stale expected target → conflict (a concurrent refresh won)
        with pytest.raises(RegistryError, match="does not match"):
            am.swap_alias("web-global", "/idx/v2", "/idx/v0")
        with pytest.raises(RegistryError, match="does not exist"):
            am.swap_alias("ghost-global", "/x", "/y")

    def test_update_refresh_timestamp(self, tmp_path):
        am = AliasManager(str(tmp_path / "aliases"))
        am.create_alias("web-global", "/idx/v0")
        before = am.read("web-global")["last_refresh"]
        am.update_refresh_timestamp("web-global")
        assert am.read("web-global")["last_refresh"] >= before


class TestQueryTracker:
    def test_refcount_floor_and_context(self):
        qt = QueryTracker()
        assert qt.get_ref_count("/p") == 0
        qt.increment_ref("/p")
        qt.increment_ref("/p")
        assert qt.get_ref_count("/p") == 2
        qt.decrement_ref("/p")
        qt.decrement_ref("/p")
        qt.decrement_ref("/p")  # floor at zero, never negative
        assert qt.get_ref_count("/p") == 0
        with qt.track_query("/p"):
            assert qt.get_ref_count("/p") == 1
        assert qt.get_ref_count("/p") == 0

    def test_track_query_releases_on_error(self):
        qt = QueryTracker()
        with pytest.raises(RuntimeError):
            with qt.track_query("/p"):
                raise RuntimeError("boom")
        assert qt.get_ref_count("/p") == 0


class TestRegistration:
    def test_register_requires_global_suffix(self, tmp_path):
        reg = GlobalRegistry(str(tmp_path / "root"))
        idx = _fake_index(str(tmp_path / "idx"))
        with pytest.raises(ValueError, match="-global"):
            reg.register("web", "web", idx)
        entry = reg.register("web", "Web-GLOBAL", idx)  # case-insensitive
        assert entry["index_path"] == os.path.abspath(idx)

    def test_register_rejects_reserved_names(self, tmp_path, monkeypatch):
        import code_indexer_ray.repos as reposmod

        monkeypatch.setitem(
            reposmod.RESERVED_GLOBAL_NAMES, "sys-global", "testing"
        )
        reg = GlobalRegistry(str(tmp_path / "root"))
        idx = _fake_index(str(tmp_path / "idx"))
        with pytest.raises(ReservedNameError):
            reg.register("sys", "sys-global", idx)
        reg.register("sys", "sys-global", idx, allow_reserved=True)

    def test_register_requires_manifest(self, tmp_path):
        reg = GlobalRegistry(str(tmp_path / "root"))
        with pytest.raises(RegistryError, match="not an index root"):
            reg.register("web", "web-global", str(tmp_path / "nothing"))

    def test_list_resolve_unregister(self, tmp_path):
        reg = GlobalRegistry(str(tmp_path / "root"))
        a = _fake_index(str(tmp_path / "a"))
        b = _fake_index(str(tmp_path / "b"))
        reg.register("b", "b-global", b)
        reg.register("a", "a-global", a)
        rows = reg.list_repos()
        assert [r["alias_name"] for r in rows] == ["a-global", "b-global"]
        assert rows[0]["target_path"] == os.path.abspath(a)
        assert reg.resolve("b-global") == os.path.abspath(b)
        reg.unregister("a-global")
        assert [r["alias_name"] for r in reg.list_repos()] == ["b-global"]
        with pytest.raises(RegistryError, match="unknown alias"):
            reg.resolve("a-global")
        with pytest.raises(RegistryError, match="unknown alias"):
            reg.unregister("a-global")


@pytest.fixture(scope="module")
def registry_root(ray_session, tmp_path_factory):
    """A registry with one REAL registered index and a corpus to refresh
    from (module-scoped: index builds cost a Ray pipeline each)."""
    root = tmp_path_factory.mktemp("reposroot")
    src_v0 = _write_corpus(
        str(root / "v0.parquet"),
        ["spark merge fast", "spark spark merge", "filler words baseline"],
    )
    src_v1 = _write_corpus(
        str(root / "v1.parquet"),
        ["spark merge fast", "spark spark merge",
         "filler words baseline", "merge newcomer doc"],
    )
    idx0 = str(root / "initial_idx")
    build_index(src_v0, idx0, store_cols=("lang", "url"),
                num_shards=1, num_buckets=1, resume=False)
    reg = GlobalRegistry(str(root / "registry"))
    reg.register("web", "web-global", idx0, repo_url="https://example/web.git")
    return {"reg": reg, "idx0": idx0, "src_v0": src_v0, "src_v1": src_v1}


def _build_fn(src):
    def fn(out_dir):
        build_index(src, out_dir, store_cols=("lang", "url"),
                    num_shards=1, num_buckets=1, resume=False)
    return fn


class TestRefreshFlow:
    def test_search_refresh_swap_and_gc(self, registry_root):
        reg: GlobalRegistry = registry_root["reg"]
        hits = reg.search("web-global", "spark merge", {"limit": 10})
        assert len(hits) == 2  # v0 corpus: 2 of 3 docs carry a query term

        # refresh to the 4-doc corpus: fresh generation dir + pointer swap
        new = reg.refresh("web-global", _build_fn(registry_root["src_v1"]))
        assert reg.resolve("web-global") == new
        assert os.path.dirname(os.path.dirname(new)).endswith("builds")
        # the ORIGINAL registration dir is the caller's property — never GC'd
        assert os.path.exists(os.path.join(registry_root["idx0"], MANIFEST_NAME))
        # registry keeps the original index_path; the alias is the live one
        assert reg.get_repo("web-global")["index_path"] == os.path.abspath(
            registry_root["idx0"]
        )
        hits = reg.search("web-global", "merge", {"limit": 10})
        assert len(hits) == 3  # v1's extra "merge newcomer doc" is visible

    def test_generation_gc_waits_for_inflight_queries(self, registry_root):
        reg: GlobalRegistry = registry_root["reg"]
        gen1 = reg.resolve("web-global")
        # pin gen1 as an in-flight query would, then refresh over it
        reg.tracker.increment_ref(gen1)
        gen2 = reg.refresh("web-global", _build_fn(registry_root["src_v0"]))
        assert gen2 != gen1
        assert gen1 in reg.get_pending_cleanups()
        assert os.path.exists(gen1)  # refcount > 0 → survives the sweep
        reg.tracker.decrement_ref(gen1)
        deleted = reg.collect_garbage()
        assert gen1 in deleted and not os.path.exists(gen1)
        assert os.path.exists(os.path.join(gen2, MANIFEST_NAME))

    def test_refresh_validates_build_output(self, registry_root):
        reg: GlobalRegistry = registry_root["reg"]
        live = reg.resolve("web-global")
        with pytest.raises(RegistryError, match="no manifest"):
            reg.refresh("web-global", lambda out: os.makedirs(out, exist_ok=True))
        assert reg.resolve("web-global") == live  # pointer untouched


class TestRefreshScheduler:
    def _reg(self, tmp_path) -> GlobalRegistry:
        reg = GlobalRegistry(str(tmp_path / "root"))
        idx = _fake_index(str(tmp_path / "idx"))
        reg.register("web", "web-global", idx)
        return reg

    def test_due_and_skip(self, tmp_path):
        reg = self._reg(tmp_path)
        t0 = reg.get_repo("web-global")["last_refresh"]
        sched = RefreshScheduler(reg, interval_s=60.0, build_fn=None)
        assert sched.due(now=t0 + 30) == []
        assert sched.due(now=t0 + 61) == ["web-global"]
        assert sched.tick(now=t0 + 30) == {"web-global": "skipped"}

    def test_unchanged_stamps_without_rebuild(self, tmp_path):
        reg = self._reg(tmp_path)
        t0 = reg.get_repo("web-global")["last_refresh"]
        calls = []
        sched = RefreshScheduler(
            reg, interval_s=60.0,
            build_fn=lambda a, out: calls.append(a),
            has_changes=lambda alias, entry: False,
        )
        assert sched.tick(now=t0 + 120) == {"web-global": "unchanged"}
        assert calls == []
        assert reg.get_repo("web-global")["last_refresh"] > t0
        assert reg.aliases.read("web-global")["last_refresh"] > t0
        # stamped → no longer due at the same logical time
        assert sched.tick(now=t0 + 120) == {"web-global": "skipped"}

    def test_changed_repo_is_rebuilt_and_swapped(self, tmp_path):
        reg = self._reg(tmp_path)
        t0 = reg.get_repo("web-global")["last_refresh"]
        old = reg.resolve("web-global")

        def build(alias, out_dir):
            _fake_index(out_dir)

        sched = RefreshScheduler(
            reg, interval_s=60.0, build_fn=build,
            has_changes=lambda alias, entry: True,
        )
        assert sched.tick(now=t0 + 120) == {"web-global": "refreshed"}
        assert reg.resolve("web-global") != old


def test_cli_repos_group(tmp_path):
    """register → list → refresh → search → gc → unregister in one
    subprocess (the CLI owns its own Ray session)."""
    import subprocess
    import sys
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    src = str(tmp_path / "c.parquet")
    _write_corpus(src, [f"spark merge w{i}" for i in range(12)])
    idx = str(tmp_path / "idx")
    root = str(tmp_path / "registry")

    script = f"""
import json
from code_indexer_ray.cli import main
from code_indexer_ray.index.build import build_index
build_index({src!r}, {idx!r}, num_shards=1, num_buckets=1, resume=False)
assert main(["--num-cpus", "4", "repos", "register", "--root", {root!r},
             "--alias", "web-global", "--index", {idx!r}]) == 0
assert main(["repos", "list", "--root", {root!r}]) == 0
assert main(["repos", "refresh", "--root", {root!r}, "--alias", "web-global",
             "--input", {src!r}, "--num-shards", "1"]) == 0
assert main(["repos", "search", "--root", {root!r}, "--alias", "web-global",
             "spark merge", "--limit", "3"]) == 0
assert main(["repos", "tree", "--root", {root!r}, "--alias", "web-global",
             "--show-stats"]) == 0
assert main(["repos", "gc", "--root", {root!r}]) == 0
assert main(["repos", "unregister", "--root", {root!r},
             "--alias", "web-global"]) == 0
# clean JSON exit 2 on unknown alias
assert main(["repos", "search", "--root", {root!r}, "--alias",
             "ghost-global", "q"]) == 2
print("REPOS_CLI_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, cwd=repo_root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REPOS_CLI_OK" in out.stdout
    for ln in out.stdout.splitlines():
        if ln.startswith("{"):
            json.loads(ln)
