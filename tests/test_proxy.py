"""Proxy mode (reference proxy/): config lifecycle (init / discovery /
refresh / add / remove, nested-proxy rejection), parallel per-repo fan-out
with error isolation, and the Stories 3.2-3.4 aggregation contract —
merge, score-desc sort, ONE global limit, repository attribution."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.index.manifest import MANIFEST_NAME
from code_indexer_ray.query.proxy import (
    NestedProxyError,
    ProxyError,
    ProxySearcher,
    add_repo,
    discover_repos,
    init_proxy,
    load_config,
    refresh_proxy,
    remove_repo,
)


def _fake_index(root: str, rel: str) -> None:
    d = os.path.join(root, rel)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, MANIFEST_NAME), "w") as f:
        f.write("{}")


class TestProxyConfig:
    def test_init_discovers_sorted_relative_paths(self, tmp_path):
        root = str(tmp_path)
        _fake_index(root, "b/idx")
        _fake_index(root, "a_repo")
        cfg = init_proxy(root)
        assert cfg["proxy_mode"] is True
        assert cfg["discovered_repos"] == ["a_repo", os.path.join("b", "idx")]
        assert load_config(root)["discovered_repos"] == cfg["discovered_repos"]

    def test_reinit_raises_unless_forced(self, tmp_path):
        root = str(tmp_path)
        init_proxy(root)
        with pytest.raises(ProxyError, match="already initialized"):
            init_proxy(root)
        init_proxy(root, force=True)  # no raise

    def test_nested_proxy_rejected(self, tmp_path):
        root = str(tmp_path)
        init_proxy(root)
        child = os.path.join(root, "sub")
        os.makedirs(child)
        with pytest.raises(NestedProxyError):
            init_proxy(child)

    def test_discovery_skips_index_internals_and_nested_proxies(self, tmp_path):
        root = str(tmp_path)
        _fake_index(root, "repo1")
        # a manifest nested INSIDE an index dir is not a second repo
        _fake_index(root, os.path.join("repo1", "inner"))
        # a nested proxy root's repos belong to that proxy, not this one
        nested = os.path.join(root, "other")
        _fake_index(nested, "theirs")
        init_proxy(nested)
        assert discover_repos(root) == ["repo1"]

    def test_refresh_picks_up_new_repo(self, tmp_path):
        root = str(tmp_path)
        _fake_index(root, "one")
        init_proxy(root)
        _fake_index(root, "two")
        assert refresh_proxy(root)["discovered_repos"] == ["one", "two"]

    def test_add_remove_validate(self, tmp_path):
        root = str(tmp_path)
        _fake_index(root, "one")
        init_proxy(root)
        with pytest.raises(ProxyError, match="already registered"):
            add_repo(root, "one")
        with pytest.raises(ProxyError, match="not an index directory"):
            add_repo(root, "ghost")
        _fake_index(root, "two")
        assert add_repo(root, "two")["discovered_repos"] == ["one", "two"]
        assert remove_repo(root, "one")["discovered_repos"] == ["two"]
        with pytest.raises(ProxyError, match="not registered"):
            remove_repo(root, "one")

    def test_load_config_requires_proxy_root(self, tmp_path):
        with pytest.raises(ProxyError, match="not a proxy root"):
            load_config(str(tmp_path / "nowhere"))

    def test_detect_mode(self, tmp_path):
        from code_indexer_ray.query.proxy import detect_mode

        root = str(tmp_path)
        _fake_index(root, "repo")
        assert detect_mode(os.path.join(root, "repo")) == "index"
        assert detect_mode(os.path.join(root, "empty_nowhere")) == "uninitialized"
        init_proxy(root)
        assert detect_mode(root) == "proxy"
        # nearest config wins: a repo inside the proxy root is index mode
        assert detect_mode(os.path.join(root, "repo")) == "index"
        # a plain subdir inherits the proxy root above it
        sub = os.path.join(root, "plain")
        os.makedirs(sub)
        assert detect_mode(sub) == "proxy"


@pytest.fixture(scope="module")
def proxy_root(ray_session, tmp_path_factory):
    """Two tiny repos under one proxy root: repo A is spark-heavy, repo B
    merge-heavy, with scores interleaving across repos."""
    root = str(tmp_path_factory.mktemp("proxy_root"))
    corpora = {
        "repoA": [
            {"doc_id": i, "text": t, "lang": "en", "url": f"a/{i}"}
            for i, t in enumerate(
                ["spark merge fast", "spark spark merge", "spark only here", "filler words baseline"]
            )
        ],
        "repoB": [
            {"doc_id": i, "text": t, "lang": "en", "url": f"b/{i}"}
            for i, t in enumerate(
                ["merge merge spark", "merge spark tail", "merge solo line", "other filler text"]
            )
        ],
    }
    for rel, rows in corpora.items():
        src = os.path.join(root, f"_src_{rel}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        build_index(
            src, os.path.join(root, rel), store_cols=("lang", "url"),
            num_shards=1, num_buckets=1, doc_id_upper=7, resume=False,
        )
    init_proxy(root)
    return root


class TestProxySearch:
    def test_interleaved_global_limit(self, proxy_root):
        ps = ProxySearcher(proxy_root)
        assert ps.repos == ["repoA", "repoB"]
        hits, errors = ps.search("spark merge", limit=3, snippet_lines=0)
        assert errors == {}
        assert len(hits) == 3
        # brute expectation: per-repo searches merged, score desc, global cut
        expect = []
        for rel in ("repoA", "repoB"):
            from code_indexer_ray.query.engine import IndexSearcher

            s = IndexSearcher(os.path.join(proxy_root, rel))
            for r in s.search("spark merge", limit=3, snippet_lines=0):
                expect.append((round(r["score"], 9), rel, r["doc_id"]))
        expect.sort(key=lambda t: (-t[0], t[1], t[2]))
        got = [(round(r["score"], 9), r["repository"], r["doc_id"]) for r in hits]
        assert got == expect[:3]
        # both repos contribute to the global page (interleave, not grouping)
        assert {r["repository"] for r in hits} == {"repoA", "repoB"}

    def test_min_score_filters_before_global_cut(self, proxy_root):
        ps = ProxySearcher(proxy_root)
        all_hits, _ = ps.search("spark merge", limit=0, snippet_lines=0)
        thresh = round(all_hits[1]["score"], 4)
        kept, _ = ps.search("spark merge", limit=0, min_score=thresh, snippet_lines=0)
        assert len(kept) < len(all_hits)
        assert all(r["score"] >= thresh for r in kept)

    def test_error_isolation(self, proxy_root):
        bad = os.path.join(proxy_root, "broken")
        os.makedirs(bad, exist_ok=True)
        with open(os.path.join(bad, MANIFEST_NAME), "w") as f:
            f.write("{not json")
        try:
            add_repo(proxy_root, "broken")
            ps = ProxySearcher(proxy_root)
            hits, errors = ps.search("spark merge", limit=5, snippet_lines=0)
            assert set(errors) == {"broken"}
            assert hits and all(r["repository"] != "broken" for r in hits)
        finally:
            remove_repo(proxy_root, "broken")

    def test_invalid_params_propagate(self, proxy_root):
        # an invalid regex fails identically on every repo: caller error,
        # re-raised rather than buried in the per-repo error map
        ps = ProxySearcher(proxy_root)
        with pytest.raises(ValueError, match="Invalid regex"):
            ps.search("s(ark", limit=5, use_regex=True, snippet_lines=0)

    def test_status(self, proxy_root):
        rows, errors = ProxySearcher(proxy_root).status()
        assert errors == {}
        assert [r["repository"] for r in rows] == ["repoA", "repoB"]
        assert all(r["num_docs"] == 4 for r in rows)


def test_proxy_cli(tmp_path):
    """proxy init/status/search/remove from the CLI, one subprocess
    (the CLI owns its own Ray session — pattern from test_cli.py)."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    repo_root = str(Path(__file__).resolve().parents[1])
    root = tmp_path / "proot"
    for rel, word in (("alpha", "spark"), ("beta", "merge")):
        rows = [
            {"doc_id": i, "text": f"{word} common w{i}", "lang": "en", "url": f"{rel}/{i}"}
            for i in range(6)
        ]
        src = tmp_path / f"{rel}.parquet"
        pq.write_table(pa.Table.from_pylist(rows), str(src))
        (root / rel).parent.mkdir(parents=True, exist_ok=True)
        script = f"""
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "build", "--input", {str(src)!r},
             "--out", {str(root / rel)!r}, "--num-shards", "1", "--num-buckets", "1"]) == 0
"""
        out = subprocess.run(
            [sys.executable, "-c", script], capture_output=True, text=True,
            timeout=300, cwd=repo_root,
        )
        assert out.returncode == 0, out.stderr[-2000:]

    script = f"""
from code_indexer_ray.cli import main
assert main(["proxy", "init", "--root", {str(root)!r}]) == 0
assert main(["proxy", "init", "--root", {str(root)!r}]) == 2  # re-init is a clean error
assert main(["proxy", "status", "--root", {str(root)!r}]) == 0
assert main(["proxy", "search", "--root", {str(root)!r}, "common", "--limit", "4"]) == 0
assert main(["proxy", "remove", "--root", {str(root)!r}, "ghost"]) == 2
# transparent mode detection: plain search/stats against the proxy root fan out
assert main(["search", "--index", {str(root)!r}, "common", "--limit", "2",
             "--snippet-lines", "0"]) == 0
assert main(["stats", "--index", {str(root)!r}]) == 0
print("PROXY_CLI_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=300, cwd=repo_root,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "PROXY_CLI_OK" in out.stdout
    rows = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    hits = [r for r in rows if "repository" in r]
    # both corpora score 'common' identically, so the deterministic
    # (score, repository, doc_id) tie-break fills the page from 'alpha':
    # 4 hits from `proxy search`, then 2 from the transparent `search`
    assert len(hits) == 6 and all(h["repository"] == "alpha" for h in hits)
    assert [h["doc_id"] for h in hits] == [0, 1, 2, 3, 0, 1]
