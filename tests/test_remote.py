"""Remote mode (reference remote/: config, initialization, query_execution,
staleness_detector, api_clients/base_client): config lifecycle + mode
detection, retrying client vs a live server thread, auth and transport error
mapping, staleness annotation, and the transparent CLI routing."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.query.remote import (
    RemoteAuthError,
    RemoteClient,
    RemoteConfigError,
    RemoteConnectionError,
    RemoteQueryError,
    apply_staleness,
    init_remote,
    load_remote_config,
    validate_server_url,
)

REPO_ROOT = str(Path(__file__).resolve().parents[1])


@pytest.fixture(scope="module")
def remote_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher
    from code_indexer_ray.server.http import IndexHTTPServer

    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(4, 40)))),
            "lang": ["en", "de"][i % 2],
            "url": f"src/f{i}.py",
        }
        for i in range(150)
    ]
    tmp = tmp_path_factory.mktemp("remote")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)
    srv = IndexHTTPServer(idx, port=0)
    srv.start()
    root = str(tmp / "workdir")
    init_remote(root, f"http://{srv.host}:{srv.port}")
    yield root, IndexSearcher(idx), srv
    srv.shutdown()


class TestConfig:
    def test_init_and_detect(self, tmp_path):
        from code_indexer_ray.query.proxy import detect_mode

        root = str(tmp_path / "wd")
        cfg = init_remote(root, "http://localhost:1234/")
        assert cfg["server_url"] == "http://localhost:1234"  # slash dropped
        assert detect_mode(root) == "remote"
        sub = os.path.join(root, "a", "b")
        os.makedirs(sub)
        assert detect_mode(sub) == "remote"  # nearest-config walk
        assert load_remote_config(sub)["server_url"] == "http://localhost:1234"
        # credential file is owner-only
        mode = os.stat(os.path.join(root, ".remote-config.json")).st_mode & 0o777
        assert mode == 0o600

    def test_reinit_needs_force(self, tmp_path):
        root = str(tmp_path)
        init_remote(root, "http://h:1")
        with pytest.raises(RemoteConfigError):
            init_remote(root, "http://h:2")
        cfg = init_remote(root, "http://h:2", force=True)
        assert cfg["server_url"] == "http://h:2"

    def test_mode_conflicts(self, tmp_path):
        from code_indexer_ray.query.proxy import init_proxy

        proxy_root = str(tmp_path / "p")
        os.makedirs(proxy_root)
        init_proxy(proxy_root)
        with pytest.raises(RemoteConfigError):
            init_remote(proxy_root, "http://h:1")

    def test_url_validation(self):
        with pytest.raises(RemoteConfigError):
            validate_server_url("ftp://h:1")
        with pytest.raises(RemoteConfigError):
            validate_server_url("http://")
        assert validate_server_url("https://h:8443/") == "https://h:8443"

    def test_missing_config(self, tmp_path):
        with pytest.raises(RemoteConfigError):
            load_remote_config(str(tmp_path))


class TestClient:
    def test_search_parity_with_engine(self, remote_srv):
        from code_indexer_ray.server.http import rest_search

        root, s, _srv = remote_srv
        rc = RemoteClient(root)
        got = rc.search("spark merge", limit=5)
        want = rest_search(s, "spark merge", {"limit": 5})
        assert [(h["doc_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["score"]) for h in want
        ]

    def test_filters_travel(self, remote_srv):
        from code_indexer_ray.server.http import rest_search

        root, s, _srv = remote_srv
        rc = RemoteClient(root)
        got = rc.search("spark", limit=10, language="de")
        want = rest_search(s, "spark", {"limit": 10, "language": "de"})
        assert got and [(h["doc_id"], h["score"]) for h in got] == [
            (h["doc_id"], h["score"]) for h in want
        ]
        unfiltered = rc.search("spark", limit=10)
        assert [h["doc_id"] for h in got] != [h["doc_id"] for h in unfiltered]

    def test_stats_and_health(self, remote_srv):
        root, s, _srv = remote_srv
        rc = RemoteClient(root)
        assert rc.health()["num_docs"] == 150
        st = rc.stats()
        assert st["num_docs"] == 150
        assert st["index_timestamp"] is not None and st["index_timestamp"] > 0

    def test_mget_suggest_complete(self, remote_srv):
        root, s, _srv = remote_srv
        rc = RemoteClient(root)
        docs = rc.mget([0, 3])
        assert [d["doc_id"] for d in docs] == [0, 3]
        assert rc.suggest("sprak") == s.suggest("sprak")
        assert rc.complete("sp") == s.complete("sp")

    def test_query_error_maps_400(self, remote_srv):
        root, _s, _srv = remote_srv
        rc = RemoteClient(root)
        with pytest.raises(RemoteQueryError) as ei:
            rc.search("spark", limit=5000)
        assert ei.value.status == 400

    def test_connection_error_after_retries(self, tmp_path):
        root = str(tmp_path)
        init_remote(root, "http://127.0.0.1:1")  # nothing listens on port 1
        rc = RemoteClient(root, retries=1, backoff=0.01, timeout=2)
        with pytest.raises(RemoteConnectionError):
            rc.health()

    def test_auth(self, remote_srv, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        _root, s, srv = remote_srv
        keyed = IndexHTTPServer(srv.index_dir, port=0, api_key="sesame")
        keyed.start()
        try:
            root = str(tmp_path / "wd")
            url = f"http://{keyed.host}:{keyed.port}"
            init_remote(root, url)
            with pytest.raises(RemoteAuthError):
                RemoteClient(root).stats()
            init_remote(root, url, api_key="wrong", force=True)
            with pytest.raises(RemoteAuthError):
                RemoteClient(root).stats()
            init_remote(root, url, api_key="sesame", force=True)
            assert RemoteClient(root).stats()["num_docs"] == 150
            # health stays open without a key (reference behavior)
            init_remote(root, url, force=True)
            assert RemoteClient(root).health()["status"] == "ok"
        finally:
            keyed.shutdown()


class TestStaleness:
    HITS = [
        {"path": "a.py", "score": 3.0, "doc_id": 1},
        {"path": "b.py", "score": 2.0, "doc_id": 2},
        {"path": "c.py", "score": 1.0, "doc_id": 3},
    ]

    def test_annotation_and_demotion(self):
        out = apply_staleness(self.HITS, {"a.py": 2000.0, "b.py": 500.0}, 1000.0)
        # a.py changed after indexing → stale, demoted below fresh hits
        assert [h["doc_id"] for h in out] == [2, 3, 1]
        stale = out[-1]
        assert stale["is_stale"] and stale["staleness_delta_seconds"] == 1000.0
        assert "local +" in stale["staleness_indicator"]
        fresh = out[0]
        assert not fresh["is_stale"] and fresh["staleness_delta_seconds"] == 0.0
        # c.py has no local counterpart → fresh by definition
        assert out[1]["local_file_mtime"] is None and not out[1]["is_stale"]

    def test_no_index_timestamp_means_all_fresh(self):
        out = apply_staleness(self.HITS, {"a.py": 2000.0}, None)
        assert [h["doc_id"] for h in out] == [1, 2, 3]
        assert not any(h["is_stale"] for h in out)

    def test_originals_not_mutated(self):
        apply_staleness(self.HITS, {}, 1.0)
        assert "is_stale" not in self.HITS[0]


def test_cli_remote(remote_srv, tmp_path):
    root, s, srv = remote_srv
    url = f"http://{srv.host}:{srv.port}"
    wd = str(tmp_path / "cliwd")
    script = f"""
import json
from code_indexer_ray.cli import main
assert main(["remote", "init", "--root", {wd!r}, "--server", {url!r}]) == 0
assert main(["remote", "status", "--root", {wd!r}]) == 0
assert main(["remote", "query", "--root", {wd!r}, "spark merge", "--limit", "3"]) == 0
# transparent routing: plain `search` pointed at a remote root goes remote
assert main(["search", "--index", {wd!r}, "spark merge", "--limit", "3",
             "--snippet-lines", "0"]) == 0
print("REMOTE_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "REMOTE_OK" in out.stdout
    rows = [json.loads(ln) for ln in out.stdout.splitlines() if ln.startswith("{")]
    hits = [r for r in rows if "score" in r]
    assert len(hits) == 6  # 3 from remote query + 3 from transparent search
    assert hits[:3] == hits[3:]  # both paths returned identical results