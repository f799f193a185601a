"""Local daemon mode (`server/daemon.py` — reference daemon/service.py +
socket_helper.py + cli_daemon_fast.py): unix-socket JSON-line protocol,
warm-query latency, concurrent clients, generation following, stale-socket
recovery, and transparent CLI delegation."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.daemon import (
    DaemonClient,
    DaemonServer,
    daemon_alive,
    socket_path_for,
)


def _corpus(tmp, n=150) -> str:
    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "join", "sort"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, 24)),
            "lang": ["en", "de"][i % 2],
            "url": f"src/f{i}.py",
        }
        for i in range(n)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    return src


@pytest.fixture(scope="module")
def daemon_idx(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    tmp = tmp_path_factory.mktemp("daemon")
    src = _corpus(tmp)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2,
                num_buckets=2, resume=False)
    sock = str(tmp / "d.sock")
    srv = DaemonServer(idx, socket_path=sock, pool_size=2)
    srv.start()
    yield idx, sock, srv, IndexSearcher(idx, lang_col="lang", url_col="url")
    srv.shutdown()


class TestProtocol:
    def test_ping_status(self, daemon_idx):
        idx, sock, srv, _s = daemon_idx
        with DaemonClient(sock) as c:
            assert c.request("ping")["pong"] is True
            st = c.request("status")
            assert st["num_docs"] == 150
            assert st["index_root"] == idx

    def test_search_matches_engine(self, daemon_idx):
        from code_indexer_ray.server.http import rest_search

        idx, sock, srv, s = daemon_idx
        with DaemonClient(sock) as c:
            got = c.request("search", q="spark merge", params={"limit": 5})
        want = rest_search(s, "spark merge", {"limit": 5})
        assert got == want

    def test_search_params_surface(self, daemon_idx):
        from code_indexer_ray.server.http import rest_search

        idx, sock, srv, s = daemon_idx
        cases = [
            ("spark", {"limit": 3, "language": "en"}),
            ("sprk", {"limit": 5, "edit_distance": 1}),
            ("s.*k", {"limit": 5, "regex": True}),
            ("spark", {"limit": 5, "path_filter": "src/*"}),
        ]
        with DaemonClient(sock) as c:
            for q, params in cases:
                assert c.request("search", q=q, params=params) == rest_search(
                    s, q, dict(params)
                ), (q, params)

    def test_batch_mget_suggest_complete(self, daemon_idx):
        idx, sock, srv, s = daemon_idx
        with DaemonClient(sock) as c:
            out = c.request(
                "batch",
                queries=[
                    {"id": "a", "q": "spark", "params": {"limit": 2}},
                    {"id": "b", "q": "merge", "params": {"limit": 2}},
                ],
            )
            assert [o["id"] for o in out] == ["a", "b"]
            assert all(len(o["hits"]) == 2 for o in out)
            docs = c.request("mget", ids=[0, 3])
            assert [d["doc_id"] for d in docs] == [d["doc_id"] for d in s.mget([0, 3])]
            assert c.request("suggest", word="sparc") == s.suggest("sparc")
            assert c.request("complete", prefix="sp") == s.complete("sp", limit=10)

    def test_validation_errors_surface(self, daemon_idx):
        idx, sock, srv, _s = daemon_idx
        with DaemonClient(sock) as c:
            with pytest.raises(RuntimeError, match="limit"):
                c.request("search", q="x", params={"limit": 5000})
            with pytest.raises(RuntimeError, match="unknown op"):
                c.request("nope")
            # the connection SURVIVES an error (keep-alive)
            assert c.request("ping")["pong"] is True

    def test_pipelined_requests_one_connection(self, daemon_idx):
        idx, sock, srv, _s = daemon_idx
        with DaemonClient(sock) as c:
            for _ in range(20):
                assert len(c.request("search", q="spark", params={"limit": 2})) == 2

    def test_concurrent_clients(self, daemon_idx):
        idx, sock, srv, s = daemon_idx
        from code_indexer_ray.server.http import rest_search

        want = rest_search(s, "merge window", {"limit": 4})
        errs: list = []

        def worker():
            try:
                with DaemonClient(sock) as c:
                    for _ in range(10):
                        got = c.request("search", q="merge window", params={"limit": 4})
                        assert got == want
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=worker) for _ in range(6)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=60)
        assert errs == []

    def test_warm_latency_under_50ms(self, daemon_idx):
        idx, sock, srv, _s = daemon_idx
        with DaemonClient(sock) as c:
            c.request("search", q="spark merge", params={"limit": 10})  # warm
            lat = []
            for _ in range(30):
                t0 = time.perf_counter()
                c.request("search", q="spark merge", params={"limit": 10})
                lat.append(time.perf_counter() - t0)
        p50 = sorted(lat)[len(lat) // 2]
        assert p50 < 0.05, f"warm daemon p50 {p50 * 1e3:.1f} ms"


class TestLifecycle:
    def test_stale_socket_recovered(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        src = _corpus(tmp_path, n=20)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=2, resume=False)
        sock = str(tmp_path / "s.sock")
        with open(sock, "w") as f:  # dead leftover file
            f.write("")
        assert not daemon_alive(sock)
        srv = DaemonServer(idx, socket_path=sock, pool_size=1)
        srv.start()
        try:
            with DaemonClient(sock) as c:
                assert c.request("ping")["pong"] is True
        finally:
            srv.shutdown()
        assert not os.path.exists(sock)

    def test_double_start_refused(self, daemon_idx, tmp_path):
        idx, sock, srv, _s = daemon_idx
        with pytest.raises(RuntimeError, match="already serving"):
            DaemonServer(idx, socket_path=sock)

    def test_shutdown_op(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        src = _corpus(tmp_path, n=20)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=2, resume=False)
        sock = str(tmp_path / "s.sock")
        srv = DaemonServer(idx, socket_path=sock, pool_size=1)
        srv.start()
        with DaemonClient(sock) as c:
            assert c.request("shutdown")["stopping"] is True
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline and daemon_alive(sock):
            time.sleep(0.05)
        assert not daemon_alive(sock)

    def test_follows_generation_republish(self, ray_session, tmp_path):
        """An index root with a `current` pointer: republish → next daemon
        answer comes from the new generation, no restart (reference AC11)."""
        from code_indexer_ray.index.build import build_index

        root = str(tmp_path / "root")
        os.makedirs(root)
        src = _corpus(tmp_path, n=30)
        g0 = os.path.join(root, "gen_000000")
        build_index(src, g0, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=2, resume=False)
        with open(os.path.join(root, "current"), "w") as f:
            f.write("gen_000000")
        sock = str(tmp_path / "s.sock")
        srv = DaemonServer(root, socket_path=sock, pool_size=1)
        srv.start()
        try:
            with DaemonClient(sock) as c:
                assert c.request("status")["num_docs"] == 30
                # publish a bigger generation and repoint
                rows = [
                    {"doc_id": i, "text": "freshterm alpha", "lang": "en",
                     "url": f"g1/f{i}.py"}
                    for i in range(55)
                ]
                src2 = str(tmp_path / "c2.parquet")
                pq.write_table(pa.Table.from_pylist(rows), src2)
                g1 = os.path.join(root, "gen_000001")
                build_index(src2, g1, store_cols=("lang", "url"), num_shards=1,
                            num_buckets=2, resume=False)
                tmp_ptr = os.path.join(root, "current.tmp")
                with open(tmp_ptr, "w") as f:
                    f.write("gen_000001")
                os.replace(tmp_ptr, os.path.join(root, "current"))
                assert c.request("status")["num_docs"] == 55
                hits = c.request("search", q="freshterm", params={"limit": 3})
                assert len(hits) == 3
        finally:
            srv.shutdown()


class TestCLIDelegation:
    @pytest.fixture(scope="class")
    def cli_env(self):
        env = dict(os.environ)
        env["RAY_ADDRESS"] = "local"
        env["PYTHONPATH"] = "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
        return env

    def test_search_delegates_when_daemon_live(self, daemon_idx, cli_env):
        from code_indexer_ray.server.http import rest_search

        idx, sock, srv, s = daemon_idx
        # point the hash-derived socket path at our server: monkeypatch via
        # a real daemon on the derived path instead — simplest: spawn the CLI
        # against the index root whose derived socket we serve
        derived = socket_path_for(idx)
        os.makedirs(os.path.dirname(derived), exist_ok=True)
        if os.path.lexists(derived):
            os.unlink(derived)
        os.symlink(sock, derived)
        try:
            t0 = time.perf_counter()
            r = subprocess.run(
                [sys.executable, "-m", "code_indexer_ray", "search",
                 "--index", idx, "spark merge", "--limit", "5",
                 "--snippet-lines", "0"],
                capture_output=True, text=True, env=cli_env, cwd="/root/repo",
                timeout=60,
            )
            took = time.perf_counter() - t0
            assert r.returncode == 0, r.stderr
            hits = [json.loads(line) for line in r.stdout.strip().splitlines()]
            want = rest_search(s, "spark merge", {"limit": 5, "snippet_lines": 0})
            assert hits == want
            # the fast path must not have started Ray: generously under the
            # ~4-6 s a ray.init path takes even warm
            assert took < 3.5, f"delegated CLI took {took:.1f}s — did it init Ray?"
        finally:
            os.unlink(derived)

    def test_no_daemon_flag_forces_local(self, daemon_idx, cli_env):
        idx, sock, srv, _s = daemon_idx
        derived = socket_path_for(idx)
        os.makedirs(os.path.dirname(derived), exist_ok=True)
        if os.path.lexists(derived):
            os.unlink(derived)
        os.symlink(sock, derived)
        try:
            before = srv.query_count
            r = subprocess.run(
                [sys.executable, "-m", "code_indexer_ray", "search",
                 "--index", idx, "spark", "--limit", "3", "--no-daemon",
                 "--snippet-lines", "0"],
                capture_output=True, text=True, env=cli_env, cwd="/root/repo",
                timeout=180,
            )
            assert r.returncode == 0, r.stderr
            assert len(r.stdout.strip().splitlines()) == 3
            assert srv.query_count == before  # daemon untouched
        finally:
            os.unlink(derived)


class TestDaemonIndexOps:
    """Reference daemon indexing/watch op trio: build subprocess into a
    fresh generation + publish, progress polling, watch lifecycle."""

    def test_index_blocking_over_empty_root_then_search(self, ray_session, tmp_path):
        src = _corpus(tmp_path, n=40)
        root = str(tmp_path / "root")
        os.makedirs(root)
        sock = str(tmp_path / "d.sock")
        srv = DaemonServer(root, socket_path=sock, pool_size=1, warm=False)
        srv.start()
        try:
            with DaemonClient(sock, timeout=300) as c:
                # empty root: queries refuse cleanly
                with pytest.raises(RuntimeError, match="no index generation"):
                    c.request("search", q="spark", params={"limit": 2})
                st = c.request(
                    "index_blocking", input=src, store_cols=["lang", "url"]
                )
                assert st["returncode"] == 0, st
                assert st["published"] is True and st["generation"] == 0
                with open(os.path.join(root, "current")) as f:
                    assert f.read().strip() == "gen_000000"
                hits = c.request("search", q="spark", params={"limit": 3})
                assert len(hits) == 3
                # background variant: second build publishes gen 1
                st2 = c.request("index", input=src, store_cols=["lang", "url"])
                assert st2["running"] is True and st2["generation"] == 1
                deadline = time.monotonic() + 240
                while time.monotonic() < deadline:
                    st3 = c.request("index_status")
                    if not st3["running"]:
                        break
                    time.sleep(0.5)
                assert st3["returncode"] == 0 and st3["published"] is True
                with open(os.path.join(root, "current")) as f:
                    assert f.read().strip() == "gen_000001"
                assert c.request("status")["num_docs"] == 40
        finally:
            srv.shutdown()

    def test_index_refused_on_bare_index(self, daemon_idx, tmp_path):
        idx, sock, srv, _s = daemon_idx
        with DaemonClient(sock) as c:
            with pytest.raises(RuntimeError, match="generation root"):
                c.request("index", input="whatever.parquet")

    def test_watch_lifecycle(self, ray_session, tmp_path):
        import pyarrow.parquet as _pq

        watch_in = str(tmp_path / "incoming")
        os.makedirs(watch_in)
        root = str(tmp_path / "root")
        os.makedirs(root)
        sock = str(tmp_path / "d.sock")
        srv = DaemonServer(root, socket_path=sock, pool_size=1, warm=False)
        srv.start()
        try:
            with DaemonClient(sock, timeout=120) as c:
                assert c.request("watch_status")["running"] is False
                st = c.request("watch_start", input=watch_in, interval=0.5,
                               store_cols=["lang", "url"])
                assert st["running"] is True and st["pid"] > 0
                with pytest.raises(RuntimeError, match="already running"):
                    c.request("watch_start", input=watch_in)
                assert c.request("watch_status")["running"] is True
                out = c.request("watch_stop")
                assert out["stopped"] is True
                assert c.request("watch_status")["running"] is False
                # idempotent stop
                assert c.request("watch_stop")["stopped"] is False
        finally:
            srv.shutdown()
