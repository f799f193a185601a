"""Auto-update tier (`server/autoupdate.py` — reference server/auto_update/
change_detector.py + deployment_lock.py + service.py): git-feed detection
against a LOCAL path remote, dir-fingerprint feed lifecycle, stale-lock
rules, the state machine, and the /health + daemon-status surfacing."""

from __future__ import annotations

import json
import os
import subprocess

import pytest

from code_indexer_ray.server.autoupdate import (
    AutoUpdateService,
    DirFingerprintFeed,
    GitFeed,
    ServiceState,
    UpdateLock,
)


def _git(cwd, *args):
    r = subprocess.run(["git", *args], cwd=cwd, capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout.strip()


@pytest.fixture()
def git_pair(tmp_path):
    """origin repo + clone, both local paths (no network)."""
    origin = str(tmp_path / "origin")
    os.makedirs(origin)
    _git(origin, "init", "-b", "master")
    _git(origin, "config", "user.email", "t@t")
    _git(origin, "config", "user.name", "t")
    with open(os.path.join(origin, "a.txt"), "w") as f:
        f.write("v1")
    _git(origin, "add", "."); _git(origin, "commit", "-m", "one")
    clone = str(tmp_path / "clone")
    _git(str(tmp_path), "clone", "--quiet", origin, clone)
    return origin, clone


class TestGitFeed:
    def test_detects_new_remote_commit(self, git_pair):
        origin, clone = git_pair
        feed = GitFeed(clone, branch="master")
        assert feed.current() == feed.latest()
        with open(os.path.join(origin, "a.txt"), "w") as f:
            f.write("v2")
        _git(origin, "commit", "-am", "two")
        assert feed.current() != feed.latest()
        # pulling clears the signal
        _git(clone, "pull", "--quiet", "origin", "master")
        assert feed.current() == feed.latest()

    def test_feed_error_surfaces(self, tmp_path):
        feed = GitFeed(str(tmp_path))  # not a git repo
        with pytest.raises(RuntimeError, match="git"):
            feed.current()


class TestDirFeed:
    def test_version_file_lifecycle(self, tmp_path):
        rel = str(tmp_path)
        feed = DirFingerprintFeed(rel, installed="1.2.0")
        assert feed.latest() == "1.2.0"  # missing file = no signal
        with open(os.path.join(rel, "VERSION"), "w") as f:
            f.write("1.2.1\n")
        assert feed.current() == "1.2.0" and feed.latest() == "1.2.1"
        feed.mark_installed("1.2.1")
        assert feed.current() == feed.latest()


class TestUpdateLock:
    def test_exclusive_and_release(self, tmp_path):
        lf = str(tmp_path / "l.lock")
        a, b = UpdateLock(lf), UpdateLock(lf)
        assert a.acquire() is True
        assert b.acquire() is False
        a.release()
        assert b.acquire() is True
        b.release()

    def test_dead_pid_is_stale_and_broken(self, tmp_path):
        lf = str(tmp_path / "l.lock")
        with open(lf, "w") as f:
            json.dump({"pid": 2 ** 22 + 12345, "heartbeat": 0}, f)
        lk = UpdateLock(lf)
        assert lk.is_stale() is True
        assert lk.acquire() is True
        lk.release()

    def test_live_pid_old_heartbeat_stale(self, tmp_path):
        lf = str(tmp_path / "l.lock")
        now = [10_000.0]
        lk = UpdateLock(lf, stale_after=60, clock=lambda: now[0])
        assert lk.acquire()
        other = UpdateLock(lf, stale_after=60, clock=lambda: now[0])
        assert other.acquire() is False
        now[0] += 120  # heartbeat aged out even though pid is alive
        assert other.is_stale() is True
        assert other.acquire() is True
        other.release()


class TestServiceLifecycle:
    def test_detector_only_poll(self, tmp_path):
        rel = str(tmp_path)
        feed = DirFingerprintFeed(rel, installed="2.0.0")
        svc = AutoUpdateService(feed)
        assert svc.poll_once() is False
        st = svc.status()
        assert st["state"] == "idle" and st["update_available"] is False
        assert st["current"] == "2.0.0" and st["last_check"] is not None
        with open(os.path.join(rel, "VERSION"), "w") as f:
            f.write("2.1.0")
        assert svc.poll_once() is True
        st = svc.status()
        assert st["update_available"] is True and st["latest"] == "2.1.0"
        assert st["state"] == "idle"  # detector-only never deploys

    def test_executor_deploys_under_lock_and_marks_installed(self, tmp_path):
        rel = str(tmp_path / "rel"); os.makedirs(rel)
        with open(os.path.join(rel, "VERSION"), "w") as f:
            f.write("3.1.0")
        feed = DirFingerprintFeed(rel, installed="3.0.0")
        states, deployed = [], []

        lock = UpdateLock(str(tmp_path / "u.lock"))
        svc = AutoUpdateService(feed, lock=lock)

        def executor(latest):
            states.append(svc.status()["state"])
            assert os.path.exists(lock.lock_file)  # held during deploy
            deployed.append(latest)

        svc.executor = executor
        assert svc.poll_once() is True  # returns the detection verdict
        assert deployed == ["3.1.0"] and states == ["deploying"]
        st = svc.status()
        assert st["current"] == "3.1.0" and st["update_available"] is False
        assert st["last_deployment"] is not None
        assert not os.path.exists(lock.lock_file)  # released
        # next poll: clean
        assert svc.poll_once() is False

    def test_held_lock_skips_deploy(self, tmp_path):
        rel = str(tmp_path / "rel"); os.makedirs(rel)
        with open(os.path.join(rel, "VERSION"), "w") as f:
            f.write("4.1.0")
        feed = DirFingerprintFeed(rel, installed="4.0.0")
        lock_path = str(tmp_path / "u.lock")
        holder = UpdateLock(lock_path)
        assert holder.acquire()
        deployed = []
        svc = AutoUpdateService(
            feed, lock=UpdateLock(lock_path), executor=deployed.append
        )
        svc.poll_once()
        assert deployed == []  # someone else is deploying
        assert svc.status()["update_available"] is True
        holder.release()

    def test_executor_failure_surfaces_and_returns_idle(self, tmp_path):
        rel = str(tmp_path / "rel"); os.makedirs(rel)
        with open(os.path.join(rel, "VERSION"), "w") as f:
            f.write("5.1.0")
        feed = DirFingerprintFeed(rel, installed="5.0.0")

        def boom(latest):
            raise OSError("disk full")

        svc = AutoUpdateService(feed, lock=None, executor=boom)
        svc.poll_once()
        st = svc.status()
        assert st["last_error"] and "disk full" in st["last_error"]
        assert st["state"] == "idle"  # recovered to IDLE, next poll retries

    def test_git_feed_end_to_end(self, tmp_path):
        origin = str(tmp_path / "o"); os.makedirs(origin)
        _git(origin, "init", "-b", "master")
        _git(origin, "config", "user.email", "t@t")
        _git(origin, "config", "user.name", "t")
        with open(os.path.join(origin, "f"), "w") as f:
            f.write("x")
        _git(origin, "add", "."); _git(origin, "commit", "-m", "c1")
        clone = str(tmp_path / "c")
        _git(str(tmp_path), "clone", "--quiet", origin, clone)
        svc = AutoUpdateService(GitFeed(clone, "master"))
        assert svc.poll_once() is False
        with open(os.path.join(origin, "f"), "w") as f:
            f.write("y")
        _git(origin, "commit", "-am", "c2")
        assert svc.poll_once() is True
        assert svc.status()["latest"] == _git(origin, "rev-parse", "HEAD")


@pytest.mark.usefixtures("ray_session")
class TestSurfacing:
    def test_health_and_daemon_status_carry_update(self, ray_session, tmp_path):
        import json as _json
        import urllib.request

        import pyarrow as pa
        import pyarrow.parquet as pq

        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.daemon import DaemonClient, DaemonServer
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [{"doc_id": i, "text": "spark merge", "lang": "en", "url": f"u{i}"}
                for i in range(5)]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)

        rel = str(tmp_path / "rel"); os.makedirs(rel)
        feed = DirFingerprintFeed(rel, installed="8.0.0")
        svc = AutoUpdateService(feed)
        svc.poll_once()

        srv = IndexHTTPServer(idx, port=0, warm=False, auto_update=svc)
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            with urllib.request.urlopen(base + "/health", timeout=15) as r:
                h = _json.loads(r.read())
            assert h["update"]["update_available"] is False
            with open(os.path.join(rel, "VERSION"), "w") as f:
                f.write("8.1.0")
            svc.poll_once()
            with urllib.request.urlopen(base + "/health", timeout=15) as r:
                h = _json.loads(r.read())
            assert h["update"]["update_available"] is True
            assert h["update"]["latest"] == "8.1.0"
        finally:
            srv.shutdown()

        sock = str(tmp_path / "d.sock")
        d = DaemonServer(idx, socket_path=sock, warm=False, auto_update=svc)
        d.start()
        try:
            c = DaemonClient(sock)
            st = c.request("status")
            assert st["update"]["update_available"] is True
            assert st["update"]["latest"] == "8.1.0"
        finally:
            d.shutdown()
