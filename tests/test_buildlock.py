"""Cross-process build lock + orphan-tmp hygiene (reference
``services/indexing_lock.py`` heartbeat lock and
``storage/background_index_rebuilder.py`` tmp cleanup)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest

from code_indexer_ray.index.buildlock import (
    BuildLock,
    BuildLockError,
    cleanup_orphan_tmp,
    holder,
)


class TestBuildLock:
    def test_acquire_release_roundtrip(self, tmp_path):
        root = str(tmp_path / "idx")
        with BuildLock(root) as lk:
            assert os.path.exists(lk.path)
            rec = holder(root)
            assert rec is not None and rec["pid"] == os.getpid()
            assert not rec["stale"]
        assert holder(root) is None  # released -> probe sees nobody

    def test_second_acquire_same_process_fails(self, tmp_path):
        root = str(tmp_path / "idx")
        with BuildLock(root):
            with pytest.raises(BuildLockError, match=str(os.getpid())):
                BuildLock(root).acquire()
        # released: acquirable again
        with BuildLock(root):
            pass

    def test_cross_process_exclusion_and_crash_release(self, tmp_path):
        root = str(tmp_path / "idx")
        # child acquires the lock, prints READY, sleeps until killed
        child = subprocess.Popen(
            [
                sys.executable,
                "-c",
                "import sys, time; sys.path.insert(0, %r)\n"
                "from code_indexer_ray.index.buildlock import BuildLock\n"
                "lk = BuildLock(%r).acquire()\n"
                "print('READY', flush=True)\n"
                "time.sleep(60)" % (os.getcwd(), root),
            ],
            stdout=subprocess.PIPE,
            text=True,
        )
        try:
            assert child.stdout.readline().strip() == "READY"
            with pytest.raises(BuildLockError, match=str(child.pid)):
                BuildLock(root).acquire()
            rec = holder(root)
            assert rec["pid"] == child.pid
        finally:
            child.kill()
            child.wait()
        # SIGKILLed holder: kernel released the flock instantly — no
        # timeout dance, acquire succeeds
        with BuildLock(root):
            pass

    def test_heartbeat_refreshes(self, tmp_path):
        root = str(tmp_path / "idx")
        with BuildLock(root, heartbeat_interval=0.05):
            first = holder(root)["heartbeat_at"]
            deadline = time.time() + 5
            while time.time() < deadline:
                time.sleep(0.05)
                if (h := holder(root)) and h["heartbeat_at"] > first:
                    break
            else:
                raise AssertionError("heartbeat never refreshed")

    def test_cli_build_lock_conflict_exit_3(self, tmp_path):
        """A held lock turns `cidx build` into a clean JSON error, exit 3."""
        out = str(tmp_path / "idx")
        with BuildLock(out):
            p = subprocess.run(
                [
                    sys.executable,
                    "-m",
                    "code_indexer_ray",
                    "--num-cpus",
                    "2",
                    "build",
                    "--input",
                    "/root/testdata/sf0.001/documents.parquet",
                    "--out",
                    out,
                ],
                capture_output=True,
                text=True,
                cwd=os.getcwd(),
                timeout=120,
            )
        assert p.returncode == 3, p.stderr
        err = json.loads(p.stderr.strip().splitlines()[-1])
        assert "another build holds" in err["error"]


class TestOrphanTmpCleanup:
    def test_dead_pid_tmp_removed_live_kept(self, tmp_path):
        root = str(tmp_path / "idx")
        sub = tmp_path / "idx" / "segments"
        sub.mkdir(parents=True)
        # a pid that cannot be alive (kernel pid_max is < 2**22 + margin)
        dead = sub / "bucket=000.parquet.tmp-99999999"
        dead.write_bytes(b"x")
        mine = sub / f"seg.parquet.tmp-{os.getpid()}"
        mine.write_bytes(b"y")
        keeper = sub / "bucket=000.parquet"
        keeper.write_bytes(b"z")
        removed = cleanup_orphan_tmp(root)
        assert [os.path.basename(p) for p in removed] == [dead.name]
        assert mine.exists() and keeper.exists()

    def test_acquire_runs_cleanup(self, tmp_path):
        root = str(tmp_path / "idx")
        os.makedirs(root)
        orphan = tmp_path / "idx" / "manifest.json.tmp-99999999"
        orphan.write_bytes(b"{}")
        with BuildLock(root):
            assert not orphan.exists()

    def test_live_foreign_pid_needs_age(self, tmp_path):
        root = str(tmp_path / "idx")
        os.makedirs(root)
        # pid 1 is always alive; fresh tmp stays, old tmp goes
        fresh = tmp_path / "idx" / "a.tmp-1"
        fresh.write_bytes(b"x")
        assert cleanup_orphan_tmp(root) == []
        old_t = time.time() - 7200
        os.utime(fresh, (old_t, old_t))
        assert cleanup_orphan_tmp(root) == [str(fresh)]
