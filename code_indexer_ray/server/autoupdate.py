"""Server auto-update detection — release-feed polling + deployment gate.

Reference analog: ``server/auto_update/`` (change_detector.py — git
fetch + local/remote ref compare; deployment_lock.py — stale-able lock
file; service.py — IDLE→CHECKING→DEPLOYING→RESTARTING state machine with
poll_once()).  This implementation keeps the reference's contracts but is
self-contained stdlib:

- :class:`GitFeed` — the reference's detector: ``git fetch`` + compare
  ``HEAD`` vs ``origin/<branch>`` (works against local path remotes, so
  the lifecycle is fully testable offline);
- :class:`DirFingerprintFeed` — data-plane flavor: a release directory's
  VERSION file (or newest ``*.version`` entry) is the feed; the
  fingerprint is (version text, mtime) so a republished same-version file
  still triggers;
- :class:`UpdateLock` — pid+heartbeat lock sidecar; stale locks (dead pid
  or heartbeat older than ``stale_after``) are broken, exactly the
  reference's stale-lock rule;
- :class:`AutoUpdateService` — the state machine.  ``poll_once()`` runs
  CHECKING, records ``update_available``; when an ``executor`` callable is
  injected it runs DEPLOYING→RESTARTING under the lock.  Without one the
  service is detector-only (surfacing "update available" in /health and
  the daemon status op — the honest mode for this sandbox: detection is
  real, restart is deployment glue).
"""

from __future__ import annotations

import json
import os
import subprocess
import threading
import time
from enum import Enum

__all__ = [
    "ServiceState",
    "GitFeed",
    "DirFingerprintFeed",
    "UpdateLock",
    "AutoUpdateService",
]


class ServiceState(Enum):
    IDLE = "idle"
    CHECKING = "checking"
    DEPLOYING = "deploying"
    RESTARTING = "restarting"


class GitFeed:
    """git-fetch change detection (reference change_detector.py:14)."""

    def __init__(self, repo_path: str, branch: str = "master"):
        self.repo_path = repo_path
        self.branch = branch

    def _git(self, *args: str) -> str:
        r = subprocess.run(
            ["git", *args], cwd=self.repo_path, capture_output=True, text=True
        )
        if r.returncode != 0:
            raise RuntimeError(f"git {' '.join(args)} failed: {r.stderr.strip()}")
        return r.stdout.strip()

    def current(self) -> str:
        return self._git("rev-parse", "HEAD")

    def latest(self) -> str:
        self._git("fetch", "origin", self.branch, "--quiet")
        return self._git("rev-parse", f"origin/{self.branch}")


class DirFingerprintFeed:
    """Release-directory polling: the VERSION file's content is the feed."""

    def __init__(self, release_dir: str, *, installed: str,
                 version_file: str = "VERSION"):
        self.release_dir = release_dir
        self.version_file = version_file
        self._installed = installed

    def current(self) -> str:
        return self._installed

    def latest(self) -> str:
        path = os.path.join(self.release_dir, self.version_file)
        try:
            with open(path) as f:
                return f.read().strip()
        except OSError:
            return self._installed  # unreachable feed = no update signal

    def mark_installed(self, version: str) -> None:
        self._installed = version


class UpdateLock:
    """pid+heartbeat deployment lock (reference deployment_lock.py)."""

    def __init__(self, lock_file: str, *, stale_after: float = 3600.0,
                 clock=time.time):
        self.lock_file = lock_file
        self.stale_after = stale_after
        self.clock = clock

    def _read(self) -> dict | None:
        try:
            with open(self.lock_file) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def is_stale(self) -> bool:
        rec = self._read()
        if rec is None:
            return False
        pid = rec.get("pid")
        if pid is not None:
            try:
                os.kill(int(pid), 0)
            except (ProcessLookupError, ValueError):
                return True  # holder is dead
            except PermissionError:
                pass  # alive, not ours
        return (self.clock() - float(rec.get("heartbeat", 0))) > self.stale_after

    def acquire(self) -> bool:
        if os.path.exists(self.lock_file):
            if not self.is_stale():
                return False
            os.unlink(self.lock_file)
        try:
            fd = os.open(self.lock_file, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            json.dump({"pid": os.getpid(), "heartbeat": self.clock()}, f)
        return True

    def release(self) -> None:
        try:
            os.unlink(self.lock_file)
        except OSError:
            pass


class AutoUpdateService:
    """State machine + poll loop; thread-safe status snapshot for /health."""

    def __init__(self, feed, *, lock: UpdateLock | None = None,
                 executor=None, clock=time.time):
        self.feed = feed
        self.lock = lock
        self.executor = executor  # callable(latest)->None; None = detector-only
        self.clock = clock
        self.state = ServiceState.IDLE
        self.update_available = False
        self.current_version: str | None = None
        self.latest_version: str | None = None
        self.last_check: float | None = None
        self.last_deployment: float | None = None
        self.last_error: str | None = None
        self._mu = threading.Lock()

    def poll_once(self) -> bool:
        """One polling iteration; returns this poll's DETECTION verdict
        (True = an update was available, even if the executor then deployed
        it).  Only runs from IDLE (the reference's concurrent-op guard)."""
        with self._mu:
            if self.state is not ServiceState.IDLE:
                return self.update_available
            self.state = ServiceState.CHECKING
        detected = False
        try:
            cur, latest = self.feed.current(), self.feed.latest()
            detected = cur != latest
            with self._mu:
                self.current_version, self.latest_version = cur, latest
                self.update_available = detected
                self.last_check = self.clock()
                self.last_error = None
            if detected and self.executor is not None:
                self._deploy(latest)
        except Exception as e:  # noqa: BLE001 — feed errors surface in status
            with self._mu:
                self.last_error = f"{type(e).__name__}: {e}"
        finally:
            with self._mu:
                # any terminal state (incl. a deploy that raised) returns to
                # IDLE so the next poll can retry — the reference's recovery
                self.state = ServiceState.IDLE
        return detected

    def _deploy(self, latest: str) -> None:
        if self.lock is not None and not self.lock.acquire():
            return  # someone else is deploying
        try:
            with self._mu:
                self.state = ServiceState.DEPLOYING
                self.last_deployment = self.clock()
            self.executor(latest)
            with self._mu:
                self.state = ServiceState.RESTARTING
                self.update_available = False
                self.current_version = latest
            if hasattr(self.feed, "mark_installed"):
                self.feed.mark_installed(latest)
        finally:
            if self.lock is not None:
                self.lock.release()

    def status(self) -> dict:
        with self._mu:
            return {
                "state": self.state.value,
                "update_available": self.update_available,
                "current": self.current_version,
                "latest": self.latest_version,
                "last_check": self.last_check,
                "last_deployment": self.last_deployment,
                "last_error": self.last_error,
            }

    # -- background loop (reference run_once/service poll cadence) ------
    def start(self, interval: float) -> threading.Thread:
        self._stop = threading.Event()

        def loop():
            while not self._stop.wait(interval):
                self.poll_once()

        t = threading.Thread(target=loop, daemon=True)
        t.start()
        self._thread = t
        return t

    def stop(self) -> None:
        ev = getattr(self, "_stop", None)
        if ev is not None:
            ev.set()
