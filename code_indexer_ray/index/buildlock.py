"""Cross-process build exclusivity + crash hygiene — the reference's
indexing-lock / background-rebuilder pair re-expressed for this engine's
atomic-publish layout:

- ``services/indexing_lock.py``: one indexing operation per project at a
  time, heartbeat JSON so humans (and a status probe) can see WHO holds it
  and for how long, stale-heartbeat takeover for crashed holders.
- ``storage/background_index_rebuilder.py``: ``fcntl`` exclusive lock held
  for the whole rebuild + cleanup of orphaned ``.tmp`` files after crashes
  (builds here write ``<file>.tmp-<pid>`` then ``os.replace``, so a crash
  can strand tmps).

Mechanism: ``flock(LOCK_EX | LOCK_NB)`` on ``<root>/_build.lock`` is the
actual mutual exclusion — kernel-owned, so a SIGKILLed holder releases
instantly (no timeout dance needed on one host).  The heartbeat JSON
is observability parity with the reference (pid / started / last beat),
refreshed by a daemon thread; ``holder()`` reads it without acquiring.
The record lives in a SIDECAR (``_build.lock.json``) published by
tmp-write + ``os.replace`` so readers never see torn JSON — the flock
must stay on a stable inode (replacing the locked file itself would let
a new acquirer lock the fresh inode while the holder still holds the
unlinked one), so the lock file is never rewritten in place.  On shared filesystems where ``flock`` may be
advisory-only across hosts, the stale-heartbeat rule
(``stale_after`` seconds without a beat) is the documented fallback
judgment — exactly the reference's semantics.

Scope: this locks the ORCHESTRATION layer (CLI build, the jobs server's
generation builds, the watch driver), mirroring the reference where
``smart_indexer`` acquires the lock and the Tantivy layer below stays
lock-free.  ``build_index`` itself remains a pure data-plane function —
its per-partition writes are idempotent and fingerprinted, so concurrent
*identical* builds corrupt nothing; the lock exists to stop concurrent
*divergent* builds and wasted duplicate work.
"""

from __future__ import annotations

import fcntl
import json
import os
import threading
import time

LOCK_FILE = "_build.lock"


class BuildLockError(RuntimeError):
    """Another build holds the lock (message carries pid + duration)."""


class BuildLock:
    """``with BuildLock(index_root): build(...)`` — non-blocking exclusive.

    ``heartbeat_interval`` controls the beat refresh; ``stale_after`` is
    only a *reported* judgment for cross-host observers (same-host
    exclusion is the kernel flock).
    """

    def __init__(
        self,
        root: str,
        *,
        heartbeat_interval: float = 5.0,
        stale_after: float = 300.0,
    ):
        self.root = root
        self.path = os.path.join(root, LOCK_FILE)
        self.json_path = self.path + ".json"
        self.heartbeat_interval = heartbeat_interval
        self.stale_after = stale_after
        self._fh = None
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._started_at: float | None = None

    # ---- acquisition --------------------------------------------------

    def acquire(self) -> "BuildLock":
        os.makedirs(self.root, exist_ok=True)
        fh = open(self.path, "a+")
        try:
            fcntl.flock(fh.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            rec = _read_record(self.json_path)
            fh.close()
            pid = rec.get("pid", "unknown") if rec else "unknown"
            dur = time.time() - rec.get("started_at", time.time()) if rec else 0.0
            raise BuildLockError(
                f"another build holds {self.path} (pid {pid}, running {dur:.1f}s); "
                f"wait for it or check its status"
            ) from None
        self._fh = fh
        self._beat(started=True)
        self._stop.clear()
        self._thread = threading.Thread(target=self._beat_loop, daemon=True)
        self._thread.start()
        cleanup_orphan_tmp(self.root)
        return self

    def release(self) -> None:
        if self._fh is None:
            return
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.heartbeat_interval + 1)
            self._thread = None
        try:
            # leave a released marker for observers, then drop the flock
            self._write_json({"released_at": time.time(), "pid": os.getpid()})
            fcntl.flock(self._fh.fileno(), fcntl.LOCK_UN)
        finally:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "BuildLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()

    # ---- heartbeat ----------------------------------------------------

    def _write_json(self, rec: dict) -> None:
        tmp = f"{self.json_path}.tmp-{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(json.dumps(rec))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.json_path)

    def _beat(self, started: bool = False) -> None:
        now = time.time()
        rec = {
            "pid": os.getpid(),
            "host": os.uname().nodename,
            "heartbeat_at": now,
            "stale_after": self.stale_after,
        }
        if started:
            self._started_at = now
        rec["started_at"] = self._started_at
        self._write_json(rec)

    def _beat_loop(self) -> None:
        while not self._stop.wait(self.heartbeat_interval):
            try:
                self._beat()
            except OSError:
                return  # fs went away; the flock still guards


def _read_record(json_path: str) -> dict | None:
    try:
        with open(json_path, "r") as fh:
            raw = fh.read()
        return json.loads(raw) if raw.strip() else None
    except (OSError, json.JSONDecodeError):
        return None


def holder(root: str) -> dict | None:
    """Status probe (the reference's 'use cidx status to check progress'):
    the current holder's heartbeat record, or None when unheld.  Adds
    ``stale`` per the heartbeat rule so cross-host observers can judge a
    crashed holder even where flock state isn't visible to them."""
    path = os.path.join(root, LOCK_FILE)
    try:
        fh = open(path, "r")
    except OSError:
        return None
    with fh:
        try:
            fcntl.flock(fh.fileno(), fcntl.LOCK_SH | fcntl.LOCK_NB)
        except OSError:
            rec = _read_record(os.path.join(root, LOCK_FILE) + ".json") or {}
            beat = rec.get("heartbeat_at", 0.0)
            rec["stale"] = (time.time() - beat) > rec.get("stale_after", 300.0)
            return rec
        fcntl.flock(fh.fileno(), fcntl.LOCK_UN)
        return None  # lockable -> nobody is building


def cleanup_orphan_tmp(root: str, *, max_age_s: float = 3600.0) -> list[str]:
    """Remove ``*.tmp-<pid>`` strandings from crashed builds (reference
    ``background_index_rebuilder.cleanup_orphaned_tmp_files``): a tmp whose
    writer pid is dead is always orphaned; one with a live pid is only
    removed past ``max_age_s`` (it may belong to an unrelated live process
    reusing the pid).  Returns the removed paths."""
    removed: list[str] = []
    now = time.time()
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            mid = name.rfind(".tmp-")
            if mid < 0:
                continue
            pid_s = name[mid + 5 :]
            if not pid_s.isdigit():
                continue
            path = os.path.join(dirpath, name)
            pid = int(pid_s)
            alive = _pid_alive(pid)
            if alive and pid != os.getpid():
                try:
                    if now - os.path.getmtime(path) <= max_age_s:
                        continue
                except OSError:
                    continue
            elif alive:  # our own in-flight tmp
                continue
            try:
                os.remove(path)
                removed.append(path)
            except OSError:
                pass
    return removed


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True
