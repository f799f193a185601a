"""Background index-build jobs — the reference server's job surface
(``server/repositories/background_jobs.py``: submit → job_id, SQLite-backed
status records, list/cancel; ``server/app.py`` job routes) recast for the
Ray engine.

Semantics:

- ``submit_build(params)`` returns a ``job_id`` immediately; ONE worker
  thread drains the queue so concurrent builds never contend for the same
  Ray cluster resources (the parallelism axis is inside a build, not across
  builds).
- Each build lands in a fresh ``gen_%06d`` directory under the index root
  and atomically repoints the ``current`` pointer file (the WatchDriver
  publish convention, ``pipelines/watch.py:112``) — a follower
  :class:`~code_indexer_ray.server.http.IndexHTTPServer` picks the new
  generation up on its next request without restarting.
- Job records persist as append-only JSONL under ``<root>/_jobs/`` (the
  reference uses SQLite; an append-log with last-state-wins replay is the
  dependency-free analog), so a restarted server still lists finished jobs.
- ``cancel``: a PENDING job is truly cancelled (the worker skips it); a
  RUNNING build only gets ``cancel_requested`` stamped — Ray Data pipelines
  are not interruptible mid-flight, and pretending otherwise would be worse
  than saying so.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
import uuid
from dataclasses import asdict, dataclass, field

PENDING = "pending"
RUNNING = "running"
COMPLETED = "completed"
FAILED = "failed"
CANCELLED = "cancelled"


@dataclass
class Job:
    job_id: str
    kind: str
    params: dict
    state: str = PENDING
    submitted_at: float = 0.0
    started_at: float | None = None
    finished_at: float | None = None
    error: str | None = None
    result: dict | None = None
    cancel_requested: bool = False

    def record(self) -> dict:
        return asdict(self)


#: build_index kwargs a job submission may set (allow-list: a request body
#: must not reach arbitrary build internals)
_BUILD_PARAMS = (
    "input",
    "id_col",
    "text_col",
    "store_cols",
    "num_shards",
    "num_buckets",
    "index_positions",
    "fields",
)


#: sync_repository kwargs a sync job may set (same allow-list discipline)
_SYNC_PARAMS = (
    "input",
    "url_col",
    "ts_col",
    "force_full",
    "search_accuracy",
    "store_cols",    # bootstrap-build only (no current generation yet)
    "doc_id_upper",  # bootstrap-build only: id headroom (default max_id*4+4096)
)


class JobManager:
    """Owns the queue, the worker thread, the registry and the JSONL log."""

    def __init__(self, index_root: str, *, clock=time.time, start_worker: bool = True):
        self.index_root = index_root
        self._clock = clock
        self._lock = threading.Lock()
        self._jobs: dict[str, Job] = {}
        self._order: list[str] = []
        self._queue: queue.Queue[str | None] = queue.Queue()
        self._log_dir = os.path.join(index_root, "_jobs")
        self._log_path = os.path.join(self._log_dir, "jobs.jsonl")
        self._replay()
        self._worker: threading.Thread | None = None
        if start_worker:
            self._worker = threading.Thread(target=self._run, daemon=True)
            self._worker.start()

    # ---- persistence -----------------------------------------------------

    def _replay(self) -> None:
        try:
            with open(self._log_path) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except json.JSONDecodeError:
                        continue  # torn tail write
                    job = Job(**rec)
                    if job.job_id not in self._jobs:
                        self._order.append(job.job_id)
                    self._jobs[job.job_id] = job
        except OSError:
            return
        # jobs that were queued/running when the previous process died are
        # not silently re-run; they are marked failed so the ledger is honest
        for job in self._jobs.values():
            if job.state in (PENDING, RUNNING):
                job.state = FAILED
                job.error = "orphaned by server restart"
                job.finished_at = self._clock()
                self._append(job)

    def _append(self, job: Job) -> None:
        os.makedirs(self._log_dir, exist_ok=True)
        with open(self._log_path, "a") as f:
            f.write(json.dumps(job.record()) + "\n")

    # ---- submission / registry --------------------------------------------

    def submit_build(self, params: dict) -> str:
        if "input" not in params:
            raise ValueError("build job needs 'input' (parquet path or list)")
        unknown = set(params) - set(_BUILD_PARAMS)
        if unknown:
            raise ValueError(f"unknown build parameters: {sorted(unknown)}")
        job = Job(
            job_id=uuid.uuid4().hex[:16],
            kind="build",
            params=dict(params),
            submitted_at=self._clock(),
        )
        with self._lock:
            self._jobs[job.job_id] = job
            self._order.append(job.job_id)
            self._append(job)
        self._queue.put(job.job_id)
        return job.job_id

    def submit_sync(self, params: dict) -> str:
        """Queue a SYNC job (reference sync_repository semantics): analyze
        the snapshot against the CURRENT generation with the reindexing
        decision engine, then full rebuild or incremental merge into a fresh
        generation.  With no current generation the sync bootstraps as a
        plain full build."""
        if "input" not in params:
            raise ValueError("sync job needs 'input' (new snapshot parquet path)")
        unknown = set(params) - set(_SYNC_PARAMS)
        if unknown:
            raise ValueError(f"unknown sync parameters: {sorted(unknown)}")
        job = Job(
            job_id=uuid.uuid4().hex[:16],
            kind="sync",
            params=dict(params),
            submitted_at=self._clock(),
        )
        with self._lock:
            self._jobs[job.job_id] = job
            self._order.append(job.job_id)
            self._append(job)
        self._queue.put(job.job_id)
        return job.job_id

    def get(self, job_id: str) -> dict:
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None:
                raise KeyError(f"unknown job {job_id!r}")
            return job.record()

    def list(self, limit: int = 50) -> list[dict]:
        with self._lock:
            return [self._jobs[i].record() for i in reversed(self._order[-limit:])]

    def cancel(self, job_id: str) -> dict:
        with self._lock:
            job = self._jobs.get(job_id)
            if job is None:
                raise KeyError(f"unknown job {job_id!r}")
            if job.state == PENDING:
                job.state = CANCELLED
                job.finished_at = self._clock()
            elif job.state == RUNNING:
                job.cancel_requested = True  # best-effort: stamped, not killed
            self._append(job)
            return job.record()

    # ---- worker ------------------------------------------------------------

    def _next_generation(self) -> int:
        gens = [
            int(name[4:])
            for name in os.listdir(self.index_root)
            if name.startswith("gen_") and name[4:].isdigit()
        ] if os.path.isdir(self.index_root) else []
        return max(gens, default=-1) + 1

    def _publish(self, gen: int) -> None:
        # the WatchDriver pointer swap: tmp file + os.replace
        ptr = os.path.join(self.index_root, "current")
        tmp = ptr + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"gen_{gen:06d}")
        os.replace(tmp, ptr)

    def _execute_build(self, job: Job) -> dict:
        from ..index.build import build_index
        from ..index.buildlock import BuildLock

        params = dict(job.params)
        inp = params.pop("input")
        if "store_cols" in params:
            params["store_cols"] = tuple(params["store_cols"])
        if "fields" in params and params["fields"] is not None:
            params["fields"] = dict(params["fields"])
        # one build per index root at a time (reference indexing_lock): the
        # job queue already serializes THIS server's builds; the lock guards
        # against a concurrent CLI build / second server on the same root
        with BuildLock(self.index_root):
            gen = self._next_generation()
            gen_dir = os.path.join(self.index_root, f"gen_{gen:06d}")
            manifest = build_index(inp, gen_dir, resume=False, **params)
            self._publish(gen)
        return {
            "index_dir": gen_dir,
            "generation": gen,
            "num_docs": manifest.num_docs,
            "num_shards": manifest.num_shards,
            "total_tokens": manifest.total_tokens,
        }

    def _current_dir(self) -> str | None:
        ptr = os.path.join(self.index_root, "current")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            name = f.read().strip()
        d = os.path.join(self.index_root, name)
        return d if os.path.isdir(d) else None

    def _execute_sync(self, job: Job) -> dict:
        from ..index.buildlock import BuildLock
        from ..pipelines.sync import sync_repository

        params = dict(job.params)
        inp = params.pop("input")
        with BuildLock(self.index_root):
            base = self._current_dir()
            if base is None:
                # bootstrap: no generation to diff against — plain full build
                # (store_cols must include url_col so the NEXT sync can diff,
                # and the doc-id space reserves headroom so later increments
                # can add documents without changing the shard layout)
                from ..index.build import _dataset_count_and_max, build_index

                url_col = params.get("url_col", "url")
                store_cols = tuple(params.get("store_cols") or ("lang", url_col))
                if url_col not in store_cols:
                    store_cols = store_cols + (url_col,)
                upper = params.get("doc_id_upper")
                if upper is None:
                    _, max_id = _dataset_count_and_max(inp, "doc_id")
                    upper = max(0, max_id) * 4 + 4096
                gen = self._next_generation()
                gen_dir = os.path.join(self.index_root, f"gen_{gen:06d}")
                manifest = build_index(
                    inp, gen_dir, store_cols=store_cols,
                    doc_id_upper=int(upper), resume=False,
                )
                self._publish(gen)
                return {
                    "index_dir": gen_dir,
                    "generation": gen,
                    "num_docs": manifest.num_docs,
                    "sync": {"executed": "bootstrap_full"},
                }
            # store_cols only shapes a BOOTSTRAP build; an existing index's
            # stored columns are pinned by its layout — reject instead of
            # silently ignoring (ADVICE r3)
            if params.get("store_cols"):
                raise ValueError(
                    "store_cols applies only to the bootstrap build; the "
                    "current generation's stored columns are fixed — submit "
                    "a build job to change them"
                )
            gen = self._next_generation()
            gen_dir = os.path.join(self.index_root, f"gen_{gen:06d}")
            upper = params.get("doc_id_upper")
            report = sync_repository(
                base,
                inp,
                gen_dir,
                url_col=params.get("url_col", "url"),
                ts_col=params.get("ts_col"),
                force_full=bool(params.get("force_full", False)),
                search_accuracy=float(params.get("search_accuracy", 1.0)),
                doc_id_upper=int(upper) if upper is not None else None,
            )
            if report["executed"] == "noop":
                # nothing changed — the current generation stays published
                return {"index_dir": base, "generation": None, "sync": report}
            self._publish(gen)
        return {
            "index_dir": gen_dir,
            "generation": gen,
            "num_docs": report["manifest"]["num_docs"],
            "sync": report,
        }

    def _run(self) -> None:
        while True:
            job_id = self._queue.get()
            if job_id is None:
                return
            with self._lock:
                job = self._jobs.get(job_id)
                if job is None or job.state != PENDING:
                    continue  # cancelled while queued
                job.state = RUNNING
                job.started_at = self._clock()
                self._append(job)
            try:
                result = (
                    self._execute_sync(job)
                    if job.kind == "sync"
                    else self._execute_build(job)
                )
            except Exception as e:  # noqa: BLE001 — job ledger, not a crash
                with self._lock:
                    job.state = FAILED
                    job.error = f"{type(e).__name__}: {e}"
                    job.finished_at = self._clock()
                    self._append(job)
            else:
                with self._lock:
                    job.state = COMPLETED
                    job.result = result
                    job.finished_at = self._clock()
                    self._append(job)

    def stop(self) -> None:
        """Stop the worker after the current job (tests / clean shutdown)."""
        self._queue.put(None)
        if self._worker is not None:
            self._worker.join(timeout=30)

    def wait(self, job_id: str, timeout: float = 120.0, poll: float = 0.05) -> dict:
        """Block until the job reaches a terminal state (tests / CLI)."""
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            rec = self.get(job_id)
            if rec["state"] in (COMPLETED, FAILED, CANCELLED):
                return rec
            time.sleep(poll)
        raise TimeoutError(f"job {job_id} still {self.get(job_id)['state']!r} after {timeout}s")
