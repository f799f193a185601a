"""Background index-build jobs (reference ``background_jobs.py`` analog):
JobManager lifecycle (pending→running→completed / failed / cancelled),
JSONL persistence + orphan marking on replay, generation publish + pointer
swap, and the HTTP job routes end-to-end — POST /index over an EMPTY root,
poll to completion, then /search hits the newly built generation."""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.jobs import (
    CANCELLED,
    COMPLETED,
    FAILED,
    PENDING,
    JobManager,
)


def _corpus(path: str, n: int = 120, seed: int = 3) -> None:
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(4, 30)))),
            "lang": ["en", "de"][i % 2],
            "url": f"s{i % 3}/f{i}.py",
        }
        for i in range(n)
    ]
    pq.write_table(pa.Table.from_pylist(rows), path)


def _get(url, headers=None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _post(url, payload, headers=None):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **(headers or {})},
    )
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def _err(fn, *a, **kw):
    try:
        fn(*a, **kw)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


class TestJobManager:
    def test_build_job_completes_and_publishes(self, ray_session, tmp_path):
        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        jm = JobManager(root)
        try:
            jid = jm.submit_build({"input": src, "num_shards": 2, "num_buckets": 2,
                                   "store_cols": ["lang", "url"]})
            rec = jm.wait(jid)
            assert rec["state"] == COMPLETED
            assert rec["result"]["num_docs"] == 120
            assert rec["result"]["generation"] == 0
            with open(os.path.join(root, "current")) as f:
                assert f.read().strip() == "gen_000000"
            # second build publishes generation 1 and repoints
            jid2 = jm.submit_build({"input": src, "num_shards": 2, "num_buckets": 2})
            assert jm.wait(jid2)["result"]["generation"] == 1
            with open(os.path.join(root, "current")) as f:
                assert f.read().strip() == "gen_000001"
        finally:
            jm.stop()

    def test_failed_job_recorded(self, ray_session, tmp_path):
        root = str(tmp_path / "root")
        os.makedirs(root)
        jm = JobManager(root)
        try:
            jid = jm.submit_build({"input": str(tmp_path / "missing.parquet")})
            rec = jm.wait(jid)
            assert rec["state"] == FAILED
            assert rec["error"]
            assert not os.path.exists(os.path.join(root, "current"))
        finally:
            jm.stop()

    def test_unknown_param_rejected(self, tmp_path):
        jm = JobManager(str(tmp_path), start_worker=False)
        with pytest.raises(ValueError, match="unknown build parameters"):
            jm.submit_build({"input": "x.parquet", "rm_rf": "/"})
        with pytest.raises(ValueError, match="needs 'input'"):
            jm.submit_build({})

    def test_cancel_pending(self, tmp_path):
        jm = JobManager(str(tmp_path), start_worker=False)  # nothing drains the queue
        jid = jm.submit_build({"input": "whatever.parquet"})
        assert jm.get(jid)["state"] == PENDING
        assert jm.cancel(jid)["state"] == CANCELLED
        # a worker starting later must skip it
        jm._queue.put(None)
        jm._run()
        assert jm.get(jid)["state"] == CANCELLED

    def test_persistence_replay_marks_orphans(self, tmp_path):
        root = str(tmp_path)
        jm = JobManager(root, start_worker=False)
        done = jm.submit_build({"input": "a.parquet"})
        # simulate a completed record then a crash with one still pending
        with jm._lock:
            job = jm._jobs[done]
            job.state = COMPLETED
            job.result = {"num_docs": 5}
            jm._append(job)
        orphan = jm.submit_build({"input": "b.parquet"})
        jm2 = JobManager(root, start_worker=False)
        recs = {r["job_id"]: r for r in jm2.list()}
        assert recs[done]["state"] == COMPLETED
        assert recs[done]["result"] == {"num_docs": 5}
        assert recs[orphan]["state"] == FAILED
        assert "orphaned" in recs[orphan]["error"]

    def test_list_newest_first(self, tmp_path):
        jm = JobManager(str(tmp_path), start_worker=False)
        ids = [jm.submit_build({"input": f"{i}.parquet"}) for i in range(5)]
        listed = [r["job_id"] for r in jm.list(limit=3)]
        assert listed == ids[-1:-4:-1]


class TestHTTPJobRoutes:
    def test_empty_root_build_then_search(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        srv = IndexHTTPServer(root, port=0, enable_jobs=True)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            # empty root: health is up, search is 503
            assert _get(base + "/health")[1]["num_docs"] == 0
            code, body = _err(_get, base + "/search?q=spark")
            assert code == 503 and "no index" in body["error"]
            # submit a build over the wire
            code, body = _post(base + "/index", {"input": src, "num_shards": 2,
                                                 "num_buckets": 2,
                                                 "store_cols": ["lang", "url"]})
            assert code == 202
            jid = body["job_id"]
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                rec = _get(base + f"/jobs/{jid}")[1]
                if rec["state"] in ("completed", "failed"):
                    break
                time.sleep(0.2)
            assert rec["state"] == "completed", rec
            # the follower picks the fresh generation up without restart
            assert _get(base + "/health")[1]["num_docs"] == 120
            hits = _get(base + "/search?q=spark&limit=5")[1]["hits"]
            assert hits and all("spark" in h["match_text"] for h in hits)
            # the job list shows the record
            jobs = _get(base + "/jobs")[1]["jobs"]
            assert jobs[0]["job_id"] == jid and jobs[0]["state"] == "completed"
        finally:
            srv.shutdown()

    def test_job_routes_404_without_enable(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        src = str(tmp_path / "c.parquet")
        _corpus(src, n=40)
        idx = str(tmp_path / "idx")
        build_index(src, idx, num_shards=1, num_buckets=1, resume=False)
        srv = IndexHTTPServer(idx, port=0)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            code, body = _err(_post, base + "/index", {"input": src})
            assert code == 404 and "not enabled" in body["error"]
            assert _err(_get, base + "/jobs")[0] == 404
        finally:
            srv.shutdown()

    def test_unknown_job_and_bad_params(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        root = str(tmp_path / "root")
        os.makedirs(root)
        srv = IndexHTTPServer(root, port=0, enable_jobs=True)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            assert _err(_get, base + "/jobs/nope")[0] == 404
            code, body = _err(_post, base + "/index", {"input": "x", "evil": 1})
            assert code == 400 and "unknown build parameters" in body["error"]
            assert _err(_get, base + "/index")[0] == 400  # GET not allowed
        finally:
            srv.shutdown()
