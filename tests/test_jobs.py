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


class TestSyncJobs:
    def _mutated(self, src: str, out: str) -> dict:
        t = pq.read_table(src).to_pylist()
        new = [r for r in t if r["doc_id"] != 7]              # 1 deleted
        new[0] = {**new[0], "text": new[0]["text"] + " freshterm"}  # 1 modified
        new.append({"doc_id": 500, "text": "spark freshterm added doc",
                    "lang": "en", "url": "s9/new.py"})        # 1 added
        pq.write_table(pa.Table.from_pylist(new), out)
        return {"deleted": 1, "modified": 1, "added": 1}

    def test_sync_job_bootstrap_then_incremental_then_noop(self, ray_session, tmp_path):
        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        jm = JobManager(root)
        try:
            # bootstrap: empty root → plain full build (url stored for diffs)
            jid = jm.submit_sync({"input": src})
            rec = jm.wait(jid)
            assert rec["state"] == COMPLETED, rec
            assert rec["result"]["sync"]["executed"] == "bootstrap_full"
            assert rec["result"]["generation"] == 0

            # incremental: small delta → apply_delta generation
            new_src = str(tmp_path / "new.parquet")
            exp = self._mutated(src, new_src)
            jid2 = jm.submit_sync({"input": new_src})
            rec2 = jm.wait(jid2)
            assert rec2["state"] == COMPLETED, rec2
            rep = rec2["result"]["sync"]
            assert rep["executed"] == "incremental"
            assert {k: rep["changes"][k] for k in exp} == exp
            assert rec2["result"]["generation"] == 1
            with open(os.path.join(root, "current")) as f:
                assert f.read().strip() == "gen_000001"

            # no-op: same snapshot again → current generation stays
            jid3 = jm.submit_sync({"input": new_src})
            rec3 = jm.wait(jid3)
            assert rec3["state"] == COMPLETED
            assert rec3["result"]["sync"]["executed"] == "noop"
            assert rec3["result"]["generation"] is None
            with open(os.path.join(root, "current")) as f:
                assert f.read().strip() == "gen_000001"
        finally:
            jm.stop()

    def test_sync_force_full(self, ray_session, tmp_path):
        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        jm = JobManager(root)
        try:
            jm.wait(jm.submit_sync({"input": src}))
            rec = jm.wait(jm.submit_sync({"input": src, "force_full": True}))
            assert rec["state"] == COMPLETED
            assert rec["result"]["sync"]["executed"] == "full"
            assert rec["result"]["sync"]["decision"]["primary_trigger"] == "user_requested"
        finally:
            jm.stop()

    def test_sync_store_cols_rejected_after_bootstrap(self, ray_session, tmp_path):
        """store_cols shapes only the bootstrap build; once a generation
        exists it must be rejected, not silently ignored (ADVICE r3), and
        doc_id_upper plumbs through as a headroom-growth request."""
        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        jm = JobManager(root)
        try:
            rec = jm.wait(jm.submit_sync({"input": src}))
            assert rec["state"] == COMPLETED, rec
            rec2 = jm.wait(jm.submit_sync({"input": src, "store_cols": ["lang"]}))
            assert rec2["state"] == FAILED
            assert "bootstrap" in rec2["error"]
            # doc_id_upper on a non-bootstrap sync grows headroom via full rebuild
            base_upper = rec["result"]["num_docs"]
            rec3 = jm.wait(jm.submit_sync({"input": src, "doc_id_upper": 10**9}))
            assert rec3["state"] == COMPLETED, rec3
            assert rec3["result"]["sync"]["executed"] == "full"
            assert (
                "id_headroom_growth_requested"
                in rec3["result"]["sync"]["decision"]["trigger_reasons"]
            )
        finally:
            jm.stop()

    def test_sync_param_allowlist(self, tmp_path):
        jm = JobManager(str(tmp_path), start_worker=False)
        with pytest.raises(ValueError, match="unknown sync parameters"):
            jm.submit_sync({"input": "x.parquet", "num_shards": 2})
        with pytest.raises(ValueError, match="needs 'input'"):
            jm.submit_sync({})

    def test_http_sync_route(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        src = str(tmp_path / "c.parquet")
        _corpus(src)
        root = str(tmp_path / "root")
        os.makedirs(root)
        srv = IndexHTTPServer(root, port=0, enable_jobs=True)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            code, body = _post(base + "/sync", {"input": src})
            assert code == 202
            jid = body["job_id"]
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                rec = _get(base + f"/jobs/{jid}")[1]
                if rec["state"] in ("completed", "failed"):
                    break
                time.sleep(0.2)
            assert rec["state"] == "completed", rec
            assert rec["result"]["sync"]["executed"] == "bootstrap_full"
            # incremental over the wire; the follower serves the new gen
            new_src = str(tmp_path / "new.parquet")
            self._mutated(src, new_src)
            code, body = _post(base + "/sync", {"input": new_src})
            jid2 = body["job_id"]
            deadline = time.monotonic() + 120
            while time.monotonic() < deadline:
                rec2 = _get(base + f"/jobs/{jid2}")[1]
                if rec2["state"] in ("completed", "failed"):
                    break
                time.sleep(0.2)
            assert rec2["state"] == "completed", rec2
            assert rec2["result"]["sync"]["executed"] == "incremental"
            hits = _get(base + "/search?q=freshterm&limit=5")[1]["hits"]
            assert len(hits) == 2  # the modified doc + the added doc
            # GET /sync is rejected
            code, body = _err(_get, base + "/sync?input=x")
            assert code == 400
        finally:
            srv.shutdown()
