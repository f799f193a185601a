"""Build-progress observation (`index/progress.py` — reference progress/ +
indexing_progress_log analog, derived from durable build artifacts)."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.progress import PLAN_NAME, build_progress


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index

    tmp = tmp_path_factory.mktemp("progress")
    rows = [
        {"doc_id": i, "text": f"alpha beta doc{i}", "lang": "en", "url": f"u{i}"}
        for i in range(50)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2,
                num_buckets=2, resume=False)
    return idx


def test_idle_on_empty_dir(tmp_path):
    assert build_progress(str(tmp_path / "nothing"))["state"] == "idle"


def test_finished_after_build(built):
    p = build_progress(built)
    assert p["state"] == "finished"
    assert p["partitions_done"] == p["partitions_expected"] == 4
    assert p["pct"] == 100.0
    assert p["plan"]["num_docs"] == 50 and p["elapsed_s"] >= 0


def test_mid_build_states(built, tmp_path):
    """Simulate a mid-build observation: plan + some partitions, no manifest."""
    import shutil

    mid = str(tmp_path / "mid")
    shutil.copytree(built, mid)
    os.remove(os.path.join(mid, "manifest.json"))
    # drop one partition side-manifest -> 3/4 done
    side = sorted(os.listdir(os.path.join(mid, "_manifests")))
    victim = [s for s in side if s.endswith(".json")][0]
    os.remove(os.path.join(mid, "_manifests", victim))

    p = build_progress(mid)
    assert p["state"] == "incomplete"  # no live lock -> dead build
    assert p["partitions_done"] == 3 and p["pct"] == 75.0

    # live lock -> building; stale heartbeat -> stalled
    lock = os.path.join(mid, "_build.lock.json")
    with open(lock, "w") as f:
        json.dump({"pid": 123, "heartbeat_at": 1000.0, "started_at": 990.0}, f)
    assert build_progress(mid, now=1002.0)["state"] == "building"
    assert build_progress(mid, now=1002.0)["lock"]["pid"] == 123
    assert build_progress(mid, now=5000.0, stale_after=300)["state"] == "stalled"
    # released lock record is not a live lock
    with open(lock, "w") as f:
        json.dump({"released_at": 1500.0, "pid": 123}, f)
    assert build_progress(mid)["state"] == "incomplete"


def test_stale_manifest_from_previous_build(built, tmp_path):
    """A manifest from a DIFFERENT fingerprint does not read as finished."""
    import shutil

    mid = str(tmp_path / "prev")
    shutil.copytree(built, mid)
    plan_path = os.path.join(mid, PLAN_NAME)
    plan = json.load(open(plan_path))
    plan["fingerprint"] = "v1:999:998:2:2:text"  # new build planned
    with open(plan_path, "w") as f:
        json.dump(plan, f)
    p = build_progress(mid)
    assert p["state"] != "finished"
    assert p["partitions_done"] == 0  # old partitions don't count for the new plan


def test_cli_stats_progress(built, capsys):
    from code_indexer_ray.cli import main as cli_main

    rc = cli_main(["stats", "--index", built, "--progress"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["state"] == "finished" and out["pct"] == 100.0
