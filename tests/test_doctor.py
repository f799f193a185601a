"""Config doctor (`index/doctor.py` — reference services/config_fixer.py
analog): each corruption class is detected, the safe ones repaired, CLI
exit codes honor the verify contract."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.doctor import diagnose, doctor, repair


def _build(tmp, name="idx", n=60, **kw) -> str:
    from code_indexer_ray.index.build import build_index

    rng = np.random.default_rng(5)
    vocab = ["spark", "merge", "window", "batch", "scan"]
    rows = [
        {"doc_id": i, "text": " ".join(vocab[j] for j in rng.integers(0, 5, 15)),
         "lang": "en", "url": f"f{i}.py"}
        for i in range(n)
    ]
    src = str(tmp / f"{name}.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / name)
    build_index(src, out, store_cols=("lang", "url"), num_shards=2,
                num_buckets=2, resume=False, **kw)
    return out


def _gen_root(tmp, n_gens=2) -> str:
    root = str(tmp / "root")
    os.makedirs(root, exist_ok=True)
    for g in range(n_gens):
        idx = _build(tmp, name=f"g{g}src", n=30 + g)
        shutil.move(idx, os.path.join(root, f"gen_{g:06d}"))
    with open(os.path.join(root, "current"), "w") as f:
        f.write(f"gen_{n_gens - 1:06d}")
    return root


@pytest.mark.usefixtures("ray_session")
class TestDiagnose:
    def test_healthy_root(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=1)
        out = doctor(root)
        assert out["healthy"], out["findings"]

    def test_dangling_current_repointed(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=2)
        with open(os.path.join(root, "current"), "w") as f:
            f.write("gen_999999")
        kinds = {f.kind for f in diagnose(root)}
        assert "dangling_current" in kinds
        out = doctor(root, fix=True)
        assert out["healthy"]
        with open(os.path.join(root, "current")) as f:
            assert f.read().strip() == "gen_000001"

    def test_missing_current_repointed(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=2)
        os.unlink(os.path.join(root, "current"))
        out = doctor(root, fix=True)
        assert out["healthy"]
        with open(os.path.join(root, "current")) as f:
            assert f.read().strip() == "gen_000001"

    def test_orphan_generation_reported_pruned_only_on_request(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=3)
        out = doctor(root)
        orphans = [f for f in out["findings"] if f["kind"] == "orphan_generation"]
        assert len(orphans) == 2
        assert out["healthy"]  # retention choice, not damage
        # --fix WITHOUT prune keeps them
        out = doctor(root, fix=True)
        assert os.path.isdir(os.path.join(root, "gen_000000"))
        # prune deletes the superseded generations, current survives
        out = doctor(root, fix=True, prune_generations=True)
        assert out["healthy"]
        assert not os.path.isdir(os.path.join(root, "gen_000000"))
        assert not os.path.isdir(os.path.join(root, "gen_000001"))
        assert os.path.isdir(os.path.join(root, "gen_000002"))

    def test_stale_scratch_cleaned(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=1)
        os.makedirs(os.path.join(root, "gen_000001_work", "snapshot"))
        gen = os.path.join(root, "gen_000000")
        with open(os.path.join(gen, "docstore", "part.tmp-12345"), "w") as f:
            f.write("junk")
        out = doctor(root)
        assert not out["healthy"]
        kinds = [f["kind"] for f in out["findings"]]
        assert kinds.count("stale_scratch") == 2
        out = doctor(root, fix=True)
        assert out["healthy"], out["findings"]
        assert not os.path.exists(os.path.join(root, "gen_000001_work"))

    def test_stale_lock_cleared_released_ignored(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=1)
        lock = os.path.join(root, "_build.lock")
        with open(lock, "w") as f:
            f.write("")
        with open(lock + ".json", "w") as f:
            json.dump({"pid": 999999, "heartbeat_at": time.time() - 3600,
                       "started_at": time.time() - 7200}, f)
        out = doctor(root)
        assert any(f["kind"] == "stale_lock" for f in out["findings"])
        out = doctor(root, fix=True)
        assert out["healthy"]
        assert not os.path.exists(lock)
        # a cleanly released sidecar is history, not a finding
        with open(lock + ".json", "w") as f:
            json.dump({"released_at": time.time() - 3600, "pid": 1}, f)
        assert doctor(root)["healthy"]

    def test_fresh_lock_not_flagged(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=1)
        with open(os.path.join(root, "_build.lock.json"), "w") as f:
            json.dump({"pid": os.getpid(), "heartbeat_at": time.time(),
                       "started_at": time.time()}, f)
        assert doctor(root)["healthy"]

    def test_stale_partition_foreign_fingerprint(self, tmp_path):
        idx = _build(tmp_path, name="single")
        # plant a partition manifest + segment from a DIFFERENT build
        pdir = os.path.join(idx, "_manifests")
        seg_rel = os.path.join("segments", "shard=00099", "bucket=099.parquet")
        os.makedirs(os.path.join(idx, os.path.dirname(seg_rel)), exist_ok=True)
        with open(os.path.join(idx, seg_rel), "wb") as f:
            f.write(b"junk")
        with open(os.path.join(pdir, "s00099_b099.json"), "w") as f:
            json.dump({"shard": 99, "bucket": 99, "fingerprint": "deadbeef",
                       "path": seg_rel, "total_tokens": 0, "n_terms": 0,
                       "n_postings": 0, "n_bytes": 4}, f)
        out = doctor(idx)
        kinds = {f["kind"] for f in out["findings"]}
        assert "stale_partition" in kinds
        out = doctor(idx, fix=True)
        assert out["healthy"], out["findings"]
        assert not os.path.exists(os.path.join(pdir, "s00099_b099.json"))
        assert not os.path.exists(os.path.join(idx, seg_rel))

    def test_orphan_segment_deleted(self, tmp_path):
        idx = _build(tmp_path, name="single2")
        orphan = os.path.join(idx, "segments", "shard=00000", "zombie.parquet")
        with open(orphan, "wb") as f:
            f.write(b"junk")
        out = doctor(idx)
        assert any(f["kind"] == "orphan_segment" for f in out["findings"])
        out = doctor(idx, fix=True)
        assert out["healthy"]
        assert not os.path.exists(orphan)

    def test_invalid_index_not_fixable(self, tmp_path):
        idx = _build(tmp_path, name="single3")
        # truncate a real segment: verify fails, doctor reports, cannot fix
        segs = []
        for dirpath, _d, files in os.walk(os.path.join(idx, "segments")):
            segs += [os.path.join(dirpath, f) for f in files]
        victim = sorted(segs)[0]
        with open(victim, "wb") as f:
            f.write(b"short")
        out = doctor(idx, fix=True)
        assert not out["healthy"]
        bad = [f for f in out["findings"] if f["kind"] == "invalid_index"]
        assert bad and bad[0]["fixable"] is False

    def test_cli_exit_codes(self, tmp_path):
        root = _gen_root(tmp_path, n_gens=1)
        env = {**os.environ, "RAY_ADDRESS": "local"}
        r = subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "doctor", "--index", root],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr
        assert json.loads(r.stdout)["healthy"] is True
        os.makedirs(os.path.join(root, "gen_000009_work"))
        r = subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "doctor", "--index", root],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 1
        r = subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "doctor", "--index", root, "--fix"],
            capture_output=True, text=True, env=env, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stdout
        body = json.loads(r.stdout)
        assert body["healthy"] and body["actions"]
