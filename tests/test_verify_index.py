"""Index integrity verifier (`index/verify.py` — the FTS analog of the
reference's fix-config doctor and sibling of `scip verify`): clean indexes
pass shallow + deep; each corruption class is caught by the right layer."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.verify import verify_index


@pytest.fixture(scope="module")
def clean_idx(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index

    tmp = tmp_path_factory.mktemp("vfy")
    rng = np.random.default_rng(9)
    vocab = ["spark", "merge", "window", "batch", "scan", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 6, 20)),
            "lang": "en",
            "url": f"f{i}.py",
        }
        for i in range(300)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=3,
                num_buckets=2, resume=False)
    return idx


def _copy(idx, tmp_path) -> str:
    dst = str(tmp_path / "idx")
    shutil.copytree(idx, dst)
    return dst


def _one_segment(idx: str) -> str:
    segs = []
    for dirpath, _d, files in os.walk(os.path.join(idx, "segments")):
        segs.extend(os.path.join(dirpath, f) for f in files)
    return sorted(segs)[0]


@pytest.mark.usefixtures("ray_session")
class TestVerifyIndex:
    def test_clean_passes_shallow_and_deep(self, clean_idx):
        out = verify_index(clean_idx)
        assert out["valid"], out["errors"]
        out = verify_index(clean_idx, deep=True)
        assert out["valid"], out["errors"]
        assert out["checks"]["deep_segments"] == 6
        assert out["checks"]["docstore_rows"] == 300

    def test_deep_sample(self, clean_idx):
        out = verify_index(clean_idx, deep=True, deep_sample=3)
        assert out["valid"] and out["checks"]["deep_segments"] == 2

    def test_multifield_clean(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        rows = [
            {"doc_id": i, "title": f"title {i % 7}", "body": f"spark merge {i}"}
            for i in range(80)
        ]
        src = str(tmp_path / "mf.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "mfidx")
        build_index(src, idx, fields={"title": "title", "body": "body"},
                    num_shards=2, resume=False)
        out = verify_index(idx, deep=True)
        assert out["valid"], out["errors"]

    def test_missing_segment_file(self, clean_idx, tmp_path):
        idx = _copy(clean_idx, tmp_path)
        os.remove(_one_segment(idx))
        out = verify_index(idx)
        assert not out["valid"]
        assert any("missing segment file" in e for e in out["errors"])

    def test_truncated_segment(self, clean_idx, tmp_path):
        idx = _copy(clean_idx, tmp_path)
        seg = _one_segment(idx)
        data = open(seg, "rb").read()
        with open(seg, "wb") as f:
            f.write(data[: len(data) // 2])
        out = verify_index(idx)
        assert not out["valid"]
        assert any("size" in e and "recorded" in e for e in out["errors"])

    def test_corrupted_postings_caught_by_deep(self, clean_idx, tmp_path):
        idx = _copy(clean_idx, tmp_path)
        seg = _one_segment(idx)
        t = pq.read_table(seg)
        docs = t.column("docs_enc").to_pylist()
        # scramble one posting list's delta stream, byte count preserved
        docs[0] = bytes(b ^ 0xFF for b in docs[0])
        cols = {name: t.column(name) for name in t.column_names}
        cols["docs_enc"] = pa.array(docs, type=pa.large_binary())
        pq.write_table(pa.table(cols), seg)
        deep = verify_index(idx, deep=True)
        assert not deep["valid"]
        # deep finds the POSTING-level defect, not just the size delta
        assert any(
            "not strictly increasing" in e or "decode failed" in e
            or "out of range" in e or "Σtf" in e
            for e in deep["errors"]
        ), deep["errors"]

    def test_docstore_row_mismatch(self, clean_idx, tmp_path):
        idx = _copy(clean_idx, tmp_path)
        files = []
        for dirpath, _d, fs in os.walk(os.path.join(idx, "docstore")):
            files += [os.path.join(dirpath, f) for f in fs if f.endswith(".parquet")]
        os.remove(sorted(files)[0])
        out = verify_index(idx)
        assert not out["valid"]
        assert any("docstore rows" in e for e in out["errors"])

    def test_manifest_tamper(self, clean_idx, tmp_path):
        idx = _copy(clean_idx, tmp_path)
        mpath = os.path.join(idx, "manifest.json")
        m = json.load(open(mpath))
        m["num_docs"] += 5
        json.dump(m, open(mpath, "w"))
        out = verify_index(idx)
        assert not out["valid"]
        assert any("docstore rows" in e for e in out["errors"])

    def test_lost_whole_shard_is_error(self, clean_idx, tmp_path):
        """Coordinated tampering: removing ALL of a shard's partition entries
        AND its tokens from the totals used to pass shallow verify with only
        a warning; the docstore cross-check keeps it an error (ADVICE r3)."""
        idx = _copy(clean_idx, tmp_path)
        mpath = os.path.join(idx, "manifest.json")
        m = json.load(open(mpath))
        dropped = [p for p in m["partitions"] if p["shard"] == 0]
        m["partitions"] = [p for p in m["partitions"] if p["shard"] != 0]
        m["total_tokens"] -= sum(p["total_tokens"] for p in dropped)
        json.dump(m, open(mpath, "w"))
        out = verify_index(idx)
        assert not out["valid"]
        assert any("NON-empty shards" in e for e in out["errors"])

    def test_lost_bucket_in_vocab_rich_shard_is_error(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        rows = [
            {"doc_id": i, "text": " ".join(f"term{i}w{j}" for j in range(8)),
             "lang": "en", "url": f"f{i}.py"}
            for i in range(40)  # 320 distinct terms >> 8 * num_buckets
        ]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=2, resume=False)
        mpath = os.path.join(idx, "manifest.json")
        m = json.load(open(mpath))
        victim = m["partitions"][0]
        m["partitions"] = m["partitions"][1:]
        m["total_tokens"] -= victim["total_tokens"]
        json.dump(m, open(mpath, "w"))
        out = verify_index(idx)
        assert not out["valid"]
        assert any("NON-empty shards" in e for e in out["errors"])

    def test_empty_headroom_shards_stay_warning(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index

        rows = [
            {"doc_id": i, "text": "alpha beta gamma", "lang": "en", "url": f"f{i}.py"}
            for i in range(10)
        ]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "idx")
        # doc ids 0-9 but headroom to 9999: most shards hold no documents
        build_index(src, idx, store_cols=("lang", "url"), num_shards=8,
                    num_buckets=2, doc_id_upper=9999, resume=False)
        out = verify_index(idx)
        assert out["valid"], out["errors"]
        assert any("empty shard" in w for w in out["warnings"])

    def test_unreadable_manifest(self, tmp_path):
        out = verify_index(str(tmp_path))
        assert not out["valid"] and "manifest unreadable" in out["errors"][0]

    def test_cli_exit_codes(self, clean_idx, tmp_path):
        env = {**os.environ, "RAY_ADDRESS": "local"}
        r = subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "verify",
             "--index", clean_idx, "--deep"],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 0, r.stderr
        assert json.loads(r.stdout)["valid"] is True
        broken = _copy(clean_idx, tmp_path)
        os.remove(_one_segment(broken))
        r = subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "verify", "--index", broken],
            capture_output=True, text=True, env=env,
        )
        assert r.returncode == 1
        assert json.loads(r.stdout)["valid"] is False
