"""Watch-mode incremental driver: fingerprint-scan → delta build → merge →
atomic generation swap, with whole-file deletions as tombstone ranges."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.pipelines.watch import WatchDriver
from code_indexer_ray.query.engine import IndexSearcher


def _write_shard(path: str, lo: int, hi: int, salt: str = "") -> None:
    n = hi - lo + 1
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(lo, hi + 1), type=pa.int64()),
                "text": pa.array(
                    [f"watch doc w{i:04d} common{salt} text body" for i in range(lo, hi + 1)]
                ),
                "lang": pa.array(["en"] * n),
                "url": pa.array([f"http://w/{i}" for i in range(lo, hi + 1)]),
            }
        ),
        path,
    )


@pytest.fixture()
def corpus(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    _write_shard(str(d / "part-000.parquet"), 0, 49)
    _write_shard(str(d / "part-001.parquet"), 50, 99)
    _write_shard(str(d / "part-002.parquet"), 100, 149)
    return d


class TestWatchDriver:
    def test_lifecycle(self, ray_session, corpus, tmp_path):
        root = str(tmp_path / "idx")
        w = WatchDriver(
            str(corpus), root, doc_id_upper=999, num_buckets=4, target_docs_per_shard=50
        )

        # tick 1: full build
        m = w.tick()
        assert m is not None and m.num_docs == 150
        cur = w.current_index()
        assert cur and os.path.basename(cur) == "gen_000000"
        s = IndexSearcher(cur)
        assert len(s.search("common", limit=0, snippet_lines=0)) == 150

        # no changes → no-op
        assert w.tick() is None

        # modify one shard (different text for its docs)
        _write_shard(str(corpus / "part-001.parquet"), 50, 99, salt="CHANGED")
        os.utime(str(corpus / "part-001.parquet"))
        m2 = w.tick()
        assert m2 is not None and m2.num_docs == 150
        cur2 = w.current_index()
        assert os.path.basename(cur2) == "gen_000001"
        s2 = IndexSearcher(cur2)
        assert len(s2.search("commonCHANGED", limit=0, snippet_lines=0)) == 50
        assert len(s2.search("common", limit=0, snippet_lines=0)) == 100  # old shards only

        # delete one shard → tombstone range removes its docs
        os.unlink(str(corpus / "part-000.parquet"))
        m3 = w.tick()
        assert m3 is not None and m3.num_docs == 100
        s3 = IndexSearcher(w.current_index())
        assert len(s3.search("common", limit=0, snippet_lines=0)) == 50
        assert s3.search("w0010", snippet_lines=0) == []       # deleted doc gone
        assert len(s3.search("w0110", snippet_lines=0)) == 1   # surviving doc intact

    def test_state_survives_restart(self, ray_session, corpus, tmp_path):
        root = str(tmp_path / "idx")
        w = WatchDriver(
            str(corpus), root, doc_id_upper=999, num_buckets=4, target_docs_per_shard=50
        )
        assert w.tick() is not None
        # a NEW driver instance over the same root sees the recorded state
        w2 = WatchDriver(
            str(corpus), root, doc_id_upper=999, num_buckets=4, target_docs_per_shard=50
        )
        assert w2.tick() is None  # nothing changed → no-op, no rebuild
        assert w2.current_index() == w.current_index()

    def test_matches_full_rebuild(self, ray_session, corpus, tmp_path):
        """After an update tick, query results equal a from-scratch rebuild of
        the updated corpus (the merge determinism invariant, via watch)."""
        from code_indexer_ray.index.build import build_index

        root = str(tmp_path / "idx")
        w = WatchDriver(
            str(corpus), root, doc_id_upper=999, num_buckets=4, target_docs_per_shard=50
        )
        w.tick()
        _write_shard(str(corpus / "part-002.parquet"), 100, 149, salt="V2")
        os.utime(str(corpus / "part-002.parquet"))
        w.tick()

        rebuild_dir = str(tmp_path / "rebuild")
        build_index(
            str(corpus), rebuild_dir, store_cols=("lang", "url"), num_buckets=4,
            target_docs_per_shard=50, doc_id_upper=999, resume=False,
        )
        a = IndexSearcher(w.current_index())
        b = IndexSearcher(rebuild_dir)
        for q in ["common", "commonV2", "w0123", "w0001"]:
            ra = [(r["doc_id"], round(r["score"], 9)) for r in a.search(q, limit=0, snippet_lines=0)]
            rb = [(r["doc_id"], round(r["score"], 9)) for r in b.search(q, limit=0, snippet_lines=0)]
            assert ra == rb, q


class TestWatchCompaction:
    def test_periodic_compaction_preserves_results(self, ray_session, corpus, tmp_path):
        import glob

        root = str(tmp_path / "idxc")
        w = WatchDriver(
            str(corpus), root, doc_id_upper=999, num_buckets=4,
            target_docs_per_shard=50, compact_every=1,  # compact every tick
        )
        w.tick()  # gen 0: full build — gen % 1 == 0 → compacted immediately
        _write_shard(str(corpus / "part-001.parquet"), 50, 99, salt="X")
        os.utime(str(corpus / "part-001.parquet"))
        m = w.tick()  # gen 1: merge + compaction of the new generation
        assert m is not None and m.num_docs == 150
        cur = w.current_index()
        files = glob.glob(os.path.join(cur, "docstore", "**", "*.parquet"), recursive=True)
        # compacted: no delta_ files survive, ≤1 file per shard at this size
        assert not [f for f in files if "delta_" in os.path.basename(f)]
        shard_dirs = {os.path.dirname(f) for f in files}
        assert len(files) == len(shard_dirs)
        s = IndexSearcher(cur)
        assert len(s.search("commonX", limit=0, snippet_lines=0)) == 50
        assert len(s.search("common", limit=0, snippet_lines=0)) == 100
        # stored fields intact after compaction
        hit = s.search("w0060", snippet_lines=1)[0]
        assert "w0060" in hit["snippet"]
