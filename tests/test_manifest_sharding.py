"""Sharded partition index (round 3, SCALE.md limit #1): above a threshold
the published manifest stops inlining the partition list — per-shard JSON
files hold it, loaded lazily per shard.  The driver never materializes 10^6
partition entries to open one shard."""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.manifest import (
    IndexManifest,
    load_manifest,
    publish_manifest,
)


class TestSyntheticScale:
    def test_100k_partitions_shard_and_load(self, tmp_path):
        """The VERDICT r2 'done' bar: a synthetic 10^5-partition manifest
        publishes sharded, loads lazily, and streams identically."""
        n_shards, n_buckets = 6250, 16
        parts = [
            {
                "shard": s,
                "bucket": b,
                "n_terms": 10,
                "n_postings": 100,
                "total_tokens": 1000,
                "n_bytes": 1,
                "path": f"segments/shard={s:05d}/bucket={b:03d}.parquet",
                "build_secs": 0.0,
                "fingerprint": "t",
            }
            for s in range(n_shards)
            for b in range(n_buckets)
        ]
        m = IndexManifest(
            num_docs=1, total_tokens=1, num_shards=n_shards, num_buckets=n_buckets,
            doc_id_upper=0, text_col="text", id_col="doc_id", partitions=parts,
            metrics={"fingerprint": "t"},
        )
        root = str(tmp_path)
        publish_manifest(root, m, pindex_threshold=1000)

        # the global manifest itself must stay SMALL (no inline partitions)
        raw = json.load(open(os.path.join(root, "manifest.json")))
        assert raw["partitions"] == []
        assert raw["metrics"]["partition_index"]["n_partitions"] == n_shards * n_buckets

        lm = load_manifest(root)
        assert lm.n_partitions == n_shards * n_buckets
        files = lm.shard_files(root)
        assert len(files) == n_shards
        assert sorted(files)[:3] == [0, 1, 2]
        got = files[1234]
        assert len(got) == n_buckets
        assert got[0].endswith("segments/shard=01234/bucket=000.parquet")
        # streaming iteration covers every partition without an inline list
        assert sum(1 for _ in lm.iter_partitions(root)) == n_shards * n_buckets

    def test_in_memory_manifest_untouched(self, tmp_path):
        parts = [
            {"shard": s, "bucket": 0, "n_terms": 1, "n_postings": 1,
             "total_tokens": 1, "n_bytes": 1, "path": f"segments/shard={s:05d}/bucket=000.parquet",
             "build_secs": 0.0, "fingerprint": "t"}
            for s in range(50)
        ]
        m = IndexManifest(
            num_docs=1, total_tokens=1, num_shards=50, num_buckets=1,
            doc_id_upper=0, text_col="text", id_col="doc_id", partitions=parts,
        )
        publish_manifest(str(tmp_path), m, pindex_threshold=10)
        assert len(m.partitions) == 50  # caller's object not mutated
        assert "partition_index" not in m.metrics

    def test_below_threshold_stays_inline(self, tmp_path):
        m = IndexManifest(
            num_docs=1, total_tokens=1, num_shards=1, num_buckets=1,
            doc_id_upper=0, text_col="text", id_col="doc_id",
            partitions=[{"shard": 0, "bucket": 0, "path": "segments/x.parquet"}],
        )
        publish_manifest(str(tmp_path), m, pindex_threshold=10)
        raw = json.load(open(os.path.join(str(tmp_path), "manifest.json")))
        assert len(raw["partitions"]) == 1
        assert "partition_index" not in raw["metrics"]


@pytest.fixture()
def small_corpus(tmp_path_factory):
    rng = np.random.default_rng(5)
    vocab = ["spark", "merge", "window", "batch", "row", "scan"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(3, 25)))),
            "lang": "en",
        }
        for i in range(300)
    ]
    tmp = tmp_path_factory.mktemp("pidx")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    return rows, src, str(tmp)


class TestEndToEnd:
    def test_build_search_resume_with_sharded_manifest(
        self, ray_session, small_corpus, monkeypatch
    ):
        """A real build published in sharded form must search identically and
        resume (fingerprint fast path + merge) without the inline list."""
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rows, src, tmp = small_corpus
        monkeypatch.setenv("CIDX_PINDEX_THRESHOLD", "1")
        out = os.path.join(tmp, "idx")
        m1 = build_index(src, out, store_cols=("lang",), num_shards=3, num_buckets=2)
        raw = json.load(open(os.path.join(out, "manifest.json")))
        assert raw["partitions"] == [] and "partition_index" in raw["metrics"]

        s = IndexSearcher(out, lang_col="lang", url_col=None)
        hits = s.search("spark merge", snippet_lines=0)
        assert hits and all(h["score"] > 0 for h in hits)

        # resume fast path: same fingerprint → no rebuild, same manifest
        m2 = build_index(src, out, store_cols=("lang",), num_shards=3, num_buckets=2)
        assert m2.metrics["fingerprint"] == m1.metrics["fingerprint"]

        # results identical to an inline-manifest build of the same corpus
        monkeypatch.setenv("CIDX_PINDEX_THRESHOLD", "1000000")
        out2 = os.path.join(tmp, "idx_inline")
        build_index(src, out2, store_cols=("lang",), num_shards=3, num_buckets=2)
        s2 = IndexSearcher(out2, lang_col="lang", url_col=None)
        a = [(h["doc_id"], h["score"]) for h in hits]
        b = [(h["doc_id"], h["score"]) for h in s2.search("spark merge", snippet_lines=0)]
        assert a == b

    def test_merge_over_sharded_base(self, ray_session, small_corpus, monkeypatch):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.pipelines.incremental import apply_delta
        from code_indexer_ray.query.engine import IndexSearcher

        rows, src, tmp = small_corpus
        monkeypatch.setenv("CIDX_PINDEX_THRESHOLD", "1")
        out = os.path.join(tmp, "idx_m")
        m = build_index(src, out, store_cols=("lang",), num_shards=3, num_buckets=2)
        delta_rows = [{"doc_id": i, "text": "spark spark spark", "lang": "en"} for i in range(5)]
        dsrc = os.path.join(tmp, "delta.parquet")
        pq.write_table(pa.Table.from_pylist(delta_rows), dsrc)
        merged = os.path.join(tmp, "merged")
        mm = apply_delta(out, dsrc, merged, store_cols=("lang",))
        raw = json.load(open(os.path.join(merged, "manifest.json")))
        assert raw["partitions"] == [] and "partition_index" in raw["metrics"]
        s = IndexSearcher(merged, lang_col="lang", url_col=None)
        # replaced docs carry the delta text and appear in the full ranking
        got = s.mget([0, 4])
        assert [g["text"] for g in got] == ["spark spark spark"] * 2
        all_ids = {h["doc_id"] for h in s.search("spark", limit=0, snippet_lines=0)}
        assert set(range(5)) <= all_ids


class TestPindexGC:
    @staticmethod
    def _mk(n_shards: int, tag: str) -> IndexManifest:
        parts = [
            {"shard": s, "bucket": 0, "n_terms": 1, "n_postings": 1,
             "total_tokens": 1, "n_bytes": 1,
             "path": f"segments/shard={s:05d}/bucket=000.parquet",
             "build_secs": 0.0, "fingerprint": tag}
            for s in range(n_shards)
        ]
        return IndexManifest(
            num_docs=n_shards, total_tokens=n_shards, num_shards=n_shards,
            num_buckets=1, doc_id_upper=0, text_col="text", id_col="doc_id",
            partitions=parts, metrics={"fingerprint": tag},
        )

    @staticmethod
    def _gens(root: str) -> list[str]:
        pdir = os.path.join(root, "_manifests", "pindex")
        return sorted(d for d in os.listdir(pdir)) if os.path.isdir(pdir) else []

    def test_generations_and_gc(self, tmp_path):
        """Each sharded publish writes a FRESH generation dir; the live
        manifest points at it; generations older than (current, previous)
        are removed by the publish itself."""
        root = str(tmp_path)
        for i in range(4):
            publish_manifest(root, self._mk(20 + i, f"t{i}"), pindex_threshold=10)
            lm = load_manifest(root)
            gdir = lm.metrics["partition_index"]["dir"]
            # live manifest always resolves from its own generation
            assert len(lm.shard_files(root)) == 20 + i
            assert os.path.isdir(os.path.join(root, gdir))
        # after 4 publishes only the last two generations survive
        assert self._gens(root) == ["g000003", "g000004"]

    def test_crash_window_previous_generation_survives(self, tmp_path):
        """A reader that loaded the manifest published at t-1 can still
        resolve every shard file after the t publish (the GC keeps the
        previous generation)."""
        root = str(tmp_path)
        publish_manifest(root, self._mk(20, "a"), pindex_threshold=10)
        old = load_manifest(root)
        publish_manifest(root, self._mk(30, "b"), pindex_threshold=10)
        files = old.shard_files(root)  # resolves from generation 1
        assert len(files) == 20 and len(files[7]) == 1

    def test_inline_publish_retires_sharded_generations(self, tmp_path):
        """Publishing an inline manifest over a previously sharded index
        GCs all but the newest generation (the one a concurrent reader of
        the just-replaced manifest may still hold)."""
        root = str(tmp_path)
        publish_manifest(root, self._mk(20, "a"), pindex_threshold=10)
        publish_manifest(root, self._mk(30, "b"), pindex_threshold=10)
        assert self._gens(root) == ["g000001", "g000002"]
        publish_manifest(root, self._mk(3, "c"), pindex_threshold=10)  # inline
        assert self._gens(root) == ["g000002"]

    def test_gc_idempotent_and_safe_without_pindex(self, tmp_path):
        from code_indexer_ray.index.manifest import gc_pindex

        root = str(tmp_path)
        publish_manifest(root, self._mk(3, "c"), pindex_threshold=10)  # inline only
        assert gc_pindex(root) == []
        publish_manifest(root, self._mk(20, "a"), pindex_threshold=10)
        assert gc_pindex(root) == []  # nothing dead right after a publish
