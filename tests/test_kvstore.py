"""SSTable-style KV doc store: point reads identical to the parquet
row-group path, fingerprint staleness, compaction independence."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.index.kvstore import build_kv_docstore

    rng = np.random.default_rng(17)
    vocab = ["spark", "merge", "window", "batch", "row", "scan"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(3, 40)))),
            "lang": "en",
            "url": f"s/{i}",
        }
        for i in range(400)
    ]
    tmp = tmp_path_factory.mktemp("kv")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2, resume=False)
    meta = build_kv_docstore(out, block_docs=16)
    return rows, out, meta


class TestKVDocStore:
    def test_point_reads_match_parquet_path(self, built):
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, meta = built
        assert meta["n_blocks"] > 0
        s_kv = IndexSearcher(out, lang_col="lang", url_col="url")
        s_pq = IndexSearcher(out, lang_col="lang", url_col="url")
        s_pq._kv = False  # force the parquet row-group path
        ids = [0, 7, 133, 399, 250]
        assert s_kv._fetch_texts(ids) == s_pq._fetch_texts(ids)
        assert s_kv._kv is not False  # the KV path actually answered
        by_id = {r["doc_id"]: r["text"] for r in rows}
        got = s_kv._fetch_texts(ids)
        assert got == {i: by_id[i] for i in ids}

    def test_missing_ids_absent(self, built):
        from code_indexer_ray.query.engine import IndexSearcher

        _rows, out, _meta = built
        s = IndexSearcher(out, lang_col="lang", url_col="url")
        assert s._fetch_texts([10_000, 20_000]) == {}

    def test_search_and_mget_identical_through_kv(self, built):
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, _meta = built
        s_kv = IndexSearcher(out, lang_col="lang", url_col="url")
        s_pq = IndexSearcher(out, lang_col="lang", url_col="url")
        s_pq._kv = False
        a = s_kv.search("spark merge", limit=10)
        b = s_pq.search("spark merge", limit=10)
        assert a == b
        assert s_kv.mget([3, 17, 55]) == s_pq.mget([3, 17, 55])

    def test_stale_fingerprint_ignored(self, built, tmp_path):
        import json

        from code_indexer_ray.index.kvstore import KV_DIR, KV_META
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, _meta = built
        meta_path = os.path.join(out, KV_DIR, KV_META)
        d = json.load(open(meta_path))
        try:
            stale = {**d, "fingerprint": "different-build"}
            with open(meta_path, "w") as f:
                json.dump(stale, f)
            s = IndexSearcher(out, lang_col="lang", url_col="url")
            got = s._fetch_texts([0, 1])
            assert s._kv is False  # fell back to parquet
            assert got == {r["doc_id"]: r["text"] for r in rows[:2]}
        finally:
            with open(meta_path, "w") as f:
                json.dump(d, f)


class TestFingerprintEdge:
    def test_missing_fingerprints_never_match(self, built):
        """Review fix: None == None must not validate a stale KV store."""
        import json

        from code_indexer_ray.index.kvstore import KV_DIR, KV_META, KVDocStore
        from code_indexer_ray.index.manifest import load_manifest

        _rows, out, _meta = built
        meta_path = os.path.join(out, KV_DIR, KV_META)
        d = json.load(open(meta_path))
        m = load_manifest(out)
        try:
            stale = {k: v for k, v in d.items() if k != "fingerprint"}
            with open(meta_path, "w") as f:
                json.dump(stale, f)
            m.metrics.pop("fingerprint", None)
            assert KVDocStore.open_if_valid(out, m) is None
        finally:
            with open(meta_path, "w") as f:
                json.dump(d, f)
