"""Persisted HNSW store (reference ``storage/hnsw_index_manager.py``:
build → save binary + metadata → load → knn_query): serialization
round-trip, rank-identity with the in-memory sharded build, manifest
no-op resume, and a recall gate vs brute force."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.ann.hnsw import HNSWIndex, hnsw_cosine_topk_sharded
from code_indexer_ray.ann.hnsw_store import (
    HNSWStoreSearcher,
    build_hnsw_store,
    _graph_arrays,
    _graph_from_arrays,
)

SRC = "/root/testdata/sf0.001/embeddings.parquet"


def _queries(n: int = 6):
    t = pq.read_table(SRC)
    qs = np.stack(
        [np.asarray(t["embedding"][i].as_py(), dtype=np.float64) for i in range(n)]
    )
    return qs, t["vec_id"].to_numpy()[:n].astype(np.int64)


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray.data as rd

    out = str(tmp_path_factory.mktemp("hnswstore") / "store")
    man = build_hnsw_store(rd.read_parquet(SRC), out, num_shards=4)
    return out, man


def test_graph_roundtrip_identical_search():
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(120, 16))
    idx = HNSWIndex(16, m=6, ef_construction=48, seed=9)
    for i in range(len(vecs)):
        idx.add(i * 3, vecs[i])
    back = _graph_from_arrays(_graph_arrays(idx))
    for qi in range(8):
        q = rng.normal(size=16)
        assert back.search(q, 10, ef=80) == idx.search(q, 10, ef=80)
    assert back._entry == idx._entry and back._max_level == idx._max_level


def test_manifest_and_resume(store, ray_session):
    import ray.data as rd

    out, man = store
    t = pq.read_table(SRC)
    assert man["total_rows"] == len(t)
    assert len(man["shards"]) == 4
    # matching params → no-op fast path (same manifest object back)
    assert build_hnsw_store(rd.read_parquet(SRC), out, num_shards=4) == man
    # changed params → rebuild
    man2 = build_hnsw_store(rd.read_parquet(SRC), out, num_shards=2)
    assert man2["num_shards"] == 2 and len(man2["shards"]) == 2
    # restore for the other tests (module fixture contract)
    man3 = build_hnsw_store(rd.read_parquet(SRC), out, num_shards=4)
    assert man3 == man


def test_rank_identical_to_in_memory_sharded(store, ray_session):
    import ray.data as rd

    out, _man = store
    qs, qids = _queries()
    got = HNSWStoreSearcher(out).topk(qs, qids, 10).to_pylist()
    want = hnsw_cosine_topk_sharded(
        rd.read_parquet(SRC), qs, qids, 10, num_shards=4
    ).to_pylist()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)


def test_recall_vs_brute(store, ray_session):
    import ray.data as rd

    from code_indexer_ray.ann.brute import ann_cosine_topk

    out, _man = store
    qs, qids = _queries()
    got = HNSWStoreSearcher(out).topk(qs, qids, 10, accuracy="high")
    brute = ann_cosine_topk(rd.read_parquet(SRC), qs, qids, 10)
    g = {}
    for r in got.to_pylist():
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = total = 0
    for r in brute.to_pylist():
        total += 1
        hits += r["vec_id"] in g.get(r["query_id"], set())
    assert hits / total >= 0.9, hits / total


def test_dim_mismatch_and_lazy_load(store):
    out, _man = store
    s = HNSWStoreSearcher(out)
    with pytest.raises(ValueError, match="dim"):
        s.topk(np.zeros((1, 3)), np.array([0]), 5)
    assert not s._graphs  # nothing loaded until a real query
    qs, qids = _queries(1)
    s.topk(qs, qids, 3)
    assert len(s._graphs) == 4  # all shards consulted, loaded once


def test_fingerprint_guards_stale_data(ray_session, tmp_path):
    """Regenerated source data must rebuild the store even when every
    hyperparameter matches (row-count fingerprint, review fix)."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(5)

    def write(n, path):
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(range(n), type=pa.int64()),
                    "embedding": pa.array(
                        [rng.normal(size=8).tolist() for _ in range(n)],
                        type=pa.list_(pa.float64()),
                    ),
                }
            ),
            path,
        )

    src = str(tmp_path / "v.parquet")
    out = str(tmp_path / "store")
    write(64, src)
    man1 = build_hnsw_store(rd.read_parquet(src), out, num_shards=2)
    assert man1["total_rows"] == 64
    write(80, src)  # regenerated data, same params
    man2 = build_hnsw_store(rd.read_parquet(src), out, num_shards=2)
    assert man2["total_rows"] == 80 and man2["fingerprint"] != man1["fingerprint"]


def test_ef_accuracy_conflict_raises(store):
    out, _man = store
    s = HNSWStoreSearcher(out)
    qs, qids = _queries(1)
    with pytest.raises(ValueError, match="not both"):
        s.topk(qs, qids, 5, ef_search=128, accuracy="high")
