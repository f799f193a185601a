"""HNSW graph: exactness on clustered data, determinism, degree bounds,
incremental adds, empty/self-match edges."""

from __future__ import annotations

import numpy as np
import pytest

from code_indexer_ray.ann.hnsw import HNSWIndex


def _clusters(n_per=50, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim)) * 5
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        vecs.append(c + rng.normal(size=(n_per, dim)) * 0.5)
        labels += [ci] * n_per
    return np.concatenate(vecs), np.array(labels)


def test_neighbors_come_from_the_same_cluster():
    vecs, labels = _clusters()
    idx = HNSWIndex(vecs.shape[1])
    for i, v in enumerate(vecs):
        idx.add(i, v)
    for probe in [0, 60, 120, 180]:
        hits = idx.search(vecs[probe], 11, ef=128)
        got = [v for v, _ in hits if v != probe][:10]
        assert all(labels[g] == labels[probe] for g in got)
        # exact top hit: itself
        assert hits[0][0] == probe and hits[0][1] == pytest.approx(1.0)


def test_matches_brute_on_small_set():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(300, 24))
    idx = HNSWIndex(24, m=8, ef_construction=100)
    for i, v in enumerate(vecs):
        idx.add(i, v)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qi in [5, 77, 200]:
        want = np.argsort(-(nv @ nv[qi]))[:10].tolist()
        got = [v for v, _ in idx.search(vecs[qi], 10, ef=200)]
        assert len(set(want) & set(got)) >= 9  # ≥0.9 recall at high ef


def test_deterministic_and_degree_bounded():
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(200, 8))
    a, b = HNSWIndex(8, seed=7), HNSWIndex(8, seed=7)
    for i, v in enumerate(vecs):
        a.add(i, v)
        b.add(i, v)
    q = rng.normal(size=8)
    assert a.search(q, 10) == b.search(q, 10)
    for node in range(len(a._vecs)):
        for lyr, lnk in enumerate(a._links[node]):
            cap = a.m0 if lyr == 0 else a.m
            assert len(lnk) <= cap


def test_empty_and_single():
    idx = HNSWIndex(4)
    assert idx.search(np.ones(4), 5) == []
    idx.add(42, np.ones(4))
    assert idx.search(np.ones(4), 5) == [(42, pytest.approx(1.0))]


def test_sharded_matches_union_of_per_shard_graphs(ray_session):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from code_indexer_ray.ann.hnsw import hnsw_cosine_topk, hnsw_cosine_topk_sharded

    SRC = "/root/testdata/sf0.001/embeddings.parquet"
    t = pq.read_table(SRC)
    ids = t["vec_id"].to_numpy()
    rows = np.flatnonzero(np.isin(ids, [0, 1, 2, 3]))
    qs = np.stack([np.asarray(t["embedding"][int(i)].as_py(), np.float64) for i in rows])
    qids = ids[rows]

    ds = rd.read_parquet(SRC, columns=["vec_id", "embedding"])
    sharded = hnsw_cosine_topk_sharded(ds, qs, qids, 10, num_shards=3)
    # layout independence: different block structure, same result
    ds2 = rd.read_parquet(SRC, columns=["vec_id", "embedding"]).repartition(5)
    sharded2 = hnsw_cosine_topk_sharded(ds2, qs, qids, 10, num_shards=3)
    assert sharded.equals(sharded2)

    # equivalence: merging each shard's own single-graph answer reproduces it
    per_shard = []
    for s in range(3):
        mask = (ids % 3) == s
        sub = pa.table({"vec_id": t["vec_id"].filter(pa.array(mask)),
                        "embedding": t["embedding"].filter(pa.array(mask))})
        per_shard.append(hnsw_cosine_topk(rd.from_arrow(sub), qs, qids, 10).to_pandas())
    import pandas as pd

    merged = pd.concat(per_shard)
    sp = sharded.to_pandas()
    for q in [0, 1, 2, 3]:
        g = merged[merged.query_id == q].sort_values(["cos", "vec_id"], ascending=[False, True]).head(10)
        assert sp[sp.query_id == q].vec_id.tolist() == g.vec_id.tolist()
