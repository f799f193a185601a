"""Quantized-path vector store (ann/quantpath.py) — reference
storage/vector_quantizer.py + filesystem_vector_store.py analog."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.ann.quantpath import (
    hash_projection_matrix,
    path_segments,
    projection_matrix,
    quantize_batch,
)


def test_projection_matrix_reference_construction():
    # deterministic, normalized by sqrt(out): reproduce by hand
    m = projection_matrix(16, 64, seed=7)
    np.random.seed(7)
    want = np.random.randn(16, 64) / np.sqrt(64)
    assert np.array_equal(m, want)
    # auto-seed path is deterministic too
    assert np.array_equal(projection_matrix(16, 64), projection_matrix(16, 64))


def test_hash_projection_stats():
    m = hash_projection_matrix(64, 64)
    assert m.shape == (64, 64)
    # uniform with variance 1/out_dim (matches Gaussian/sqrt(out) scaling)
    assert abs(m.mean()) < 0.01
    assert abs(m.var() * 64 - 1.0) < 0.05
    assert np.array_equal(m, hash_projection_matrix(64, 64))


def test_quantize_known_values():
    # identity-ish projection: first 64 dims pass through
    proj = np.eye(64)
    v = np.zeros((1, 64))
    v[0, 0] = -3.0   # clips to -2 → level 0
    v[0, 1] = -0.9   # (1.1/4)*3.999 = 1.0997 → level 1
    v[0, 2] = 0.1    # (2.1/4)*3.999 = 2.099 → level 2
    v[0, 3] = 3.0    # clips to 2 → level 3
    h = quantize_batch(v, proj)[0]
    assert len(h) == 32
    # nibble 0 = (0<<2)|1 = 1; nibble 1 = (2<<2)|3 = b; rest: 0.0 → level 1
    # pairs (1,1) → (1<<2)|1 = 5
    assert h[:2] == "1b" and h[2:] == "5" * 30


def test_quantize_rejects_wrong_output_dim():
    with pytest.raises(ValueError):
        quantize_batch(np.zeros((1, 8)), np.zeros((8, 32)))


def test_path_segments():
    h = "abcd1234" + "e" * 24
    assert path_segments(h, 4) == ["ab", "cd", "12", "34", "e" * 24]


@pytest.fixture(scope="module")
def qp_store(ray_session, tmp_path_factory):
    import ray.data as rd

    from code_indexer_ray.ann.quantpath import QuantPathSearcher, build_quantpath_store

    rng = np.random.default_rng(5)
    n, dim = 300, 64
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in mat]),
        }
    )
    root = str(tmp_path_factory.mktemp("qp") / "store")
    man = build_quantpath_store(rd.from_arrow(tbl), root)
    return QuantPathSearcher(root), man, mat


def test_store_layout_and_lookup(qp_store):
    s, man, mat = qp_store
    assert man["n_buckets"] >= 2
    total = sum(s.lookup(b).num_rows for b in man["buckets"])
    assert total == 300
    # every row's hexpath starts with its bucket prefix
    t = s.lookup(man["buckets"][0])
    assert all(h[:2] == man["buckets"][0] for h in t["hexpath"].to_pylist())
    # unknown prefix → typed empty
    assert s.lookup("zz").num_rows == 0


def test_store_build_idempotent(qp_store, ray_session):
    import ray.data as rd

    from code_indexer_ray.ann.quantpath import build_quantpath_store

    s, man, _ = qp_store
    again = build_quantpath_store(rd.from_arrow(pa.table({"x": [1]})), s.root)
    assert again == man  # existing manifest short-circuits


def test_topk_full_probe_equals_brute(qp_store):
    s, man, mat = qp_store
    q = mat[:2].astype(np.float64)
    out = s.topk(q, np.array([0, 1]), k=5, nprobe=man["n_buckets"]).to_pandas()
    # brute-force reference (self excluded)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (0, 1):
        cos = norm @ norm[qid]
        cos[qid] = -np.inf
        want = set(np.argsort(-cos)[:5])
        got = set(out.loc[out.query_id == qid, "vec_id"])
        assert got == want
    assert (out.groupby("query_id")["rank"].max() == 5).all()
