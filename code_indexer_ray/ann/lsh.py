"""LSH-bucketed approximate nearest neighbour — the scale path for ANN.

Random-hyperplane (sign) LSH: project embeddings onto ``n_planes`` seeded
hyperplanes → a bucket code; candidates are corpus vectors sharing a bucket
with the query in ANY of ``n_tables`` independent tables.  Exact cosine is
then computed only on candidates.  The bucket assignment is one vectorized
matmul per batch; the candidate join is a broadcast of the (tiny) query
bucket codes — no shuffle.

Recall is tunable with (n_planes, n_tables); this is the standard SimHash/
hyperplane-LSH construction (Charikar 2002).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def plane_matrix(dim: int, n_planes: int, n_tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def bucket_codes(vectors: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(n_vectors, n_tables) int64 bucket codes."""
    # signs: (tables, planes, n) → code per table
    out = np.empty((vectors.shape[0], planes.shape[0]), dtype=np.int64)
    for t in range(planes.shape[0]):
        signs = (vectors @ planes[t].T) > 0
        out[:, t] = signs @ (1 << np.arange(planes.shape[1], dtype=np.int64))
    return out


def lsh_cosine_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k: filter each batch to bucket-colliding candidates,
    then exact cosine on survivors; same output schema as brute force."""
    import ray

    from .brute import _to_matrix, cosine_topk_batch

    dim = queries.shape[1]
    planes = plane_matrix(dim, n_planes, n_tables, seed)
    qcodes = bucket_codes(queries, planes)  # (n_q, n_tables)
    shared = ray.put((queries, query_ids, planes, qcodes))

    def local(batch: pa.Table) -> pa.Table:
        q, qids, pl, qc = ray.get(shared)
        m = _to_matrix(batch[vec_col])
        codes = bucket_codes(m, pl)  # (n_batch, n_tables)
        # candidate mask: collides with ANY query in ANY table
        coll = np.zeros(len(m), dtype=bool)
        for t in range(pl.shape[0]):
            coll |= np.isin(codes[:, t], qc[:, t])
        sub = batch.filter(pa.array(coll))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        return cosine_topk_batch(sub, q, qids, k, id_col=id_col, vec_col=vec_col)

    parts = pa.concat_tables(ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs()))
    from .brute import ann_cosine_topk as _  # noqa: F401  (same merge shape)

    qs = parts["query_id"].to_numpy(zero_copy_only=False) if parts.num_rows else np.empty(0, np.int64)
    out_rows = []
    if parts.num_rows:
        vs = parts["vec_id"].to_numpy(zero_copy_only=False)
        cs = parts["cos"].to_numpy(zero_copy_only=False)
        for qid in np.unique(qs):
            mask = qs == qid
            order = np.lexsort((vs[mask], -cs[mask]))[:k]
            idx = np.flatnonzero(mask)[order]
            for rank, i in enumerate(idx, 1):
                out_rows.append((int(qid), rank, int(vs[i]), float(cs[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )
