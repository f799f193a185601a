"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k — per-batch numpy matmul of the corpus
block against a broadcast query matrix (``ray.put`` once, read per task).
Scale path: :mod:`code_indexer_ray.ann.lsh` buckets candidates first.

All math in float64 with a fixed accumulation pattern so ranks are stable
across systems (oracle: DuckDB ``list_cosine_similarity`` on DOUBLE lists).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(len(col), -1)


def cosine_topk_batch(
    batch: pa.Table, queries: np.ndarray, query_ids: np.ndarray, k: int,
    *, id_col: str = "vec_id", vec_col: str = "embedding",
) -> pa.Table:
    """Local top-k of one corpus batch against all queries (vectorized).

    Output: (query_id, vec_id, cos) rows, ≤ k per query per batch; the global
    merge keeps the true top-k per query.  Self-matches excluded.
    """
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    m = _to_matrix(batch[vec_col])
    mn = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    cos = qn @ mn.T  # (n_queries, n_batch)
    out_q, out_v, out_c = [], [], []
    for qi in range(len(query_ids)):
        row = cos[qi]
        mask = ids != query_ids[qi]
        cand = np.flatnonzero(mask)
        if not len(cand):
            continue
        sel = cand[np.argsort(-row[cand], kind="stable")[:k]]
        out_q.extend([int(query_ids[qi])] * len(sel))
        out_v.extend(ids[sel].tolist())
        out_c.extend(row[sel].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "cos": pa.array(out_c, type=pa.float64()),
        }
    )


def _empty_topk_table() -> pa.Table:
    return pa.table(
        {
            "query_id": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "cos": pa.array([], type=pa.float64()),
        }
    )


def ann_cosine_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int,
                    *, id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Distributed brute-force ANN: broadcast queries, per-batch local top-k,
    driver merge (tie-break by vec_id asc for rank determinism)."""
    import ray

    qref = ray.put((queries, query_ids))

    def local(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)
        return cosine_topk_batch(batch, q, qids, k, id_col=id_col, vec_col=vec_col)

    blocks = ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
    # drop zero-row blocks (an upstream filter can emit empty-schema blocks);
    # all-empty input → empty result, keeping a schema'd block if any exists
    nonempty = [b for b in blocks if b.num_rows]
    if not nonempty:
        # an all-empty corpus (e.g. a label filter matching nothing) must
        # still carry the FINAL output schema (query_id, rank, vec_id, cos),
        # not the map-stage schema — downstream schema compares otherwise
        # see a missing rank column (ADVICE r2).
        return _empty_topk_table()
    parts = pa.concat_tables(nonempty)
    if parts.num_rows == 0:
        return parts
    qs = parts["query_id"].to_numpy(zero_copy_only=False)
    vs = parts["vec_id"].to_numpy(zero_copy_only=False)
    cs = parts["cos"].to_numpy(zero_copy_only=False)
    out_rows = []
    for q in np.unique(qs):
        mask = qs == q
        order = np.lexsort((vs[mask], -cs[mask]))[:k]
        idx = np.flatnonzero(mask)[order]
        for rank, i in enumerate(idx, 1):
            out_rows.append((int(q), rank, int(vs[i]), float(cs[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )


def cosine_range(ds, queries: np.ndarray, query_ids: np.ndarray, tau: float,
                 *, id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Range similarity search: ALL corpus vectors with cosine ≥ ``tau`` to
    each query (the ε-neighbourhood dual of top-k).  Same broadcast shape as
    :func:`ann_cosine_topk` — queries ship once via ``ray.put``, each batch
    emits only its qualifying rows, the driver concatenates (result size is
    data-dependent, not k-bounded).  Self-matches excluded."""
    import ray

    qref = ray.put((queries, query_ids))

    def local(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _to_matrix(batch[vec_col])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        qn = q / np.linalg.norm(q, axis=1, keepdims=True)
        cos = qn @ mn.T
        out_q, out_v, out_c = [], [], []
        for qi in range(len(qids)):
            row = cos[qi]
            sel = np.flatnonzero((row >= tau) & (ids != qids[qi]))
            out_q.extend([int(qids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_c.extend(row[sel].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    blocks = ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
    nonempty = [b for b in blocks if b.num_rows]
    if not nonempty:
        # explicit final schema (here the map-stage schema IS the output
        # schema, but empty-schema blocks from upstream filters must not leak)
        return pa.table(
            {
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cos": pa.array([], type=pa.float64()),
            }
        )
    return pa.concat_tables(nonempty)
