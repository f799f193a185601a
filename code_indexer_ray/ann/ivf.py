"""IVF (inverted-file) approximate nearest neighbour — the second scale path
next to hyperplane LSH (:mod:`.lsh`).

Standard IVF-Flat construction (Sivic & Zisserman's video-google inverted
file / FAISS IVF): k-means coarse centroids trained on a bounded sample,
every corpus vector assigned to its nearest centroid cell, and a query only
scans the ``nprobe`` cells whose centroids are closest to it.  Here the cell
scan is expressed Ray-native: the (tiny) centroid matrix and per-query probe
sets are broadcast once (``ray.put``), each ``map_batches`` task assigns its
block's vectors to cells with one matmul and computes exact cosine only for
vectors landing in a probed cell — no shuffle, no index materialization.

Determinism: seeded k-means with fixed iteration count; all float64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .brute import _to_matrix, cosine_topk_batch


def train_centroids(
    sample: np.ndarray, n_centroids: int, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means on a (normalized) training sample."""
    rng = np.random.default_rng(seed)
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    n = len(x)
    k = min(n_centroids, n)
    cent = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                v = members.sum(axis=0)
                nrm = np.linalg.norm(v)
                if nrm > 0:
                    cent[c] = v / nrm
    return cent


def ivf_cosine_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    train_max: int = 100_000,
    seed: int = 42,
) -> pa.Table:
    """Approximate top-k via IVF cell probing; same output schema as brute.

    Training reads at most ``train_max`` vectors onto the driver (the
    standard bounded-sample IVF practice — the corpus itself streams)."""
    import ray

    sample_tbl = ds.limit(train_max).to_arrow_refs()
    sample = np.concatenate(
        [_to_matrix(t[vec_col]) for t in ray.get(sample_tbl) if t.num_rows]
    )
    cent = train_centroids(sample, n_centroids, seed=seed)

    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    # per-query probe sets → the union of probed cells gates candidate rows
    probes = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]
    probed_union = np.unique(probes)
    shared = ray.put((queries, query_ids, cent, probed_union))

    def local(batch: pa.Table) -> pa.Table:
        q, qids, c, cells = ray.get(shared)
        m = _to_matrix(batch[vec_col])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        assign = np.argmax(mn @ c.T, axis=1)
        keep = np.isin(assign, cells)
        sub = batch.filter(pa.array(keep))
        if sub.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cos": pa.array([], pa.float64()),
                }
            )
        return cosine_topk_batch(sub, q, qids, k, id_col=id_col, vec_col=vec_col)

    parts = pa.concat_tables(
        ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
    )
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
