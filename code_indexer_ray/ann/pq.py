"""Product-quantization ANN (Jégou, Douze & Schmid 2011): the
memory-compressed scale path next to LSH (:mod:`.lsh`) and IVF
(:mod:`.ivf`/:mod:`.store`).

Vectors are L2-normalized, split into ``m`` subspaces, and each subvector is
replaced by the id of its nearest subspace centroid — ``m`` bytes per vector
instead of ``4·dim``.  A query builds one (m × ks) lookup table of subspace
dot products; the asymmetric-distance (ADC) score of any code is ``m`` table
lookups.  Here ADC produces a per-batch SHORTLIST that is re-scored with
exact cosine (the vectors are in the batch anyway — the standard ADC+refine
arrangement), so recall tracks the shortlist width, not quantization error.

At 100 TB the codes + codebooks ARE the resident index (~16 B/vector in RAM
per billion vectors); the full-precision vectors stay in cold storage and
are fetched only for shortlisted candidates — exactly the refine pattern
this kernel exercises per batch.

Determinism: seeded Lloyd iterations, float64, fixed tie-breaks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .brute import _to_matrix


def train_pq(
    sample: np.ndarray, m: int = 16, ks: int = 32, *, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means → codebooks (m, ks, dim/m)."""
    x = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    n, dim = x.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    k = min(ks, n)
    rng = np.random.default_rng(seed)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cent = sub[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(x: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) normalized vectors → (n, m) uint8 codes."""
    m, _, dsub = books.shape
    codes = np.empty((len(x), m), dtype=np.uint8)
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = np.argmin(d2, axis=1)
    return codes


def adc_tables(queries_n: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(Q, dim) normalized queries → (Q, m, ks) dot-product lookup tables."""
    m, ks, dsub = books.shape
    lut = np.empty((len(queries_n), m, ks), dtype=np.float64)
    for j in range(m):
        lut[:, j, :] = queries_n[:, j * dsub : (j + 1) * dsub] @ books[j].T
    return lut


def pq_cosine_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 16,
    ks: int = 32,
    shortlist: int = 4,
    train_max: int = 100_000,
    seed: int = 42,
) -> pa.Table:
    """ADC shortlist (top ``shortlist·k`` per query per batch) + exact-cosine
    refine; same output schema/tie-breaks as :func:`..ann.brute.ann_cosine_topk`."""
    import ray

    sample_tbls = ray.get(ds.limit(train_max).to_arrow_refs())
    sample = np.concatenate([_to_matrix(t[vec_col]) for t in sample_tbls if t.num_rows])
    books = train_pq(sample, m, ks, seed=seed)
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    lut = adc_tables(qn, books)
    shared = ray.put((qn, query_ids.astype(np.int64), books, lut))
    R = shortlist * k

    def local(batch: pa.Table) -> pa.Table:
        q, qids, bks, tables = ray.get(shared)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = _to_matrix(batch[vec_col])
        xn = x / np.linalg.norm(x, axis=1, keepdims=True)
        codes = pq_encode(xn, bks)
        nq, mm = len(qids), bks.shape[0]
        out_q, out_v, out_c = [], [], []
        # ADC: m table lookups per (query, code)
        approx = np.zeros((nq, len(ids)), dtype=np.float64)
        for j in range(mm):
            approx += tables[:, j, codes[:, j]]
        for qi in range(nq):
            mask = ids != qids[qi]
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            short = cand[np.argsort(-approx[qi, cand], kind="stable")[:R]]
            exact = xn[short] @ q[qi]  # refine: exact cosine on the shortlist
            sel = short[np.lexsort((ids[short], -exact))[:k]]
            out_q.extend([int(qids[qi])] * len(sel))
            out_v.extend(ids[sel].tolist())
            out_c.extend((xn[sel] @ q[qi]).tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )

    parts = pa.concat_tables(
        ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
    )
    out_rows = []
    if parts.num_rows:
        qs = parts["query_id"].to_numpy(zero_copy_only=False)
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
