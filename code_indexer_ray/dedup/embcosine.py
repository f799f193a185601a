"""Embedding-cosine near-duplicate pairs with a corpus-size ROUTER.

Reference analog: semantic near-dup detection over an embedding column
(the vector twin of MinHash near-dup; SURVEY §2 LLM-curation family).

Two implementations, one front door (:func:`embed_near_pairs`):

- **exact** (≤ ``exact_threshold`` vectors): broadcast the L2-normalized
  corpus matrix once (``ray.put``), blocked matmul per batch, emit every
  (a < b, cos ≥ τ) pair.  O(N·d) object-store + O(N²) compute — the
  oracle-verifiable small-corpus twin (the ``dedup_embed_cosine`` catalog
  entry stays on this path at driver scale).
- **lsh** (above the threshold): random-hyperplane (sign) LSH — per batch
  ONE matmul derives ``n_tables`` bucket codes per vector, rows
  (bucket key, vec_id, normalized vec) take ONE coarse hash-partition
  shuffle, and exact cosine runs only INSIDE each bucket (members stacked,
  one small matmul per bucket).  Cross-table duplicate pairs collapse in a
  final (vec_a, vec_b) groupby-max — pair rows are sparse, so that second
  shuffle moves candidates, never the corpus.  Nothing is ever
  driver-resident or broadcast: memory per task is bounded by the
  partition's bucket rows (VERDICT r4 finding #3 — the previous catalog
  glue broadcast the whole corpus matrix unconditionally).

Oversized buckets (degenerate boilerplate collisions) emit the
sorted-adjacent CHAIN instead of C(n,2) pairs — same O(n) bound as
``dedup/minhash.py::candidate_pairs`` — preserving union-find
connectivity for downstream component folding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ann.brute import _to_matrix
from ..ann.lsh import bucket_codes, plane_matrix

DEFAULT_EXACT_THRESHOLD = 200_000
DEFAULT_MAX_BUCKET = 4096


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def embed_near_pairs_exact(ds, tau: float, *, id_col: str = "vec_id",
                           vec_col: str = "embedding"):
    """Exact all-pairs path: broadcast normalized corpus, blocked matmul."""
    import ray

    refs = ray.get(ds.to_arrow_refs())
    parts = [t for t in refs if t.num_rows]
    if not parts:
        return _empty_pairs_ds()
    corpus = pa.concat_tables([t.select([id_col, vec_col]) for t in parts])
    full = _norm_rows(_to_matrix(corpus[vec_col]).astype(np.float64))
    full_ids = corpus[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    shared = ray.put((full, full_ids))

    def pairs(batch: pa.Table) -> pa.Table:
        m, ids_all = ray.get(shared)
        v = _norm_rows(_to_matrix(batch[vec_col]).astype(np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cos = v @ m.T
        bi, ci = np.nonzero(cos >= tau)
        a, b = ids[bi], ids_all[ci]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cos_r": pa.array(np.round(cos[bi, ci][keep], 4)),
            }
        )

    return ds.map_batches(pairs, batch_format="pyarrow")


def _empty_pairs_ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos_r": pa.array([], pa.float64()),
            }
        )
    )


def embed_near_pairs_lsh(
    ds,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 14,
    n_tables: int = 6,
    num_partitions: int = 256,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    seed: int = 42,
):
    """Hyperplane-LSH bucketed path — the >10⁶-vector scale route."""
    import ray
    from ray.data.aggregate import Max

    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")

    first = ds.take(1)
    if not first:
        return _empty_pairs_ds()
    dim = len(first[0][vec_col])
    planes_ref = ray.put(plane_matrix(dim, n_planes, n_tables, seed=seed))
    pmask = np.int64(num_partitions - 1)
    shift = np.int64(n_planes)

    def emit(batch: pa.Table) -> pa.Table:
        planes = ray.get(planes_ref)
        m = _norm_rows(_to_matrix(batch[vec_col]).astype(np.float32))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        codes = bucket_codes(m, planes)  # (n, T)
        n, T = codes.shape
        # bucket key = table_id << n_planes | code  (globally unique per table)
        key = (
            (np.arange(T, dtype=np.int64)[None, :] << shift) | codes
        ).T.reshape(-1)  # table-major
        rep_ids = np.tile(ids, T)
        vecs = np.tile(m, (T, 1))
        # mix the key before masking so adjacent codes spread across partitions
        h = (key.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        pb = (h >> np.uint64(40)).view(np.int64) & pmask
        flat = pa.array(vecs.reshape(-1), type=pa.float32())
        offs = pa.array(np.arange(0, (len(rep_ids) + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "pb": pa.array(pb),
                "bkey": pa.array(key),
                "vid": pa.array(rep_ids),
                "vec": pa.ListArray.from_arrays(offs, flat),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_a": pa.array([], pa.int64()),
                "vec_b": pa.array([], pa.int64()),
                "cos_r": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        key = g["bkey"].to_numpy(zero_copy_only=False)
        vid = g["vid"].to_numpy(zero_copy_only=False)
        mat = _to_matrix(g["vec"]).astype(np.float32)
        order = np.lexsort((vid, key))
        key, vid, mat = key[order], vid[order], mat[order]
        starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
        ends = np.r_[starts[1:], len(key)]
        out_a, out_b, out_c = [], [], []
        for s, e in zip(starts, ends):
            sz = e - s
            if sz < 2:
                continue
            bids = vid[s:e]
            bm = mat[s:e]
            if sz <= max_bucket:
                cos = bm @ bm.T
                ai, bi = np.nonzero(np.triu(cos >= tau, k=1))
            else:  # degenerate bucket: sorted-adjacent chain, O(n)
                cos = None
                adj = np.einsum("ij,ij->i", bm[:-1], bm[1:])
                keep = np.flatnonzero(adj >= tau)
                ai, bi = keep, keep + 1
            if len(ai) == 0:
                continue
            a, b = bids[ai], bids[bi]
            c = (cos[ai, bi] if cos is not None else adj[ai]).astype(np.float64)
            swap = a > b
            a2 = np.where(swap, b, a)
            b2 = np.where(swap, a, b)
            same = a2 != b2  # duplicate ids inside a bucket can't self-pair
            out_a.append(a2[same])
            out_b.append(b2[same])
            out_c.append(c[same])
        if not out_a:
            return empty
        return pa.table(
            {
                "vec_a": pa.array(np.concatenate(out_a), pa.int64()),
                "vec_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cos_r": pa.array(np.round(np.concatenate(out_c), 4)),
            }
        )

    cand = (
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # a pair found in several tables lands in several partitions → collapse
    # (pair rows are sparse: this shuffle moves candidates, not the corpus)
    return cand.groupby(["vec_a", "vec_b"]).aggregate(Max("cos_r", alias_name="cos_r"))


def embed_near_pairs(
    ds,
    tau: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_threshold: int = DEFAULT_EXACT_THRESHOLD,
    **lsh_kwargs,
):
    """Route by corpus size: exact all-pairs under ``exact_threshold``
    vectors (oracle twin), hyperplane-LSH buckets above it (scale path).
    Returns a Dataset of (vec_a, vec_b, cos_r)."""
    n = ds.count()
    if n <= exact_threshold:
        return embed_near_pairs_exact(ds, tau, id_col=id_col, vec_col=vec_col)
    return embed_near_pairs_lsh(ds, tau, id_col=id_col, vec_col=vec_col, **lsh_kwargs)
