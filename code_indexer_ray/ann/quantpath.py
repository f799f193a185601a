"""Quantized-path vector store — the reference's filesystem vector layout.

Reference: ``storage/vector_quantizer.py`` (random projection → fixed-range
2-bit quantization → 32-char hex path → directory segments) +
``storage/projection_matrix_manager.py`` (deterministic seeded Gaussian /
√out_dim, cached per collection) + ``storage/filesystem_vector_store.py``
(vectors stored under their hex-path directories).  The hex path is
LOCALITY-PRESERVING by construction (fixed thresholds for all vectors), so
nearby vectors share path prefixes and a prefix bucket is a candidate set.

Ray-native recast:

- **Quantizer**: identical math, vectorized over a batch — project (float64),
  round to 6 dp (frozen, the JPEG-quantizer precedent: makes the kernel
  closed-form in SQL; ties at quantization boundaries cannot occur on the
  6-dp grid), clip to [-2, 2], map to {0..3} via ×3.999 floor, pack pairs
  into 32 hex chars.
- **Store**: hive-partitioned parquet keyed by the FIRST path segment (two
  hex chars = the reference's first directory level, ≤256 buckets); the
  projection matrix rides the store as ``projection.npy`` exactly like the
  reference's ``projection_matrix.npy``.
- **Search**: quantize the query, rank buckets by nibble-wise quantized
  distance on the prefix, read the ``nprobe`` nearest buckets only, exact
  cosine inside — the IVF shape with the reference's bucketing function
  (recall-gated like the other approximate ANN entries).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

MANIFEST = "quantpath.json"
PROJ_FILE = "projection.npy"


def projection_matrix(input_dim: int, output_dim: int = 64, seed: int | None = None) -> np.ndarray:
    """Deterministic Gaussian projection / sqrt(output_dim) — byte-for-byte
    the reference construction (projection_matrix_manager.py:26-56,
    including the legacy np.random.seed API and the auto-seed hash)."""
    if seed is None:
        # stable auto-seed (the reference uses hash(), which is
        # PYTHONHASHSEED-salted and NOT reproducible across processes —
        # crc32 keeps the documented determinism actually true)
        import zlib

        seed = zlib.crc32(f"projection_matrix_{input_dim}_{output_dim}".encode())
    np.random.seed(seed)
    m = np.random.randn(input_dim, output_dim)
    m /= np.sqrt(output_dim)
    return m


def hash_projection_matrix(
    input_dim: int, output_dim: int = 64, salt: str = "qp"
) -> np.ndarray:
    """Deterministic md5-derived UNIFORM projection with the same 1/out_dim
    variance as the reference's Gaussian/√out (Achlioptas-style
    database-friendly random projection): m[i][j] = (md5_lower64("salt:i:j")
    / 2⁶⁴ − 0.5)·√(12/out).  Every step is exact IEEE double on both sides,
    so the SQL twin derives the SAME matrix with ``md5_number_lower`` — the
    hash-embedder precedent (text/embed.py) applied to the projection."""
    from ..dedup.minhash import md5_lower64

    h = np.array(
        [
            [md5_lower64(f"{salt}:{i}:{j}") for j in range(output_dim)]
            for i in range(input_dim)
        ],
        dtype=np.uint64,
    )
    return (h.astype(np.float64) / 2.0**64 - 0.5) * np.sqrt(12.0 / output_dim)


_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def quantize_batch(mat: np.ndarray, proj: np.ndarray) -> list[str]:
    """(n, input_dim) float matrix → n 32-char hex paths (vectorized;
    reference quantize_vector semantics with the frozen 6-dp pre-round)."""
    if proj.shape[1] != 64:
        raise ValueError("output_dim must be 64 for 32-character hex paths")
    p = np.round(mat.astype(np.float64) @ proj, 6)
    c = np.clip(p, -2.0, 2.0)
    q = np.clip(((c + 2.0) / 4.0 * 3.999).astype(np.uint8), 0, 3)
    nib = (q[:, 0::2] << 2) | q[:, 1::2]  # (n, 32) values 0..15
    chars = _HEX[nib]  # (n, 32) ascii bytes
    return [bytes(row).decode("ascii") for row in chars]


def path_segments(hexpath: str, depth_factor: int = 4) -> list[str]:
    """Reference _split_hex_path: depth_factor 2-char segments + remainder."""
    segs = [hexpath[i * 2 : i * 2 + 2] for i in range(depth_factor)]
    segs.append(hexpath[depth_factor * 2 :])
    return segs


def build_quantpath_store(
    ds,
    out_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    input_dim: int | None = None,
    projection: str = "hash",
) -> dict:
    """Quantize every vector and write the store: hive-partitioned parquet
    by the first path segment (``q0``), projection matrix + manifest beside
    it (manifest written LAST — a complete store has one)."""
    import shutil

    mpath = os.path.join(out_dir, MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            man = json.load(f)
        # reuse only when the build parameters match (content staleness is
        # the caller's contract, as with the other stores)
        if man.get("projection") == projection and man.get("seed") == seed:
            return man
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    if input_dim is None:
        first = ds.take(1)
        input_dim = len(first[0][vec_col])
    if projection == "hash":
        proj = hash_projection_matrix(int(input_dim), 64)
    elif projection == "gauss":
        proj = projection_matrix(int(input_dim), 64, seed)
    else:
        raise ValueError(f"unknown projection {projection!r}")
    np.save(os.path.join(out_dir, PROJ_FILE), proj)
    import ray

    pref = ray.put(proj)

    def tag(batch: pa.Table) -> pa.Table:
        pm = ray.get(pref)
        emb = batch[vec_col]
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        mat = np.asarray(emb.to_pylist(), dtype=np.float64)
        if len(mat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    vec_col: batch[vec_col],
                    "hexpath": pa.array([], pa.string()),
                    "q0": pa.array([], pa.string()),
                }
            )
        hexes = quantize_batch(mat, pm)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                vec_col: batch[vec_col],
                "hexpath": pa.array(hexes, type=pa.string()),
                "q0": pa.array([h[:2] for h in hexes], type=pa.string()),
            }
        )

    data_dir = os.path.join(out_dir, "data")
    tagged = ds.map_batches(tag, batch_format="pyarrow")
    tagged.write_parquet(data_dir, partition_cols=["q0"])
    buckets = sorted(
        d.split("=", 1)[1] for d in os.listdir(data_dir) if d.startswith("q0=")
    )
    man = {
        "input_dim": int(input_dim),
        "projection": projection,
        "seed": seed,
        "id_col": id_col,
        "vec_col": vec_col,
        "n_buckets": len(buckets),
        "buckets": buckets,
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mpath)
    return man


def _prefix_dist(a: str, b: str) -> int:
    """Quantized-level distance between two 2-hex-char prefixes: the sum of
    |level difference| over the 4 packed 2-bit dims (locality metric of the
    fixed-threshold quantizer)."""
    d = 0
    for ca, cb in zip(a, b):
        na, nb = int(ca, 16), int(cb, 16)
        d += abs((na >> 2) - (nb >> 2)) + abs((na & 3) - (nb & 3))
    return d


class QuantPathSearcher:
    """Point lookups + nprobe-bucket approximate top-k over a built store."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.proj = np.load(os.path.join(root, PROJ_FILE))
        self._buckets = list(self.manifest["buckets"])

    def _bucket_table(self, b: str) -> pa.Table:
        return pads.dataset(
            os.path.join(self.root, "data", f"q0={b}")
        ).to_table()

    def lookup(self, hex_prefix: str) -> pa.Table:
        """All vectors whose path starts with ``hex_prefix`` (≥2 chars):
        ONE bucket read + a prefix filter — the reference's O(1)
        path-addressed fetch."""
        import pyarrow.compute as pc

        b = hex_prefix[:2]
        if b not in self._buckets:
            return pa.table(
                {
                    self.manifest["id_col"]: pa.array([], pa.int64()),
                    "hexpath": pa.array([], pa.string()),
                }
            )
        t = self._bucket_table(b)
        m = pc.starts_with(t["hexpath"], hex_prefix)
        return t.filter(m).select([self.manifest["id_col"], "hexpath"])

    def topk(
        self, queries: np.ndarray, query_ids: np.ndarray, k: int, *, nprobe: int = 8
    ) -> pa.Table:
        """(query_id, rank, vec_id, cos): exact cosine inside the ``nprobe``
        buckets nearest (prefix quantized distance, then bucket id) to each
        query's own bucket — I/O ∝ nprobe/n_buckets, never the corpus."""
        id_col, vec_col = self.manifest["id_col"], self.manifest["vec_col"]
        qhex = quantize_batch(np.asarray(queries, dtype=np.float64), self.proj)
        out_q, out_r, out_v, out_c = [], [], [], []
        for qi, (qvec, qh) in enumerate(zip(queries, qhex)):
            order = sorted(self._buckets, key=lambda b: (_prefix_dist(qh[:2], b), b))
            cand = order[:nprobe]
            if not cand:
                continue
            tabs = [self._bucket_table(b) for b in cand]
            t = pa.concat_tables(tabs)
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            mat = np.asarray(t[vec_col].to_pylist(), dtype=np.float64)
            keep = ids != int(query_ids[qi])  # family convention: no self-match
            ids, mat = ids[keep], mat[keep]
            if len(ids) == 0:
                continue
            qn = qvec / (np.linalg.norm(qvec) or 1.0)
            nm = np.linalg.norm(mat, axis=1)
            nm[nm == 0] = 1.0
            cos = (mat @ qn) / nm
            top = np.argsort(-cos, kind="stable")[:k]
            # deterministic tie order: (-cos round9, vec_id)
            rows = sorted(
                ((ids[i], float(cos[i])) for i in top),
                key=lambda r: (-round(r[1], 9), r[0]),
            )
            for rank, (vid, c) in enumerate(rows, 1):
                out_q.append(int(query_ids[qi]))
                out_r.append(rank)
                out_v.append(int(vid))
                out_c.append(c)
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "rank": pa.array(out_r, type=pa.int64()),
                "vec_id": pa.array(out_v, type=pa.int64()),
                "cos": pa.array(out_c, type=pa.float64()),
            }
        )
