"""Persisted vector store: IVF-partitioned parquet + centroid sidecar.

The reference persists vectors in a filesystem vector store with an ANN index
built over it (``storage/filesystem_vector_store.py``,
``storage/hnsw_index_manager.py:23-58``).  The Ray-native analog is a *sink*:
one pass over the embeddings dataset assigns every vector to its nearest
k-means centroid cell and writes the corpus as hive-partitioned parquet
(``cell=K/``), with the (tiny) centroid matrix and a manifest published
atomically next to it.  Search then becomes an I/O-pruned scan: a query
probes ``nprobe`` cells and Ray reads ONLY those cells' files — at 100 TB the
read volume is ``nprobe / n_centroids`` of the corpus, and the per-batch math
is the same exact-cosine kernel as :mod:`.brute`.

Build is resumable the same way the FTS index is: the manifest (fingerprint
keyed on input count + layout params) is written last; a matching manifest
makes ``build_vector_store`` a no-op fast path.

Determinism: seeded k-means (:func:`..ann.ivf.train_centroids`), float64
scoring, ``vec_id`` tie-breaks — with ``nprobe == n_centroids`` search is
exactly brute-force (asserted in tests/test_vector_store.py).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa

from .brute import _to_matrix
from .ivf import train_centroids

VEC_MANIFEST = "vector_manifest.json"
CENTROIDS_FILE = "centroids.npy"
CELLS_DIR = "cells"


def _fingerprint(n_rows: int, dim: int, n_centroids: int, seed: int, vec_col: str) -> str:
    return f"v1:{n_rows}:{dim}:{n_centroids}:{seed}:{vec_col}"


def build_vector_store(
    input_paths,
    out_dir: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    train_max: int = 100_000,
    seed: int = 42,
    resume: bool = True,
) -> dict:
    """One streaming pass: assign → hive-partitioned write → atomic publish.

    Returns the manifest dict.  Centroid training reads at most ``train_max``
    vectors onto the driver (bounded regardless of corpus size); everything
    else is ``map_batches`` + a partitioned ``write_parquet``.
    """
    import ray
    import ray.data as rd

    ds = rd.read_parquet(input_paths, columns=[id_col, vec_col])
    n_rows = ds.count()
    sample_tbls = ray.get(ds.limit(min(train_max, n_rows)).to_arrow_refs())
    sample = np.concatenate([_to_matrix(t[vec_col]) for t in sample_tbls if t.num_rows])
    dim = sample.shape[1]
    fp = _fingerprint(n_rows, dim, n_centroids, seed, vec_col)

    man_path = os.path.join(out_dir, VEC_MANIFEST)
    if resume and os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if man.get("fingerprint") == fp:
            return man  # complete store with identical layout — no-op

    cent = train_centroids(sample, n_centroids, seed=seed)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _to_matrix(batch[vec_col])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = np.argmax(mn @ c.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cells))

    cells_dir = os.path.join(out_dir, CELLS_DIR)
    shutil.rmtree(cells_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        cells_dir, partition_cols=["cell"]
    )
    # the partitioned write emits one file per (task, cell) — coalesce each
    # cell to ~target-byte files before publishing (small-file bound at scale)
    from ..index.compact import coalesce_partition_dirs

    coalesce_partition_dirs(cells_dir, sort_col=id_col)

    tmp = os.path.join(out_dir, CENTROIDS_FILE + ".tmp")
    with open(tmp, "wb") as f:
        np.save(f, cent)
    os.replace(tmp, os.path.join(out_dir, CENTROIDS_FILE))

    man = {
        "fingerprint": fp,
        "n_vectors": int(n_rows),
        "dim": int(dim),
        "n_centroids": int(len(cent)),
        "seed": int(seed),
        "id_col": id_col,
        "vec_col": vec_col,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, man_path)  # manifest last = store complete
    return man


class VectorStoreSearcher:
    """Query a persisted store: probe ``nprobe`` cells, read ONLY their files.

    Output schema matches :func:`..ann.brute.ann_cosine_topk`:
    (query_id, rank, vec_id, cos), rank by cos desc / vec_id asc.
    """

    def __init__(self, store_dir: str):
        with open(os.path.join(store_dir, VEC_MANIFEST)) as f:
            self.manifest = json.load(f)
        self.centroids = np.load(os.path.join(store_dir, CENTROIDS_FILE))
        self.tombstones = np.array(sorted(load_tombstones(store_dir)), dtype=np.int64)
        self.store_dir = store_dir
        self._cell_dirs = {
            int(name.split("=", 1)[1]): os.path.join(store_dir, CELLS_DIR, name)
            for name in os.listdir(os.path.join(store_dir, CELLS_DIR))
            if name.startswith("cell=")
        }

    def probe_dirs(self, queries: np.ndarray, nprobe: int) -> tuple[np.ndarray, list[str]]:
        """(per-query probe matrix, the cell directories a search will read)."""
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        nprobe = min(nprobe, len(self.centroids))
        probes = np.argsort(-(qn @ self.centroids.T), kind="stable", axis=1)[:, :nprobe]
        cells = sorted(int(c) for c in np.unique(probes) if int(c) in self._cell_dirs)
        files = [
            os.path.join(self._cell_dirs[c], f)
            for c in cells
            for f in sorted(os.listdir(self._cell_dirs[c]))
            if f.endswith(".parquet")
        ]
        return probes, files

    def _resolve_nprobe(self, nprobe: int | None, accuracy: str | None) -> int:
        if accuracy is not None:
            # reference --accuracy profile (fast/balanced/high) resolves the
            # probe fraction; an explicit nprobe alongside it is a conflict
            from .accuracy import resolve_nprobe

            if nprobe is not None:
                raise ValueError("pass either accuracy= or nprobe=, not both")
            return resolve_nprobe(accuracy, len(self.centroids))
        return 4 if nprobe is None else nprobe

    def topk(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        k: int,
        *,
        nprobe: int | None = None,
        accuracy: str | None = None,
    ) -> pa.Table:
        import ray
        import ray.data as rd

        nprobe = self._resolve_nprobe(nprobe, accuracy)
        if queries.shape[1] != self.manifest["dim"]:
            raise ValueError(
                f"query dim {queries.shape[1]} != store dim {self.manifest['dim']}"
            )
        id_col, vec_col = self.manifest["id_col"], self.manifest["vec_col"]
        probes, dirs = self.probe_dirs(queries, nprobe)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if not dirs:
            return empty
        # query → probed-cell membership as a dense bool matrix (tiny).
        # Each row's cell is RECOMPUTED from the broadcast centroids (one
        # extra (batch × k) matmul) rather than read back from the hive path —
        # assignment is deterministic, and leaf-dir reads need no partition
        # re-inference.
        allow = np.zeros((len(query_ids), len(self.centroids)), dtype=bool)
        for qi in range(len(query_ids)):
            allow[qi, probes[qi]] = True
        shared = ray.put(
            (queries, query_ids.astype(np.int64), allow, self.centroids, self.tombstones)
        )

        def local(batch: pa.Table) -> pa.Table:
            q, qids, allow_m, cent, tombs = ray.get(shared)
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if len(tombs):
                keep = ~np.isin(ids, tombs)
                if not keep.all():
                    batch = batch.filter(pa.array(keep))
                    ids = ids[keep]
                if len(ids) == 0:
                    return pa.table(
                        {
                            "query_id": pa.array([], pa.int64()),
                            "vec_id": pa.array([], pa.int64()),
                            "cos": pa.array([], pa.float64()),
                        }
                    )
            m = _to_matrix(batch[vec_col])
            mn = m / np.linalg.norm(m, axis=1, keepdims=True)
            cells = np.argmax(mn @ cent.T, axis=1)
            qn = q / np.linalg.norm(q, axis=1, keepdims=True)
            cos = qn @ mn.T  # (n_queries, n_batch)
            out_q, out_v, out_c = [], [], []
            for qi in range(len(qids)):
                mask = allow_m[qi, cells] & (ids != qids[qi])
                cand = np.flatnonzero(mask)
                if not len(cand):
                    continue
                sel = cand[np.argsort(-cos[qi, cand], kind="stable")[:k]]
                out_q.extend([int(qids[qi])] * len(sel))
                out_v.extend(ids[sel].tolist())
                out_c.extend(cos[qi, sel].tolist())
            return pa.table(
                {
                    "query_id": pa.array(out_q, type=pa.int64()),
                    "vec_id": pa.array(out_v, type=pa.int64()),
                    "cos": pa.array(out_c, type=pa.float64()),
                }
            )

        # hive-pruned read: only the probed cells' files are opened
        ds = rd.read_parquet(dirs, columns=[id_col, vec_col])
        parts = pa.concat_tables(
            ray.get(ds.map_batches(local, batch_format="pyarrow").to_arrow_refs())
        )
        if parts.num_rows == 0:
            return empty
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


    def topk_local(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        k: int,
        *,
        nprobe: int | None = None,
        accuracy: str | None = None,
    ) -> pa.Table:
        """Ray-free point-probe path for a latency-bound QUERY TIER: the
        same semantics as :meth:`topk` (tombstone filter, probed-cell allow
        mask, self-exclusion, cos desc / vec_id asc order) but the probed
        cells' files are read in-process with pyarrow — the reference
        daemon's in-process vector-store read
        (``storage/filesystem_vector_store.py``), where :meth:`topk` is the
        batch/pipeline shape.  Hot cell files are held in a small bounded
        table cache (an immutable published store never mutates a file in
        place — publishes swap directories).  Parity-tested against
        :meth:`topk` in tests/test_vector_store.py."""
        import pyarrow.parquet as pq

        nprobe = self._resolve_nprobe(nprobe, accuracy)
        if queries.shape[1] != self.manifest["dim"]:
            raise ValueError(
                f"query dim {queries.shape[1]} != store dim {self.manifest['dim']}"
            )
        id_col, vec_col = self.manifest["id_col"], self.manifest["vec_col"]
        probes, files = self.probe_dirs(queries, nprobe)
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
        )
        if not files:
            return empty
        cache = getattr(self, "_file_cache", None)
        if cache is None:
            cache = self._file_cache = {}
        tabs = []
        for path in files:
            # atomic pop-and-hold (the round-2 LRU-race lesson): never
            # check-then-get under a concurrent evictor
            t = cache.pop(path, None)
            if t is None:
                t = pq.read_table(path, columns=[id_col, vec_col])
            while len(cache) >= 64:
                try:
                    cache.pop(next(iter(cache)))
                except (KeyError, StopIteration, RuntimeError):
                    break
            cache[path] = t
            tabs.append(t)
        tbl = pa.concat_tables(tabs)
        ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(self.tombstones):
            keep = ~np.isin(ids, self.tombstones)
            tbl = tbl.filter(pa.array(keep))
            ids = ids[keep]
        if len(ids) == 0:
            return empty
        m = _to_matrix(tbl[vec_col])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = np.argmax(mn @ self.centroids.T, axis=1)
        qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
        cos = qn @ mn.T
        qids = query_ids.astype(np.int64)
        out_rows: list[tuple[int, int, int, float]] = []
        # topk() emits ascending-query_id row order (np.unique merge) —
        # match it so the two paths are table-identical
        for qi in np.argsort(qids, kind="stable"):
            allow = np.zeros(len(self.centroids), dtype=bool)
            allow[probes[qi]] = True
            mask = allow[cells] & (ids != qids[qi])
            cand = np.flatnonzero(mask)
            if not len(cand):
                continue
            order = np.lexsort((ids[cand], -cos[qi, cand]))[:k]
            sel = cand[order]
            for rank, i in enumerate(sel, 1):
                out_rows.append((int(qids[qi]), rank, int(ids[i]), float(cos[qi, i])))
        return pa.table(
            {
                "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
                "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
                "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
                "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
            }
        )


TOMBSTONE_FILE = "tombstones.json"


def add_to_vector_store(
    store_dir: str,
    input_paths,
    *,
    resurrect: bool = True,
) -> dict:
    """Incremental ADD: assign new vectors with the store's EXISTING
    centroids (no retrain — the IVF analog of delta-merge keeping the base
    index's layout) and append coalesced per-cell files.

    New files are written atomically per cell and the manifest (n_vectors)
    is republished last, so a crash mid-add leaves the previous manifest
    pointing at a still-consistent store (extra cell files without a
    manifest bump are harmless duplicates of the delta and are overwritten
    by the re-run — file names are keyed by the delta's id range).
    ``resurrect``: added ids are removed from the tombstone set.
    """
    import ray
    import ray.data as rd

    with open(os.path.join(store_dir, VEC_MANIFEST)) as f:
        man = json.load(f)
    cent = np.load(os.path.join(store_dir, CENTROIDS_FILE))
    id_col, vec_col = man["id_col"], man["vec_col"]
    cent_ref = ray.put(cent)

    cells_dir = os.path.join(store_dir, CELLS_DIR)

    def assign_write(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        c = ray.get(cent_ref)
        m = _to_matrix(batch[vec_col])
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        cells = np.argmax(mn @ c.T, axis=1).astype(np.int32)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        for cell in np.unique(cells):
            sel = batch.filter(pa.array(cells == cell)).sort_by(id_col)
            d = os.path.join(cells_dir, f"cell={int(cell)}")
            os.makedirs(d, exist_ok=True)
            lo = int(ids[cells == cell].min())
            hi = int(ids[cells == cell].max())
            dst = os.path.join(d, f"part-{lo:012d}-{hi:012d}.parquet")
            tmp = dst + f".tmp-{os.getpid()}"
            pq.write_table(sel, tmp, compression="zstd")
            os.replace(tmp, dst)
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    ds = rd.read_parquet(input_paths, columns=[id_col, vec_col])
    n_added = sum(
        t["n"][0].as_py()
        for t in __import__("ray").get(
            ds.map_batches(assign_write, batch_format="pyarrow").to_arrow_refs()
        )
        if t.num_rows
    )

    if resurrect:
        added_ids = set(
            pa.concat_tables(
                __import__("ray").get(
                    rd.read_parquet(input_paths, columns=[id_col]).to_arrow_refs()
                )
            )[id_col].to_pylist()
        )
        tombs = load_tombstones(store_dir)
        if tombs & added_ids:
            _write_tombstones(store_dir, tombs - added_ids)

    man["n_vectors"] = int(man["n_vectors"]) + int(n_added)
    man["fingerprint"] = man["fingerprint"] + f"+{n_added}"
    tmp = os.path.join(store_dir, VEC_MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(store_dir, VEC_MANIFEST))
    return man


def load_tombstones(store_dir: str) -> set[int]:
    try:
        with open(os.path.join(store_dir, TOMBSTONE_FILE)) as f:
            return set(json.load(f))
    except OSError:
        return set()


def _write_tombstones(store_dir: str, ids: set[int]) -> None:
    tmp = os.path.join(store_dir, TOMBSTONE_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(sorted(int(i) for i in ids), f)
    os.replace(tmp, os.path.join(store_dir, TOMBSTONE_FILE))


def delete_from_vector_store(store_dir: str, ids) -> int:
    """Tombstone DELETE: ids are masked at search time (the delete-then-add
    half of the vector upsert path); physical removal happens when a cell is
    rewritten by a future compaction/add.  Returns the tombstone count."""
    tombs = load_tombstones(store_dir) | {int(i) for i in ids}
    _write_tombstones(store_dir, tombs)
    return len(tombs)
