"""Persisted HNSW store — the reference's ``storage/hnsw_index_manager.py``
(build index from vectors → save to a binary file + collection metadata →
load and serve fast k-NN) recast shard-parallel:

- **build**: ONE hash shuffle (``vec_id % num_shards``) partitions vectors;
  each shard builds its own deterministic graph inside ``map_groups``
  (hash-seeded levels keyed on vec_id — layout-independent, the same graph
  the in-memory :func:`..ann.hnsw.hnsw_cosine_topk_sharded` builds) and
  serializes it to one ``shard-NNNNN.npz`` (vectors, ids, levels, ragged
  adjacency as offsets+flat).  Manifest lands LAST (publish == complete);
  a matching fingerprint is a no-op fast path (reference: full rebuild
  only — ``hnsw_index_manager.py`` "Build HNSW index ... (full rebuild
  only)").
- **serve**: :class:`HNSWStoreSearcher` lazy-loads shard graphs once per
  process (actor ``__init__`` at scale), answers queries per shard and
  merges ``num_shards × k`` rows — identical results to the in-memory
  sharded build by construction (parity-tested), so the store adds
  persistence without a recall change.

At 100 TB each shard graph lives in its own actor (the FTS shard-searcher
pattern); the npz is the checkpoint that lets a serving tier restart
without re-inserting every vector.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from .hnsw import HNSWIndex, _ef

HNSW_MANIFEST = "hnsw_store.json"


def _graph_arrays(idx: HNSWIndex) -> dict[str, np.ndarray]:
    """Flatten one graph to dense arrays (ragged adjacency → counts+flat)."""
    counts, flat = [], []
    for node_links in idx._links:
        for layer in node_links:
            counts.append(len(layer))
            flat.extend(layer)
    return {
        "vecs": np.asarray(idx._vecs, dtype=np.float64).reshape(len(idx._ids), idx.dim),
        "ids": np.asarray(idx._ids, dtype=np.int64),
        "levels": np.asarray(idx._levels, dtype=np.int32),
        "counts": np.asarray(counts, dtype=np.int32),
        "flat": np.asarray(flat, dtype=np.int32),
        "meta": np.asarray(
            [idx.dim, idx.m, idx.ef_construction, idx.seed, idx._entry if idx._entry is not None else -1, idx._max_level],
            dtype=np.int64,
        ),
    }


def _graph_from_arrays(a) -> HNSWIndex:
    dim, m, efc, seed, entry, max_level = (int(x) for x in a["meta"])
    idx = HNSWIndex(dim, m=m, ef_construction=efc, seed=seed)
    vecs = np.asarray(a["vecs"], dtype=np.float64)
    idx._vecs = [vecs[i] for i in range(len(vecs))]
    idx._ids = [int(x) for x in a["ids"]]
    idx._levels = [int(x) for x in a["levels"]]
    counts = a["counts"]
    flat = a["flat"]
    links: list[list[list[int]]] = []
    ci = fi = 0
    for lvl in idx._levels:
        node = []
        for _ in range(lvl + 1):
            n = int(counts[ci]); ci += 1
            node.append([int(x) for x in flat[fi : fi + n]]); fi += n
        links.append(node)
    idx._links = links
    idx._entry = None if entry < 0 else entry
    idx._max_level = max_level
    return idx


def build_hnsw_store(
    ds,
    out_dir: str,
    *,
    num_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fingerprint: str | None = None,
) -> dict:
    """Build + persist the sharded store from a vector Dataset.  Returns
    the manifest; a complete store with matching params/fingerprint is a
    no-op fast path.  When no fingerprint is given one is derived from the
    input row count (the build_vector_store precedent) so regenerated
    source data can never silently reuse stale graphs."""
    import shutil

    from .brute import _to_matrix

    if fingerprint is None:
        fingerprint = f"rows={ds.count()}"
    mpath = os.path.join(out_dir, HNSW_MANIFEST)
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                man = json.load(f)
            if (
                man.get("num_shards") == num_shards
                and man.get("m") == m
                and man.get("ef_construction") == ef_construction
                and man.get("seed") == seed
                and man.get("fingerprint") == fingerprint
            ):
                return man
        except (OSError, ValueError):
            pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("_shard", pa.array((ids % num_shards).astype(np.int64)))

    def write_shard(g: pa.Table) -> pa.Table:
        sh = int(g["_shard"][0].as_py())
        g = g.sort_by(id_col)  # pin insertion order → deterministic graph
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _to_matrix(g[vec_col])
        idx = HNSWIndex(mat.shape[1], m=m, ef_construction=ef_construction, seed=seed)
        for i, ext in enumerate(ids):
            idx.add(int(ext), mat[i])
        np.savez(os.path.join(out_dir, f"shard-{sh:05d}.npz"), **_graph_arrays(idx))
        return pa.table(
            {
                "shard": pa.array([sh], type=pa.int64()),
                "rows": pa.array([len(ids)], type=pa.int64()),
                "dim": pa.array([mat.shape[1]], type=pa.int64()),
            }
        )

    stats = (
        ds.map_batches(add_shard, batch_format="pyarrow")
        .groupby("_shard")
        .map_groups(write_shard, batch_format="pyarrow")
        .take_all()
    )
    man = {
        "num_shards": num_shards,
        "m": m,
        "ef_construction": ef_construction,
        "seed": seed,
        "fingerprint": fingerprint,
        "dim": int(stats[0]["dim"]) if stats else 0,
        "shards": sorted(
            [{"shard": int(r["shard"]), "rows": int(r["rows"])} for r in stats],
            key=lambda r: r["shard"],
        ),
        "total_rows": int(sum(r["rows"] for r in stats)),
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mpath)  # manifest last = store complete
    return man


class HNSWStoreSearcher:
    """Load-once k-NN over a persisted store (the reference's load_index →
    knn_query path).  Results are rank-identical to the in-memory sharded
    build with the same parameters."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, HNSW_MANIFEST)) as f:
            self.manifest = json.load(f)
        self._graphs: dict[int, HNSWIndex] = {}

    def _graph(self, shard: int) -> HNSWIndex:
        g = self._graphs.get(shard)
        if g is None:
            with np.load(os.path.join(self.root, f"shard-{shard:05d}.npz")) as a:
                g = _graph_from_arrays(a)
            self._graphs[shard] = g
        return g

    def topk(
        self,
        queries: np.ndarray,
        query_ids: np.ndarray,
        k: int,
        *,
        ef_search: int | None = None,
        accuracy: str | None = None,
    ) -> pa.Table:
        if queries.shape[1] != self.manifest["dim"]:
            raise ValueError(
                f"query dim {queries.shape[1]} != store dim {self.manifest['dim']}"
            )
        ef = _ef(ef_search, accuracy, k)
        rows = []
        qids = query_ids.astype(np.int64)
        for qi in range(len(qids)):
            merged: list[tuple[int, float]] = []
            for ent in self.manifest["shards"]:
                hits = self._graph(ent["shard"]).search(queries[qi], k + 1, ef=ef)
                # per-shard cut to k AFTER the self-filter — the exact merge
                # the in-memory sharded build performs (rank-identity
                # contract holds through cross-shard cosine ties)
                merged.extend([(v, c) for v, c in hits if v != int(qids[qi])][:k])
            merged.sort(key=lambda t: (-t[1], t[0]))
            for rank, (v, c) in enumerate(merged[:k], 1):
                rows.append((int(qids[qi]), rank, v, float(c)))
        return pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "rank": pa.array([r[1] for r in rows], type=pa.int64()),
                "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
                "cos": pa.array([r[3] for r in rows], type=pa.float64()),
            }
        )
