"""HNSW approximate nearest neighbour (Malkov & Yashunin 2016) — the
reference's actual ANN structure (``storage/hnsw_index_manager.py:23-58``
wraps hnswlib), implemented from the published algorithm.

Graph semantics follow the paper: exponentially-distributed insert levels,
greedy ``SEARCH-LAYER`` beam with ``ef`` candidates, simple top-M neighbour
selection, bidirectional links with degree pruning (``M`` per layer, ``2M``
at layer 0).  Cosine similarity on L2-normalized vectors (distance =
1 − cos).

Determinism: insert levels come from a hash-seeded RNG keyed on the vector
id, so the graph is identical across runs AND independent of Ray block
layout; candidate heaps tie-break on id.

Scale shape: one HNSW instance is an IN-MEMORY per-partition index — the
reference builds one per repository; at web scale each doc-range shard's
actor holds its own graph and the driver merges per-shard top-k (the same
fan-out the FTS path uses).  The driver-side build here mirrors the
reference's per-repo scope.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pyarrow as pa

from .brute import _to_matrix


def _ef(ef_search: int | None, accuracy: str | None, k: int) -> int:
    """Reference --accuracy profile → beam width; explicit ef_search is the
    precise override (default 64 when neither is given).  Passing BOTH is a
    parameter conflict, same contract as the IVF nprobe/accuracy pair."""
    if accuracy is not None:
        if ef_search is not None:
            raise ValueError("pass either accuracy= or ef_search=, not both")
        from .accuracy import resolve_ef

        return resolve_ef(accuracy, k)
    return 64 if ef_search is None else ef_search


class HNSWIndex:
    def __init__(self, dim: int, *, m: int = 8, ef_construction: int = 64, seed: int = 42):
        self.dim = dim
        self.m = m
        self.m0 = 2 * m
        self.ef_construction = ef_construction
        self.ml = 1.0 / math.log(m)
        self.seed = seed
        self._vecs: list[np.ndarray] = []
        self._ids: list[int] = []
        self._levels: list[int] = []
        self._links: list[list[list[int]]] = []  # node → per-layer neighbour lists
        self._entry: int | None = None
        self._max_level = -1

    # ---- internals ----
    def _dist(self, q: np.ndarray, node: int) -> float:
        return 1.0 - float(q @ self._vecs[node])

    def _level_for(self, ext_id: int) -> int:
        # hash-seeded per-id uniform → deterministic, layout-independent
        rng = np.random.default_rng((self.seed << 32) ^ (ext_id & 0xFFFFFFFF))
        u = max(rng.random(), 1e-12)
        return int(-math.log(u) * self.ml)

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int, layer: int) -> list[tuple[float, int]]:
        """Beam search on one layer: returns up to ef (dist, node) ascending."""
        visited = set(eps)
        cand: list[tuple[float, int]] = []   # min-heap by dist
        best: list[tuple[float, int]] = []   # max-heap via negated dist
        for e in eps:
            d = self._dist(q, e)
            heapq.heappush(cand, (d, e))
            heapq.heappush(best, (-d, e))
        while cand:
            d, c = heapq.heappop(cand)
            if d > -best[0][0]:
                break
            for nb in self._links[c][layer]:
                if nb in visited:
                    continue
                visited.add(nb)
                dn = self._dist(q, nb)
                if len(best) < ef or dn < -best[0][0]:
                    heapq.heappush(cand, (dn, nb))
                    heapq.heappush(best, (-dn, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        out = sorted(((-nd, n) for nd, n in best), key=lambda t: (t[0], self._ids[t[1]]))
        return out

    def _select(self, found: list[tuple[float, int]], m: int) -> list[int]:
        """SELECT-NEIGHBORS-HEURISTIC (paper Alg. 4): keep a candidate only
        if it is closer to the query point than to every already-kept
        neighbor — the diversity rule that keeps the graph connected (plain
        top-M orphans nodes inside tight clusters)."""
        kept: list[int] = []
        skipped: list[int] = []
        for d, n in found:
            if len(kept) >= m:
                break
            vn = self._vecs[n]
            if all(1.0 - float(vn @ self._vecs[kq]) > d for kq in kept):
                kept.append(n)
            else:
                skipped.append(n)
        # keepPrunedConnections: fill remaining slots from the skipped list
        for n in skipped:
            if len(kept) >= m:
                break
            kept.append(n)
        return kept

    # ---- public ----
    def add(self, ext_id: int, vec: np.ndarray) -> None:
        v = np.asarray(vec, dtype=np.float64)
        v = v / (np.linalg.norm(v) or 1.0)
        node = len(self._vecs)
        level = self._level_for(ext_id)
        self._vecs.append(v)
        self._ids.append(int(ext_id))
        self._levels.append(level)
        self._links.append([[] for _ in range(level + 1)])
        if self._entry is None:
            self._entry = node
            self._max_level = level
            return
        eps = [self._entry]
        for lyr in range(self._max_level, level, -1):
            eps = [self._search_layer(v, eps, 1, lyr)[0][1]]
        for lyr in range(min(level, self._max_level), -1, -1):
            found = self._search_layer(v, eps, self.ef_construction, lyr)
            mcap = self.m0 if lyr == 0 else self.m
            neigh = self._select(found, mcap)
            self._links[node][lyr] = list(neigh)
            for nb in neigh:
                lnk = self._links[nb][lyr]
                lnk.append(node)
                if len(lnk) > mcap:
                    # re-select with the same diversity heuristic (degree bound)
                    ds = sorted(
                        (self._dist(self._vecs[nb], x), self._ids[x], x) for x in lnk
                    )
                    self._links[nb][lyr] = self._select([(d, x) for d, _, x in ds], mcap)
            eps = [n for _, n in found]
        if level > self._max_level:
            self._max_level = level
            self._entry = node

    def search(self, q: np.ndarray, k: int, *, ef: int | None = None) -> list[tuple[int, float]]:
        """Top-k (ext_id, cosine) — cos desc, id asc tie-break."""
        if self._entry is None:
            return []
        qv = np.asarray(q, dtype=np.float64)
        qv = qv / (np.linalg.norm(qv) or 1.0)
        ef = max(ef or 64, k)
        eps = [self._entry]
        for lyr in range(self._max_level, 0, -1):
            eps = [self._search_layer(qv, eps, 1, lyr)[0][1]]
        found = self._search_layer(qv, eps, ef, 0)
        out = [(self._ids[n], 1.0 - d) for d, n in found[:k]]
        out.sort(key=lambda t: (-t[1], t[0]))
        return out


def hnsw_cosine_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int | None = None,
    seed: int = 42,
    accuracy: str | None = None,
) -> pa.Table:
    """Build one in-memory HNSW over the dataset (the reference's per-repo
    scope; per-shard actors at web scale) and answer all queries.

    Insertion order is pinned to ascending id so the graph is independent of
    Ray block layout.  Self-matches excluded; output schema matches
    :func:`..ann.brute.ann_cosine_topk`.
    """
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    tbl = pa.concat_tables(tbls).sort_by(id_col)
    ids = tbl[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = _to_matrix(tbl[vec_col])
    idx = HNSWIndex(mat.shape[1], m=m, ef_construction=ef_construction, seed=seed)
    for i, ext in enumerate(ids):
        idx.add(int(ext), mat[i])
    rows = []
    for qi in range(len(query_ids)):
        hits = idx.search(queries[qi], k + 1, ef=_ef(ef_search, accuracy, k))
        hits = [(v, c) for v, c in hits if v != int(query_ids[qi])][:k]
        for rank, (v, c) in enumerate(hits, 1):
            rows.append((int(query_ids[qi]), rank, v, float(c)))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )


def hnsw_cosine_topk_sharded(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_shards: int = 4,
    m: int = 8,
    ef_construction: int = 64,
    ef_search: int | None = None,
    seed: int = 42,
    accuracy: str | None = None,
) -> pa.Table:
    """Distributed HNSW: ONE hash shuffle partitions vectors into
    ``num_shards`` groups, each group builds its own graph inside
    ``map_groups`` (bounded by the shard, never the corpus) and answers the
    broadcast queries; the driver merges ``num_shards × k`` rows — the same
    per-shard fan-out the FTS path uses, and how a 100-TB corpus actually
    deploys HNSW (one graph per doc-range shard in an actor).

    Per-shard graphs are deterministic (hash-seeded levels keyed on vec_id),
    so results are independent of Ray block layout AND of num_shards'
    *placement* (though num_shards itself changes which candidates each
    graph sees — it is part of the config, like nprobe)."""
    import ray

    qref = ray.put((queries, query_ids.astype(np.int64)))

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "_shard", pa.array((ids % num_shards).astype(np.int64))
        )

    def per_shard(g: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)
        g = g.sort_by(id_col)  # pin insertion order
        ids = g[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _to_matrix(g[vec_col])
        idx = HNSWIndex(mat.shape[1], m=m, ef_construction=ef_construction, seed=seed)
        for i, ext in enumerate(ids):
            idx.add(int(ext), mat[i])
        rows_q, rows_v, rows_c = [], [], []
        for qi in range(len(qids)):
            hits = idx.search(q[qi], k + 1, ef=_ef(ef_search, accuracy, k))
            hits = [(v, c) for v, c in hits if v != int(qids[qi])][:k]
            rows_q.extend([int(qids[qi])] * len(hits))
            rows_v.extend(v for v, _ in hits)
            rows_c.extend(c for _, c in hits)
        return pa.table(
            {
                "query_id": pa.array(rows_q, type=pa.int64()),
                "vec_id": pa.array(rows_v, type=pa.int64()),
                "cos": pa.array(rows_c, type=pa.float64()),
            }
        )

    tbls = [
        t.select(["query_id", "vec_id", "cos"])
        for t in ray.get(
            ds.map_batches(add_shard, batch_format="pyarrow")
            .groupby("_shard")
            .map_groups(per_shard, batch_format="pyarrow")
            .to_arrow_refs()
        )
        if t.num_rows  # empty groups emit schema-less/input-schema blocks
    ]
    parts = pa.concat_tables(tbls) if tbls else None
    rows = []
    if parts is not None and parts.num_rows:
        qs_ = parts["query_id"].to_numpy(zero_copy_only=False)
        vs = parts["vec_id"].to_numpy(zero_copy_only=False)
        cs = parts["cos"].to_numpy(zero_copy_only=False)
        for qid in np.unique(qs_):
            mask = qs_ == qid
            order = np.lexsort((vs[mask], -cs[mask]))[:k]
            idx_ = np.flatnonzero(mask)[order]
            for rank, i in enumerate(idx_, 1):
                rows.append((int(qid), rank, int(vs[i]), float(cs[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in rows], type=pa.float64()),
        }
    )
