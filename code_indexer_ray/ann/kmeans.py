"""Distributed fixed-point k-means over an embedding column.

Lloyd's algorithm with a FIXED iteration count and fully integer (fixed-
point) arithmetic, so a DuckDB SQL twin reproduces assignments and distances
bit-exactly: embeddings quantize to ``q = floor(x * SCALE + 0.5)`` (int64,
float32→float64 is exact so both sides see identical doubles), squared-L2
distances are exact BIGINT sums, and each centroid update is
``floor(sum / count)`` at the same scale (an empty cluster keeps its previous
centroid; ties in the argmin go to the smallest cluster index).

The reference has no clustering; this is the training-data-pipeline
extension (corpus clustering for mixture balancing / curation, in the
cluster-based data-selection family, e.g. Tirumala et al. 2023 D4).

Scale shape: centroids (k × dim int64) are broadcast once per iteration via
``ray.put`` and read inside each task; every ``map_batches`` task computes
batch-local assignments and emits ONLY k rows of (count, per-dim sums) — the
shuffle-free moment-partial pattern, so the driver folds k·dim integers per
block regardless of corpus size.  The corpus is re-read per iteration (at
100 TB you would materialize the quantized column once and iterate over
that); the final labeling pass streams out (vec_id, cluster, dist).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCALE = 1000


def quantize_embeddings(col, scale: int = SCALE) -> np.ndarray:
    """list<float> column → (n, dim) int64 fixed-point matrix.

    floor(x*scale + 0.5) — round-half-up, identical to the SQL twin's
    ``floor(CAST(e AS DOUBLE) * scale + 0.5)`` for every representable float.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    dim = len(flat) // max(n, 1)
    return np.floor(flat * scale + 0.5).astype(np.int64).reshape(n, dim)


def _assign(q: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Exact integer argmin over squared L2; ties → smallest cluster index
    (np.argmin picks the first minimum)."""
    # (n, k): |q|² - 2 q·C + |C|², all int64 (exact; values ≪ 2⁶³)
    d2 = (
        (q * q).sum(axis=1, keepdims=True)
        - 2 * (q @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    a = d2.argmin(axis=1)
    return a, d2[np.arange(len(a)), a]


def kmeans_fixed(ds, *, k: int = 8, iters: int = 2, scale: int = SCALE,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
    """Run ``iters`` centroid updates then a final labeling pass.

    Seeds are the embeddings of the ``k`` smallest ids (deterministic, no
    RNG — matches the SQL twin's ``ORDER BY vec_id LIMIT k``).  Returns a
    ``ray.data.Dataset`` with columns (vec_id, cluster, dist) — all BIGINT,
    dist the exact fixed-point squared L2 to the final centroid.
    """
    import ray

    cents = kmeans_centroids(
        ds, k=k, iters=iters, scale=scale, id_col=id_col, vec_col=vec_col
    )

    ref = ray.put(cents)

    def label(batch: pa.Table, _ref=ref) -> pa.Table:
        cur = ray.get(_ref)
        q = quantize_embeddings(batch[vec_col], scale)
        a, d = _assign(q, cur)
        return pa.table(
            {
                "vec_id": batch[id_col].cast(pa.int64()),
                "cluster": pa.array(a.astype(np.int64)),
                "dist": pa.array(d),
            }
        )

    return ds.map_batches(label, batch_format="pyarrow")


def kmeans_centroids(ds, *, k: int = 8, iters: int = 2, scale: int = SCALE,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> np.ndarray:
    """The converged ``(k, dim)`` int64 centroid matrix of
    :func:`kmeans_fixed` (same seeds / updates), without the labeling pass —
    for consumers that broadcast the centroids into their own stages
    (e.g. SemDeDup's cluster-then-prune)."""
    import ray

    # --- seeds: per-batch bottom-k by id, folded on the driver (k rows) ---
    def seed_partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids, kind="stable")[:k]
        q = quantize_embeddings(batch[vec_col], scale)[order]
        return pa.table(
            {
                "vec_id": pa.array(ids[order]),
                "q": pa.array(list(q), type=pa.list_(pa.int64())),
            }
        )

    parts = [
        t
        for t in ray.get(ds.map_batches(seed_partial, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows
    ]
    seeds = pa.concat_tables(parts)
    ids = seeds["vec_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")[:k]
    if len(order) < k:
        raise ValueError(f"k={k} exceeds the {len(order)} input rows")
    cents = np.stack(
        [np.asarray(seeds["q"][int(i)].as_py(), dtype=np.int64) for i in order]
    )

    # --- Lloyd iterations: broadcast centroids, fold k×dim partials ---
    for _ in range(iters):
        ref = ray.put(cents)

        def partial(batch: pa.Table, _ref=ref) -> pa.Table:
            cur = ray.get(_ref)
            q = quantize_embeddings(batch[vec_col], scale)
            a, _ = _assign(q, cur)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            sums = np.zeros((k, q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            return pa.table(
                {
                    "c": pa.array(np.arange(k, dtype=np.int64)),
                    "n": pa.array(counts),
                    "s": pa.array(list(sums), type=pa.list_(pa.int64())),
                }
            )

        parts = [
            t
            for t in ray.get(ds.map_batches(partial, batch_format="pyarrow").to_arrow_refs())
            if t.num_rows
        ]
        folded = pa.concat_tables(parts)
        cs = folded["c"].to_numpy(zero_copy_only=False)
        ns = folded["n"].to_numpy(zero_copy_only=False)
        dim = cents.shape[1]
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(counts, cs, ns)
        svals = folded["s"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
        np.add.at(sums, cs, svals.reshape(len(cs), dim))
        new = cents.copy()  # empty cluster keeps its previous centroid
        nz = counts > 0
        # floor(sum/count) via float64 division — sums ≪ 2⁵³ so the quotient
        # is the same double DuckDB computes; floor of it matches exactly
        new[nz] = np.floor(sums[nz].astype(np.float64) / counts[nz, None]).astype(np.int64)
        cents = new

    return cents


def kmeans_ctes(*, k: int = 8, iters: int = 2, scale: int = SCALE,
                source: str = "embeddings") -> tuple[list[str], str]:
    """The unrolled twin's CTE list plus the name of the final-assignment
    CTE (``asg{iters+1}``, columns vec_id/c/dist) — so other twins
    (SemDeDup) can build on the identical clustering.  ``source`` names the
    (vec_id, embedding) relation to cluster — a view or an earlier CTE."""
    ctes, final = _kmeans_ctes(k=k, iters=iters, scale=scale, source=source)
    return ctes, final


def kmeans_sql(*, k: int = 8, iters: int = 2, scale: int = SCALE) -> str:
    """Unrolled DuckDB twin of :func:`kmeans_fixed` — same seeds, same
    fixed-point quantization, same floor(sum/count) update, same
    (dist, cluster) argmin tiebreak; generated per iteration count."""
    ctes, final = _kmeans_ctes(k=k, iters=iters, scale=scale, source="embeddings")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        f"SELECT vec_id::BIGINT AS vec_id, c::BIGINT AS cluster, dist::BIGINT AS dist FROM {final}"
    )


def _kmeans_ctes(*, k: int, iters: int, scale: int, source: str = "embeddings") -> tuple[list[str], str]:
    ctes = [
        (
            "qv AS (SELECT vec_id, d, CAST(floor(CAST(e AS DOUBLE) * "
            f"{scale} + 0.5) AS BIGINT) AS q FROM (SELECT vec_id, "
            "unnest(embedding) AS e, generate_subscripts(embedding, 1) - 1 AS d "
            f"FROM {source}) u)"
        ),
        (
            "seeds AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS c "
            f"FROM (SELECT vec_id FROM {source} ORDER BY vec_id LIMIT {k}))"
        ),
        "c0 AS (SELECT s.c, q.d, q.q AS qc FROM seeds s JOIN qv q USING (vec_id))",
    ]
    cur = "c0"
    for i in range(1, iters + 1):
        ctes.append(
            f"dist{i} AS (SELECT q.vec_id, c.c, sum((q.q - c.qc) * (q.q - c.qc)) AS dist\n"
            f"  FROM qv q JOIN {cur} c ON q.d = c.d GROUP BY q.vec_id, c.c)"
        )
        ctes.append(
            f"asg{i} AS (SELECT vec_id, c, dist FROM (SELECT vec_id, c, dist,\n"
            f"  row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dist{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"cs{i} AS (SELECT a.c, q.d, CAST(floor(sum(q.q)::DOUBLE / count(*)) AS BIGINT) AS qc\n"
            f"  FROM asg{i} a JOIN qv q USING (vec_id) GROUP BY a.c, q.d)"
        )
        ctes.append(
            f"c{i} AS (SELECT * FROM cs{i} UNION ALL SELECT p.* FROM {cur} p\n"
            f"  WHERE p.c NOT IN (SELECT DISTINCT c FROM cs{i}))"
        )
        cur = f"c{i}"
    f = iters + 1
    ctes.append(
        f"dist{f} AS (SELECT q.vec_id, c.c, sum((q.q - c.qc) * (q.q - c.qc)) AS dist\n"
        f"  FROM qv q JOIN {cur} c ON q.d = c.d GROUP BY q.vec_id, c.c)"
    )
    ctes.append(
        f"asg{f} AS (SELECT vec_id, c, dist FROM (SELECT vec_id, c, dist,\n"
        f"  row_number() OVER (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM dist{f}) WHERE rn = 1)"
    )
    return ctes, f"asg{f}"
