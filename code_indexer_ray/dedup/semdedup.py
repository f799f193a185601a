"""SemDeDup — semantic deduplication via cluster-then-prune (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

Shape: k-means over the embedding column (the fixed-point, SQL-twinned
clustering in ``ann/kmeans.py``) assigns every vector to a cluster; inside
each cluster, pairs with cosine similarity >= ``tau`` are semantic
duplicates and only the pair member CLOSEST TO THE CENTROID survives
(Abbas et al.'s keep-low-similarity-to-centroid choice inverted to the
deterministic "keep the most central" — ties by smaller id).  Pairwise
similarity is only ever computed within a cluster: O(sum n_c^2), not
O(N^2).

Scale: the centroid matrix broadcasts once (``ray.put``); labeling is a
streaming map; the only shuffle is the cluster groupby.  At web scale k
grows with the corpus (SemDeDup uses k ~ sqrt(N)) so clusters stay
worker-sized; the quantized vectors ride the one shuffle as fixed-width
int64 lists.

Everything is fixed-point / IEEE-reproducible, so the DuckDB twin
(``semdedup_sql``) matches bit-exactly: integer dot products, norms as
``sqrt(sum(q*q)::DOUBLE)``, cosine as ``dot / (sqrt(na) * sqrt(nb))``.

The reference has no semantic dedup (its dedup is content-hash based);
this is part of the LLM-curation surface alongside exact / MinHash /
SimHash / char-n-gram / embedding-cosine / substring dedup.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..ann.kmeans import SCALE, _assign, kmeans_centroids, kmeans_ctes, quantize_embeddings

DEFAULT_TAU = 0.95


def semdedup(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    tau: float = DEFAULT_TAU,
    scale: int = SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Dataset of the SURVIVING vectors: (vec_id, cluster, dist).

    A vector is dropped iff some other vector in its cluster has cosine
    similarity >= ``tau`` with it AND is strictly better ranked by
    (dist-to-centroid, vec_id).  Zero-norm quantized vectors never match
    anything (cosine undefined), mirroring the twin's ``n2 > 0`` guard.
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
                "q": pa.array(list(q), type=pa.list_(pa.int64())),
            }
        )

    labeled = ds.map_batches(label, batch_format="pyarrow")

    def prune(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        if g.num_columns == 0 or g.num_rows == 0:
            return empty
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        dist = g["dist"].to_numpy(zero_copy_only=False)
        qv = (
            g["q"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .reshape(len(ids), -1)
        )
        dots = qv @ qv.T  # int64 exact
        n2 = np.einsum("ij,ij->i", qv, qv).astype(np.float64)
        norms = np.sqrt(n2)
        nz = n2 > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots.astype(np.float64) / (norms[:, None] * norms[None, :])
        sim = cos >= tau
        sim &= nz[:, None] & nz[None, :]
        np.fill_diagonal(sim, False)
        # better[j, i]: j strictly better ranked than i by (dist, id)
        better = (dist[:, None] < dist[None, :]) | (
            (dist[:, None] == dist[None, :]) & (ids[:, None] < ids[None, :])
        )
        dropped = (sim & better).any(axis=0)
        keep = ~dropped
        return pa.table(
            {
                "vec_id": pa.array(ids[keep]),
                "cluster": g["cluster"].filter(pa.array(keep)),
                "dist": pa.array(dist[keep]),
            }
        )

    return labeled.groupby("cluster").map_groups(prune, batch_format="pyarrow")


def semdedup_parts(
    *,
    k: int = 8,
    iters: int = 2,
    tau: float = DEFAULT_TAU,
    scale: int = SCALE,
    source: str = "embeddings",
    prelude: str = "",
) -> tuple[str, str]:
    """(CTE body, survivors-CTE name) of the twin — the survivors CTE
    ``sdkept`` has columns (vec_id, c, dist), so downstream twins (D4
    prototype selection) can build on the identical pruning."""
    ctes, asg = kmeans_ctes(k=k, iters=iters, scale=scale, source=source)
    body = (prelude + ",\n" if prelude else "") + ",\n".join(ctes)
    body += (
        ",\n"
        "nrm AS (SELECT vec_id, sum(q * q)::DOUBLE AS n2 FROM qv GROUP BY vec_id),\n"
        f"pairs AS (SELECT a.vec_id AS ia, b.vec_id AS ib, a.dist AS da, b.dist AS db,\n"
        "  sum(x.q * y.q)::DOUBLE AS dot\n"
        f"  FROM {asg} a JOIN {asg} b ON a.c = b.c AND a.vec_id < b.vec_id\n"
        "  JOIN qv x ON x.vec_id = a.vec_id\n"
        "  JOIN qv y ON y.vec_id = b.vec_id AND x.d = y.d\n"
        "  GROUP BY a.vec_id, b.vec_id, a.dist, b.dist),\n"
        "sim AS (SELECT ia, ib, da, db, dot / (sqrt(na.n2) * sqrt(nb.n2)) AS cos\n"
        "  FROM pairs JOIN nrm na ON na.vec_id = ia JOIN nrm nb ON nb.vec_id = ib\n"
        "  WHERE na.n2 > 0 AND nb.n2 > 0),\n"
        f"dropped AS (SELECT ib AS vec_id FROM sim WHERE cos >= {tau!r}\n"
        "    AND (da < db OR (da = db AND ia < ib))\n"
        f"  UNION SELECT ia FROM sim WHERE cos >= {tau!r} AND db < da),\n"
        f"sdkept AS (SELECT a.vec_id, a.c, a.dist FROM {asg} a\n"
        "  WHERE a.vec_id NOT IN (SELECT vec_id FROM dropped))"
    )
    return body, "sdkept"


def semdedup_sql(
    *,
    k: int = 8,
    iters: int = 2,
    tau: float = DEFAULT_TAU,
    scale: int = SCALE,
    source: str = "embeddings",
    prelude: str = "",
) -> str:
    """DuckDB twin of :func:`semdedup` over the ``source`` relation —
    builds on the unrolled k-means CTEs, then within-cluster integer dot
    products and the identical (dist, vec_id) drop rule.  ``prelude``
    prepends extra CTEs (e.g. a deterministic near-duplicate augmenter)."""
    body, kept = semdedup_parts(
        k=k, iters=iters, tau=tau, scale=scale, source=source, prelude=prelude
    )
    return (
        f"WITH {body}\n"
        f"SELECT vec_id::BIGINT AS vec_id, c::BIGINT AS cluster, dist::BIGINT AS dist\n"
        f"FROM {kept}"
    )


def d4_select(
    ds,
    *,
    k: int = 8,
    iters: int = 2,
    tau: float = DEFAULT_TAU,
    keep_num: int = 1,
    keep_den: int = 2,
    scale: int = SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """D4 selection (Tirumala et al. 2023, "D4: Improving LLM Pretraining
    via Document De-Duplication and Diversification"): SemDeDup first, then
    within each cluster keep the ``keep_num/keep_den`` fraction FARTHEST
    from the centroid — duplicates leave in stage one, over-prototypical
    (template-like, semantically redundant) documents leave in stage two,
    diversifying the mix.

    The per-cluster quota is ``ceil(n_c * keep_num / keep_den)`` in exact
    integer arithmetic (both sides), selection orders by (dist DESC, id) —
    no floats anywhere beyond SemDeDup's own cosine.  Same scale shape as
    :func:`semdedup`: one extra groupby over the already-pruned survivors.
    """
    survivors = semdedup(
        ds, k=k, iters=iters, tau=tau, scale=scale, id_col=id_col, vec_col=vec_col
    )

    def pick(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return g
        ids = g["vec_id"].to_numpy(zero_copy_only=False)
        dist = g["dist"].to_numpy(zero_copy_only=False)
        quota = -(-len(ids) * keep_num // keep_den)  # ceil
        order = np.lexsort((ids, -dist))[:quota]
        return g.take(pa.array(np.sort(order)))

    return survivors.groupby("cluster").map_groups(pick, batch_format="pyarrow")


def d4_sql(
    *,
    k: int = 8,
    iters: int = 2,
    tau: float = DEFAULT_TAU,
    keep_num: int = 1,
    keep_den: int = 2,
    scale: int = SCALE,
    source: str = "embeddings",
    prelude: str = "",
) -> str:
    """DuckDB twin of :func:`d4_select` — the SemDeDup CTEs plus a
    per-cluster (dist DESC, vec_id) rank cut at ceil(n*num/den)."""
    body, kept = semdedup_parts(
        k=k, iters=iters, tau=tau, scale=scale, source=source, prelude=prelude
    )
    return (
        f"WITH {body},\n"
        f"ranked AS (SELECT vec_id, c, dist,\n"
        "  row_number() OVER (PARTITION BY c ORDER BY dist DESC, vec_id) AS rk,\n"
        "  count(*) OVER (PARTITION BY c) AS nc\n"
        f"  FROM {kept})\n"
        f"SELECT vec_id::BIGINT AS vec_id, c::BIGINT AS cluster, dist::BIGINT AS dist\n"
        f"FROM ranked WHERE rk <= (nc * {keep_num} + {keep_den} - 1) // {keep_den}"
    )
