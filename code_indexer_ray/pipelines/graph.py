"""Iterative graph algorithms over edge Datasets — PageRank power iteration.

The scale-correct vertex-centric shape (no corpus-sized driver state in the
data plane):

- the edge list is a Dataset (src, dst) built once;
- each iteration JOINs current ranks onto edges by ``src`` (one hash-bucket
  co-partitioning shuffle via :func:`shuffle_equi_join` — the rank vector is
  itself a Dataset, never broadcast), then a groupby(dst) sum folds
  contributions (map-side partial combine inside the aggregate);
- k iterations = k (join + aggregate) rounds, O(edges) per round.

Determinism: every arithmetic step is a float64 sum over a groupby whose
per-key accumulation order can vary — results are compared at 1e-6 rounding
(the catalog's float policy), and the fixed iteration count (no convergence
test on floats) keeps both sides on the same schedule.

PageRank math (Brin & Page 1998): r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/deg(u).
Preconditions: every vertex has out-degree exactly ``N_LINKS`` (the synthetic
graph guarantees it; dangling nodes — in-edges but no out-edges — would leak
mass and are NOT redistributed).  Zero-IN-degree vertices are handled: each
fold unions a zero-contribution row per vertex so they keep their (1−d)/N
rank row and their outgoing mass survives the next join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N_LINKS = 3
DAMPING = 0.85


def synth_edges(batch: pa.Table, n_docs: int, id_col: str = "doc_id") -> pa.Table:
    """Deterministic out-links per doc: dst_j = (src * p_j + j) mod N for
    co-prime multipliers — every node has exactly N_LINKS out-edges
    (self-loops allowed; harmless for PageRank)."""
    src = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    mults = [7, 13, 31][:N_LINKS]
    srcs, dsts = [], []
    for j, m in enumerate(mults):
        srcs.append(src)
        dsts.append((src * m + j) % n_docs)
    return pa.table(
        {
            "src": pa.array(np.concatenate(srcs)),
            "dst": pa.array(np.concatenate(dsts)),
        }
    )


def pagerank(edges, n_docs: int, iters: int = 5, damping: float = DAMPING):
    """``iters`` power iterations; returns a Dataset of (doc_id, rank).

    ``edges`` must have int64 (src, dst) with constant out-degree N_LINKS.
    """
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .ops import shuffle_equi_join

    edges = edges.materialize()  # reused every iteration
    base = (1.0 - damping) / n_docs

    # vertex set = distinct src (constant out-degree ⇒ every vertex appears
    # as a src).  Each fold unions one ZERO contribution row per vertex so a
    # zero-in-degree vertex still gets its rank row (= base) — without it
    # the vertex would vanish from the groupby and its OUT-going mass would
    # be silently dropped from the next iteration's join.
    def vrow(b: pa.Table) -> pa.Table:
        agg = b.select(["src"]).group_by("src").aggregate([])
        n = agg.num_rows
        return pa.table(
            {"dst": agg["src"], "c": pa.array(np.zeros(n, dtype=np.float64))}
        )

    vertices = edges.map_batches(vrow, batch_format="pyarrow").materialize()

    # iteration 0: uniform ranks — contributions need only a constant, so the
    # first round skips the join entirely
    def first_contrib(b: pa.Table) -> pa.Table:
        n = b.num_rows
        r0 = 1.0 / n_docs
        return pa.table(
            {"dst": b["dst"], "c": pa.array(np.full(n, r0 / N_LINKS))}
        )

    def fold(contrib_ds):
        agg = (
            contrib_ds.union(vertices)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="s"))
        )

        def to_rank(b: pa.Table) -> pa.Table:
            s = b["s"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"doc_id": b["dst"], "rank": pa.array(base + damping * s)}
            )

        return agg.map_batches(to_rank, batch_format="pyarrow")

    ranks = fold(edges.map_batches(first_contrib, batch_format="pyarrow"))

    for _ in range(iters - 1):
        joined = shuffle_equi_join(
            edges, ranks.materialize(), key="src", right_key="doc_id",
            left_cols=["dst"], right_cols=["rank"],
        )

        def contrib(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            return pa.table({"dst": b["dst"], "c": pa.array(r / N_LINKS)})

        ranks = fold(joined.map_batches(contrib, batch_format="pyarrow"))

    return ranks


def pagerank_sql(iters: int = 5, damping: float = DAMPING) -> str:
    """DuckDB twin: same synthetic edges, ``iters`` unrolled iterations.
    N is the table's own row count (scalar subquery), so the SQL is
    scale-factor-independent like the Ray pipeline."""
    mults = [7, 13, 31][:N_LINKS]
    edge_parts = " UNION ALL ".join(
        f"SELECT doc_id AS src, (doc_id * {m} + {j}) % nn.n AS dst FROM documents, nn"
        for j, m in enumerate(mults)
    )
    base = f"(1.0 - {damping}) / nn.n"
    sql = ["WITH nn AS (SELECT count(*)::BIGINT AS n FROM documents),"]
    sql.append(f"edges AS ({edge_parts}),")
    # every iteration LEFT JOINs from the full vertex set so zero-in-degree
    # vertices keep a (base) rank row — mirrors the Ray fold's zero-row union
    sql.append(
        f"r1 AS (SELECT d.doc_id, {base} + {damping} * coalesce(c.s, 0) AS rank\n"
        "  FROM documents d CROSS JOIN nn LEFT JOIN (\n"
        f"    SELECT dst, sum((1.0 / nn2.n) / {N_LINKS}) AS s FROM edges, nn nn2 GROUP BY dst\n"
        "  ) c ON c.dst = d.doc_id)"
    )
    prev = "r1"
    for i in range(2, iters + 1):
        cur = f"r{i}"
        sql.append(
            f", {cur} AS (SELECT d.doc_id, {base} + {damping} * coalesce(c.s, 0) AS rank\n"
            "  FROM documents d CROSS JOIN nn LEFT JOIN (\n"
            f"    SELECT e.dst, sum(p.rank / {N_LINKS}) AS s FROM edges e\n"
            f"    JOIN {prev} p ON p.doc_id = e.src GROUP BY e.dst\n"
            "  ) c ON c.dst = d.doc_id)"
        )
        prev = cur
    sql.append(f"\nSELECT doc_id, round(rank, 9) AS rank_r FROM {prev}")
    return "\n".join(sql)
