"""Distributed connected components over a near-duplicate pair list.

Real-world dedup semantics: LSH-verified pairs are only *edges*; the unit a
curation pipeline keeps or drops is the *connected component* (transitive
closure of near-duplicate relations — A~B, B~C ⇒ {A,B,C} is one cluster even
if A and C never collided in a band).  The reference has no near-dup stage at
all (SURVEY.md §2.8 "No near-dup anywhere in the reference"); this is the
standard web-corpus extension (Gyawali et al. / SlimPajama-style cluster
dedup) built from public algorithms.

Algorithm: iterative **min-label propagation** (the textbook message-passing
CC algorithm, equivalent to one round of "hash-to-min" per iteration —
Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC 2014):

    label(v) ← min(label(v), min_{(u,v)∈E} label(u))

repeated until the global label sum stops changing.  Each iteration is two
hash shuffles (one to join labels onto edge endpoints, one min-combine) over
the *edge list only* — never the corpus.  Convergence takes O(diameter)
rounds; near-duplicate components are band-collision cliques with tiny
diameter (almost always ≤ 3), so the loop is short.  A ``max_iters`` cap
bounds the pathological chain case; hitting it raises rather than silently
returning partial labels.

Scale notes:
- State per iteration = one (node, label) row per distinct node — O(V) rows,
  hash-partitioned; nothing is materialized on the driver except the single
  scalar label-sum used for the convergence test.
- The convergence check is a monotone integer aggregate (labels only ever
  decrease), so "sum unchanged" ⇔ fixpoint; no diff join needed.
- Skewed hub nodes (one doc near-duplicating thousands) are fine: the
  groupby groups are per *node*, and a group's size is its degree, already
  capped upstream by the LSH bucket-cap policy (minhash.candidate_pairs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _sym_edges(edges: pa.Table, a: str, b: str) -> pa.Table:
    """(u,v) for both directions of every input pair, int64, self-loops kept
    out (they are no-ops for min-propagation)."""
    ua = edges[a].to_numpy(zero_copy_only=False).astype(np.int64)
    vb = edges[b].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "u": pa.array(np.concatenate([ua, vb])),
            "v": pa.array(np.concatenate([vb, ua])),
        }
    )


def connected_components(
    edges,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    max_iters: int = 32,
):
    """Cluster ids for every node of an edge Dataset/Table.

    Parameters
    ----------
    edges : ray.data.Dataset | pyarrow.Table with columns (doc_a, doc_b)
    Returns
    -------
    ray.data.Dataset of (doc_id:int64, cluster_id:int64), one row per
    distinct node, cluster_id = min doc_id of the node's component.
    """
    import ray
    import ray.data as rd

    if isinstance(edges, pa.Table):
        edges_ds = rd.from_arrow(_sym_edges(edges, doc_a, doc_b)) if edges.num_rows else None
    else:
        refs = [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows]
        edges_ds = (
            rd.from_arrow(_sym_edges(pa.concat_tables(refs), doc_a, doc_b)) if refs else None
        )
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
    )
    if edges_ds is None:
        return rd.from_arrow(empty)

    # labels(node, label) init: label = node (distinct endpoint set).
    def init_labels(batch: pa.Table) -> pa.Table:
        n = np.unique(batch["u"].to_numpy(zero_copy_only=False))
        return pa.table({"node": pa.array(n), "label": pa.array(n)})

    labels = (
        edges_ds.map_batches(init_labels, batch_format="pyarrow")
        .groupby("node")
        .map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")
    ).materialize()

    def label_sum(lab) -> int:
        agg = lab.sum("label")
        return int(agg if not isinstance(agg, dict) else agg["sum(label)"])

    prev = label_sum(labels)

    # One propagation round: union tagged rows, group by the *source* key, fan
    # the group's label out along its edges, then min-combine per target.
    def propagate(g: pa.Table) -> pa.Table:
        kind = g["kind"].to_numpy(zero_copy_only=False)
        payload = g["payload"].to_numpy(zero_copy_only=False)
        own = payload[kind == 1]
        label = int(own[0])
        targets = payload[kind == 0]
        key = g["key"][0].as_py()
        out_nodes = np.concatenate([targets, [key]])
        return pa.table(
            {
                "node": pa.array(out_nodes, pa.int64()),
                "label": pa.array(np.full(len(out_nodes), label, np.int64)),
            }
        )

    for _ in range(max_iters):
        tagged_edges = edges_ds.map_batches(
            lambda b: pa.table(
                {
                    "key": b["u"],
                    "kind": pa.array(np.zeros(b.num_rows, np.int8)),
                    "payload": b["v"],
                }
            ),
            batch_format="pyarrow",
        )
        tagged_labels = labels.map_batches(
            lambda b: pa.table(
                {
                    "key": b["node"],
                    "kind": pa.array(np.ones(b.num_rows, np.int8)),
                    "payload": b["label"],
                }
            ),
            batch_format="pyarrow",
        )
        messages = (
            tagged_edges.union(tagged_labels)
            .groupby("key")
            .map_groups(propagate, batch_format="pyarrow")
        )
        labels = (
            messages.groupby("node").min("label").materialize()
        )
        labels = labels.map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
            batch_format="pyarrow",
        ).materialize()
        cur = label_sum(labels)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} iterations"
        )

    return labels.map_batches(
        lambda b: pa.table({"doc_id": b["node"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )


def components_table(pairs: pa.Table, doc_a: str = "doc_a", doc_b: str = "doc_b") -> pa.Table:
    """Driver-side convenience: run the distributed CC and collect the (small)
    (doc_id, cluster_id) result as one sorted Arrow table."""
    import ray

    ds = connected_components(pairs, doc_a, doc_b)
    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}
        )
    out = pa.concat_tables(tbls)
    return out.sort_by("doc_id")
