"""Connected-components label propagation vs a brute-force union-find."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from code_indexer_ray.dedup.components import components_table, connected_components


def _uf_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(pairs: list[tuple[int, int]]) -> dict[int, int]:
    tbl = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    out = components_table(tbl)
    return dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))


def test_empty(ray_session):
    out = components_table(pa.table({"doc_a": pa.array([], pa.int64()),
                                     "doc_b": pa.array([], pa.int64())}))
    assert out.num_rows == 0
    assert out.schema.names == ["doc_id", "cluster_id"]


def test_single_pair(ray_session):
    assert _run([(7, 3)]) == {3: 3, 7: 3}


def test_transitive_chain(ray_session):
    # A-B, B-C, C-D: one component even though A,D never share an edge.
    got = _run([(1, 2), (2, 3), (3, 4)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1}


def test_long_chain_diameter(ray_session):
    # 20-node path: worst-case diameter for the propagation loop.
    pairs = [(i, i + 1) for i in range(100, 120)]
    got = _run(pairs)
    assert set(got.values()) == {100}


def test_disjoint_clusters_and_random(ray_session):
    rng = np.random.RandomState(7)
    pairs = []
    for base in (0, 1000, 2000, 3000):
        nodes = base + rng.permutation(50)[:20]
        for i in range(len(nodes) - 1):
            pairs.append((int(nodes[i]), int(nodes[i + 1])))
    extra = [(int(a), int(b)) for a, b in rng.randint(0, 4000, size=(30, 2)) if a != b]
    pairs += extra
    expect = _uf_components(pairs)
    got = _run(pairs)
    assert got == expect


def test_dataset_input(ray_session):
    import ray.data as rd

    tbl = pa.table({"doc_a": pa.array([5, 1], pa.int64()),
                    "doc_b": pa.array([9, 5], pa.int64())})
    import ray

    ds = connected_components(rd.from_arrow(tbl))
    out = pa.concat_tables(
        [t.select(["doc_id", "cluster_id"])
         for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    )
    got = dict(zip(out["doc_id"].to_pylist(), out["cluster_id"].to_pylist()))
    assert got == {1: 1, 5: 1, 9: 1}
