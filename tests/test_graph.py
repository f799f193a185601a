"""Distributed PageRank vs a dense numpy power-iteration reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _collect(ds) -> pd.DataFrame:
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(parts).to_pandas()


def _dense_pagerank(edges: list[tuple[int, int]], n: int, iters: int, d: float = 0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        for s, t in edges:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    return r


class TestPageRank:
    @pytest.fixture()
    def graph(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.graph import synth_edges

        n = 200
        ids = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        ds = rd.from_arrow(ids).repartition(4)
        edges_ds = ds.map_batches(lambda b: synth_edges(b, n), batch_format="pyarrow")
        edges = list(
            zip(
                _collect(edges_ds)["src"].tolist(),
                _collect(edges_ds)["dst"].tolist(),
            )
        )
        return n, edges_ds, edges

    def test_matches_dense_reference(self, graph):
        from code_indexer_ray.pipelines.graph import pagerank

        n, edges_ds, edges = graph
        got = _collect(pagerank(edges_ds, n, iters=5)).sort_values("doc_id")
        want = _dense_pagerank(edges, n, 5)
        assert len(got) == n
        np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=1e-12)

    def test_rank_mass_conserved(self, graph):
        from code_indexer_ray.pipelines.graph import pagerank

        n, edges_ds, _ = graph
        got = _collect(pagerank(edges_ds, n, iters=3))
        assert abs(got["rank"].sum() - 1.0) < 1e-9

    def test_single_iteration(self, graph):
        from code_indexer_ray.pipelines.graph import pagerank

        n, edges_ds, edges = graph
        got = _collect(pagerank(edges_ds, n, iters=1)).sort_values("doc_id")
        want = _dense_pagerank(edges, n, 1)
        np.testing.assert_allclose(got["rank"].to_numpy(), want, atol=1e-12)

    def test_layout_independent_at_rounding(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.graph import pagerank, synth_edges

        n = 97
        ids = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64))})
        outs = []
        for blocks in (1, 5):
            ds = rd.from_arrow(ids).repartition(blocks)
            edges = ds.map_batches(lambda b: synth_edges(b, n), batch_format="pyarrow")
            out = _collect(pagerank(edges, n, iters=4)).sort_values("doc_id")
            outs.append(np.round(out["rank"].to_numpy(), 9))
        np.testing.assert_array_equal(outs[0], outs[1])
