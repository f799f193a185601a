"""Bottom-k-by-hash quantile sketch: accuracy gate vs the exact operator,
exact mergeability / layout-independence, and collocation PMI vs brute."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _collect(ds) -> pd.DataFrame:
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(parts).to_pandas()


def _ds(df: pd.DataFrame, n_blocks: int):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(n_blocks)


class TestApproxQuantiles:
    def test_rank_error_within_gate(self, ray_session):
        from code_indexer_ray.pipelines.ops import approx_grouped_quantiles

        rng = np.random.default_rng(11)
        n = 60_000
        df = pd.DataFrame(
            {
                "k": rng.choice(["a", "b"], n),
                "v": rng.lognormal(0.0, 2.0, n),  # heavy-tailed on purpose
                "id": np.arange(n, dtype=np.int64),
            }
        )
        K = 1024
        got = _collect(
            approx_grouped_quantiles(_ds(df, 8), "k", "v", "id", [0.5, 0.95], ["p50", "p95"], k=K)
        ).set_index("k")
        for key in ("a", "b"):
            v = np.sort(df.loc[df["k"] == key, "v"].to_numpy())
            m = len(v)
            for q, col in [(0.5, "p50"), (0.95, "p95")]:
                est = got.loc[key, col]
                rank = np.searchsorted(v, est) / m
                # sampling-theory gate: 5 sigma of sqrt(q(1-q)/K)
                tol = 5 * np.sqrt(q * (1 - q) / K)
                assert abs(rank - q) < tol, (key, q, rank)

    def test_layout_independent_and_mergeable(self, ray_session):
        from code_indexer_ray.pipelines.ops import approx_grouped_quantiles

        rng = np.random.default_rng(5)
        n = 20_000
        df = pd.DataFrame(
            {
                "k": rng.choice(["x", "y", "z"], n),
                "v": rng.normal(size=n),
                "id": rng.permutation(n).astype(np.int64),
            }
        )
        outs = []
        for blocks in (1, 3, 13):
            out = _collect(
                approx_grouped_quantiles(_ds(df, blocks), "k", "v", "id", [0.5], ["p50"], k=256)
            ).sort_values("k").reset_index(drop=True)
            outs.append(out)
        # bottom-k of a union == bottom-k of merged bottom-k's → bit-identical
        assert outs[0].equals(outs[1]) and outs[1].equals(outs[2])

    def test_small_group_is_exact(self, ray_session):
        from code_indexer_ray.pipelines.ops import approx_grouped_quantiles

        # group smaller than k: the "sample" is the whole group → exact
        df = pd.DataFrame(
            {"k": ["g"] * 101, "v": np.arange(101.0), "id": np.arange(101, dtype=np.int64)}
        )
        out = _collect(
            approx_grouped_quantiles(_ds(df, 4), "k", "v", "id", [0.5, 0.95], ["p50", "p95"], k=256)
        )
        assert out["p50"].iloc[0] == 50.0
        assert out["p95"].iloc[0] == 95.0


class TestCollocations:
    def test_matches_brute_force(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.text.collocations import bigram_pmi_topk
        from code_indexer_ray.text.analysis import tokenize_query

        rng = np.random.default_rng(2)
        words = ["red", "blue", "fish", "cat", "dog", "runs"]
        docs = []
        for _ in range(300):
            toks = list(rng.choice(words, rng.integers(2, 12)))
            if rng.random() < 0.5:
                toks += ["strong", "coffee"]  # planted collocation
            docs.append(" ".join(toks))
        ds = rd.from_items([{"text": t} for t in docs]).repartition(4)
        got = bigram_pmi_topk(ds, "text", min_count=3, k=10).to_pandas()

        # brute force
        from collections import Counter

        uni, big = Counter(), Counter()
        for t in docs:
            toks = tokenize_query(t)
            uni.update(toks)
            big.update(zip(toks, toks[1:]))
        tu, tb = sum(uni.values()), sum(big.values())
        rows = [
            (a, b, n, round(np.log((n / tb) / ((uni[a] / tu) * (uni[b] / tu))), 9))
            for (a, b), n in big.items()
            if n >= 3
        ]
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        want = rows[:10]
        assert list(zip(got["a"], got["b"], got["n_ab"])) == [(a, b, n) for a, b, n, _ in want]
        assert ("strong", "coffee") in set(zip(got["a"], got["b"]))
        np.testing.assert_allclose(got["pmi_r"], [round(p, 4) for *_, p in want], atol=1e-9)

    def test_empty_corpus(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.text.collocations import bigram_pmi_topk

        ds = rd.from_items([{"text": "single"}, {"text": ""}])
        out = bigram_pmi_topk(ds, "text", min_count=1, k=5)
        assert out.num_rows == 0
