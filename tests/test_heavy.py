"""Misra-Gries exact top-k vs brute-force Counter."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.text.analysis import tokenize_query
from code_indexer_ray.text.heavy import heavy_hitters_topk


def _ds(docs: list[str], parts: int = 6):
    import ray.data as rd

    tbl = pa.table(
        {"doc_id": pa.array(range(len(docs)), pa.int64()), "text": pa.array(docs)}
    )
    return rd.from_arrow(tbl).repartition(parts)


def _brute_topk(docs: list[str], k: int):
    cnt = Counter()
    for t in docs:
        cnt.update(tokenize_query(t))
    ranked = sorted(cnt.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, t, c) for i, (t, c) in enumerate(ranked)]


def test_zipf_matches_brute(ray_session):
    rng = np.random.RandomState(17)
    vocab = [f"w{i:03d}" for i in range(400)]
    p = (1.0 / np.arange(1, 401)) ** 1.2
    p /= p.sum()
    docs = [" ".join(rng.choice(vocab, size=80, p=p)) for _ in range(120)]
    got = heavy_hitters_topk(_ds(docs), k=15, m=128)
    exp = _brute_topk(docs, 15)
    assert list(zip(got["rank"].to_pylist(), got["term"].to_pylist(),
                    got["count"].to_pylist())) == exp


def test_small_vocab_no_deduction(ray_session):
    docs = ["a a a b b c"] * 10
    got = heavy_hitters_topk(_ds(docs, parts=2), k=3, m=64)
    assert got["term"].to_pylist() == ["a", "b", "c"]
    assert got["count"].to_pylist() == [30, 20, 10]


def test_unsound_raises(ray_session):
    # perfectly flat data with a tiny m: deduction swamps the k-th lower bound
    rng = np.random.RandomState(5)
    vocab = [f"u{i:04d}" for i in range(3000)]
    docs = [" ".join(rng.permutation(vocab)[:100]) for _ in range(60)]
    with pytest.raises(ValueError, match="unsound"):
        heavy_hitters_topk(_ds(docs, parts=8), k=5, m=8)


def test_empty(ray_session):
    got = heavy_hitters_topk(_ds(["", ""]), k=5)
    assert got.num_rows == 0
