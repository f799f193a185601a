"""HNSW graph: exactness on clustered data, determinism, degree bounds,
incremental adds, empty/self-match edges."""

from __future__ import annotations

import numpy as np
import pytest

from code_indexer_ray.ann.hnsw import HNSWIndex


def _clusters(n_per=50, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(4, dim)) * 5
    vecs, labels = [], []
    for ci, c in enumerate(centers):
        vecs.append(c + rng.normal(size=(n_per, dim)) * 0.5)
        labels += [ci] * n_per
    return np.concatenate(vecs), np.array(labels)


def test_neighbors_come_from_the_same_cluster():
    vecs, labels = _clusters()
    idx = HNSWIndex(vecs.shape[1])
    for i, v in enumerate(vecs):
        idx.add(i, v)
    for probe in [0, 60, 120, 180]:
        hits = idx.search(vecs[probe], 11, ef=128)
        got = [v for v, _ in hits if v != probe][:10]
        assert all(labels[g] == labels[probe] for g in got)
        # exact top hit: itself
        assert hits[0][0] == probe and hits[0][1] == pytest.approx(1.0)


def test_matches_brute_on_small_set():
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(300, 24))
    idx = HNSWIndex(24, m=8, ef_construction=100)
    for i, v in enumerate(vecs):
        idx.add(i, v)
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qi in [5, 77, 200]:
        want = np.argsort(-(nv @ nv[qi]))[:10].tolist()
        got = [v for v, _ in idx.search(vecs[qi], 10, ef=200)]
        assert len(set(want) & set(got)) >= 9  # ≥0.9 recall at high ef


def test_deterministic_and_degree_bounded():
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(200, 8))
    a, b = HNSWIndex(8, seed=7), HNSWIndex(8, seed=7)
    for i, v in enumerate(vecs):
        a.add(i, v)
        b.add(i, v)
    q = rng.normal(size=8)
    assert a.search(q, 10) == b.search(q, 10)
    for node in range(len(a._vecs)):
        for lyr, lnk in enumerate(a._links[node]):
            cap = a.m0 if lyr == 0 else a.m
            assert len(lnk) <= cap


def test_empty_and_single():
    idx = HNSWIndex(4)
    assert idx.search(np.ones(4), 5) == []
    idx.add(42, np.ones(4))
    assert idx.search(np.ones(4), 5) == [(42, pytest.approx(1.0))]
