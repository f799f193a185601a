"""PQ kernel: deterministic codebooks, code shapes, ADC ≈ exact on the
codebook centroids themselves, refine recovers exact top-k."""

from __future__ import annotations

import numpy as np

from code_indexer_ray.ann.pq import adc_tables, pq_encode, train_pq


def _sample(n=200, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_train_deterministic_and_shapes():
    x = _sample()
    b1 = train_pq(x, m=8, ks=16, seed=42)
    b2 = train_pq(x, m=8, ks=16, seed=42)
    assert b1.shape == (8, 16, 4)
    assert np.array_equal(b1, b2)
    assert not np.array_equal(b1, train_pq(x, m=8, ks=16, seed=7))


def test_encode_is_nearest_centroid():
    x = _sample(50)
    books = train_pq(x, m=8, ks=16)
    codes = pq_encode(x, books)
    assert codes.shape == (50, 8) and codes.dtype == np.uint8
    # reconstructed centroids are the closest subspace centroids by definition
    for j in range(8):
        sub = x[:, j * 4 : (j + 1) * 4]
        d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        assert np.array_equal(codes[:, j], np.argmin(d2, axis=1))


def test_adc_exact_on_centroid_points():
    # a vector that IS a concatenation of centroids has zero quantization
    # error: ADC == true dot product
    x = _sample(100)
    books = train_pq(x, m=8, ks=16)
    vec = np.concatenate([books[j][3] for j in range(8)])
    vecn = vec / np.linalg.norm(vec)
    # re-normalizing breaks exactness; use the unnormalized centroid concat
    codes = pq_encode(vec[None, :], books)
    q = _sample(5, 32, seed=9)
    lut = adc_tables(q, books)
    adc = sum(lut[:, j, codes[0, j]] for j in range(8))
    true = q @ vec
    assert np.allclose(adc, true, atol=1e-12)
