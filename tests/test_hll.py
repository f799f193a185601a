"""HyperLogLog sketch: accuracy vs exact, merge associativity/determinism,
parallelism-independence of the estimate."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.dedup.hll import (
    approx_distinct,
    hll_estimate,
    hll_fold,
    hll_merge,
)


def test_estimate_accuracy_across_cardinalities():
    rng = np.random.default_rng(0)
    for true_n in [10, 200, 5_000, 50_000]:
        vals = [f"v{int(x)}" for x in rng.choice(10**9, size=true_n, replace=False)]
        est = hll_estimate(hll_fold(vals))
        assert abs(est - true_n) / true_n < 0.06, (true_n, est)  # p=12 → ±1.6% σ


def test_merge_equals_single_fold_and_is_deterministic():
    vals = [f"x{i}" for i in range(3000)]
    whole = hll_fold(vals)
    parts = hll_merge(hll_merge(hll_fold(vals[:1000]), hll_fold(vals[1000:2500])), hll_fold(vals[2500:]))
    assert np.array_equal(whole, parts)  # max-merge == one pass (same hashes)
    assert np.array_equal(hll_fold(vals), hll_fold(list(vals)))  # deterministic


def test_duplicates_do_not_inflate():
    est_uniq = hll_estimate(hll_fold([f"d{i}" for i in range(1000)]))
    est_dup = hll_estimate(hll_fold([f"d{i % 1000}" for i in range(20000)]))
    assert est_uniq == est_dup  # same register state regardless of multiplicity


def test_dataset_per_key_matches_exact_within_tolerance(ray_session):
    import ray.data as rd

    from code_indexer_ray.pipelines.ops import distinct_count

    rng = np.random.default_rng(1)
    n = 20_000
    keys = rng.integers(0, 3, size=n)
    vals = [f"u{int(v)}" for v in rng.integers(0, 4_000, size=n)]
    tbl = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals)})
    approx = approx_distinct(rd.from_arrow(tbl), "k", "v").to_pandas().set_index("k")
    exact = distinct_count(rd.from_arrow(tbl), "k", "v").to_pandas().set_index("k")
    for k in exact.index:
        e, a = exact.loc[k, "n_distinct"], approx.loc[k, "n_distinct_approx"]
        assert abs(a - e) / e < 0.06, (k, e, a)


def test_estimate_is_parallelism_independent(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "k": pa.array([0] * 5000, pa.int64()),
        "v": pa.array([f"u{i % 1200}" for i in range(5000)]),
    })
    outs = []
    for blocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(blocks)
        outs.append(approx_distinct(ds, "k", "v").to_pandas().n_distinct_approx[0])
    assert outs[0] == outs[1]  # max-merge is associative → layout-independent
