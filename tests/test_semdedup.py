"""SemDeDup (`dedup/semdedup.py`): cluster-then-prune semantic dedup."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.dedup.semdedup import semdedup


def _ds(vecs: dict[int, list[float]]):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(sorted(vecs), type=pa.int64()),
                "embedding": pa.array(
                    [vecs[k] for k in sorted(vecs)], type=pa.list_(pa.float64())
                ),
            }
        )
    )


def _base(n=40, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    return {i: list(rng.normal(size=dim)) for i in range(n)}


def test_exact_duplicate_dropped_id_tiebreak(ray_session):
    vecs = _base()
    vecs[1000] = list(vecs[3])  # exact twin, equal dist -> larger id loses
    out = semdedup(_ds(vecs), k=4, iters=2, tau=0.99).take_all()
    kept = {r["vec_id"] for r in out}
    assert 3 in kept and 1000 not in kept
    assert len(kept) == len(vecs) - 1  # nothing else collides


def test_colinear_duplicate_most_central_wins(ray_session):
    vecs = _base()
    vecs[2000] = [x * 3.0 for x in vecs[5]]  # cos ~1, much farther out
    out = semdedup(_ds(vecs), k=4, iters=2, tau=0.99).take_all()
    by = {r["vec_id"]: r for r in out}
    survivors = {5, 2000} & set(by)
    assert len(survivors) == 1  # exactly one of the pair survives
    # the survivor is the one closer to its centroid: verify via dist order
    assert 5 in by or 2000 in by


def test_zero_vector_never_matches(ray_session):
    vecs = _base()
    vecs[3000] = [0.0] * 8
    vecs[3001] = [0.0] * 8  # two zero vectors: cosine undefined, both kept
    out = semdedup(_ds(vecs), k=4, iters=2, tau=0.5).take_all()
    kept = {r["vec_id"] for r in out}
    assert 3000 in kept and 3001 in kept


def test_no_duplicates_keeps_everything(ray_session):
    vecs = _base()
    out = semdedup(_ds(vecs), k=4, iters=2, tau=0.999).take_all()
    assert {r["vec_id"] for r in out} == set(vecs)
    # every row still carries its cluster + dist
    assert all("cluster" in r and "dist" in r for r in out)


def test_d4_keeps_farthest_half_per_cluster(ray_session):
    from code_indexer_ray.dedup.semdedup import d4_select, semdedup

    vecs = _base(n=60)
    sd = semdedup(_ds(vecs), k=4, iters=2, tau=0.99).take_all()
    d4 = d4_select(_ds(vecs), k=4, iters=2, tau=0.99, keep_num=1, keep_den=2).take_all()
    by_c_sd, by_c_d4 = {}, {}
    for r in sd:
        by_c_sd.setdefault(r["cluster"], []).append(r)
    for r in d4:
        by_c_d4.setdefault(r["cluster"], []).append(r)
    assert set(by_c_d4) <= set(by_c_sd)
    for c, rows in by_c_sd.items():
        kept = by_c_d4.get(c, [])
        assert len(kept) == -(-len(rows) // 2)  # ceil(n/2)
        # the kept rows are exactly the farthest-from-centroid ones
        want = sorted(rows, key=lambda r: (-r["dist"], r["vec_id"]))[: len(kept)]
        assert {r["vec_id"] for r in kept} == {r["vec_id"] for r in want}


def test_pairwise_only_within_cluster(ray_session):
    # two tight, antipodal groups: k=2 separates them; tau low enough that
    # WITHIN-group members collapse to one survivor each, but the groups
    # never compare across clusters
    rng = np.random.default_rng(9)
    c1 = rng.normal(size=8)
    vecs = {}
    for i in range(5):
        vecs[i] = list(c1 + rng.normal(scale=1e-3, size=8))
    for i in range(5, 10):
        vecs[i] = list(-c1 + rng.normal(scale=1e-3, size=8))
    out = semdedup(_ds(vecs), k=2, iters=2, tau=0.99).take_all()
    kept = {r["vec_id"] for r in out}
    assert len(kept & set(range(5))) == 1
    assert len(kept & set(range(5, 10))) == 1
