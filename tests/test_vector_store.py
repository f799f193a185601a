"""Persisted vector store (SURVEY S8): IVF-partitioned sink + pruned search.

Correctness anchors: with ``nprobe == n_centroids`` the search is EXACTLY the
brute-force result (every vector scored, same float64 kernel, same
tie-breaks); resume is a fingerprinted no-op; probed reads touch only the
probed cells' files; the partitioned write is coalesced to ~1 file/cell."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from code_indexer_ray.ann.brute import ann_cosine_topk
from code_indexer_ray.ann.store import (
    CELLS_DIR,
    VectorStoreSearcher,
    build_vector_store,
)

SRC = "/root/testdata/sf0.001/embeddings.parquet"
QUERY_IDS = (0, 1, 2, 3)


def _queries():
    t = pq.read_table(SRC)
    ids = t["vec_id"].to_numpy()
    rows = np.flatnonzero(np.isin(ids, QUERY_IDS))
    qs = np.stack([np.asarray(t["embedding"][i].as_py(), dtype=np.float64) for i in rows])
    return qs, ids[rows]


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vstore") / "store")
    man = build_vector_store(SRC, out, n_centroids=8)
    return out, man


def test_build_layout_and_resume(store):
    out, man = store
    assert man["n_vectors"] == 500 and man["n_centroids"] == 8
    files = glob.glob(os.path.join(out, CELLS_DIR, "cell=*", "*.parquet"))
    # coalesced: one file per non-empty cell at this scale
    assert len(files) <= man["n_centroids"]
    assert sum(pq.read_table(f).num_rows for f in files) == man["n_vectors"]
    mtimes = {f: os.path.getmtime(f) for f in files}
    man2 = build_vector_store(SRC, out, n_centroids=8)  # fingerprint match
    assert man2 == man
    assert {f: os.path.getmtime(f) for f in files} == mtimes  # true no-op


def test_full_probe_equals_brute(store, ray_session):
    out, _ = store
    qs, qids = _queries()
    s = VectorStoreSearcher(out)
    exact = s.topk(qs, qids, 10, nprobe=8)
    brute = ann_cosine_topk(
        rd.read_parquet(SRC, columns=["vec_id", "embedding"]), qs, qids, 10
    )
    assert exact.equals(brute)


def test_partial_probe_reads_only_probed_cells(store):
    out, _ = store
    qs, _ = _queries()
    s = VectorStoreSearcher(out)
    probes, files = s.probe_dirs(qs, nprobe=2)
    assert probes.shape == (len(qs), 2)
    probed_cells = {f"cell={c}" for c in np.unique(probes)}
    touched = {os.path.basename(os.path.dirname(f)) for f in files}
    assert touched <= probed_cells
    all_cells = {
        os.path.basename(d) for d in glob.glob(os.path.join(out, CELLS_DIR, "cell=*"))
    }
    assert touched < all_cells  # strictly pruned


def test_partial_probe_results_are_subset_ranked(store, ray_session):
    out, _ = store
    qs, qids = _queries()
    s = VectorStoreSearcher(out)
    appr = s.topk(qs, qids, 10, nprobe=3)
    assert set(appr.schema.names) == {"query_id", "rank", "vec_id", "cos"}
    # every approximate hit's cos must equal the true cosine (exact scoring
    # inside probed cells — only candidate coverage is approximate)
    brute = ann_cosine_topk(
        rd.read_parquet(SRC, columns=["vec_id", "embedding"]), qs, qids, 500
    ).to_pandas()
    truth = {(q, v): c for q, v, c in zip(brute.query_id, brute.vec_id, brute.cos)}
    for q, v, c in zip(
        appr["query_id"].to_pylist(), appr["vec_id"].to_pylist(), appr["cos"].to_pylist()
    ):
        assert truth[(q, v)] == pytest.approx(c, abs=1e-12)


def test_dim_mismatch_raises(store):
    out, _ = store
    s = VectorStoreSearcher(out)
    with pytest.raises(ValueError, match="dim"):
        s.topk(np.zeros((1, 3)), np.array([0]), 5)


class TestVectorStoreUpsert:
    def test_add_delete_resurrect(self, ray_session, tmp_path):
        import pyarrow as pa

        from code_indexer_ray.ann.store import (
            add_to_vector_store,
            delete_from_vector_store,
            load_tombstones,
        )

        # base store over the first 400 vectors; delta adds the rest
        t = pq.read_table(SRC)
        base_src = str(tmp_path / "base.parquet")
        delta_src = str(tmp_path / "delta.parquet")
        pq.write_table(t.slice(0, 400).select(["vec_id", "embedding"]), base_src)
        pq.write_table(t.slice(400).select(["vec_id", "embedding"]), delta_src)
        out = str(tmp_path / "store")
        build_vector_store(base_src, out, n_centroids=8)

        qs, qids = _queries()
        s0 = VectorStoreSearcher(out)
        before = s0.topk(qs, qids, 10, nprobe=8)

        man = add_to_vector_store(out, delta_src)
        assert man["n_vectors"] == 500
        s1 = VectorStoreSearcher(out)
        after = s1.topk(qs, qids, 10, nprobe=8)
        # full probe after the add == brute force over the FULL table
        # (rank-identical; cos compared approximately — different GEMM batch
        # shapes may differ in the last ulp)
        brute = ann_cosine_topk(
            rd.read_parquet(SRC, columns=["vec_id", "embedding"]), qs, qids, 10
        )
        assert after.select(["query_id", "rank", "vec_id"]).equals(
            brute.select(["query_id", "rank", "vec_id"])
        )
        np.testing.assert_allclose(
            after["cos"].to_numpy(), brute["cos"].to_numpy(), atol=1e-12
        )
        assert not after.equals(before)  # the delta actually changed results

        # delete every vector that appears in the current top-10s
        victims = set(after["vec_id"].to_pylist())
        delete_from_vector_store(out, victims)
        s2 = VectorStoreSearcher(out)
        masked = s2.topk(qs, qids, 10, nprobe=8)
        assert not (set(masked["vec_id"].to_pylist()) & victims)

        # re-adding a deleted id resurrects it (tombstone cleared)
        some = sorted(victims)[:3]
        sel = t.filter(pa.compute.is_in(t["vec_id"], value_set=pa.array(some)))
        readd = str(tmp_path / "readd.parquet")
        pq.write_table(sel.select(["vec_id", "embedding"]), readd)
        add_to_vector_store(out, readd)
        assert not (set(some) & load_tombstones(out))
        s3 = VectorStoreSearcher(out)
        res = s3.topk(qs, qids, 10, nprobe=8)
        assert set(res["vec_id"].to_pylist()) & set(some)


class TestAccuracyProfiles:
    """Reference --accuracy fast|balanced|high resolved to IVF probe
    fractions (ann/accuracy.py); high on an 8-cell store probes half the
    cells; conflicts and bad profiles raise."""

    def test_profile_resolution(self):
        from code_indexer_ray.ann.accuracy import resolve_ef, resolve_nprobe, validate_accuracy

        assert resolve_nprobe("fast", 8) == 1
        assert resolve_nprobe("balanced", 8) == 2
        assert resolve_nprobe("high", 8) == 4
        assert resolve_nprobe("high", 64) == 32
        assert resolve_nprobe("fast", 2) == 1  # floor keeps tiny stores alive
        assert resolve_ef("fast", 10) == 32
        assert resolve_ef("balanced", 10) == 64
        assert resolve_ef("high", 100) == 400
        with pytest.raises(ValueError, match="accuracy"):
            validate_accuracy("turbo")

    def test_store_accuracy_equals_explicit_nprobe(self, store, ray_session):
        out, _man = store
        s = VectorStoreSearcher(out)
        qs, qids = _queries()
        for acc, npb in (("fast", 1), ("balanced", 2), ("high", 4)):
            a = s.topk(qs, qids, 5, accuracy=acc)
            b = s.topk(qs, qids, 5, nprobe=npb)
            assert a.equals(b), acc

    def test_conflict_and_default(self, store, ray_session):
        out, _man = store
        s = VectorStoreSearcher(out)
        qs, qids = _queries()
        with pytest.raises(ValueError, match="not both"):
            s.topk(qs, qids, 5, nprobe=2, accuracy="fast")
        # omitting both keeps the historical default (nprobe=4)
        assert s.topk(qs, qids, 5).equals(s.topk(qs, qids, 5, nprobe=4))

    def test_hnsw_accuracy_profile(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.ann.hnsw import hnsw_cosine_topk

        ds = rd.read_parquet(SRC)
        qs, qids = _queries()
        hi = hnsw_cosine_topk(ds, qs, qids, 5, accuracy="high")
        explicit = hnsw_cosine_topk(ds, qs, qids, 5, ef_search=128)
        assert hi.equals(explicit)
