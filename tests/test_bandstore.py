"""Persisted LSH band store: build / append-generation / co-partitioned
probe — candidates must equal the brute band-join of new×old, appends
must equal a from-scratch build over the union, and probes must agree
with the batch pipeline's candidate semantics."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.dedup.bandstore import (
    append_band_store,
    build_band_store,
    probe_band_store,
)
from code_indexer_ray.dedup.minhash import MERSENNE_31, band_batch, minhash_batch_fast


def _corpus(ids, texts):
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": pa.array(texts)})


def _brute_pairs(new_tbl: pa.Table, old_tbl: pa.Table) -> set[tuple[int, int]]:
    def bands(t):
        b = band_batch(minhash_batch_fast(t), mod=MERSENNE_31)
        return b.to_pandas()

    nb, ob = bands(new_tbl), bands(old_tbl)
    hit = nb.merge(ob, on=["band_id", "band_hash"], suffixes=("_new", "_old"))
    return set(zip(hit["doc_id_new"].astype(int), hit["doc_id_old"].astype(int)))


def _collect_pairs(ds) -> set[tuple[int, int]]:
    out = set()
    for b in ds.iter_batches(batch_format="pandas"):
        if len(b):
            out |= set(zip(b["new_id"].astype(int), b["old_id"].astype(int)))
    return out


BASE = [
    "the quick brown fox jumps over the lazy dog tonight",
    "completely unrelated text about ray data pipelines and arrow tables",
    "another page describing inverted index construction at web scale",
    "short one",
    "",
]


@pytest.fixture()
def store(ray_session, tmp_path):
    old_rows = _corpus(
        list(range(1, 11)),
        [BASE[i % len(BASE)] + f" variant {i // len(BASE)}" for i in range(10)],
    )
    src = str(tmp_path / "old.parquet")
    pq.write_table(old_rows, src)
    sdir = str(tmp_path / "bstore")
    man = build_band_store(src, sdir, num_parts=4)
    return sdir, old_rows, man


def test_build_and_probe_matches_brute(store, tmp_path):
    sdir, old_rows, man = store
    assert man["generations"] == 1 and man["total_rows"] > 0
    # new corpus: exact dup of old doc 1, near text, and a fresh doc
    new_rows = _corpus(
        [100, 101, 102],
        [
            BASE[0] + " variant 0",  # identical to old doc_id=1 text
            "the quick brown fox jumps over the lazy dog tonight extra",
            "totally fresh never seen content zebra quartz",
        ],
    )
    nsrc = str(tmp_path / "new.parquet")
    pq.write_table(new_rows, nsrc)
    got = _collect_pairs(probe_band_store(sdir, nsrc))
    want = _brute_pairs(new_rows, old_rows)
    assert got == want
    assert any(n == 100 and o == 1 for n, o in got)  # the exact dup is found
    assert all(n != 102 for n, _ in got)  # fresh doc matches nothing


def test_append_equals_union_rebuild(store, tmp_path):
    sdir, old_rows, _ = store
    extra = _corpus([50, 51], [BASE[0] + " variant 9", "brand new appended page words"])
    esrc = str(tmp_path / "extra.parquet")
    pq.write_table(extra, esrc)
    man2 = append_band_store(sdir, esrc)
    assert man2["generations"] == 2

    new_rows = _corpus([200], [BASE[0] + " variant 9"])
    nsrc = str(tmp_path / "probe.parquet")
    pq.write_table(new_rows, nsrc)
    got = _collect_pairs(probe_band_store(sdir, nsrc))

    union = pa.concat_tables([old_rows, extra])
    assert got == _brute_pairs(new_rows, union)
    assert (200, 50) in got  # matches the appended near-identical doc


def test_rebuild_clears_stale_parts(store, tmp_path):
    sdir, _, _ = store
    # leave a stray part around, rebuild over a tiny corpus: the stray
    # must not pollute probes
    stray = os.path.join(sdir, "part-00003", "gen-000000.parquet")
    assert os.path.exists(os.path.join(sdir, "_bandstore.json"))
    tiny = _corpus([7], ["only document in the rebuilt store words here"])
    tsrc = str(tmp_path / "tiny.parquet")
    pq.write_table(tiny, tsrc)
    man = build_band_store(tsrc, sdir, num_parts=4)
    assert man["generations"] == 1
    probe = _corpus([300], [BASE[0] + " variant 0"])
    psrc = str(tmp_path / "p.parquet")
    pq.write_table(probe, psrc)
    got = _collect_pairs(probe_band_store(sdir, psrc))
    assert got == _brute_pairs(probe, tiny)  # old corpus rows are gone


def test_probe_prunes_row_groups(store, tmp_path):
    """The pruned read must return the same join inputs as a full read —
    checked indirectly (results equal brute) plus at least one file has
    multiple row groups when ROW_GROUP is tiny."""
    from code_indexer_ray.dedup import bandstore as bs

    old = _corpus(
        list(range(1000, 1200)),
        [f"document number {i} with shared boilerplate words" for i in range(200)],
    )
    src = str(tmp_path / "big.parquet")
    pq.write_table(old, src)
    sdir = str(tmp_path / "big_store")
    orig = bs.ROW_GROUP
    bs.ROW_GROUP = 64
    try:
        build_band_store(src, sdir, num_parts=2)
    finally:
        bs.ROW_GROUP = orig
    f = os.path.join(sdir, "part-00000", "gen-000000.parquet")
    assert pq.ParquetFile(f).metadata.num_row_groups > 1
    probe = _corpus([5000], ["document number 17 with shared boilerplate words"])
    psrc = str(tmp_path / "probe.parquet")
    pq.write_table(probe, psrc)
    got = _collect_pairs(probe_band_store(sdir, psrc))
    assert got == _brute_pairs(probe, old)
    assert (5000, 1017) in got
