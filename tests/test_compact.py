"""Doc-store compaction: bounded file counts, identical point reads, atomic
crash-recoverable swap (VERDICT round-1 'small-file explosion' item)."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.index.compact import (
    compact_docstore,
    plan_groups,
    recover_docstore,
)
from code_indexer_ray.index.manifest import DOCSTORE_DIR
from code_indexer_ray.query.engine import IndexSearcher

from .test_index_e2e import _corpus_rows


def test_plan_groups_packs_and_keeps_overlaps_together():
    # disjoint files pack by byte budget
    ranges = [(0, 9, "a", 100), (10, 19, "b", 100), (20, 29, "c", 100)]
    assert plan_groups(ranges, target_bytes=250) == [["a", "b"], ["c"]]
    # overlapping ranges must never split across groups
    ranges = [(0, 9, "a", 100), (5, 19, "b", 100), (20, 29, "c", 100)]
    assert plan_groups(ranges, target_bytes=150) == [["a", "b"], ["c"]]
    # a single oversized cluster still becomes one group
    ranges = [(0, 50, "a", 400), (10, 60, "b", 400)]
    assert plan_groups(ranges, target_bytes=100) == [["a", "b"]]
    assert plan_groups([], target_bytes=100) == []


@pytest.fixture(scope="module")
def compacted_index(ray_session, tmp_path_factory):
    rows = _corpus_rows()
    tmp = tmp_path_factory.mktemp("compact")
    src = str(tmp / "corpus.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "index")
    build_index(
        src, out, store_cols=("lang", "url"), num_shards=4, num_buckets=2,
        target_docs_per_shard=32,
    )
    return rows, out


def _docstore_files(out):
    return sorted(glob.glob(os.path.join(out, DOCSTORE_DIR, "**", "*.parquet"), recursive=True))


def _all_texts(searcher, rows):
    return searcher._fetch_texts([r["doc_id"] for r in rows])


def test_compact_preserves_point_reads_and_search(compacted_index):
    rows, out = compacted_index
    before_files = _docstore_files(out)
    s = IndexSearcher(out)
    hits_before = s.search("spark merge", limit=10)
    texts_before = _all_texts(s, rows)
    assert texts_before  # sanity: point reads work pre-compaction

    stats = compact_docstore(out, target_bytes=1 << 30, row_group_size=1024)
    assert stats["files_before"] == len(before_files)
    assert stats["rows"] == len(rows)
    after_files = _docstore_files(out)
    assert len(after_files) == stats["files_after"] <= len(before_files)
    # one giant target → exactly one file per non-empty shard
    shards_with_docs = {os.path.dirname(f) for f in before_files}
    assert stats["files_after"] == len(shards_with_docs)

    s2 = IndexSearcher(out)
    assert _all_texts(s2, rows) == texts_before
    hits_after = s2.search("spark merge", limit=10)
    assert hits_after == hits_before


def test_compact_is_idempotent(compacted_index):
    _, out = compacted_index
    stats1 = compact_docstore(out, target_bytes=1 << 30)
    stats2 = compact_docstore(out, target_bytes=1 << 30)
    assert stats2["files_before"] == stats1["files_after"]
    assert stats2["files_after"] == stats1["files_after"]
    assert stats2["rows"] == stats1["rows"]


def test_recover_rolls_forward_interrupted_swap(compacted_index):
    rows, out = compacted_index
    live = os.path.join(out, DOCSTORE_DIR)
    stage = live + ".compact-stage"
    # simulate a crash after live -> old rename, before stage -> live
    shutil.copytree(live, stage)
    os.rename(live, live + ".pre-compact")
    assert recover_docstore(out) is True
    assert os.path.isdir(live) and not os.path.isdir(stage)
    assert not os.path.isdir(live + ".pre-compact")
    s = IndexSearcher(out)
    assert len(_all_texts(s, rows)) == len(rows)
    # healthy store: recovery is a no-op
    assert recover_docstore(out) is False
