"""Parallelism-independence: the same corpus built under different task
decompositions must produce byte-identical segments (the north-rule
determinism invariant), and multi-MB wide records must flow through."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.pipelines.corpus import generate_pages_block
from code_indexer_ray.query.engine import IndexSearcher


def test_segments_identical_across_parallelism(ray_session, tmp_path, monkeypatch):
    pages = generate_pages_block(0, 400, seed=7)
    src = str(tmp_path / "c.parquet")
    pq.write_table(pages, src, row_group_size=50)

    manifests = {}
    for blocks in ("4", "23"):
        monkeypatch.setenv("CIDX_READ_BLOCKS", blocks)
        out = str(tmp_path / f"idx_{blocks}")
        manifests[blocks] = build_index(
            src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=3, resume=False
        )
    a, b = manifests["4"], manifests["23"]
    assert a.total_tokens == b.total_tokens
    assert {(p["shard"], p["bucket"]) for p in a.partitions} == {
        (p["shard"], p["bucket"]) for p in b.partitions
    }
    for p in a.partitions:
        ta = pq.read_table(os.path.join(str(tmp_path / "idx_4"), p["path"]))
        tb = pq.read_table(os.path.join(str(tmp_path / "idx_23"), p["path"]))
        assert ta.equals(tb), f"{p['path']} differs across parallelism levels"


def test_wide_record_flows_through(ray_session, tmp_path):
    """doc 17 of the synthetic corpus is a ~40k-token wide record (multi-100KB
    text) — it must index, match, and chunk without special-casing."""
    pages = generate_pages_block(0, 40, seed=42)
    wide_len = len(pages["text"][17].as_py())
    assert wide_len > 200_000
    src = str(tmp_path / "w.parquet")
    pq.write_table(pages, src)
    out = str(tmp_path / "idx")
    m = build_index(src, out, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)
    assert m.num_docs == 40
    s = IndexSearcher(out)
    hits = s.search("t000000", limit=0)
    assert 17 in {h["doc_id"] for h in hits}
    # the wide doc's quantized length saturates correctly (fieldnorm bucket)
    from code_indexer_ray.index.fieldnorm import quantize_length

    assert quantize_length([40_000])[0] <= 40_000

    from code_indexer_ray.text.chunker import chunk_batch, num_chunks

    chunks = chunk_batch(pages.slice(17, 1).select(["doc_id", "text"]))
    assert chunks.num_rows == num_chunks(wide_len, 1000, 850)


def test_segments_identical_across_sort_group_split(ray_session, tmp_path, monkeypatch):
    """Forcing the two-level (multi-sort-group) build path via a tiny
    CIDX_SORT_GROUP_BYTES must produce segments byte-identical to the
    single-sort plan — and each group's read keeps the FULL block count
    (the round-5 fix: pro-rated blocks cluster a group's contiguous
    matching fragments into few tasks and serialize the tokenize wave)."""
    pages = generate_pages_block(0, 600, seed=11)
    src = str(tmp_path / "c.parquet")
    pq.write_table(pages, src, row_group_size=50)
    monkeypatch.setenv("CIDX_READ_BLOCKS", "16")

    monkeypatch.delenv("CIDX_SORT_GROUP_BYTES", raising=False)
    single = build_index(
        src, str(tmp_path / "idx_one"), store_cols=("lang", "url"),
        num_shards=4, num_buckets=3, resume=False,
    )
    monkeypatch.setenv("CIDX_SORT_GROUP_BYTES", "1")  # 1 byte: group per shard
    split = build_index(
        src, str(tmp_path / "idx_split"), store_cols=("lang", "url"),
        num_shards=4, num_buckets=3, resume=False,
    )
    assert single.total_tokens == split.total_tokens
    assert single.num_docs == split.num_docs == 600
    parts = {(p["shard"], p["bucket"]): p["path"] for p in single.partitions}
    parts_b = {(p["shard"], p["bucket"]): p["path"] for p in split.partitions}
    assert set(parts) == set(parts_b)
    for key, path in parts.items():
        ta = pq.read_table(os.path.join(str(tmp_path / "idx_one"), path))
        tb = pq.read_table(os.path.join(str(tmp_path / "idx_split"), parts_b[key]))
        assert ta.equals(tb), f"{key} differs between single-sort and split plans"
    # and the split index serves identically
    s = IndexSearcher(str(tmp_path / "idx_split"), lang_col="lang", url_col="url")
    s1 = IndexSearcher(str(tmp_path / "idx_one"), lang_col="lang", url_col="url")
    q = "t000012"
    assert [
        (h["doc_id"], round(h["score"], 9)) for h in s.search(q, snippet_lines=0)
    ] == [(h["doc_id"], round(h["score"], 9)) for h in s1.search(q, snippet_lines=0)]
