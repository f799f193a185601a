"""apply_delta: keep-latest → delta build → merge, end-to-end, plus unicode
char-offset semantics (the reference's unicode-columns test analog)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.pipelines.incremental import apply_delta
from code_indexer_ray.query.engine import IndexSearcher


def test_apply_delta_end_to_end(ray_session, tmp_path):
    base_rows = [
        {"doc_id": i, "text": f"alpha beta doc{i}", "lang": "en", "url": f"u/{i}"}
        for i in range(20)
    ]
    src = str(tmp_path / "base.parquet")
    pq.write_table(pa.Table.from_pylist(base_rows), src)
    base_idx = str(tmp_path / "base_idx")
    build_index(
        src, base_idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2,
        doc_id_upper=63, resume=False,
    )

    # delta: two versions of doc 3 (keep-latest must pick ts=2) + new doc 25
    delta_rows = [
        {"doc_id": 3, "warc_ts": 1, "text": "stale version", "lang": "en", "url": "u/3"},
        {"doc_id": 3, "warc_ts": 2, "text": "freshmarker gamma", "lang": "en", "url": "u/3"},
        {"doc_id": 25, "warc_ts": 1, "text": "newdoc gamma", "lang": "de", "url": "u/25"},
    ]
    dsrc = str(tmp_path / "delta.parquet")
    pq.write_table(pa.Table.from_pylist(delta_rows), dsrc)

    out = str(tmp_path / "merged_idx")
    m = apply_delta(base_idx, dsrc, out, ts_col="warc_ts")
    assert m.num_docs == 21

    s = IndexSearcher(out)
    assert [r["doc_id"] for r in s.search("freshmarker", limit=0)] == [3]
    assert [r["doc_id"] for r in s.search("stale", limit=0)] == []
    assert {r["doc_id"] for r in s.search("gamma", limit=0)} == {3, 25}
    assert [r["doc_id"] for r in s.search("doc3", limit=0)] == []  # old content gone
    assert len(s.search("alpha", limit=0)) == 19  # doc 3 replaced


def test_unicode_char_offsets(ray_session, tmp_path):
    """Match column/line are CHARACTER offsets (reference's unicode-columns
    contract): multibyte prefixes must not shift the reported column."""
    rows = [{"doc_id": 0, "text": "äöü αβγ 🎈🎈\nπρefix spark end", "lang": "de", "url": "u/0"}]
    src = str(tmp_path / "u.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "u_idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, num_buckets=1, resume=False)
    s = IndexSearcher(idx)
    r = s.search("spark", limit=1, snippet_lines=1)[0]
    text = rows[0]["text"]
    line2 = text.split("\n")[1]
    assert r["line"] == 2
    assert r["column"] == line2.index("spark") + 1  # char-based, 1-indexed
    assert r["snippet"] == text  # ±1 line covers both lines
