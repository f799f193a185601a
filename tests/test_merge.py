"""Incremental maintenance: delta build + segment merge must be
indistinguishable from a from-scratch rebuild of the updated corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.index.merge import merge_indexes
from code_indexer_ray.query.engine import IndexSearcher

WORDS = ["spark", "merge", "join", "window", "scan", "batch", "filter", "sort"]


def _doc(i: int, version: int = 0) -> dict:
    toks = [WORDS[(i + j + version) % len(WORDS)] for j in range(5 + i % 7)]
    if version:
        toks.append("updatedmarker")
    return {
        "doc_id": i,
        "text": " ".join(toks),
        "lang": ["en", "de", "fr"][i % 3],
        "url": f"site{i % 5}/{i}",
    }


@pytest.fixture(scope="module")
def merged_vs_fresh(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("merge")
    kw = dict(
        store_cols=("lang", "url"), num_shards=4, num_buckets=4, doc_id_upper=109, resume=False
    )

    base_rows = [_doc(i) for i in range(100)]
    delta_rows = [_doc(i, version=1) for i in range(10, 20)] + [_doc(i) for i in range(100, 110)]
    combined = {r["doc_id"]: r for r in base_rows}
    combined.update({r["doc_id"]: r for r in delta_rows})

    paths = {}
    for name, rows in [("base", base_rows), ("delta", delta_rows), ("combined", list(combined.values()))]:
        p = str(tmp / f"{name}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), p)
        paths[name] = p

    base_idx = str(tmp / "base_idx")
    delta_idx = str(tmp / "delta_idx")
    fresh_idx = str(tmp / "fresh_idx")
    merged_idx = str(tmp / "merged_idx")
    build_index(paths["base"], base_idx, **kw)
    build_index(paths["delta"], delta_idx, **kw)
    build_index(paths["combined"], fresh_idx, **kw)
    m = merge_indexes(base_idx, delta_idx, merged_idx)
    return m, merged_idx, fresh_idx


def test_merged_manifest_matches_fresh(merged_vs_fresh):
    m, merged_idx, fresh_idx = merged_vs_fresh
    from code_indexer_ray.index.manifest import load_manifest

    fresh = load_manifest(fresh_idx)
    assert m.num_docs == fresh.num_docs == 110
    assert m.total_tokens == fresh.total_tokens
    assert {(p["shard"], p["bucket"]) for p in m.partitions} == {
        (p["shard"], p["bucket"]) for p in fresh.partitions
    }


def test_merged_segments_byte_identical_to_rebuild(merged_vs_fresh):
    m, merged_idx, fresh_idx = merged_vs_fresh
    for p in m.partitions:
        a = pq.read_table(os.path.join(merged_idx, p["path"]))
        b = pq.read_table(os.path.join(fresh_idx, p["path"]))
        assert a.equals(b), f"partition {p['path']} differs from fresh rebuild"


def test_merged_queries_match_fresh(merged_vs_fresh):
    _, merged_idx, fresh_idx = merged_vs_fresh
    sm = IndexSearcher(merged_idx)
    sf = IndexSearcher(fresh_idx)
    for q, kw in [
        ("updatedmarker", {}),
        ("spark join", {}),
        ("window", {"limit": 0}),
        ("merge", {"languages": ["de"]}),
    ]:
        rm = [(r["doc_id"], r["score"], r["path"]) for r in sm.search(q, snippet_lines=0, **kw)]
        rf = [(r["doc_id"], r["score"], r["path"]) for r in sf.search(q, snippet_lines=0, **kw)]
        assert rm == rf, q
    # updated docs searchable under new content, old content gone for them
    hits = {r["doc_id"] for r in sm.search("updatedmarker", limit=0)}
    assert hits == set(range(10, 20))
