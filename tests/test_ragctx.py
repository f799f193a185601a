"""RAG context extraction (query/ragctx.py) — window math, island merge,
budget fold, and the end-to-end table against a hand-computed fixture."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pytest

from code_indexer_ray.query.ragctx import (
    effective_context,
    extract_contexts,
    merge_islands,
)


def test_effective_context_adjustment():
    # 10 files × (500+50) > 5000 → shrink to 5000//10 - 50 = 450
    assert effective_context(
        10, context_lines=500, max_total_lines=5000, buffer=50,
        min_context=50, ensure_all_files=True,
    ) == 450
    # floor at min_context
    assert effective_context(
        1000, context_lines=500, max_total_lines=5000, buffer=50,
        min_context=50, ensure_all_files=True,
    ) == 50
    # no adjustment when everything fits / when disabled
    assert effective_context(
        5, context_lines=500, max_total_lines=5000, buffer=50,
        min_context=50, ensure_all_files=True,
    ) == 500
    assert effective_context(
        1000, context_lines=500, max_total_lines=5000, buffer=50,
        min_context=50, ensure_all_files=False,
    ) == 500


def test_merge_islands():
    # overlap, adjacency, and max-score propagation; input unsorted
    assert merge_islands([(5, 8, 1), (1, 3, 2), (4, 6, 3)]) == [(1, 8, 3)]
    assert merge_islands([(1, 2, 1), (4, 5, 2)]) == [(1, 2, 1), (4, 5, 2)]
    assert merge_islands([(1, 2, 1), (3, 5, 2)]) == [(1, 5, 2)]  # adjacent
    assert merge_islands([]) == []


def _mk_docs():
    # doc 0: 10 lines L1..L10; doc 1: 6 lines M1..M6
    t0 = "\n".join(f"L{i}" for i in range(1, 11))
    t1 = "\n".join(f"M{i}" for i in range(1, 7))
    return pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [t0, t1]})


@pytest.fixture()
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_mk_docs())


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_extract_contexts_end_to_end(docs_ds):
    # doc 1 has the better hit (score 5) → its island is taken first
    hits = pa.table(
        {
            "doc_id": pa.array([0, 0, 1], pa.int64()),
            "line_start": pa.array([2, 5, 3], pa.int64()),
            "line_end": pa.array([2, 5, 3], pa.int64()),
            "score": pa.array([1, 2, 5], pa.int64()),
        }
    )
    out = extract_contexts(
        hits, docs_ds, context_lines=1, max_total_lines=100,
        buffer=0, min_context=1,
    )
    rows = sorted(out.to_pylist(), key=lambda r: (r["doc_id"], r["line_start"]))
    # doc 0: windows [1,3] and [4,6] are adjacent → one island [1,6];
    # doc 1: [2,4]
    assert [(r["doc_id"], r["line_start"], r["line_end"], r["score"]) for r in rows] == [
        (0, 1, 6, 2),
        (1, 2, 4, 5),
    ]
    assert rows[0]["content_md5"] == _md5("L1\nL2\nL3\nL4\nL5\nL6")
    assert rows[1]["content_md5"] == _md5("M2\nM3\nM4")


def test_budget_truncates_crossing_island(docs_ds):
    hits = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "line_start": pa.array([5, 3], pa.int64()),
            "line_end": pa.array([5, 3], pa.int64()),
            "score": pa.array([1, 9], pa.int64()),
        }
    )
    # doc 1 first (score 9): island [1,5] = 5 lines; budget 7 leaves 2 for
    # doc 0's island [3,7] → truncated to [3,4]
    out = extract_contexts(
        hits, docs_ds, context_lines=2, max_total_lines=7,
        buffer=0, min_context=1,
    )
    rows = sorted(out.to_pylist(), key=lambda r: r["doc_id"])
    assert [(r["doc_id"], r["line_start"], r["line_end"]) for r in rows] == [
        (0, 3, 4),
        (1, 1, 5),
    ]
    assert rows[0]["content_md5"] == _md5("L3\nL4")


def test_budget_drops_after_exhaustion(docs_ds):
    hits = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "line_start": pa.array([5, 3], pa.int64()),
            "line_end": pa.array([5, 3], pa.int64()),
            "score": pa.array([1, 9], pa.int64()),
        }
    )
    out = extract_contexts(
        hits, docs_ds, context_lines=2, max_total_lines=5,
        buffer=0, min_context=1,
    )
    rows = out.to_pylist()
    assert [(r["doc_id"], r["line_start"], r["line_end"]) for r in rows] == [(1, 1, 5)]


def test_empty_hits(docs_ds):
    out = extract_contexts(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "line_start": pa.array([], pa.int64()),
                "line_end": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        ),
        docs_ds,
    )
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "line_start", "line_end", "score", "content_md5"]


def test_format_contexts():
    from code_indexer_ray.query.ragctx import format_contexts

    assert format_contexts([]) == "No relevant code contexts found."
    ctxs = [
        {"path": "a.py", "language": "python", "line_start": 3, "line_end": 4,
         "total_lines": 10, "score": 0.91, "content": "x = 1\ny = 2"},
        {"doc_id": 7, "line_start": 1, "line_end": 1, "score": 0.4,
         "content": "hello"},
    ]
    out = format_contexts(ctxs)
    assert "## Context 1: a.py (python)" in out
    assert "**Lines 3-4/10** | **Relevance: 0.910 (HIGH)**" in out
    assert "   3: x = 1\n   4: y = 2" in out
    assert "## Context 2: doc 7" in out and "(LOW)" in out
    # no line numbers
    plain = format_contexts(ctxs, include_line_numbers=False)
    assert "x = 1\ny = 2" in plain and "   3:" not in plain


def test_format_contexts_budget():
    from code_indexer_ray.query.ragctx import format_contexts

    ctxs = [
        {"path": f"f{i}.py", "line_start": 1, "line_end": 2, "score": 0.9,
         "content": "A" * 400}
        for i in range(10)
    ]
    out = format_contexts(ctxs, max_chars=1200)
    assert len(out) <= 1400  # budget + truncation note
    assert "truncated" in out
    assert out.count("## Context") < 10
