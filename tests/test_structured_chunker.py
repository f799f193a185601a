"""Language-aware structural chunker vs a first-principles per-doc
recomputation (reference analog: indexing/chunker.py per-language regex
splitters feeding the fixed-size fallback)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.text.chunker import OVERLAP_PERCENTAGE, chunk_text
from code_indexer_ray.text.structured import (
    BOUNDARY_PATTERNS,
    structured_chunk_batch,
)


def _brute(doc_id, text, pattern, max_chars):
    """Per-doc reference: line split → boundary segments → whitespace-only
    segments dropped → fixed-size fallback inside oversized segments."""
    lines = text.split("\n")
    pat = re.compile(pattern)
    seg_starts = [0] + [i for i in range(1, len(lines)) if pat.match(lines[i])]
    # dedupe/sort (0 may also match)
    seg_starts = sorted(set(seg_starts))
    out = []
    for si, start in enumerate(seg_starts):
        end = seg_starts[si + 1] if si + 1 < len(seg_starts) else len(lines)
        seg = "\n".join(lines[start:end])
        if not seg.strip(" \t\n\r"):
            continue
        for c in chunk_text(seg, chunk_size=max_chars):
            out.append(
                {
                    "doc_id": doc_id,
                    "size": c["size"],
                    "line_start": c["line_start"] + start,
                    "line_end": c["line_end"] + start,
                    "chunk_text": c["text"],
                }
            )
    for i, c in enumerate(out):
        c["chunk_index"] = i
        c["total_chunks"] = len(out)
    return out


CASES = [
    ("python", "def a():\n    x = 1\n    y = 2\nclass B:\n    pass\n\ndef c():\n    return 3"),
    ("python", "x = 1\ny = 2"),                       # no boundary → one segment
    ("markdown", "# Title\ntext one\n## Sub\ntext two\n# Other\nmore"),
    ("default", "para one line a\nline b\n\npara two\n\n\npara three"),
    ("default", ""),                                   # empty → no chunks
    ("default", "   \n   "),                           # whitespace-only
    ("python", "def long():\n" + "\n".join(f"    line_{i} = {i}" for i in range(60))),
]


@pytest.mark.parametrize("language,text", CASES)
def test_matches_brute(language, text):
    max_chars = 120
    batch = pa.table({"doc_id": pa.array([7], pa.int64()), "text": pa.array([text])})
    got = structured_chunk_batch(batch, language=language, max_chars=max_chars).to_pylist()
    want = _brute(7, text, BOUNDARY_PATTERNS[language], max_chars)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (
            g["chunk_index"], g["total_chunks"], g["size"],
            g["line_start"], g["line_end"], g["chunk_text"],
        ) == (
            w["chunk_index"], w["total_chunks"], w["size"],
            w["line_start"], w["line_end"], w["chunk_text"],
        )


def test_multi_doc_batch_and_order():
    texts = [t for _l, t in CASES if t.strip()]
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": pa.array(texts)}
    )
    got = structured_chunk_batch(batch, language="python", max_chars=100)
    df = got.to_pandas()
    for d, g in df.groupby("doc_id"):
        assert list(g["chunk_index"]) == list(range(len(g)))
        assert (g["total_chunks"] == len(g)).all()
        want = _brute(int(d), texts[int(d)], BOUNDARY_PATTERNS["python"], 100)
        assert [r["chunk_text"] for r in want] == list(g["chunk_text"])


def test_oversized_segment_falls_back_to_fixed():
    body = "def f():\n" + "x" * 500
    batch = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([body])})
    got = structured_chunk_batch(batch, language="python", max_chars=120)
    assert got.num_rows > 1  # fixed-size arithmetic kicked in
    sizes = got["size"].to_pylist()
    assert max(sizes) <= 120
