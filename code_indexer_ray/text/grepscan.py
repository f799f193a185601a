"""Direct regex line scan over corpus text — the index-bypassing "grep"
surface (reference ``global_repos/regex_search.py``: ripgrep-style search
straight against the files of a repository, returning per-match file, line
number, column, line content and context lines, with truncation at a match
cap).

Here the corpus is a Dataset of (doc_id, text) rows and the scan is one
shuffle-free vectorized ``map_batches`` pass: split to lines (zero-copy list
offsets), one RE2 ``match_substring_regex`` over the flat line array, and
the match column derived as ``len(first split prefix) + 1`` — the same
definition DuckDB's ``regexp_split_to_array`` yields, so the SQL twin is
exact.  Context lines come from index-shifted takes within the same doc (no
cross-row Python).  At 100 TB this is the "cold grep" path: it streams the
text column only, never builds state, and parallelism is the block stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("line_number", pa.int64()),
        ("col", pa.int64()),
        ("line_content", pa.string()),
        ("ctx_before", pa.string()),
        ("ctx_after", pa.string()),
    ]
)


def scan_batch(batch: pa.Table, pattern: str, context: int = 1) -> pa.Table:
    """All regex-matching lines of ``batch['text']`` with 1-based line
    numbers, 1-based match column (chars before the first match + 1) and
    up to ``context`` (0 or 1) neighbouring lines joined per side."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lines = pc.split_pattern(texts, "\n")
    flat = pc.list_flatten(lines)
    off = lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_lines = np.diff(off)
    parent = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_lines)
    line0 = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], n_lines)

    mask = pc.match_substring_regex(flat, pattern)
    idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
    if len(idx) == 0:
        return _SCHEMA.empty_table()
    sel = pc.take(flat, pa.array(idx))
    # Column: chars before the first match.  RE2 split on both sides keeps
    # this definition exactly SQL-expressible (regexp_split_to_array[1]).
    prefix = pc.list_element(pc.split_pattern_regex(sel, pattern, max_splits=1), 0)
    col = pc.add(pc.utf8_length(prefix).cast(pa.int64()), 1)

    def _ctx(shift: int, valid: np.ndarray) -> pa.Array:
        taken = pc.take(flat, pa.array(np.where(valid, idx + shift, 0)))
        return pc.if_else(pa.array(valid), taken, pa.scalar("", type=pa.string()))

    if context:
        before = _ctx(-1, line0[idx] > 0)
        after = _ctx(+1, line0[idx] < n_lines[parent[idx]] - 1)
    else:
        empty = pa.array([""] * len(idx), type=pa.string())
        before = after = empty
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[parent[idx]], type=pa.int64()),
            "line_number": pa.array(line0[idx] + 1, type=pa.int64()),
            "col": col,
            "line_content": sel,
            "ctx_before": before,
            "ctx_after": after,
        }
    )


def regex_line_scan(ds, pattern: str, *, context: int = 1):
    """Dataset of matching lines (doc_id, line_number, col, line_content,
    ctx_before, ctx_after).  Lazy; composes with any upstream transform."""
    return ds.map_batches(
        lambda b: scan_batch(b, pattern, context), batch_format="pyarrow"
    )


def regex_search(ds, pattern: str, *, max_matches: int = 1000, context: int = 1) -> dict:
    """Service-shaped result (reference ``RegexSearchResult``): the first
    ``max_matches`` matches in (doc_id, line_number) order plus
    ``total_matches`` / ``truncated``.  The matched set is materialized ONCE
    (it is output-sized, bounded by the cap's consumer anyway), then counted
    and cut — never the corpus."""
    matched = regex_line_scan(ds, pattern, context=context).materialize()
    total = matched.count()
    rows = matched.sort(["doc_id", "line_number"]).limit(max_matches).take_all()
    return {
        "matches": rows,
        "total_matches": total,
        "truncated": total > max_matches,
        "search_engine": "ray-arrow-re2",
    }
