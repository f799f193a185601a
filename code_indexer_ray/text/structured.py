"""Language-aware structural chunker (round 3).

Reference analog: ``indexing/chunker.py`` (1,109 lines of per-language
regex splitters feeding the same chunk table as the fixed-size path).  The
semantics here are a deterministic, SQL-expressible distillation of that
design — NOT a port:

1. the document splits into LINES;
2. a line matching the language's BOUNDARY regex starts a new segment (the
   first line always starts segment 0) — ``def``/``class`` for python,
   ``func`` for go, headings for markdown, blank lines (paragraphs) for
   plain text;
3. each segment becomes one chunk, UNLESS it exceeds ``max_chars`` — then
   the fixed-size arithmetic (15 % overlap, ``chunker.py`` semantics) splits
   it, so no chunk ever exceeds the embedding-model budget;
4. whitespace-only segments produce no chunks (the fixed chunker's
   empty-doc rule, applied per segment);
5. line numbers are 1-based over the ORIGINAL document.

Everything is vectorized: one line split per batch, one RE2 match over the
flat line array, segment texts rebuilt via list-offsets + ``binary_join``,
oversized segments routed through the existing vectorized fixed-size
kernel with line-number offsets re-based to the document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .chunker import OVERLAP_PERCENTAGE, chunk_batch

#: per-language structural boundary patterns (RE2, anchored per line).
BOUNDARY_PATTERNS: dict[str, str] = {
    "python": r"^(def |class |async def |@)",
    "javascript": r"^(function |class |const |export )",
    "typescript": r"^(function |class |const |export |interface )",
    "go": r"^(func |type )",
    "java": r"^(public |private |protected |class )",
    "rust": r"^(fn |pub |impl |struct |enum )",
    "markdown": r"^#{1,6} ",
    # plain text: a blank line starts a new paragraph segment
    "default": r"^[ \t]*$",
}


def boundary_pattern(language: str | None) -> str:
    return BOUNDARY_PATTERNS.get((language or "default").lower(), BOUNDARY_PATTERNS["default"])


def structured_chunk_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    language: str | None = None,
    max_chars: int = 1000,
) -> pa.Table:
    """(doc_id, chunk_index, total_chunks, size, line_start, line_end,
    chunk_text) rows — same shape as the fixed-size kernel, structural
    boundaries first, fixed-size fallback inside oversized segments."""
    pattern = boundary_pattern(language)
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    line_lists = pc.split_pattern(texts, "\n")
    flat = pc.list_flatten(line_lists)
    parents = pc.list_parent_indices(line_lists).to_numpy(zero_copy_only=False)
    n_lines_per_row = np.zeros(len(texts), dtype=np.int64)
    if len(parents):
        n_lines_per_row = np.bincount(parents, minlength=len(texts)).astype(np.int64)
    row_line_offs = np.concatenate(([0], np.cumsum(n_lines_per_row)))

    if len(flat) == 0:
        return _empty_chunks()

    is_boundary = pc.match_substring_regex(flat, pattern).to_numpy(zero_copy_only=False)
    # the first line of every row starts its segment 0 regardless of pattern
    first_line = np.zeros(len(flat), dtype=bool)
    first_line[row_line_offs[:-1][n_lines_per_row > 0]] = True
    seg_start = is_boundary | first_line
    seg_id = np.cumsum(seg_start) - 1  # global segment id, contiguous

    # one row per segment: parent row, first line index, line count
    sstarts = np.flatnonzero(seg_start)
    seg_row = parents[sstarts]
    seg_nlines = np.diff(np.r_[sstarts, len(flat)])
    # line_start (1-based within the document)
    seg_line_start = sstarts - row_line_offs[seg_row] + 1

    # segment text: lines joined by \n via list offsets (zero-copy slices)
    seg_off = np.concatenate((sstarts, [len(flat)])).astype(np.int64)
    seg_lists = pa.LargeListArray.from_arrays(
        pa.array(seg_off, type=pa.int64()), flat.cast(pa.large_string())
    )
    seg_text = pc.binary_join(seg_lists, pa.scalar("\n", type=pa.large_string()))

    # drop whitespace-only segments (per-segment empty-doc rule)
    keep = pc.not_equal(
        pc.utf8_trim(seg_text, " \t\n\r"), pa.scalar("", type=pa.large_string())
    ).to_numpy(zero_copy_only=False)
    if not keep.any():
        return _empty_chunks()
    seg_text = seg_text.filter(pa.array(keep))
    seg_row = seg_row[keep]
    seg_nlines = seg_nlines[keep]
    seg_line_start = seg_line_start[keep]

    # route through the fixed-size kernel with a synthetic per-segment id;
    # small segments come back as exactly one chunk (len <= max_chars)
    seg_pk = np.arange(len(seg_row), dtype=np.int64)
    sub = chunk_batch(
        pa.table({"doc_id": pa.array(seg_pk), "text": seg_text.cast(pa.string())}),
        chunk_size=max_chars,
    )
    spk = sub["doc_id"].to_numpy(zero_copy_only=False)
    # re-base the kernel's segment-relative line numbers to the document
    base = seg_line_start[spk] - 1
    line_start = sub["line_start"].to_numpy(zero_copy_only=False) + base
    line_end = sub["line_end"].to_numpy(zero_copy_only=False) + base
    doc = ids[seg_row[spk]]
    ci_in_seg = sub["chunk_index"].to_numpy(zero_copy_only=False)

    # per-document chunk_index in (segment, sub-chunk) order
    order = np.lexsort((ci_in_seg, spk))
    doc_s = doc[order]
    starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
    counts = np.diff(np.r_[starts, len(doc_s)])
    ci = np.arange(len(doc_s), dtype=np.int64) - np.repeat(starts, counts)
    total = np.repeat(counts, counts)
    return pa.table(
        {
            "doc_id": pa.array(doc_s, type=pa.int64()),
            "chunk_index": pa.array(ci, type=pa.int64()),
            "total_chunks": pa.array(total, type=pa.int64()),
            "size": sub["size"].take(pa.array(order)),
            "line_start": pa.array(line_start[order], type=pa.int64()),
            "line_end": pa.array(line_end[order], type=pa.int64()),
            "chunk_text": sub["chunk_text"].take(pa.array(order)),
        }
    )


def _empty_chunks() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_index": pa.array([], pa.int64()),
            "total_chunks": pa.array([], pa.int64()),
            "size": pa.array([], pa.int64()),
            "line_start": pa.array([], pa.int64()),
            "line_end": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )


def synthesize_code_batch(batch: pa.Table) -> pa.Table:
    """documents row → ``text`` rewritten as a deterministic code-shaped
    document: body lines of 8 tokens (4-space indent), a ``def f{j}():``
    header before every 3rd body line — real structural boundaries for the
    chunker, reproducible token-for-token in SQL.  Fully vectorized (same
    pattern as :func:`..text.c4.synthesize_lines_batch`)."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks)
    n_tok = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    off = np.concatenate(([0], np.cumsum(n_tok)))
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], n_tok)
    j = pos // 8
    line_start = pos % 8 == 0
    last = pos == np.repeat(n_tok - 1, n_tok)
    line_end = ((pos + 1) % 8 == 0) & ~last
    jstr = pc.cast(pa.array(j, type=pa.int64()), pa.string())
    hdr = pc.binary_join_element_wise(
        pa.scalar("def f"), jstr, pa.scalar("():\n    "), pa.scalar("")
    )
    ls = pa.array(line_start)
    pref = pc.if_else(
        pc.and_(ls, pa.array((j % 3) == 0)),
        hdr,
        pc.if_else(ls, pa.scalar("    "), pa.scalar("")),
    )
    suffix = pa.array(np.where(line_end, "\n", np.where(last, "", " ")), type=pa.string())
    glued = pc.binary_join_element_wise(pref, flat, suffix, pa.scalar(""))
    lined = pc.binary_join(pa.ListArray.from_arrays(toks.offsets, glued), "")
    cols = {name: batch[name] for name in batch.column_names}
    cols["text"] = lined
    return pa.table(cols)


def synthesize_calls_batch(batch: pa.Table) -> pa.Table:
    """Like :func:`synthesize_code_batch`, plus ONE function call planted at
    the end of every body line: body line ``j`` calls ``f{3·((j·5+1) mod H)}``
    where ``H`` is the doc's def count — every callee exists, the call graph
    is deterministic, and the whole construction is closed-form in SQL (the
    symbol-extraction twins recompute it without parsing)."""
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks)
    n_tok = np.diff(toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    off = np.concatenate(([0], np.cumsum(n_tok)))
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], n_tok)
    j = pos // 8
    line_start = pos % 8 == 0
    last = pos == np.repeat(n_tok - 1, n_tok)
    last_in_line = (((pos + 1) % 8 == 0) | last)
    # per-row def count H = floor((n_body-1)/3)+1, n_body = ceil(n_tok/8)
    n_body = -(-n_tok // 8)
    h_row = np.maximum((n_body - 1) // 3 + 1, 1)
    h = np.repeat(h_row, n_tok)
    callee = 3 * ((j * 5 + 1) % h)

    jstr = pc.cast(pa.array(j, type=pa.int64()), pa.string())
    cstr = pc.cast(pa.array(callee, type=pa.int64()), pa.string())
    hdr = pc.binary_join_element_wise(
        pa.scalar("def f"), jstr, pa.scalar("():\n    "), pa.scalar("")
    )
    ls = pa.array(line_start)
    pref = pc.if_else(
        pc.and_(ls, pa.array((j % 3) == 0)),
        hdr,
        pc.if_else(ls, pa.scalar("    "), pa.scalar("")),
    )
    call = pc.binary_join_element_wise(pa.scalar(" f"), cstr, pa.scalar("()"), pa.scalar(""))
    nl = pa.array(np.where(last, "", "\n"), type=pa.string())
    suffix = pc.if_else(
        pa.array(last_in_line),
        pc.binary_join_element_wise(call, nl, pa.scalar("")),
        pa.scalar(" "),
    )
    glued = pc.binary_join_element_wise(pref, flat, suffix, pa.scalar(""))
    lined = pc.binary_join(pa.ListArray.from_arrays(toks.offsets, glued), "")
    cols = {name: batch[name] for name in batch.column_names}
    cols["text"] = lined
    return pa.table(cols)
