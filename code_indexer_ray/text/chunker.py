"""Fixed-size chunker — behavioral port of the reference algorithm.

Semantics from ``indexing/fixed_size_chunker.py:100-169`` (observed, not
copied): fixed ``chunk_size`` character windows with 15% overlap
(step = chunk_size − int(chunk_size·0.15)); the last chunk takes the
remaining text; empty/whitespace-only text produces no chunks; 1-based
line numbers from newline counts (``:75-98``).  This arithmetic is the
"byte-identical extracted text" determinism anchor — covered by golden-hash
tests and the DuckDB oracle (same formulas in SQL).

The batch kernel is vectorized: chunk starts are computed arithmetically for
the whole batch (repeat/cumsum), slices via ``pc.utf8_slice_codeunits`` and
line numbers via vectorized substring newline counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_CHUNK_SIZE = 1000
OVERLAP_PERCENTAGE = 0.15
MODEL_CHUNK_SIZES = {  # model-aware sizing (reference fixed_size_chunker.py:34-41)
    "voyage-code-3": 4096,
    "voyage-code-2": 4096,
    "voyage-large-2": 4096,
    "voyage-3": 4096,
    "voyage-3-large": 4096,
    "default": DEFAULT_CHUNK_SIZE,
}


def chunk_params(model: str | None = None) -> tuple[int, int, int]:
    """(chunk_size, overlap, step) for a model name."""
    size = MODEL_CHUNK_SIZES.get(model or "default", DEFAULT_CHUNK_SIZE)
    overlap = int(size * OVERLAP_PERCENTAGE)
    return size, overlap, size - overlap


def num_chunks(text_len: int, chunk_size: int, step: int) -> int:
    """Chunk count for a non-empty text (loop-equivalent closed form)."""
    if text_len <= chunk_size:
        return 1
    return 1 + -(-(text_len - chunk_size) // step)


def chunk_text(text: str, chunk_size: int = DEFAULT_CHUNK_SIZE) -> list[dict]:
    """Reference-shaped single-doc chunker (used by tests as the oracle)."""
    if not text or not text.strip():
        return []
    overlap = int(chunk_size * OVERLAP_PERCENTAGE)
    step = chunk_size - overlap
    chunks = []
    current_start = 0
    chunk_index = 0
    while current_start < len(text):
        chunk_end = current_start + chunk_size
        piece = text[current_start:] if chunk_end >= len(text) else text[current_start:chunk_end]
        actual_end = min(current_start + len(piece), len(text))
        chunks.append(
            {
                "text": piece,
                "chunk_index": chunk_index,
                "size": len(piece),
                "line_start": text[:current_start].count("\n") + 1,
                "line_end": text[:actual_end].count("\n") + 1,
            }
        )
        if chunk_end >= len(text):
            break
        current_start += step
        chunk_index += 1
    total = len(chunks)
    for c in chunks:
        c["total_chunks"] = total
    return chunks


def chunk_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> pa.Table:
    """Vectorized batch chunker: one input row → ``num_chunks`` output rows.

    Output columns: doc_id, chunk_index (int64), total_chunks (int64),
    chunk_text (string), size (int64), line_start (int64), line_end (int64).
    """
    overlap = int(chunk_size * OVERLAP_PERCENTAGE)
    step = chunk_size - overlap

    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    stripped = pc.utf8_trim_whitespace(texts)
    nonempty = pc.greater(pc.utf8_length(stripped), 0).to_numpy(zero_copy_only=False)

    n_chunks = np.where(
        ~nonempty, 0, np.where(lens <= chunk_size, 1, 1 + -(-(lens - chunk_size) // step))
    ).astype(np.int64)
    total = int(n_chunks.sum())
    if total == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_index": pa.array([], pa.int64()),
                "total_chunks": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "size": pa.array([], pa.int64()),
                "line_start": pa.array([], pa.int64()),
                "line_end": pa.array([], pa.int64()),
            }
        )

    row_of = np.repeat(np.arange(len(lens)), n_chunks)
    first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
    chunk_idx = np.arange(total) - np.repeat(first, n_chunks)
    starts = chunk_idx * step
    piece_len = np.minimum(starts + chunk_size, lens[row_of]) - starts

    texts_rep = texts.take(pa.array(row_of))
    # utf8_slice_codeunits takes scalar bounds → one pass per distinct
    # chunk_index (= max chunks of any doc in the batch), each vectorized.
    pieces_np = np.empty(total, dtype=object)
    win_nl = np.zeros(total, dtype=np.int64)  # newlines in disjoint window [k·step, (k+1)·step)
    for k in np.unique(chunk_idx):
        mask = chunk_idx == k
        sub = texts_rep.filter(pa.array(mask))
        s = int(k) * step
        sl = pc.utf8_slice_codeunits(sub, start=s, stop=s + chunk_size)
        pieces_np[np.flatnonzero(mask)] = sl.to_numpy(zero_copy_only=False)
        win = pc.utf8_slice_codeunits(sub, start=s, stop=s + step)
        win_nl[np.flatnonzero(mask)] = pc.count_substring(win, "\n").to_numpy(zero_copy_only=False)
    pieces = pa.array(pieces_np, type=pa.string())

    # line_start = 1 + newlines before the chunk = per-doc exclusive cumsum of
    # the disjoint step-window newline counts; line_end adds newlines inside
    # the chunk itself (the piece IS text[start:actual_end]).
    cums = np.cumsum(win_nl)
    excl = cums - win_nl
    excl_within = excl - np.repeat(excl[np.minimum(first, total - 1)], n_chunks)
    line_start = excl_within + 1
    nl_in_piece = pc.count_substring(pieces, "\n").to_numpy(zero_copy_only=False)
    line_end = excl_within + nl_in_piece + 1

    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[row_of]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "chunk_index": pa.array(chunk_idx.astype(np.int64)),
            "total_chunks": pa.array(n_chunks[row_of].astype(np.int64)),
            "chunk_text": pieces,
            "size": pa.array(piece_len.astype(np.int64)),
            "line_start": pa.array(line_start),
            "line_end": pa.array(line_end),
        }
    )
