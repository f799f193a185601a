"""Tantivy-default-compatible text analysis, vectorized over Arrow.

The reference's ``content`` field uses Tantivy's default analyzer
(SimpleTokenizer → RemoveLongFilter(40) → LowerCaser; schema declared at
reference ``services/tantivy_index_manager.py:96-103``):

1. split on runs of non-alphanumeric characters,
2. drop raw tokens whose UTF-8 byte length is >= 40,
3. lowercase.

We express "alphanumeric" as the RE2 class ``[\\p{L}\\p{N}]`` so the exact
same pattern runs in pyarrow (RE2) on the engine side and in DuckDB (RE2) on
the oracle side — deterministic parity by construction.

All kernels take/return Arrow arrays (zero-copy from the Ray object store);
no per-row Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: RE2 pattern of token *separators* (complement of alphanumeric).
TOKEN_SEPARATOR_RE = r"[^\p{L}\p{N}]+"
#: Raw tokens with UTF-8 byte length >= this are dropped (Tantivy RemoveLongFilter(40)).
MAX_TOKEN_BYTES = 40


def tokenize_flat(texts: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    """Tokenize a column of texts.

    Returns ``(tokens, row_indices)`` where ``tokens`` is a flat Arrow string
    array of lowercased tokens and ``row_indices[i]`` is the input row the
    i-th token came from.  Rows producing no tokens simply don't appear.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    token_lists = pc.split_pattern_regex(texts, pattern=TOKEN_SEPARATOR_RE)
    flat = pc.list_flatten(token_lists)
    parents = pc.list_parent_indices(token_lists).to_numpy(zero_copy_only=False)
    nbytes = pc.binary_length(flat)  # byte length (RemoveLongFilter counts UTF-8 bytes)
    keep = pc.and_(pc.greater(nbytes, 0), pc.less(nbytes, MAX_TOKEN_BYTES))
    keep_np = keep.to_numpy(zero_copy_only=False)
    tokens = pc.utf8_lower(flat.filter(keep))
    return tokens, parents[keep_np]


def token_counts(texts: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Per-row token count (after the length filter) — the BM25 field length."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    _, parents = tokenize_flat(texts)
    if not len(parents):
        return np.zeros(len(texts), dtype=np.int64)
    return np.bincount(parents, minlength=len(texts)).astype(np.int64)


def term_frequencies(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch and aggregate to (term, row, tf) triples.

    Returns ``(terms, row_indices, tfs, row_token_counts)`` where the first
    three are parallel (one entry per distinct (row, term) pair) and
    ``row_token_counts[r]`` is the total token count of input row ``r``
    (0 for rows with no tokens).  Aggregation uses Arrow's hash group-by —
    vectorized, no Python loop over tokens.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tokens, parents = tokenize_flat(texts)
    row_counts = (
        np.bincount(parents, minlength=len(texts)).astype(np.int64)
        if len(parents)
        else np.zeros(len(texts), dtype=np.int64)
    )
    if len(tokens) == 0:
        return (
            pa.DictionaryArray.from_arrays(
                pa.array([], type=pa.int32()), pa.array([], type=pa.string())
            ),
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            row_counts,
        )
    # dictionary-encode before the tf aggregation: grouping int codes is
    # faster than hashing strings, and the dictionary-typed output column
    # halves downstream shuffle bytes (indices + one vocab per block)
    dic = pc.dictionary_encode(tokens)
    tbl = pa.table(
        {"row": pa.array(parents, type=pa.int64()), "code": dic.indices}
    )
    grouped = tbl.group_by(["row", "code"], use_threads=False).aggregate([("code", "count")])
    out_terms = pa.DictionaryArray.from_arrays(
        grouped["code"].combine_chunks().cast(pa.int32()), dic.dictionary
    )
    return (
        out_terms,
        grouped["row"].to_numpy(zero_copy_only=False),
        grouped["code_count"].to_numpy(zero_copy_only=False).astype(np.int64),
        row_counts,
    )


def term_positions(
    texts: pa.Array | pa.ChunkedArray,
) -> tuple[pa.Array, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like :func:`term_frequencies`, plus token positions per posting.

    Returns ``(terms, row_indices, tfs, row_token_counts, pos_flat,
    pos_offsets)`` where posting ``i``'s ascending in-document token positions
    are ``pos_flat[pos_offsets[i] : pos_offsets[i+1]]`` (0-based over the
    analyzed token stream — Tantivy's position semantics for phrase queries).
    Fully vectorized: one lexsort groups (row, term) and orders positions.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    tokens, parents = tokenize_flat(texts)
    row_counts = (
        np.bincount(parents, minlength=len(texts)).astype(np.int64)
        if len(parents)
        else np.zeros(len(texts), dtype=np.int64)
    )
    if len(tokens) == 0:
        empty = np.empty(0, dtype=np.int64)
        return (
            pa.DictionaryArray.from_arrays(
                pa.array([], type=pa.int32()), pa.array([], type=pa.string())
            ),
            empty, empty, row_counts, empty, np.zeros(1, dtype=np.int64),
        )
    # position within its document: arange minus the row's start offset
    # (row_counts are already exact, so the prefix sum IS the start table —
    # no per-token searchsorted)
    row_offs = np.concatenate(([0], np.cumsum(row_counts)))
    pos_in_row = np.arange(len(parents), dtype=np.int64) - row_offs[parents]
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    # single packed-key argsort when (row, code, pos) fit in 64 bits —
    # ~3x cheaper than a 3-key lexsort at typical batch sizes
    bits_pos = max(int(pos_in_row.max()).bit_length(), 1)
    bits_code = max(int(len(dic.dictionary) - 1).bit_length(), 1)
    bits_row = max(int(parents[-1]).bit_length(), 1)
    if bits_pos + bits_code + bits_row <= 64:
        key = (
            (parents.astype(np.uint64) << np.uint64(bits_code + bits_pos))
            | (codes.astype(np.uint64) << np.uint64(bits_pos))
            | pos_in_row.astype(np.uint64)
        )
        order = np.argsort(key)
    else:
        order = np.lexsort((pos_in_row, codes, parents))
    r_s, c_s, p_s = parents[order], codes[order], pos_in_row[order]
    bounds = np.flatnonzero(np.r_[True, (r_s[1:] != r_s[:-1]) | (c_s[1:] != c_s[:-1])])
    tfs = np.diff(np.r_[bounds, len(r_s)]).astype(np.int64)
    terms = pa.DictionaryArray.from_arrays(
        pa.array(c_s[bounds].astype(np.int32)), dic.dictionary
    )
    pos_offsets = np.concatenate((bounds, [len(p_s)])).astype(np.int64)
    return terms, r_s[bounds], tfs, row_counts, p_s, pos_offsets


def tokenize_query(query_text: str) -> list[str]:
    """Tokenize a single query term the way the index analyzed documents.

    The reference splits the raw query on whitespace first (AND semantics per
    word, ``tantivy_index_manager.py:344``) and each word is then analyzed by
    the index tokenizer; this helper applies the index analyzer to one word.
    """
    import re

    # Python `re` lacks \p classes; [^\W_] == unicode alnum (\w minus '_'),
    # equivalent to [\p{L}\p{N}] plus marks — identical on ASCII and on all
    # common text; documented approximation for exotic codepoints.
    parts = re.split(r"[^\w]+|_+", query_text)
    out = []
    for p in parts:
        if p and len(p.encode("utf-8")) < MAX_TOKEN_BYTES:
            out.append(p.lower())
    return out


def sql_tokens_cte(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB CTE body producing (doc_id, term) token rows — the oracle twin
    of :func:`tokenize_flat`.  Same RE2 pattern, same byte-length filter,
    same lowercasing order (filter raw bytes, then lower)."""
    return (
        f"SELECT {id_col} AS doc_id, lower(tok) AS term "
        f"FROM (SELECT {id_col}, unnest(regexp_split_to_array({text_col}, '{TOKEN_SEPARATOR_RE}')) AS tok "
        f"FROM {table}) WHERE strlen(tok) > 0 AND strlen(tok) < {MAX_TOKEN_BYTES}"
    )
