"""Posting-list compression: delta + variable-byte blocks with block-max metadata.

Our explicit analog of the Tantivy internals the reference delegates to Rust
(SURVEY.md §2.4 T2/T3): doc ids are sorted, delta-encoded and varbyte-packed
in blocks of ``BLOCK_SIZE``; term frequencies are varbyte-packed in the same
block layout; per-posting fieldnorm ids are stored raw (1 byte each).  Each
block carries skip metadata (``last_doc``) plus score-bound metadata
(``max_tf``, ``min_norm_id``) so the query engine can do block skipping and
block-max / MaxScore pruning without an ``avgdl``-dependent value baked in at
build time (the bound ``tf/(tf + K·dl)`` is monotone in tf and anti-monotone
in dl, so (max_tf, min_norm) gives a valid per-block upper bound at query
time for any global stats).

All kernels are numpy-vectorized — no per-value Python in the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length of each value under 7-bit varbyte encoding (vectorized)."""
    v = values.astype(np.uint64, copy=True)
    n = np.ones(len(v), dtype=np.int64)  # 0 encodes in 1 byte
    v >>= np.uint64(7)
    while v.any():
        n += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    return n


def varbyte_encode(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode uint64 values to a varbyte buffer.

    Returns ``(buffer, byte_offsets)`` where ``byte_offsets[i]`` is the byte
    position at which value ``i`` starts (len == len(values)); vectorized over
    byte positions (≤10 iterations).
    Layout: little-endian 7-bit groups; high bit set = continuation.
    """
    v = values.astype(np.uint64)
    lens = varbyte_lengths(v)
    ends = np.cumsum(lens)
    starts = ends - lens
    out = np.zeros(int(ends[-1]) if len(v) else 0, dtype=np.uint8)
    max_len = int(lens.max()) if len(v) else 0
    for i in range(max_len):
        mask = lens > i
        idx = starts[mask] + i
        byte = (v[mask] >> np.uint64(7 * i)) & np.uint64(0x7F)
        cont = (lens[mask] - 1 > i).astype(np.uint8) << 7
        out[idx] = byte.astype(np.uint8) | cont
    return out.tobytes(), starts


def varbyte_decode(buf: np.ndarray | bytes, count: int | None = None) -> np.ndarray:
    """Decode a varbyte buffer back to uint64 values (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lens = ends - starts + 1
    vals = np.zeros(len(ends), dtype=np.uint64)
    for i in range(int(lens.max())):
        mask = lens > i
        vals[mask] |= (b[starts[mask] + i] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * i)
    if count is not None and len(vals) != count:
        raise ValueError(f"varbyte_decode: expected {count} values, got {len(vals)}")
    return vals


@dataclass
class EncodedPostings:
    """One term's encoded posting list (doc-sorted)."""

    df: int
    cf: int
    docs_enc: bytes          # varbyte(delta(doc_ids))
    tfs_enc: bytes           # varbyte(tfs)
    norms: bytes             # raw u8 fieldnorm id per posting
    last_docs: bytes         # u64 LE per block — skip metadata
    max_tfs: bytes           # u32 LE per block — block-max bound
    min_norms: bytes         # u8 per block — block-max bound
    doc_offsets: bytes       # u32 LE per block: byte offset of block start in docs_enc
    tf_offsets: bytes        # u32 LE per block: byte offset of block start in tfs_enc


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray, norm_ids: np.ndarray) -> EncodedPostings:
    """Encode one term's postings. ``doc_ids`` must be sorted ascending, unique."""
    n = len(doc_ids)
    docs = doc_ids.astype(np.int64)
    deltas = np.empty(n, dtype=np.uint64)
    if n:
        deltas[0] = docs[0]
        np.subtract(docs[1:], docs[:-1], out=deltas[1:], casting="unsafe")
    docs_enc, doc_starts = varbyte_encode(deltas)
    tfs_enc, tf_starts = varbyte_encode(tfs.astype(np.uint64))

    block_starts = np.arange(0, n, BLOCK_SIZE)
    last_docs = docs[np.minimum(block_starts + BLOCK_SIZE - 1, n - 1)].astype(np.uint64)
    max_tfs = np.maximum.reduceat(tfs.astype(np.uint32), block_starts) if n else np.empty(0, np.uint32)
    min_norms = np.minimum.reduceat(norm_ids.astype(np.uint8), block_starts) if n else np.empty(0, np.uint8)
    doc_offsets = doc_starts[block_starts].astype(np.uint32)
    tf_offsets = tf_starts[block_starts].astype(np.uint32)

    return EncodedPostings(
        df=int(n),
        cf=int(tfs.sum()) if n else 0,
        docs_enc=docs_enc,
        tfs_enc=tfs_enc,
        norms=norm_ids.astype(np.uint8).tobytes(),
        last_docs=last_docs.tobytes(),
        max_tfs=max_tfs.astype(np.uint32).tobytes(),
        min_norms=min_norms.astype(np.uint8).tobytes(),
        doc_offsets=doc_offsets.tobytes(),
        tf_offsets=tf_offsets.tobytes(),
    )


def decode_doc_ids(docs_enc: bytes, df: int) -> np.ndarray:
    """Full decode of a posting list's doc ids (prefix-summed deltas)."""
    deltas = varbyte_decode(docs_enc, df)
    return np.cumsum(deltas.astype(np.int64))


def decode_tfs(tfs_enc: bytes, df: int) -> np.ndarray:
    return varbyte_decode(tfs_enc, df).astype(np.int64)


def decode_blocks(
    posting: "EncodedPostings | dict",
    block_indices: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only the selected blocks of a posting list.

    Returns ``(doc_ids, tfs, norm_ids)`` for the postings in those blocks.
    This is the skip-read primitive behind intersection and MaxScore gather:
    a candidate set touching 3 of 1000 blocks decodes ~384 postings, not df.
    """
    if isinstance(posting, dict):
        df = int(posting["df"])
        docs_enc = np.frombuffer(posting["docs_enc"], dtype=np.uint8)
        tfs_enc = np.frombuffer(posting["tfs_enc"], dtype=np.uint8)
        norms = np.frombuffer(posting["norms"], dtype=np.uint8)
        last_docs = np.frombuffer(posting["last_docs"], dtype=np.uint64)
        doc_offsets = np.frombuffer(posting["doc_offsets"], dtype=np.uint32)
        tf_offsets = np.frombuffer(posting["tf_offsets"], dtype=np.uint32)
    else:
        df = posting.df
        docs_enc = np.frombuffer(posting.docs_enc, dtype=np.uint8)
        tfs_enc = np.frombuffer(posting.tfs_enc, dtype=np.uint8)
        norms = np.frombuffer(posting.norms, dtype=np.uint8)
        last_docs = np.frombuffer(posting.last_docs, dtype=np.uint64)
        doc_offsets = np.frombuffer(posting.doc_offsets, dtype=np.uint32)
        tf_offsets = np.frombuffer(posting.tf_offsets, dtype=np.uint32)

    n_blocks = len(last_docs)
    out_docs, out_tfs, out_norms = [], [], []
    bi = np.asarray(block_indices, dtype=np.int64)
    # decode CONSECUTIVE needed blocks as one run (one varbyte call per run,
    # not per block — a dense candidate set over a long list otherwise pays
    # per-block call overhead hundreds of times)
    runs = np.split(bi, np.flatnonzero(np.diff(bi) > 1) + 1) if len(bi) else []
    for run in runs:
        b0, b1 = int(run[0]), int(run[-1])
        p_start = b0 * BLOCK_SIZE
        p_end = min((b1 + 1) * BLOCK_SIZE, df)
        d0 = int(doc_offsets[b0])
        d1 = int(doc_offsets[b1 + 1]) if b1 + 1 < n_blocks else len(docs_enc)
        t0 = int(tf_offsets[b0])
        t1 = int(tf_offsets[b1 + 1]) if b1 + 1 < n_blocks else len(tfs_enc)
        deltas = varbyte_decode(docs_enc[d0:d1], p_end - p_start)
        # the delta stream is continuous across blocks: block k's first delta
        # is relative to the previous block's last doc (= last_docs[k-1])
        anchor = int(last_docs[b0 - 1]) if b0 > 0 else 0
        docs = np.cumsum(deltas.astype(np.int64)) + anchor
        out_docs.append(docs)
        out_tfs.append(varbyte_decode(tfs_enc[t0:t1], p_end - p_start).astype(np.int64))
        out_norms.append(norms[p_start:p_end])
    if not out_docs:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.uint8))
    return (np.concatenate(out_docs), np.concatenate(out_tfs), np.concatenate(out_norms))


def decode_full_many(posts: list[dict]) -> list[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Batch-decode MANY posting lists in two varbyte passes (one for doc
    deltas, one for tfs) instead of two per list.

    Wide unions (fuzzy/regex expansions) decode hundreds of small variant
    lists; per-call numpy overhead dominates them.  Concatenating the
    buffers is safe — every varbyte value ends on a clear-high-bit byte, so
    list boundaries cannot bleed — and per-list doc ids come back from one
    global cumsum minus each segment's base (segmented prefix sum).
    """
    if not posts:
        return []
    dfs = np.array([p["df"] for p in posts], dtype=np.int64)
    n = int(dfs.sum())
    cat_docs = np.frombuffer(b"".join(p["docs_enc"] for p in posts), dtype=np.uint8)
    cat_tfs = np.frombuffer(b"".join(p["tfs_enc"] for p in posts), dtype=np.uint8)
    deltas = varbyte_decode(cat_docs, n).astype(np.int64)
    tfs_all = varbyte_decode(cat_tfs, n).astype(np.int64)
    tot = np.cumsum(deltas)
    starts = np.zeros(len(posts), dtype=np.int64)
    np.cumsum(dfs[:-1], out=starts[1:])
    ends = starts + dfs
    out = []
    for i, p in enumerate(posts):
        s, e = int(starts[i]), int(ends[i])
        docs = tot[s:e] - (tot[s - 1] if s > 0 else 0)
        out.append((docs, tfs_all[s:e], np.frombuffer(p["norms"], dtype=np.uint8)))
    return out
