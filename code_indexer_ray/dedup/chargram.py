"""Character-n-gram Jaccard near-duplicate detection (the n-gram-overlap
method of the classic near-dup family: exact / MinHash / SimHash / n-gram
Jaccard / embedding-cosine).  Word-shingle MinHash (``minhash.py``) catches
reordered-paragraph duplicates; character n-grams additionally catch
small in-word edits and are tokenizer-free, which matters for CJK and
noisy web text.

Same scale architecture as the word path: per-doc UNIQUE gram hashes →
MinHash signatures → LSH bands (one bucketed shuffle, capped buckets) →
exact gram-hash-set Jaccard verify on the tiny candidate fraction.

Everything is integer Horner arithmetic over codepoints (base 1000003 mod
2³¹−1), so the DuckDB twin — ``substr`` grams + ``unicode()`` codepoints +
the same Horner/permutation algebra in BIGINT — is bit-exact.  Docs shorter
than ``n`` characters have no grams and never pair (documented divergence
from the word kernel's short-doc fallback: a sub-n-char document has no
meaningful n-gram identity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .minhash import DEFAULT_NUM_PERMS, HORNER_BASE, MERSENNE_31, perm_coeffs_fast

DEFAULT_CHARGRAM = 4


def chargram_hashes(texts: list[str], n: int = DEFAULT_CHARGRAM) -> tuple[np.ndarray, np.ndarray]:
    """UNIQUE char-n-gram Horner hashes per text: ``(hashes, row_ids)``,
    both sorted by (row, hash).  Vectorized over one UTF-32 decode of the
    whole batch; windows never cross text boundaries."""
    if not texts:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    if len(cp) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    M = np.uint64(MERSENNE_31)
    B = np.uint64(HORNER_BASE)
    h = cp[: len(cp) - n + 1] % M
    for j in range(1, n):
        h = (h * B + cp[j : len(cp) - n + 1 + j]) % M
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(len(h), dtype=np.int64)
    row = np.searchsorted(starts, pos, side="right") - 1
    keep = pos + n - 1 < starts[row] + lens[row]
    h, row = h[keep], row[keep]
    if len(h) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    # unique per row: sort by (row, hash) once, drop adjacent equals
    order = np.lexsort((h, row))
    h, row = h[order], row[order]
    first = np.r_[True, (row[1:] != row[:-1]) | (h[1:] != h[:-1])]
    return h[first], row[first]


def chargram_minhash_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = DEFAULT_NUM_PERMS,
    gram_n: int = DEFAULT_CHARGRAM,
    seed: int = 42,
) -> pa.Table:
    """(doc_id, perm_id, minhash) MinHash over unique char-n-gram hashes —
    same permutation family and output layout as ``minhash_batch_fast``, so
    ``band_batch`` / ``candidate_pairs`` compose unchanged."""
    a, b = perm_coeffs_fast(num_perms, seed)
    M = np.uint64(MERSENNE_31)
    texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    xs, xr = chargram_hashes(texts, gram_n)
    if len(xs) == 0:
        empty = pa.array([], type=pa.int64())
        return pa.table({"doc_id": empty, "perm_id": empty, "minhash": empty})
    seg = np.flatnonzero(np.r_[True, xr[1:] != xr[:-1]])
    out_rows = xr[seg]
    n_docs = len(out_rows)
    sigs = np.empty((num_perms, n_docs), dtype=np.uint64)
    for p in range(num_perms):
        v = (a[p] * xs + b[p]) % M
        sigs[p] = np.minimum.reduceat(v, seg)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(doc_ids[out_rows], num_perms), type=pa.int64()),
            "perm_id": pa.array(np.tile(np.arange(num_perms, dtype=np.int64), n_docs)),
            "minhash": pa.array(sigs.T.reshape(-1).astype(np.int64)),
        }
    )


def chargram_rows(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = DEFAULT_CHARGRAM,
) -> pa.Table:
    """(doc_id, sh) rows — each doc's DISTINCT char-n-gram Horner hashes,
    join-ready for the data-plane pair verify
    (:func:`code_indexer_ray.dedup.verify.pair_jaccard_verify`)."""
    texts = ["" if t is None else t for t in batch[text_col].to_pylist()]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    h, row = chargram_hashes(texts, n)
    return pa.table(
        {
            "doc_id": pa.array(ids[row], type=pa.int64()),
            "sh": pa.array(h.astype(np.int64), type=pa.int64()),
        }
    )


def chargram_jaccard_sets(texts: list[str], n: int = DEFAULT_CHARGRAM) -> list[set]:
    """Per-text unique gram-hash sets for the exact verify step (hash sets,
    not literal grams — identical on both engine and SQL sides even under
    hash collisions)."""
    h, r = chargram_hashes(texts, n)
    out: list[set] = [set() for _ in texts]
    for hh, rr in zip(h.tolist(), r.tolist()):
        out[rr].add(hh)
    return out
