"""MinHash + LSH near-duplicate detection (shingle → minhash → band → bucket
groupby → candidate pairs → Jaccard verify).

Web-scale shape: per-batch vectorized signatures (numpy), explode to
(band_id, band_hash, doc_id) rows, one ``groupby([band_id, band_hash])``
shuffle whose groups are bucket-sized, then exact-Jaccard verification only
on candidate pairs.  Hash functions are ``(a_i·x + b_i) mod p`` over
``x = lower 64 bits of md5(shingle)`` — md5 keeps the DuckDB oracle
(``md5_number_lower``) bit-identical.

Shingles are ``n``-word shingles of the analyzer token stream (token order
preserved, duplicates kept).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from ..text.analysis import tokenize_flat

MERSENNE_P = (1 << 61) - 1
DEFAULT_NUM_PERMS = 8
DEFAULT_SHINGLE = 3


def perm_coeffs(num_perms: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_i, b_i) for the universal-hash permutations."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_perms, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_perms, dtype=np.int64)
    return a, b


def md5_lower64(s: str) -> int:
    """Lower 64 bits of md5 — little-endian of digest[8:16], the exact
    value DuckDB's ``md5_number_lower`` returns."""
    return struct.unpack("<Q", hashlib.md5(s.encode("utf-8")).digest()[8:16])[0]


def shingles_of(tokens: list[str], n: int) -> list[str]:
    if len(tokens) < n:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]


MERSENNE_31 = (1 << 31) - 1


def minhash_batch_fast(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = DEFAULT_NUM_PERMS,
    shingle_n: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> pa.Table:
    """Production-scale MinHash: fully vectorized, no per-shingle Python.

    Token hashes are crc32 (computed once per *unique* token in the batch),
    shingle hashes are xor-rotate combines, permutations are
    ``(a·x + b) mod (2³¹−1)`` in uint64 (no overflow).  ~50× faster than the
    md5 path; same signature shape and LSH behavior, different hash values —
    the md5 path remains the DuckDB-oracle-parity mode.
    """
    import zlib

    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=num_perms, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_31, size=num_perms, dtype=np.uint64)

    tokens, rows = tokenize_flat(batch[text_col])
    toks = tokens.to_pylist()
    uniq: dict[str, int] = {}
    for t in toks:
        if t not in uniq:
            uniq[t] = zlib.crc32(t.encode("utf-8"))
    th = np.array([uniq[t] for t in toks], dtype=np.uint64)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    bounds = np.flatnonzero(np.diff(rows)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(rows)]))
    out_doc, out_perm, out_min = [], [], []
    for s, e in zip(starts, ends):
        h = th[s:e]
        n = len(h)
        if n == 0:
            continue
        if n >= shingle_n:
            x = h[: n - shingle_n + 1].copy()
            for j in range(1, shingle_n):
                hj = h[j : n - shingle_n + 1 + j]
                x ^= (hj << np.uint64(21 * j)) | (hj >> np.uint64(64 - 21 * j))
        else:
            x = np.array([np.bitwise_xor.reduce(h)], dtype=np.uint64)
        x32 = (x ^ (x >> np.uint64(32))) & np.uint64(0xFFFFFFFF)
        sig = ((a[:, None] * x32[None, :] + b[:, None]) % np.uint64(MERSENNE_31)).min(axis=1)
        r = int(rows[s])
        out_doc.extend([int(doc_ids[r])] * num_perms)
        out_perm.extend(range(num_perms))
        out_min.extend(int(v) for v in sig)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "perm_id": pa.array(out_perm, type=pa.int64()),
            "minhash": pa.array(out_min, type=pa.int64()),
        }
    )


def minhash_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = DEFAULT_NUM_PERMS,
    shingle_n: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> pa.Table:
    """(doc_id, perm_id, minhash) rows — one per permutation per doc.

    Docs with no shingles (empty text) are omitted.
    """
    a, b = perm_coeffs(num_perms, seed)
    texts = batch[text_col]
    tokens, rows = tokenize_flat(texts)
    toks = tokens.to_pylist()
    per_row: dict[int, list[str]] = {}
    for t, r in zip(toks, rows):
        per_row.setdefault(int(r), []).append(t)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    out_doc, out_perm, out_min = [], [], []
    for r, tks in per_row.items():
        sh = shingles_of(tks, shingle_n)
        if not sh:
            continue
        xs = np.array([md5_lower64(s) for s in sh], dtype=np.uint64)
        # (a*x + b) mod p in python ints to avoid overflow; vectorized via object math
        sig = (
            (a.astype(object)[:, None] * xs.astype(object)[None, :] + b.astype(object)[:, None])
            % MERSENNE_P
        ).min(axis=1)
        out_doc.extend([int(doc_ids[r])] * len(a))
        out_perm.extend(range(len(a)))
        out_min.extend(int(v) for v in sig)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "perm_id": pa.array(out_perm, type=pa.int64()),
            "minhash": pa.array(out_min, type=pa.int64()),
        }
    )


def band_batch(sig: pa.Table, *, rows_per_band: int = 2) -> pa.Table:
    """Fold a (doc_id, perm_id, minhash) signature table into LSH band rows
    (doc_id, band_id, band_hash).  band_hash combines the band's minhashes
    with the same universal-hash form so the oracle can reproduce it."""
    df = sig.to_pandas().sort_values(["doc_id", "perm_id"], kind="mergesort")
    doc = df["doc_id"].to_numpy()
    mh = df["minhash"].to_numpy().astype(object)
    band = (df["perm_id"].to_numpy() // rows_per_band).astype(np.int64)
    # combine rows of a band: h = Σ mh_j * 1000003^j  mod p  (order = perm order)
    key = pd.DataFrame({"doc_id": doc, "band_id": band, "mh": mh})
    key["j"] = df["perm_id"].to_numpy() % rows_per_band
    key["contrib"] = [
        (int(m) * pow(1_000_003, int(j), MERSENNE_P)) % MERSENNE_P
        for m, j in zip(key["mh"], key["j"])
    ]
    agg = key.groupby(["doc_id", "band_id"], sort=True)["contrib"].sum().reset_index()
    agg["band_hash"] = (agg["contrib"] % MERSENNE_P).astype(np.int64)
    return pa.Table.from_pandas(
        agg[["doc_id", "band_id", "band_hash"]], preserve_index=False
    ).cast(
        pa.schema(
            [("doc_id", pa.int64()), ("band_id", pa.int64()), ("band_hash", pa.int64())]
        )
    )


def candidate_pairs(bands, min_pair: int = 2):
    """groupby (band_id, band_hash) → sorted doc-id pairs within each bucket."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].unique())
        if len(ids) < min_pair:
            return pd.DataFrame({"doc_a": [], "doc_b": []}, dtype=np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    return bands.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")


def jaccard_ngrams(a_tokens: list[str], b_tokens: list[str], n: int = DEFAULT_SHINGLE) -> float:
    """Exact n-gram Jaccard — the verification step after LSH candidates."""
    sa, sb = set(shingles_of(a_tokens, n)), set(shingles_of(b_tokens, n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
