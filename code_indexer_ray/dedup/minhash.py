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
HORNER_BASE = 1_000_003


def perm_coeffs_fast(num_perms: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a_i, b_i) over the 2³¹−1 field for the fast kernel."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=num_perms, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_31, size=num_perms, dtype=np.uint64)
    return a, b


def minhash_batch_fast(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perms: int = DEFAULT_NUM_PERMS,
    shingle_n: int = DEFAULT_SHINGLE,
    seed: int = 42,
) -> pa.Table:
    """Production MinHash: vectorized across the whole batch AND exactly
    reproducible in DuckDB SQL (the ``dedup_minhash_sig`` oracle twin).

    - token hash   ``t = md5_lower64(token) mod (2³¹−1)`` — md5 runs once per
      *unique* token in the batch (Zipf: ~4% of the token stream), matching
      DuckDB's ``md5_number_lower``;
    - shingle hash ``x = Horner(t_i … t_{i+n−1}; B=1000003) mod (2³¹−1)`` —
      vectorized over every shingle position at once, doc boundaries masked;
      docs with fewer than ``shingle_n`` tokens hash their full token stream
      as one shingle (same policy as :func:`shingles_of`);
    - signature    ``sig_p = min over shingles of (a_p·x + b_p) mod (2³¹−1)``
      via one (num_perms × n_shingles) broadcast + ``np.minimum.reduceat``.

    Every intermediate fits uint64/BIGINT: values < 2³¹, products < 2⁶².
    The md5-per-shingle path (:func:`minhash_batch`) remains as the legacy
    parity fixture; this kernel is ~20× faster and equally oracle-gated.
    """
    import pyarrow.compute as pc

    a, b = perm_coeffs_fast(num_perms, seed)
    M = np.uint64(MERSENNE_31)
    B = np.uint64(HORNER_BASE)

    tokens, rows = tokenize_flat(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(tokens) == 0:
        empty = pa.array([], type=pa.int64())
        return pa.table({"doc_id": empty, "perm_id": empty, "minhash": empty})

    # md5 per UNIQUE token only
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    uh = np.fromiter(
        (md5_lower64(t) % MERSENNE_31 for t in dic.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    th = uh[codes]  # per-token hash, < 2^31

    N = len(th)
    n = shingle_n
    # full shingles: every window of n tokens lying inside one doc
    if N >= n:
        x_full = th[: N - n + 1].copy()
        for j in range(1, n):
            x_full = (x_full * B + th[j : N - n + 1 + j]) % M
        full_mask = rows[: N - n + 1] == rows[n - 1 :]
        x_full = x_full[full_mask]
        rows_full = rows[: N - n + 1][full_mask]
    else:
        x_full = np.empty(0, dtype=np.uint64)
        rows_full = np.empty(0, dtype=rows.dtype)

    # short docs (< n tokens): one Horner over their whole token stream
    counts = np.zeros(len(batch), dtype=np.int64)
    np.add.at(counts, rows, 1)
    short_rows = np.flatnonzero((counts > 0) & (counts < n))
    if len(short_rows):
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        x_short = np.empty(len(short_rows), dtype=np.uint64)
        for i, r in enumerate(short_rows):
            acc = th[starts[r]]
            for k in range(1, counts[r]):
                acc = (acc * B + th[starts[r] + k]) % M
            x_short[i] = acc
    else:
        x_short = np.empty(0, dtype=np.uint64)

    # merge (doc-sorted): full-shingle docs and short docs are disjoint
    xs = np.concatenate([x_full, x_short])
    xr = np.concatenate([rows_full, short_rows.astype(rows_full.dtype)])
    order = np.argsort(xr, kind="stable")
    xs, xr = xs[order], xr[order]

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


def band_batch(sig: pa.Table, *, rows_per_band: int = 2, mod: int = MERSENNE_P) -> pa.Table:
    """Fold a (doc_id, perm_id, minhash) signature table into LSH band rows
    (doc_id, band_id, band_hash).  band_hash = Σ mh_j·B^j mod p over the
    band's minhashes (perm order), so the oracle can reproduce it.

    Vectorized when ``mod`` < 2³¹ (the fast-kernel field: products stay in
    uint64); falls back to exact Python-int math for the 2⁶¹−1 legacy field.
    """
    if sig.num_rows == 0:
        empty = pa.array([], type=pa.int64())
        return pa.table({"doc_id": empty, "band_id": empty, "band_hash": empty})
    doc_a = sig["doc_id"].to_numpy(zero_copy_only=False)
    perm_a = sig["perm_id"].to_numpy(zero_copy_only=False)
    mh_a = sig["minhash"].to_numpy(zero_copy_only=False)
    order = np.lexsort((perm_a, doc_a))
    doc, perm, mh = doc_a[order], perm_a[order], mh_a[order]
    band = (perm // rows_per_band).astype(np.int64)
    j = perm % rows_per_band
    if mod < (1 << 31):
        w = np.array([pow(HORNER_BASE, int(k), mod) for k in range(rows_per_band)], dtype=np.uint64)
        contrib = (mh.astype(np.uint64) * w[j]) % np.uint64(mod)
        key_changes = np.flatnonzero(
            np.r_[True, (doc[1:] != doc[:-1]) | (band[1:] != band[:-1])]
        )
        sums = np.add.reduceat(contrib, key_changes) % np.uint64(mod)
        return pa.table(
            {
                "doc_id": pa.array(doc[key_changes], type=pa.int64()),
                "band_id": pa.array(band[key_changes], type=pa.int64()),
                "band_hash": pa.array(sums.astype(np.int64)),
            }
        )
    # legacy 2^61-1 field: python-int exactness (mh*B^j overflows uint64)
    out_doc, out_band, out_hash = [], [], []
    acc = 0
    for i in range(len(doc)):
        if i and (doc[i] != doc[i - 1] or band[i] != band[i - 1]):
            out_doc.append(int(doc[i - 1]))
            out_band.append(int(band[i - 1]))
            out_hash.append(acc % mod)
            acc = 0
        acc += (int(mh[i]) * pow(HORNER_BASE, int(j[i]), mod)) % mod
    if len(doc):
        out_doc.append(int(doc[-1]))
        out_band.append(int(band[-1]))
        out_hash.append(acc % mod)
    return pa.table(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "band_id": pa.array(out_band, type=pa.int64()),
            "band_hash": pa.array(out_hash, type=pa.int64()),
        }
    )


#: Buckets larger than this emit a connectivity chain instead of all pairs —
#: one degenerate bucket (empty/boilerplate pages colliding) would otherwise
#: emit O(n²) pairs and OOM the group task.
MAX_BUCKET_PAIRS_DOCS = 256


def candidate_pairs(
    bands,
    min_pair: int = 2,
    max_bucket: int = MAX_BUCKET_PAIRS_DOCS,
    num_partitions: int = 64,
):
    """(band_id, band_hash) buckets → sorted doc-id pairs within each bucket.

    One COARSE hash-partition shuffle (``band_hash % num_partitions``) instead
    of a group per bucket: most buckets are singletons, and per-group pandas
    calls over hundreds of thousands of tiny groups were the wall-time sink.
    Each partition task sorts its rows once and emits pairs only for the few
    multi-doc buckets.  Buckets with ≤ ``max_bucket`` distinct docs emit all
    C(n,2) pairs; larger buckets emit the sorted-adjacent chain (n−1 pairs) —
    union-find connectivity preserved at O(n) memory.
    """

    def add_pb(batch: pa.Table) -> pa.Table:
        pb = (
            batch["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
            % num_partitions
        )
        return batch.append_column("pb", pa.array(pb))

    def pairs_partition(g: pa.Table) -> pa.Table:
        # Arrow/numpy (round-4: was pandas drop_duplicates+sort_values —
        # one lexsort + a dedup mask do both without the conversion)
        empty = pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
        if g.num_rows == 0:
            return empty
        band = g["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        bh = g["band_hash"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, bh, band))
        band, bh, doc = band[order], bh[order], doc[order]
        keep = np.r_[
            True,
            (band[1:] != band[:-1]) | (bh[1:] != bh[:-1]) | (doc[1:] != doc[:-1]),
        ]
        band, bh, doc = band[keep], bh[keep], doc[keep]
        n = len(doc)
        bounds = np.flatnonzero(np.r_[True, (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])])
        sizes = np.diff(np.r_[bounds, n])
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        for s, size in zip(bounds[sizes >= min_pair], sizes[sizes >= min_pair]):
            ids = doc[s : s + size]
            if size > max_bucket:
                out_a.append(ids[:-1])
                out_b.append(ids[1:])
            else:
                ia, ib = np.triu_indices(size, k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
        if not out_a:
            return empty
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return (
        bands.map_batches(add_pb, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(pairs_partition, batch_format="pyarrow")
    )


def jaccard_ngrams(a_tokens: list[str], b_tokens: list[str], n: int = DEFAULT_SHINGLE) -> float:
    """Exact n-gram Jaccard — the verification step after LSH candidates."""
    sa, sb = set(shingles_of(a_tokens, n)), set(shingles_of(b_tokens, n))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
