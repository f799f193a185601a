"""SimHash near-duplicate fingerprints (63-bit, tf-weighted).

bit b of simhash(doc) = 1 iff Σ_terms tf(t) · (±1 per bit of md5_lower64(t))
is positive.  63 bits (not 64) so the value fits a signed int64 — identical
in Arrow and in the DuckDB oracle (``md5_number_lower`` twin).  Vectorized:
one (term, tf) aggregation per batch, then a bit-unpack matmul.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..text.analysis import term_frequencies
from .minhash import md5_lower64

NUM_BITS = 63


def simhash_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    terms, rows, tfs, row_counts = term_frequencies(batch[text_col])
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(doc_ids)

    # md5 once per unique term (terms is dictionary-encoded by term_frequencies)
    if pa.types.is_dictionary(terms.type):
        codes = terms.indices.to_numpy(zero_copy_only=False)
        uniq = terms.dictionary.to_pylist()
    else:
        import pyarrow.compute as pc

        dic = pc.dictionary_encode(terms)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        uniq = dic.dictionary.to_pylist()
    h = np.fromiter((md5_lower64(t) for t in uniq), dtype=np.uint64, count=len(uniq))
    # ±1 matrix: (n_uniq, NUM_BITS)
    bits = ((h[:, None] >> np.arange(NUM_BITS, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    pm = 2 * bits - 1
    # per-bit weighted bincount — vectorized over all (row, term) pairs,
    # O(pairs) memory (no pairs×bits contribution matrix)
    acc = np.empty((n, NUM_BITS), dtype=np.int64)
    tfw = tfs.astype(np.float64)
    for b in range(NUM_BITS):
        acc[:, b] = np.bincount(rows, weights=tfw * pm[codes, b], minlength=n).astype(np.int64)
    sim = (
        ((acc > 0).astype(np.int64) << np.arange(NUM_BITS, dtype=np.int64)[None, :]).sum(axis=1)
    )
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "simhash": pa.array(sim, type=pa.int64()),
            "n_tokens": pa.array(row_counts),
        }
    )


def hamming_distance(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a ^ b).astype(np.uint64)
    return np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
