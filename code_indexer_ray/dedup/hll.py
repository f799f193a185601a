"""HyperLogLog approximate count-distinct (Flajolet et al. 2007) as a
mergeable Ray Data sketch.

Exact distinct-count must shuffle every unique (key, value) pair
(:func:`..pipelines.ops.distinct_count`); at 100 TB that is still a huge
exchange.  The HLL sketch replaces it with a CONSTANT-size state: each
``map_batches`` task folds its rows into 2^p byte registers, the registers
merge with elementwise max, and only ``keys × 2^p`` bytes ever cross the
network — the classic sketch trade (±1.04/√2^p relative error; p=12 → ±1.6%).

Determinism: values hash with the same lower-64-bits-of-md5 the dedup
kernels use (``md5_lower64`` — DuckDB's ``md5_number_lower``), so estimates
are bit-reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .minhash import md5_lower64

DEFAULT_P = 12  # 4096 registers → ±1.6 % standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_fold(values: list[str] | np.ndarray, p: int = DEFAULT_P) -> np.ndarray:
    """Fold values into a fresh 2^p uint8 register array (one batch's state)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    hs = np.fromiter(
        (md5_lower64(str(v)) for v in values), dtype=np.uint64, count=len(values)
    )
    idx = (hs >> np.uint64(64 - p)).astype(np.int64)
    rest = hs << np.uint64(p)  # remaining 64-p bits, left-aligned
    # rho = position of the leftmost 1-bit in the remaining bits (1-based);
    # all-zero rest → 64-p+1
    nbits = 64 - p
    rho = np.full(len(hs), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(hs), dtype=bool)
    for j in range(nbits):
        bit = (rest >> np.uint64(63 - j)) & np.uint64(1)
        hit = (~found) & (bit == 1)
        rho[hit] = j + 1
        found |= hit
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting) and
    large-range corrections from the original paper."""
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return m * np.log(m / zeros)
    two64 = 2.0**64
    if est > two64 / 30.0:
        return -two64 * np.log(1.0 - est / two64)
    return float(est)


def approx_distinct(ds, key_col: str, of_col: str, p: int = DEFAULT_P):
    """Per-key approximate distinct-count over a Dataset.

    Shape: map_batches folds each batch's rows into per-(batch, key)
    registers (shipped as fixed-size binary — 2^p bytes per key per batch),
    one groupby(key) merges registers with elementwise max, and the estimate
    is computed per group.  Nothing value-sized ever crosses the shuffle.
    Output: (key, n_distinct_approx int64).
    """
    m = 1 << p

    def fold(batch: pa.Table) -> pa.Table:
        keys = batch[key_col]
        vals = batch[of_col].to_numpy(zero_copy_only=False)
        import pyarrow.compute as pc

        dic = pc.dictionary_encode(keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        out_keys, out_regs = [], []
        for c in range(len(dic.dictionary)):
            sel = codes == c
            out_keys.append(dic.dictionary[c].as_py())
            out_regs.append(hll_fold(vals[sel], p).tobytes())
        return pa.table(
            {
                key_col: pa.array(out_keys, type=keys.type if not isinstance(keys, pa.ChunkedArray) else keys.type),
                "regs": pa.array(out_regs, type=pa.binary(m)),
            }
        )

    def merge_est(g: pa.Table) -> pa.Table:
        regs = np.frombuffer(b"".join(g["regs"].to_pylist()), dtype=np.uint8).reshape(-1, m)
        merged = regs.max(axis=0)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "n_distinct_approx": pa.array(
                    [int(round(hll_estimate(merged)))], type=pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_est, batch_format="pyarrow")
    )
