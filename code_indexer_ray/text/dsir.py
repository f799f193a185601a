"""DSIR — data selection via importance resampling (hashed n-gram features).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling"): estimate target and raw distributions over HASHED n-gram
buckets, score every raw document with the log importance weight

    w(doc) = Σ over the doc's hashed bigram buckets b of
             ln( (c_t[b] + 1) / (N_t + B) ) - ln( (c_r[b] + 1) / (N_r + B) )

(add-one smoothing over B buckets), then resample proportionally.  Here the
TARGET distribution is a deterministic corpus slice (``doc_id % slice_mod
== slice_rem`` — the in-corpus stand-in for Wikipedia/books) and the RAW
distribution is everything else, so the operator is fully oracle-checkable.

Scale shape: unlike the perplexity LM (unbounded vocabulary → data-plane
joins), DSIR's whole point is the FIXED feature space — ``n_buckets``
counts fit in one small array regardless of corpus size, so the two count
vectors aggregate via one groupby each and broadcast with ``ray.put``;
scoring is one vectorized pass (bincount-style lookups), shuffle-free.

Bucketing is oracle-visible (bucket boundaries change the counts), so each
kernel carries its own exact DuckDB twin:

- ``kernel="fast"`` (default): md5 runs once per UNIQUE token
  (dictionary-encode; Zipf ≈4 % of the stream), then the bucket id is the
  Horner pair hash over the 2³¹−1 field — the arithmetic proven in
  ``dedup/minhash.py::minhash_batch_fast`` —
  ``((md5_lower64(w1) % (2³¹−1)) · 1000003 + md5_lower64(w2) % (2³¹−1))
  % (2³¹−1) % n_buckets``, every intermediate < 2⁶² (BIGINT-safe), and
  DuckDB reproduces it term-for-term with ``md5_number_lower``.
- ``kernel="md5"``: the legacy per-bigram ``md5_number_lower(w1␟w2) %
  n_buckets`` key (~10× slower; the round-4 parity fixture).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.minhash import HORNER_BASE, MERSENNE_31, md5_lower64
from .analysis import MAX_TOKEN_BYTES, TOKEN_SEPARATOR_RE, tokenize_flat

__all__ = ["dsir_weights", "sql_dsir_weights"]

SEP = "\x1f"
DEFAULT_BUCKETS = 10_000


def _bucket_rows(
    batch: pa.Table, *, id_col: str, text_col: str, n_buckets: int,
    kernel: str = "fast",
) -> pa.Table:
    import pyarrow.compute as pc

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tokens, parents = tokenize_flat(batch[text_col])
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
    )
    if len(parents) < 2:
        return empty
    adj = parents[1:] == parents[:-1]
    if not adj.any():
        return empty
    idx = np.flatnonzero(adj)
    if kernel == "md5":
        toks = tokens.to_pylist()
        b = np.fromiter(
            (md5_lower64(toks[i] + SEP + toks[i + 1]) % n_buckets for i in idx),
            dtype=np.int64, count=len(idx),
        )
    else:
        dic = pc.dictionary_encode(tokens)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        M = np.uint64(MERSENNE_31)
        uh = np.fromiter(
            (md5_lower64(t) % MERSENNE_31 for t in dic.dictionary.to_pylist()),
            dtype=np.uint64, count=len(dic.dictionary),
        )
        th = uh[codes]  # per-token hash < 2^31; md5 once per unique token
        b = (
            ((th[idx] * np.uint64(HORNER_BASE) + th[idx + 1]) % M)
            % np.uint64(n_buckets)
        ).astype(np.int64)
    return pa.table(
        {"doc_id": pa.array(ids[parents[idx]], pa.int64()), "b": pa.array(b)}
    )


def dsir_weights(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_mod: int = 10,
    slice_rem: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
    kernel: str = "fast",
):
    """(doc_id, n_features, w_r) for every doc with ≥1 bigram — w_r is the
    log importance weight rounded to 4; higher = more target-like.

    ``kernel`` picks the bucket hash ("fast" Horner pair hash, default, or
    the legacy per-bigram "md5") — each has its own exact SQL twin via
    :func:`sql_dsir_weights`."""
    import ray

    if kernel not in ("fast", "md5"):
        raise ValueError("kernel must be 'fast' or 'md5'")
    rows = ds.map_batches(
        lambda bt: _bucket_rows(
            bt, id_col=id_col, text_col=text_col, n_buckets=n_buckets, kernel=kernel
        ),
        batch_format="pyarrow",
    ).materialize()

    def partial_counts(bt: pa.Table) -> pa.Table:
        ids = bt["doc_id"].to_numpy(zero_copy_only=False)
        b = bt["b"].to_numpy(zero_copy_only=False)
        tgt = ids % slice_mod == slice_rem
        ct = np.bincount(b[tgt], minlength=n_buckets).astype(np.int64)
        cr = np.bincount(b[~tgt], minlength=n_buckets).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(np.arange(n_buckets, dtype=np.int64)),
                "ct": pa.array(ct),
                "cr": pa.array(cr),
            }
        )

    from ray.data.aggregate import Sum

    counts = (
        rows.map_batches(partial_counts, batch_format="pyarrow")
        .groupby("b")
        .aggregate(Sum("ct", alias_name="ct"), Sum("cr", alias_name="cr"))
        .to_pandas()
        .sort_values("b")
    )
    ct = np.zeros(n_buckets, np.int64)
    cr = np.zeros(n_buckets, np.int64)
    ct[counts["b"].to_numpy()] = counts["ct"].to_numpy()
    cr[counts["b"].to_numpy()] = counts["cr"].to_numpy()
    nt, nr = int(ct.sum()), int(cr.sum())
    # the per-bucket log ratio is a FIXED B-sized vector → broadcast once
    log_ratio = (np.log(ct + 1.0) - np.log(nt + n_buckets)) - (
        np.log(cr + 1.0) - np.log(nr + n_buckets)
    )
    ref = ray.put(log_ratio)

    def score_partial(bt: pa.Table) -> pa.Table:
        """Per-batch partial (doc rows CAN split across map batches — the
        final groupby makes the fold exact regardless of batching)."""
        lr = ray.get(ref)
        ids = bt["doc_id"].to_numpy(zero_copy_only=False)
        b = bt["b"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, b = ids[order], b[order]
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        n = np.diff(np.r_[starts, len(ids)])
        s = np.add.reduceat(lr[b], starts)
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "n": pa.array(n.astype(np.int64)),
                "s": pa.array(s),
            }
        )

    folded = (
        rows.map_batches(score_partial, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(bt: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": bt["doc_id"],
                "n_features": bt["n"].cast(pa.int64()),
                "w_r": pa.array(
                    np.round(bt["s"].to_numpy(zero_copy_only=False), 4)
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def sql_dsir_weights(
    slice_mod: int = 10,
    slice_rem: int = 0,
    n_buckets: int = DEFAULT_BUCKETS,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    kernel: str = "fast",
) -> str:
    """Exact DuckDB twin of the matching kernel: md5_number_lower token
    hashing + the same bucket arithmetic, same smoothing."""
    sep = TOKEN_SEPARATOR_RE
    if kernel == "md5":
        bucket = (
            f"(md5_number_lower(l[i] || chr(31) || l[i + 1]) % {n_buckets})::BIGINT"
        )
    else:  # Horner pair hash over 2^31-1, term-for-term the fast kernel
        bucket = (
            f"((((md5_number_lower(l[i]) % {MERSENNE_31}) * {HORNER_BASE}\n"
            f"      + (md5_number_lower(l[i + 1]) % {MERSENNE_31}))\n"
            f"     % {MERSENNE_31}) % {n_buckets})::BIGINT"
        )
    return (
        f"WITH tl AS (SELECT {id_col} AS doc_id,\n"
        f"    [lower(t) FOR t IN regexp_split_to_array({text_col}, '{sep}')\n"
        f"     IF strlen(t) > 0 AND strlen(t) < {MAX_TOKEN_BYTES}] AS l\n"
        f"  FROM {table}),\n"
        "bg AS (SELECT doc_id,\n"
        f"    {bucket} AS b\n"
        "  FROM tl, (SELECT unnest(generate_series(1, 4000)) AS i) g WHERE i < len(l)),\n"
        f"ct AS (SELECT b, count(*)::BIGINT AS c FROM bg WHERE doc_id % {slice_mod} = {slice_rem} GROUP BY b),\n"
        f"cr AS (SELECT b, count(*)::BIGINT AS c FROM bg WHERE doc_id % {slice_mod} <> {slice_rem} GROUP BY b),\n"
        "tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM ct) AS nt,\n"
        "            (SELECT coalesce(sum(c), 0) FROM cr) AS nr),\n"
        "terms AS (SELECT bg.doc_id,\n"
        f"    (ln(coalesce(ct.c, 0) + 1.0) - ln(tot.nt + {n_buckets}))\n"
        f"    - (ln(coalesce(cr.c, 0) + 1.0) - ln(tot.nr + {n_buckets})) AS t\n"
        "  FROM bg LEFT JOIN ct USING (b) LEFT JOIN cr USING (b), tot)\n"
        "SELECT doc_id, count(*)::BIGINT AS n_features,\n"
        "  round(sum(t), 4) AS w_r\n"
        "FROM terms GROUP BY doc_id"
    )
