"""Exact distributed top-k heavy hitters with a Misra-Gries candidate pass.

The full-vocabulary ``groupby(term)`` top-k is an all-to-all shuffle of every
(term, count) partial — at web scale that is 10⁸⁺ rows.  This operator gets
the EXACT answer while moving only O(m) rows per batch:

1. **Sketch pass** — each batch summarizes its own term counts with a
   Misra-Gries decrement (Misra & Gries 1982; the merge analysis is
   Agarwal et al., "Mergeable Summaries", PODS 2012): subtract the
   (m+1)-th largest count from all counts, keep the positive remainders as
   lower-bound weights, and record the deducted amount ``d_b``.  Any term's
   true batch count is ≤ weight_b + d_b, so after the (tiny) merge
   ``upper(t) = Σ weight_b(t) + Σ d_b`` and ``lower(t) = Σ weight_b(t)``.
2. **Candidate selection** — L = k-th largest lower bound.  Every true top-k
   term has ``upper ≥ true ≥ true_kth ≥ L``, so
   ``candidates = {t : upper(t) ≥ L}`` is a provable superset — PROVIDED a
   term absent from every summary cannot beat L, i.e. ``Σ d_b ≤ L``.  That
   soundness condition is CHECKED at runtime; if the data is too flat for
   the chosen ``m`` the operator raises (increase m) instead of silently
   returning approximate results.
3. **Exact recount** — candidates broadcast (``ray.put``), one more streamed
   pass counts only them exactly, tiny groupby, top-k by
   (count desc, term asc).

Output is bit-exact vs the naive full groupby (and the DuckDB twin); the
sketch only bounds what crosses the wire.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import tokenize_flat

HH_K = 20
HH_M = 256


def _batch_counts(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(unique term array (object), counts) for one batch."""
    toks, _ = tokenize_flat(batch["text"])
    if len(toks) == 0:
        return np.empty(0, object), np.empty(0, np.int64)
    dic = pc.dictionary_encode(toks)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    cnt = np.bincount(codes, minlength=len(dic.dictionary)).astype(np.int64)
    return np.asarray(dic.dictionary.to_pylist(), dtype=object), cnt


def heavy_hitters_topk(ds, *, k: int = HH_K, m: int = HH_M) -> pa.Table:
    """Exact global top-k terms by total occurrence count.

    Returns (rank, term, count) sorted by rank; ties broken term-ascending.
    Raises if the Misra-Gries soundness condition fails for this (k, m).
    """
    import ray

    def sketch(batch: pa.Table) -> pa.Table:
        terms, cnt = _batch_counts(batch)
        if len(cnt) <= m:
            d = 0
            keep = np.ones(len(cnt), bool)
            w = cnt
        else:
            d = int(np.partition(cnt, len(cnt) - m - 1)[len(cnt) - m - 1])
            w = cnt - d
            keep = w > 0
        out = pa.table(
            {
                "term": pa.array(list(terms[keep]), pa.string()),
                "w": pa.array(w[keep].astype(np.int64)),
                "d": pa.array(np.zeros(int(keep.sum()), np.int64)),
            }
        )
        # one sentinel row carries this batch's deduction
        sent = pa.table(
            {
                "term": pa.array([""], pa.string()),
                "w": pa.array([0], pa.int64()),
                "d": pa.array([d], pa.int64()),
            }
        )
        return pa.concat_tables([out, sent])

    parts = [t for t in ray.get(
        ds.map_batches(sketch, batch_format="pyarrow").to_arrow_refs()
    ) if t.num_rows]
    merged = pa.concat_tables(parts) if parts else pa.table(
        {"term": pa.array([], pa.string()), "w": pa.array([], pa.int64()),
         "d": pa.array([], pa.int64())}
    )
    err = int(pc.sum(merged["d"]).as_py() or 0)
    body = merged.filter(pc.not_equal(merged["term"], pa.scalar("")))
    summary = body.group_by("term").aggregate([("w", "sum")])
    lower = summary["w_sum"].to_numpy(zero_copy_only=False)
    terms = np.asarray(summary["term"].to_pylist(), dtype=object)
    if len(lower) == 0:
        return pa.table(
            {"rank": pa.array([], pa.int64()), "term": pa.array([], pa.string()),
             "count": pa.array([], pa.int64())}
        )
    kk = min(k, len(lower))
    L = int(np.partition(lower, len(lower) - kk)[len(lower) - kk])
    if err > L:
        raise ValueError(
            f"heavy-hitter sketch unsound for k={k}, m={m}: total deduction "
            f"{err} exceeds k-th lower bound {L}; increase m"
        )
    cand = terms[(lower + err) >= L]
    cand_sorted = np.sort(cand)
    cand_ref = ray.put(cand_sorted)

    def recount(batch: pa.Table) -> pa.Table:
        cs = ray.get(cand_ref)
        terms_b, cnt = _batch_counts(batch)
        if len(terms_b) == 0 or len(cs) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        pos = np.searchsorted(cs, terms_b)
        pos[pos == len(cs)] = 0
        hit = cs[pos] == terms_b
        return pa.table(
            {
                "term": pa.array(list(terms_b[hit]), pa.string()),
                "c": pa.array(cnt[hit]),
            }
        )

    exact_parts = [t for t in ray.get(
        ds.map_batches(recount, batch_format="pyarrow").to_arrow_refs()
    ) if t.num_rows]
    exact = pa.concat_tables(exact_parts).group_by("term").aggregate([("c", "sum")])
    cn = exact["c_sum"].to_numpy(zero_copy_only=False)
    tn = np.asarray(exact["term"].to_pylist(), dtype=object)
    order = np.lexsort((tn, -cn))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "term": pa.array(list(tn[order]), pa.string()),
            "count": pa.array(cn[order].astype(np.int64)),
        }
    )


def sql_heavy_hitters(k: int = HH_K) -> str:
    from .analysis import sql_tokens_cte

    return (
        f"WITH toks AS ({sql_tokens_cte()}),\n"
        "cnt AS (SELECT term, count(*)::BIGINT AS count FROM toks GROUP BY term),\n"
        "rk AS (SELECT term, count, row_number() OVER (ORDER BY count DESC, term) AS rank\n"
        "  FROM cnt)\n"
        f"SELECT rank::BIGINT AS rank, term, count FROM rk WHERE rank <= {k}"
    )
