"""CCNet-style language-model quality scoring — per-document perplexity
under an n-gram LM trained on an in-corpus reference slice.

CCNet (Wenzek et al. 2020) buckets Common-Crawl documents by the perplexity
of a 5-gram KenLM trained on Wikipedia; head/middle/tail perplexity bands
drive what enters the training mix.  This operator is the same shape with a
deterministic, oracle-verifiable core: an add-one-smoothed BIGRAM model
trained on a deterministic corpus slice (``doc_id % slice_mod ==
slice_rem`` — the in-corpus stand-in for the clean reference corpus), and
per-document average negative log-likelihood

    nll(doc) = mean over adjacent token pairs of
               ln(c1(w1) + V) - ln(c2(w1, w2) + 1)

where c2/c1 are slice bigram/left-unigram counts and V the slice
vocabulary size (perplexity = e^nll).  Lower = closer to the reference
distribution, exactly CCNet's ranking signal.

Scale shape — everything stays in the data plane:
- ONE tokenize pass emits per-doc bigram rows keyed by 64-bit hashes; the
  training slice's rows additionally feed two count aggregations.  The
  default ``kernel="fast"`` runs md5 once per UNIQUE token in the batch
  (dictionary-encode; Zipf ≈4 % of the stream) and derives the bigram key
  with a vectorized 64-bit mix — the keys are ENGINE-INTERNAL (the SQL
  twin joins on the token strings), so only their equality classes
  matter.  ``kernel="md5"`` keeps the legacy per-bigram
  ``md5_number_lower(w1␟w2)`` key (~10× slower, bit-equal to DuckDB);
  both kernels produce identical output tables.
- Count lookup is the engine's shuffle-equi-join: LM count rows and doc
  rows union into ONE coarse hash-partition shuffle per key (bigram, then
  left-unigram); inside each partition a sorted ``searchsorted`` lookup is
  vectorized — the LM is NEVER driver-resident or broadcast (at web scale
  a reference-slice bigram table is billions of rows).
- The per-doc fold is a small groupby of constant-size partials.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.minhash import md5_lower64
from .analysis import MAX_TOKEN_BYTES, TOKEN_SEPARATOR_RE, tokenize_flat

__all__ = ["ccnet_perplexity", "sql_ccnet_perplexity"]

SEP = "\x1f"  # never inside a token (tokens are alphanumeric runs)
DEFAULT_PARTITIONS = 128


_GOLD1 = np.uint64(0x9E3779B97F4A7C15)
_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _mix64(h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit pair mix (splitmix-style, uint64 wraparound).
    Order-sensitive; engine-internal join key — only equality classes
    matter, so collision exposure is the same 2⁻⁶⁴ birthday bound as the
    legacy per-bigram md5 it replaces."""
    x = h1 * _GOLD1
    x = x ^ (x >> np.uint64(31))
    x = x + h2 * _GOLD2
    x = x ^ (x >> np.uint64(29))
    x = x * _GOLD1
    return x ^ (x >> np.uint64(32))


def _bigram_rows(
    batch: pa.Table, *, id_col: str, text_col: str, kernel: str = "fast"
) -> pa.Table:
    """(doc_id, bh, wh) per adjacent token pair; wh = md5_lower64(w1) in
    BOTH kernels; bh = _mix64(hash(w1), hash(w2)) (fast) or the legacy
    md5(w1␟w2) (md5) — identical equality classes, identical output."""
    import pyarrow.compute as pc

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    tokens, parents = tokenize_flat(batch[text_col])
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "bh": pa.array([], pa.int64()),
            "wh": pa.array([], pa.int64()),
        }
    )
    if len(parents) < 2:
        return empty
    adj = parents[1:] == parents[:-1]
    if not adj.any():
        return empty
    idx = np.flatnonzero(adj)
    if kernel == "md5":
        toks = tokens.to_pylist()
        bh = np.fromiter(
            (md5_lower64(toks[i] + SEP + toks[i + 1]) for i in idx),
            dtype=np.uint64, count=len(idx),
        )
        wh = np.fromiter(
            (md5_lower64(toks[i]) for i in idx), dtype=np.uint64, count=len(idx)
        )
    else:
        dic = pc.dictionary_encode(tokens)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        uh = np.fromiter(
            (md5_lower64(t) for t in dic.dictionary.to_pylist()),
            dtype=np.uint64, count=len(dic.dictionary),
        )
        th = uh[codes]  # per-token md5-lower-64, md5 run once per unique
        wh = th[idx]
        bh = _mix64(wh, th[idx + 1])
    # int64 VIEW of the uint64 hashes: Ray groupby keys and Arrow arrays
    # stay native (uint64 > 2^63 keys fall back to pickled Python objects);
    # the hash is an engine-internal join key, so only consistency matters
    return pa.table(
        {
            "doc_id": pa.array(ids[parents[idx]], pa.int64()),
            "bh": pa.array(bh.view(np.int64)),
            "wh": pa.array(wh.view(np.int64)),
        }
    )


def _count_join(doc_rows, lm_counts, key: str, out_name: str, num_partitions: int):
    """Annotate ``doc_rows`` with the LM count for ``key`` (0 when unseen):
    union-tag → coarse hash partition → vectorized searchsorted per group."""

    mask = num_partitions - 1  # power-of-two partition count

    def tag_docs(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b[key],
                "pb": pa.array(np.bitwise_and(k, mask).astype(np.int64)),
                "doc_id": b["doc_id"],
                "c": pa.array(np.full(b.num_rows, -1, np.int64)),  # -1 = doc row
            }
        )

    def tag_lm(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": b["k"],
                "pb": pa.array(np.bitwise_and(k, mask).astype(np.int64)),
                "doc_id": pa.array(np.full(b.num_rows, -1, np.int64)),
                "c": b["c"],
            }
        )

    both = doc_rows.map_batches(tag_docs, batch_format="pyarrow").union(
        lm_counts.map_batches(tag_lm, batch_format="pyarrow")
    )

    def fold(g: pa.Table) -> pa.Table:
        c = g["c"].to_numpy(zero_copy_only=False)
        k = g["k"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        is_lm = c >= 0
        lk, lc = k[is_lm], c[is_lm]
        order = np.argsort(lk, kind="mergesort")
        lk, lc = lk[order], lc[order]
        dk, dd = k[~is_lm], d[~is_lm]
        if len(dk) == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 out_name: pa.array([], pa.int64())}
            )
        if len(lk) == 0:
            cnt = np.zeros(len(dk), np.int64)
        else:
            pos = np.searchsorted(lk, dk).clip(0, len(lk) - 1)
            hit = lk[pos] == dk
            cnt = np.where(hit, lc[pos], 0)
        return pa.table(
            {"doc_id": pa.array(dd, pa.int64()), out_name: pa.array(cnt, pa.int64())}
        )

    return both.groupby("pb").map_groups(fold, batch_format="pyarrow")


def ccnet_perplexity(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    slice_mod: int = 10,
    slice_rem: int = 0,
    num_partitions: int = DEFAULT_PARTITIONS,
    kernel: str = "fast",
):
    """(doc_id, n_bigrams, nll_r) for every doc with ≥1 bigram — nll_r is
    the add-one bigram average negative log-likelihood rounded to 4
    (perplexity = e^nll); lower = closer to the reference slice.

    ``kernel``: "fast" (md5 per unique token + vectorized pair mix,
    default) or "md5" (legacy per-bigram md5) — identical results."""
    import ray.data as rd  # noqa: F401
    from ray.data.aggregate import Sum

    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")
    if kernel not in ("fast", "md5"):
        raise ValueError("kernel must be 'fast' or 'md5'")

    rows = ds.map_batches(
        lambda b: _bigram_rows(b, id_col=id_col, text_col=text_col, kernel=kernel),
        batch_format="pyarrow",
    ).materialize()  # one tokenize pass feeds slice counts AND doc scoring

    def only_slice(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % slice_mod == slice_rem))

    slice_rows = rows.map_batches(only_slice, batch_format="pyarrow")
    c2 = (
        slice_rows.map_batches(
            lambda b: pa.table({"k": b["bh"], "n": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="c"))
    )
    c1 = (
        slice_rows.map_batches(
            lambda b: pa.table({"k": b["wh"], "n": pa.array(np.ones(b.num_rows, np.int64))}),
            batch_format="pyarrow",
        )
        .groupby("k")
        .aggregate(Sum("n", alias_name="c"))
    )
    # V = slice vocabulary: distinct tokens ANYWHERE in the slice = distinct
    # left-unigrams ∪ the final token of each doc; counting distinct left
    # hashes is the deterministic definition both sides use
    v_size = c1.count()

    j2 = _count_join(
        rows.map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"], "bh": b["bh"]}),
            batch_format="pyarrow",
        ),
        c2, "bh", "c2", num_partitions,
    )
    j1 = _count_join(
        rows.map_batches(lambda b: pa.table({"doc_id": b["doc_id"], "bh": b["wh"]}), batch_format="pyarrow"),
        c1, "bh", "c1", num_partitions,
    )

    def partial2(b: pa.Table) -> pa.Table:
        c2v = b["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "s": pa.array(-np.log1p(c2v)),  # -ln(c2 + 1)
                "n": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )

    def partial1(b: pa.Table) -> pa.Table:
        c1v = b["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "s": pa.array(np.log(c1v + float(v_size))),  # +ln(c1 + V)
                "n": pa.array(np.zeros(b.num_rows, np.int64)),
            }
        )

    folded = (
        j2.map_batches(partial2, batch_format="pyarrow")
        .union(j1.map_batches(partial1, batch_format="pyarrow"))
        .groupby("doc_id")
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finish(b: pa.Table) -> pa.Table:
        s = b["s"].to_numpy(zero_copy_only=False)
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_bigrams": pa.array(n),
                "nll_r": pa.array(np.round(s / n, 4)),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow")


def sql_ccnet_perplexity(
    slice_mod: int = 10,
    slice_rem: int = 0,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Exact DuckDB twin: identical tokenizer, slice, add-one formula."""
    sep = TOKEN_SEPARATOR_RE
    return (
        f"WITH tl AS (SELECT {id_col} AS doc_id,\n"
        f"    [lower(t) FOR t IN regexp_split_to_array({text_col}, '{sep}')\n"
        f"     IF strlen(t) > 0 AND strlen(t) < {MAX_TOKEN_BYTES}] AS l\n"
        f"  FROM {table}),\n"
        "bg AS (SELECT doc_id, l[i] AS w1, l[i + 1] AS w2 FROM tl,\n"
        "    (SELECT unnest(generate_series(1, 4000)) AS i) g WHERE i < len(l)),\n"
        f"sl AS (SELECT * FROM bg WHERE doc_id % {slice_mod} = {slice_rem}),\n"
        "c2 AS (SELECT w1, w2, count(*)::BIGINT AS c FROM sl GROUP BY w1, w2),\n"
        "c1 AS (SELECT w1, count(*)::BIGINT AS c FROM sl GROUP BY w1),\n"
        "v AS (SELECT count(*)::BIGINT AS v FROM c1),\n"
        "terms AS (SELECT bg.doc_id,\n"
        "    ln(coalesce(c1.c, 0) + v.v) - ln(coalesce(c2.c, 0) + 1) AS t\n"
        "  FROM bg LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2\n"
        "  LEFT JOIN c1 ON bg.w1 = c1.w1, v)\n"
        "SELECT doc_id, count(*)::BIGINT AS n_bigrams,\n"
        "  round(sum(t) / count(*), 4) AS nll_r\n"
        "FROM terms GROUP BY doc_id"
    )
