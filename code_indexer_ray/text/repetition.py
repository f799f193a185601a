"""Webtext repetition-quality signals and corpus-level duplicated-span stats.

Two classic training-data curation operators over raw web text:

- :func:`repetition_stats_batch` — per-document repetition signals in the
  style of the Gopher quality rules (Rae et al. 2021 §A1.1: "fraction in the
  most frequent n-gram", "fraction in duplicate n-grams"), computed over
  TOKEN n-grams so every statistic is an exact integer (counts and
  floor-divided e4 fractions) reproducible in SQL.
- :func:`span_dedup_stats` — corpus-LEVEL duplicated-span statistics (the
  C4 / RefinedWeb remove-repeated-spans family): for every document, how
  many of its distinct 10-token spans also appear in some other document.

Both use the proven exact-twin hash algebra of the fast MinHash kernel
(``dedup/minhash.py``): per-unique-token ``md5_lower64 % (2³¹−1)`` (DuckDB
``md5_number_lower``), Horner window combine base 1000003 mod 2³¹−1 —
BIGINT-safe on the SQL side, vectorized uint64 on the numpy side.  Hash
collisions merge gram identities identically on both sides, so the oracle
stays bit-exact even in the (≈2⁻³¹) collision case.

Scale notes: the per-doc signals are embarrassingly parallel (no shuffle).
The span stats use ONE coarse hash-partition shuffle on the span hash
(every occurrence of a span lands in one partition) with map-side
DISTINCT-(span, doc) dedup, then a per-doc partial aggregate inside each
partition and a tiny final ``groupby(doc_id)`` — the same
no-tiny-groups design as ``candidate_pairs``.  Nothing corpus-sized ever
gathers on one node; partitions are bounded by corpus-share / 64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..dedup.minhash import HORNER_BASE, MERSENNE_31, md5_lower64
from .analysis import tokenize_flat

TOP_NGRAM_N = 2
DUP_NGRAM_N = 5
SPAN_N = 10
SPAN_PARTITIONS = 64


def token_ngram_hashes(
    texts: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """``(gram_hash, row, n_tokens)``: Horner hashes of every n-token window
    (windows never cross document boundaries; docs with < n tokens emit no
    grams), plus the per-row token count.  One md5 per UNIQUE token."""
    tokens, rows = tokenize_flat(texts)
    n_rows = len(texts)
    n_tok = np.zeros(n_rows, dtype=np.int64)
    if len(rows):
        np.add.at(n_tok, rows, 1)
    if len(tokens) == 0 or len(tokens) < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n_tok
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    uh = np.fromiter(
        (md5_lower64(t) % MERSENNE_31 for t in dic.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    th = uh[codes]
    M = np.uint64(MERSENNE_31)
    B = np.uint64(HORNER_BASE)
    N = len(th)
    x = th[: N - n + 1].copy()
    for j in range(1, n):
        x = (x * B + th[j : N - n + 1 + j]) % M
    mask = rows[: N - n + 1] == rows[n - 1 :]
    return x[mask], rows[: N - n + 1][mask].astype(np.int64), n_tok


def _per_row_gram_stats(
    h: np.ndarray, rows: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per row: total gram count, distinct gram count, top gram multiplicity."""
    total = np.zeros(n_rows, dtype=np.int64)
    uniq = np.zeros(n_rows, dtype=np.int64)
    top = np.zeros(n_rows, dtype=np.int64)
    if len(h):
        np.add.at(total, rows, 1)
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        gstart = np.flatnonzero(np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])])
        gcount = np.diff(np.r_[gstart, len(hs)])
        grow = rs[gstart]
        np.add.at(uniq, grow, 1)
        np.maximum.at(top, grow, gcount)
    return total, uniq, top


def repetition_stats_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Gopher-style repetition signals per document (token-n-gram variant):

    - ``top2_cnt`` / ``top2_frac_e4`` — multiplicity of the most frequent
      2-gram and its floor(·10⁴) share of all 2-gram positions;
    - ``dup5_cnt`` / ``dup5_frac_e4`` — number of 5-gram positions occupied
      by repeated 5-grams (total − distinct) and their e4 share.

    All integers — byte-exact against the SQL twin; docs with fewer than n
    tokens report zeros for that n."""
    n_rows = batch.num_rows
    doc_ids = batch[id_col].cast(pa.int64())
    h2, r2, n_tok = token_ngram_hashes(batch[text_col], TOP_NGRAM_N)
    h5, r5, _ = token_ngram_hashes(batch[text_col], DUP_NGRAM_N)
    n2, _, top2 = _per_row_gram_stats(h2, r2, n_rows)
    n5, u5, _ = _per_row_gram_stats(h5, r5, n_rows)
    dup5 = n5 - u5
    top2_e4 = np.where(n2 > 0, (top2 * 10_000) // np.maximum(n2, 1), 0)
    dup5_e4 = np.where(n5 > 0, (dup5 * 10_000) // np.maximum(n5, 1), 0)
    return pa.table(
        {
            "doc_id": doc_ids,
            "n_tokens": pa.array(n_tok),
            "n_2grams": pa.array(n2),
            "top2_cnt": pa.array(top2),
            "top2_frac_e4": pa.array(top2_e4),
            "n_5grams": pa.array(n5),
            "dup5_cnt": pa.array(dup5),
            "dup5_frac_e4": pa.array(dup5_e4),
        }
    )


def span_dedup_stats(ds, *, span_n: int = SPAN_N, num_partitions: int = SPAN_PARTITIONS):
    """Corpus-level duplicated-span statistics: for each doc with ≥1 distinct
    ``span_n``-token span, ``(doc_id, n_spans, n_shared, shared_frac_e4)``
    where ``n_shared`` counts its distinct spans that occur in >1 document.

    Shape: map-side DISTINCT (span, doc) pairs → one coarse hash-partition
    shuffle on ``span % num_partitions`` (all occurrences of a span
    co-locate) → vectorized per-partition count of span multiplicities +
    per-doc partial sums → small final ``groupby(doc_id)``."""
    from ray.data.aggregate import Sum

    def pairs(batch: pa.Table) -> pa.Table:
        h, rows, _ = token_ngram_hashes(batch["text"], span_n)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            e = pa.array([], pa.int64())
            return pa.table({"x": e, "doc_id": e, "pb": e})
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        first = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
        hs, rs = hs[first], rs[first]  # DISTINCT (span, doc) before the shuffle
        return pa.table(
            {
                "x": pa.array(hs.astype(np.int64)),
                "doc_id": pa.array(doc_ids[rs]),
                "pb": pa.array((hs % np.uint64(num_partitions)).astype(np.int64)),
            }
        )

    def partition_stats(g: pa.Table) -> pa.Table:
        # Arrow/numpy fold (round-4: was a pandas groupby — pure conversion
        # tax; reduceat over the doc-sorted run does the same sum)
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_shared": pa.array([], pa.int64()),
                }
            )
        x = g["x"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(x, kind="mergesort")
        x, d = x[order], d[order]
        start = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        size = np.diff(np.r_[start, len(x)])
        shared = np.repeat(size > 1, size).astype(np.int64)
        od = np.argsort(d, kind="mergesort")
        d2, sh2 = d[od], shared[od]
        dstart = np.flatnonzero(np.r_[True, d2[1:] != d2[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d2[dstart], pa.int64()),
                "n_spans": pa.array(np.diff(np.r_[dstart, len(d2)]), pa.int64()),
                "n_shared": pa.array(np.add.reduceat(sh2, dstart), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(partition_stats, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_spans", alias_name="n_spans"), Sum("n_shared", alias_name="n_shared"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        ns = batch["n_spans"].to_numpy(zero_copy_only=False)
        sh = batch["n_shared"].to_numpy(zero_copy_only=False)
        e4 = (sh * 10_000) // np.maximum(ns, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_spans": pa.array(ns.astype(np.int64)),
                "n_shared": pa.array(sh.astype(np.int64)),
                "shared_frac_e4": pa.array(e4.astype(np.int64)),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sql_token_hash_cte(table: str = "documents") -> str:
    """Shared token CTEs: ``tokarr``/``tpos``/``th`` with the per-token
    ``md5_number_lower % (2³¹−1)`` hash (twin of :func:`token_ngram_hashes`'s
    token stage)."""
    M = MERSENNE_31
    return (
        "tokarr AS (SELECT d.doc_id,\n"
        "  list_transform(list_filter(regexp_split_to_array(d.text, '[^\\p{L}\\p{N}]+'),\n"
        f"    x -> strlen(x) > 0 AND strlen(x) < 40), x -> lower(x)) AS tks FROM {table} d),\n"
        "tpos AS (SELECT doc_id, unnest(tks) AS term, generate_subscripts(tks, 1) AS pos,\n"
        "  len(tks) AS nt FROM tokarr),\n"
        f"th AS (SELECT doc_id, pos, nt, (md5_number_lower(term) % {M})::BIGINT AS t FROM tpos)"
    )


def sql_ngram_hash_cte(n: int, out_name: str) -> str:
    """``{out_name}(doc_id, x)``: the n-token-window Horner hashes — exact
    twin of :func:`token_ngram_hashes` for the same ``n``."""
    M = MERSENNE_31
    B = HORNER_BASE
    expr = "t"
    for j in range(1, n):
        expr = f"((({expr}) * {B} + lead(t, {j}) OVER w) % {M})"
    return (
        f"{out_name}_w AS (SELECT doc_id, pos, nt, {expr} AS x\n"
        "  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),\n"
        f"{out_name} AS (SELECT doc_id, x FROM {out_name}_w WHERE pos <= nt - {n - 1})"
    )


def token_ngram_hashes_pos(
    texts: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Like :func:`token_ngram_hashes` plus each window's 0-based START
    position within its row: ``(gram_hash, row, pos, n_tokens)``."""
    tokens, rows = tokenize_flat(texts)
    n_rows = len(texts)
    n_tok = (
        np.bincount(rows, minlength=n_rows).astype(np.int64)
        if len(rows)
        else np.zeros(n_rows, dtype=np.int64)
    )
    if len(tokens) == 0 or len(tokens) < n:
        e = np.empty(0, np.int64)
        return np.empty(0, np.uint64), e, e, n_tok
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    uh = np.fromiter(
        (md5_lower64(t) % MERSENNE_31 for t in dic.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    th = uh[codes]
    M = np.uint64(MERSENNE_31)
    B = np.uint64(HORNER_BASE)
    N = len(th)
    x = th[: N - n + 1].copy()
    for j in range(1, n):
        x = (x * B + th[j : N - n + 1 + j]) % M
    mask = rows[: N - n + 1] == rows[n - 1 :]
    idx = np.flatnonzero(mask)
    row_offs = np.concatenate(([0], np.cumsum(n_tok)))
    r = rows[idx].astype(np.int64)
    pos = idx - row_offs[r]
    return x[mask], r, pos, n_tok


def remove_duplicate_spans(
    ds, *, span_n: int = SPAN_N, num_partitions: int = SPAN_PARTITIONS,
    id_col: str = "doc_id", text_col: str = "text",
):
    """EXACT duplicated-substring REMOVAL (the output side of Lee et al.
    2022's suffix-array dedup, distilled to fixed-``span_n``-token windows):
    a token is removed iff it is covered by any ``span_n``-token window
    whose span occurs in MORE THAN ONE document.  Returns one row per doc:
    (doc_id, n_tokens, n_removed, clean_md5) where clean_md5 hashes the
    kept tokens joined by single spaces.

    All in the data plane, three shuffles, nothing corpus-sized at the
    driver:
      1. DISTINCT (span, doc) pairs hash-partition on the span → duplicated
         span hashes (≥2 distinct docs);
      2. every span OCCURRENCE (doc, pos, span) equi-joins the dup set on
         the span hash → duplicated window starts per doc;
      3. docs ∪ per-doc start lists co-group on a doc bucket → vectorized
         coverage (difference-array + prefix sum) → cleaned text per row.
    Within-doc-only repeats are NOT removed (cross-document semantics, same
    as :func:`span_dedup_stats`; documented divergence from Lee et al.'s
    within-corpus suffix arrays)."""
    import ray.data as rd

    from ..pipelines.ops import shuffle_equi_join

    def occurrences(batch: pa.Table) -> pa.Table:
        h, rows, pos, _ = token_ngram_hashes_pos(batch[text_col], span_n)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "x": pa.array(h.astype(np.int64)),
                "doc_id": pa.array(doc_ids[rows]),
                "pos": pa.array(pos),
            }
        )

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        h, rows, _, _ = token_ngram_hashes_pos(batch[text_col], span_n)
        doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(h) == 0:
            e = pa.array([], pa.int64())
            return pa.table({"x": e, "doc_id": e, "pb": e})
        order = np.lexsort((h, rows))
        hs, rs = h[order], rows[order]
        first = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
        hs, rs = hs[first], rs[first]
        return pa.table(
            {
                "x": pa.array(hs.astype(np.int64)),
                "doc_id": pa.array(doc_ids[rs]),
                "pb": pa.array((hs % np.uint64(num_partitions)).astype(np.int64)),
            }
        )

    def dup_hashes(g: pa.Table) -> pa.Table:
        x = g["x"].to_numpy(zero_copy_only=False)
        if len(x) == 0:
            return pa.table({"x": pa.array([], pa.int64())})
        xs = np.sort(x)
        start = np.flatnonzero(np.r_[True, xs[1:] != xs[:-1]])
        size = np.diff(np.r_[start, len(xs)])
        return pa.table({"x": pa.array(xs[start[size >= 2]])})

    dups = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(dup_hashes, batch_format="pyarrow")
    )
    occ = ds.map_batches(occurrences, batch_format="pyarrow")
    starts = shuffle_equi_join(
        occ, dups, key="x", left_cols=["doc_id", "pos"], right_cols=[],
        num_buckets=num_partitions,
    )

    nb = 64  # doc-bucket width for the final co-group

    def tag_doc(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        d = batch[id_col].cast(pa.int64())
        return pa.table(
            {
                "doc_id": d,
                "text": batch[text_col],
                "pos": pa.nulls(n, pa.int64()),
                "_db": pc.cast(
                    pc.bit_wise_and(d, pa.scalar(nb - 1, pa.int64())), pa.int64()
                ),
            }
        )

    def tag_start(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        d = batch["doc_id"].cast(pa.int64())
        return pa.table(
            {
                "doc_id": d,
                "text": pa.nulls(n, pa.string()),
                "pos": batch["pos"].cast(pa.int64()),
                "_db": pc.cast(
                    pc.bit_wise_and(d, pa.scalar(nb - 1, pa.int64())), pa.int64()
                ),
            }
        )

    both = ds.map_batches(tag_doc, batch_format="pyarrow").union(
        starts.map_batches(tag_start, batch_format="pyarrow")
    )

    def rebuild(g: pa.Table) -> pa.Table:
        import hashlib

        text_valid = pc.is_valid(g["text"]).to_numpy(zero_copy_only=False)
        docs = g.filter(pa.array(text_valid))
        srows = g.filter(pa.array(~text_valid))
        if docs.num_rows == 0:
            return _empty_clean()
        d_ids = docs["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(d_ids, kind="mergesort")
        docs = docs.take(pa.array(order))
        d_ids = d_ids[order]
        tokens, rows = tokenize_flat(docs["text"])
        n_tok = (
            np.bincount(rows, minlength=docs.num_rows).astype(np.int64)
            if len(rows)
            else np.zeros(docs.num_rows, dtype=np.int64)
        )
        row_offs = np.concatenate(([0], np.cumsum(n_tok)))
        # map dup-window starts onto the global token index space
        diff = np.zeros(int(row_offs[-1]) + 1, dtype=np.int64)
        if srows.num_rows:
            s_doc = srows["doc_id"].to_numpy(zero_copy_only=False)
            s_pos = srows["pos"].to_numpy(zero_copy_only=False)
            di = np.searchsorted(d_ids, s_doc)
            ok = (di < len(d_ids)) & (d_ids[np.minimum(di, len(d_ids) - 1)] == s_doc)
            di, s_pos = di[ok], s_pos[ok]
            a = row_offs[di] + s_pos
            b = np.minimum(row_offs[di] + s_pos + span_n, row_offs[di + 1])
            np.add.at(diff, a, 1)
            np.add.at(diff, b, -1)
        covered = np.cumsum(diff[:-1]) > 0
        kept = tokens.filter(pa.array(~covered))
        kept_rows = rows[~covered]
        kept_counts = (
            np.bincount(kept_rows, minlength=docs.num_rows).astype(np.int64)
            if len(kept_rows)
            else np.zeros(docs.num_rows, dtype=np.int64)
        )
        offs = np.concatenate(([0], np.cumsum(kept_counts)))
        lists = pa.LargeListArray.from_arrays(
            pa.array(offs, type=pa.int64()),
            (kept.combine_chunks() if isinstance(kept, pa.ChunkedArray) else kept).cast(
                pa.large_string()
            ),
        )
        clean = pc.binary_join(lists, pa.scalar(" ", type=pa.large_string()))
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in clean.to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(d_ids, type=pa.int64()),
                "n_tokens": pa.array(n_tok),
                "n_removed": pa.array(n_tok - kept_counts),
                "clean_md5": pa.array(md5s, type=pa.string()),
            }
        )

    return both.groupby("_db").map_groups(rebuild, batch_format="pyarrow")


def _empty_clean() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "n_removed": pa.array([], pa.int64()),
            "clean_md5": pa.array([], pa.string()),
        }
    )
