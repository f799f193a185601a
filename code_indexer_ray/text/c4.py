"""C4 / RefinedWeb line-level curation operators.

C4 (Raffel et al. 2020 §2.2) keeps only lines that end in terminal
punctuation and have ≥ MIN_WORDS words, then drops pages with fewer than
MIN_LINES surviving lines; RefinedWeb (Penedo et al. 2023) additionally
removes individual lines duplicated ACROSS documents (exact line dedup).
Both operators here work on any newline-delimited text column.

The driver corpus has single-line texts, so the catalog entries first run a
DETERMINISTIC line synthesis (the pii_redact precedent — the fixture is
injected identically on both sides): tokens group into lines of
``LINE_TOKENS``, and line ``li`` of doc ``d`` ends with '.' iff
``(d + li) % 3 != 0``.  The synthesis is reproduced exactly in the DuckDB
twin, so the rules run over real multi-line strings on both sides.

Scale shape: synthesis + the C4 filter are shuffle-free vectorized
map_batches passes; line dedup is the span-dedup shape — map-side DISTINCT
(line-hash, doc) pairs through ONE coarse hash-partition shuffle, so a
degenerate boilerplate line never lands on a single reducer unsplit (the
hash partition count, not the line multiplicity, bounds group size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LINE_TOKENS = 10  # synthesized line length (tokens)
MIN_WORDS = 5  # C4: a kept line has at least this many words
MIN_LINES = 3  # C4: a kept page has at least this many kept lines
LINE_PARTITIONS = 256  # line-dedup shuffle fan-out


def _flat_tokens(texts: pa.Array | pa.ChunkedArray):
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern(texts, " ")
    flat = pc.list_flatten(toks)
    off = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    n_tok = np.diff(off)
    return toks, flat, off, n_tok


def synthesize_lines_batch(batch: pa.Table) -> pa.Table:
    """documents row → same row with ``text`` rewritten as multi-line text:
    lines of LINE_TOKENS tokens, '.' appended to line li iff
    (doc_id + li) % 3 != 0.  Fully vectorized — per-token suffixes are one
    numpy select + one Arrow element-wise join, docs reassemble with one
    list-join."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    toks, flat, off, n_tok = _flat_tokens(batch["text"])
    parents = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_tok)
    pos = np.arange(len(flat), dtype=np.int64) - np.repeat(off[:-1], n_tok)
    li = pos // LINE_TOKENS
    punct = ((doc_ids[parents] + li) % 3) != 0
    line_end = (pos + 1) % LINE_TOKENS == 0
    last = pos == np.repeat(n_tok - 1, n_tok)
    suffix = np.where(
        last,
        np.where(punct, ".", ""),
        np.where(line_end, np.where(punct, ".\n", "\n"), " "),
    )
    glued = pc.binary_join_element_wise(flat, pa.array(suffix, type=pa.string()), "")
    lined = pc.binary_join(pa.ListArray.from_arrays(toks.offsets, glued), "")
    cols = {name: batch[name] for name in batch.column_names}
    cols["text"] = lined
    return pa.table(cols)


def _flat_lines(batch: pa.Table):
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    lines = pc.split_pattern(texts, "\n")
    flat = pc.list_flatten(lines)
    n_lines = np.diff(lines.offsets.to_numpy(zero_copy_only=False).astype(np.int64))
    return flat, n_lines


def c4_stats_batch(batch: pa.Table) -> pa.Table:
    """Per-doc C4 line-rule stats over newline-delimited text: (doc_id,
    n_lines, n_kept, kept) where a line is kept iff it has ≥ MIN_WORDS words
    AND ends in terminal punctuation, and the page is kept iff ≥ MIN_LINES
    lines survive.  One vectorized pass, shuffle-free."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    flat, n_lines = _flat_lines(batch)
    wc = pc.add(pc.count_substring(flat, " "), 1).to_numpy(zero_copy_only=False)
    ends = pc.ends_with(flat, ".").to_numpy(zero_copy_only=False)
    kept_line = (wc >= MIN_WORDS) & ends
    parents = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_lines)
    n_kept = np.zeros(len(doc_ids), dtype=np.int64)
    np.add.at(n_kept, parents, kept_line.astype(np.int64))
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "n_lines": pa.array(n_lines.astype(np.int64)),
            "n_kept": pa.array(n_kept),
            "kept": pa.array((n_kept >= MIN_LINES).astype(np.int64)),
        }
    )


def line_dedup_stats(ds):
    """RefinedWeb exact line dedup stats: per doc, (n_lines, n_dup) counting
    its DISTINCT lines and how many of them occur in >1 document.  Map-side
    DISTINCT (md5-lower-64 line hash, doc) pairs → one coarse hash-partition
    shuffle → vectorized multiplicity count → tiny per-doc groupby (the
    span-dedup shape; hashes match DuckDB's ``md5_number_lower`` so the twin
    is collision-proof on both sides)."""
    from ray.data.aggregate import Sum

    from ..dedup.minhash import md5_lower64

    def pairs(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, n_lines = _flat_lines(batch)
        parents = np.repeat(np.arange(len(doc_ids), dtype=np.int64), n_lines)
        if len(flat) == 0:
            e = pa.array([], pa.int64())
            return pa.table({"x": e, "doc_id": e, "pb": e})
        h = np.fromiter(
            (md5_lower64(s) for s in flat.to_pylist()), dtype=np.uint64, count=len(flat)
        )
        order = np.lexsort((h, parents))
        hs, rs = h[order], parents[order]
        first = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
        hs, rs = hs[first], rs[first]  # DISTINCT (line, doc) before the shuffle
        return pa.table(
            {
                "x": pa.array(hs.astype(np.int64)),
                "doc_id": pa.array(doc_ids[rs]),
                "pb": pa.array((hs % np.uint64(LINE_PARTITIONS)).astype(np.int64)),
            }
        )

    def partition_stats(g: pa.Table) -> pa.Table:
        # Arrow/numpy fold (round-4: was a pandas groupby — conversion tax)
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_lines": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        x = g["x"].to_numpy(zero_copy_only=False)
        d = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(x, kind="mergesort")
        x, d = x[order], d[order]
        start = np.flatnonzero(np.r_[True, x[1:] != x[:-1]])
        size = np.diff(np.r_[start, len(x)])
        dup = np.repeat(size > 1, size).astype(np.int64)
        od = np.argsort(d, kind="mergesort")
        d2, du2 = d[od], dup[od]
        dstart = np.flatnonzero(np.r_[True, d2[1:] != d2[:-1]])
        return pa.table(
            {
                "doc_id": pa.array(d2[dstart], pa.int64()),
                "n_lines": pa.array(np.diff(np.r_[dstart, len(d2)]), pa.int64()),
                "n_dup": pa.array(np.add.reduceat(du2, dstart), pa.int64()),
            }
        )

    return (
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(partition_stats, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_lines", alias_name="n_lines"), Sum("n_dup", alias_name="n_dup"))
    )


def sql_lines_cte(table: str = "documents") -> str:
    """DuckDB CTE body ``lines(doc_id, li, line, nw)`` reproducing the
    synthesis bit-exactly (same token grouping, same punctuation rule)."""
    lt = LINE_TOKENS
    return (
        f"tokarr AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),\n"
        "tok AS (SELECT doc_id, unnest(w) AS t, generate_subscripts(w, 1) AS pos FROM tokarr),\n"
        f"ln AS (SELECT doc_id, (pos - 1) // {lt} AS li, string_agg(t, ' ' ORDER BY pos) AS body,\n"
        f"  count(*) AS nw FROM tok GROUP BY doc_id, (pos - 1) // {lt}),\n"
        "lines AS (SELECT doc_id, li,\n"
        "  CASE WHEN (doc_id + li) % 3 <> 0 THEN body || '.' ELSE body END AS line, nw FROM ln)"
    )
