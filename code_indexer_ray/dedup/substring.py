"""Substring (duplicated-span) deduplication — the Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" operator family:
find runs of >= ``w`` tokens that occur more than once across (or within)
the corpus, report the non-canonical occurrences as removal spans, and
optionally emit the cleaned text.

This is span-level dedup, complementing the doc-level family (exact /
MinHash / SimHash / char-n-gram / embedding-cosine): a web page that embeds
one boilerplate paragraph inside otherwise-unique text is invisible to
doc-level near-dup but caught here.

Architecture (Ray-Data-first, two keyed shuffles, no driver state):

1. ``window_hash_rows`` (map_batches): rolling Horner hash of every
   ``w``-token window — same token hash (``md5_lower64 % (2^31-1)``) and
   Horner algebra (base 1000003 mod 2^31-1) as the fast MinHash kernel, so
   the DuckDB twin is bit-exact.  Optional winnowing (``winnow_k``) keeps
   only window-minimum anchors for the 100-TB path.
2. groupby coarse ``whash`` bucket → per-partition vectorized sort: every
   occurrence of a hash except the global-first (ordered by doc_id, pos)
   is flagged as a duplicate position.
3. groupby coarse ``doc_id`` bucket → gaps-and-islands merge of adjacent
   flagged positions into maximal removal spans ``[span_start, span_end)``
   (1-based token positions, end exclusive); the clean variant re-tokenizes
   the doc text in the same group and drops the spanned tokens.

The suffix-array machinery of the paper is a single-machine construct; the
hashed-window formulation is the standard distributed equivalent (every
duplicated run of >= w tokens produces >= 1 duplicated window, and maximal
runs are recovered exactly by the island merge).  With winnowing anchors
(robust winnowing, Schleimer et al. 2003 MOSS) any duplicated run of
>= w + winnow_k - 1 tokens is still guaranteed to share an anchor.

Reference parity: the reference has no substring dedup (its dedup story is
content-hash based, see ``services/file_identifier.py``); this operator is
part of the LLM-curation surface (SURVEY §6 training-data ops).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..text.analysis import tokenize_flat
from .minhash import HORNER_BASE, MERSENNE_31, md5_lower64

DEFAULT_WINDOW = 5
DEFAULT_PARTITIONS = 64


def _token_hash_stream(batch: pa.Table, text_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-token fast-kernel hashes for a batch: ``(th, rows)`` with
    ``th < 2^31`` (md5 once per unique token, as in ``minhash_batch_fast``)."""
    import pyarrow.compute as pc

    tokens, rows = tokenize_flat(batch[text_col])
    if len(tokens) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    dic = pc.dictionary_encode(tokens)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    uh = np.fromiter(
        (md5_lower64(t) % MERSENNE_31 for t in dic.dictionary.to_pylist()),
        dtype=np.uint64,
        count=len(dic.dictionary),
    )
    return uh[codes], np.asarray(rows, dtype=np.int64)


def window_hash_rows(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_WINDOW,
    winnow_k: int | None = None,
) -> pa.Table:
    """(whash, doc_id, pos) for every ``w``-token window of every doc.

    ``pos`` is the 1-based token position of the window start (matching
    SQL ``generate_subscripts``).  Docs with fewer than ``w`` tokens emit
    nothing — a sub-window document has no w-token span to deduplicate.

    ``winnow_k`` (scale mode, engine-internal): keep only positions whose
    hash is the minimum of the trailing ``winnow_k`` windows — ~1/k of the
    rows, still guaranteed to anchor every duplicated run of
    >= w + winnow_k - 1 tokens.
    """
    th, rows = _token_hash_stream(batch, text_col)
    doc_ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    N = len(th)
    empty = pa.table(
        {
            "whash": pa.array([], type=pa.int64()),
            "doc_id": pa.array([], type=pa.int64()),
            "pos": pa.array([], type=pa.int64()),
        }
    )
    if N < w:
        return empty
    B = np.uint64(HORNER_BASE)
    M = np.uint64(MERSENNE_31)
    x = th[: N - w + 1].copy()
    for j in range(1, w):
        x = (x * B + th[j : N - w + 1 + j]) % M
    inside = rows[: N - w + 1] == rows[w - 1 :]  # window stays in one doc
    x = x[inside]
    wrows = rows[: N - w + 1][inside]
    if not len(x):
        return empty
    # 1-based per-doc start position: rank of the window within its doc.
    # rows are nondecreasing (tokenize_flat order), so positions are
    # offsets from each doc's first window.
    starts = np.flatnonzero(np.r_[True, wrows[1:] != wrows[:-1]])
    run_id = np.cumsum(np.r_[True, wrows[1:] != wrows[:-1]]) - 1
    pos = np.arange(len(wrows), dtype=np.int64) - starts[run_id] + 1

    if winnow_k and winnow_k > 1:
        # Classic robust winnowing (Schleimer et al. 2003): select the
        # RIGHTMOST minimum of every window of k consecutive hashes — at
        # least one anchor per k positions, so anchor gaps are <= k and
        # (for k <= w) anchored duplicates chain into one span exactly
        # like the full mode.  Identical hash runs select identical
        # relative anchors, preserving cross-occurrence matching.
        k = min(winnow_k, len(x))
        sw = np.lib.stride_tricks.sliding_window_view(x, k)
        sel = np.arange(len(sw)) + (k - 1) - sw[:, ::-1].argmin(axis=1)
        is_min = np.zeros(len(x), dtype=bool)
        is_min[np.unique(sel)] = True
        # never let winnowing drop a doc's first window entirely
        is_min[starts] = True
        x, wrows, pos = x[is_min], wrows[is_min], pos[is_min]

    return pa.table(
        {
            "whash": pa.array(x.astype(np.int64)),
            "doc_id": pa.array(doc_ids[wrows]),
            "pos": pa.array(pos),
        }
    )


def _flag_partition(g: pa.Table) -> pa.Table:
    """All-but-first occurrence of each whash (ordered by doc_id, pos)."""
    if g.num_columns == 0 or g.num_rows == 0:  # empty range partition
        return pa.table(
            {"doc_id": pa.array([], type=pa.int64()), "pos": pa.array([], type=pa.int64())}
        )
    wh = g["whash"].to_numpy(zero_copy_only=False)
    di = g["doc_id"].to_numpy(zero_copy_only=False)
    po = g["pos"].to_numpy(zero_copy_only=False)
    order = np.lexsort((po, di, wh))
    wh, di, po = wh[order], di[order], po[order]
    first = np.r_[True, wh[1:] != wh[:-1]]
    return pa.table({"doc_id": pa.array(di[~first]), "pos": pa.array(po[~first])})


def duplicate_positions(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_WINDOW,
    winnow_k: int | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Dataset of (doc_id, pos): every non-canonical duplicated window."""

    def hash_stage(batch: pa.Table) -> pa.Table:
        t = window_hash_rows(
            batch, id_col=id_col, text_col=text_col, w=w, winnow_k=winnow_k
        )
        pkey = (t["whash"].to_numpy(zero_copy_only=False) % num_partitions).astype(
            np.int64
        )
        return t.append_column("pkey", pa.array(pkey))

    rows = ds.map_batches(hash_stage, batch_format="pyarrow")
    return rows.groupby("pkey").map_groups(
        lambda g: _flag_partition(g.drop_columns(["pkey"]) if "pkey" in g.column_names else g),
        batch_format="pyarrow",
    )


def _spans_of_positions(po: np.ndarray, w: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted 1-based window starts into maximal [start, end) spans.

    Overlapping/adjacent windows (gap <= w) chain into one span — two
    duplicated windows starting <= w apart cover a contiguous token run.
    """
    brk = np.flatnonzero(np.r_[True, np.diff(po) > w])
    starts = po[brk]
    ends = po[np.r_[brk[1:] - 1, len(po) - 1]] + w
    return starts, ends


def removal_spans(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_WINDOW,
    winnow_k: int | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Dataset of (doc_id, span_start, span_end): maximal duplicated-token
    spans to remove (1-based token positions, end exclusive), keeping the
    corpus-first occurrence of every window."""
    flagged = duplicate_positions(
        ds,
        id_col=id_col,
        text_col=text_col,
        w=w,
        winnow_k=winnow_k,
        num_partitions=num_partitions,
    )

    def bucket(batch: pa.Table) -> pa.Table:
        b = (batch["doc_id"].to_numpy(zero_copy_only=False) % num_partitions).astype(
            np.int64
        )
        return batch.append_column("dkey", pa.array(b))

    def spans_partition(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "span_start": pa.array([], type=pa.int64()),
                "span_end": pa.array([], type=pa.int64()),
            }
        )
        if g.num_columns == 0 or g.num_rows == 0:
            return empty
        di = g["doc_id"].to_numpy(zero_copy_only=False)
        po = g["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((po, di))
        di, po = di[order], po[order]
        out_d, out_s, out_e = [], [], []
        doc_breaks = np.flatnonzero(np.r_[True, di[1:] != di[:-1]])
        bounds = np.r_[doc_breaks, len(di)]
        for i in range(len(doc_breaks)):
            lo, hi = bounds[i], bounds[i + 1]
            s, e = _spans_of_positions(po[lo:hi], w)
            out_d.append(np.full(len(s), di[lo], dtype=np.int64))
            out_s.append(s)
            out_e.append(e)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_d)),
                "span_start": pa.array(np.concatenate(out_s).astype(np.int64)),
                "span_end": pa.array(np.concatenate(out_e).astype(np.int64)),
            }
        )

    return (
        flagged.map_batches(bucket, batch_format="pyarrow")
        .groupby("dkey")
        .map_groups(
            lambda g: spans_partition(
                g.drop_columns(["dkey"]) if "dkey" in g.column_names else g
            ),
            batch_format="pyarrow",
        )
    )


def clean_documents(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    w: int = DEFAULT_WINDOW,
    winnow_k: int | None = None,
    num_partitions: int = DEFAULT_PARTITIONS,
):
    """Dataset of (doc_id, n_removed, clean_text): token stream with every
    removal span dropped, rejoined with single spaces (token-level output —
    original inter-token whitespace is not preserved, documented).

    Docs are re-tokenized inside the doc-bucket group (text ships through
    the one doc-keyed shuffle once; token streams never shuffle).
    """
    flagged = duplicate_positions(
        ds,
        id_col=id_col,
        text_col=text_col,
        w=w,
        winnow_k=winnow_k,
        num_partitions=num_partitions,
    )

    def tag_flags(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "dkey": pa.array((d % num_partitions).astype(np.int64)),
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                "text": pa.array([""] * len(batch), type=pa.string()),
            }
        )

    def tag_docs(batch: pa.Table) -> pa.Table:
        d = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "dkey": pa.array((d % num_partitions).astype(np.int64)),
                "doc_id": pa.array(d),
                "pos": pa.array(np.full(len(batch), -1, dtype=np.int64)),
                "text": batch[text_col].cast(pa.string()),
            }
        )

    union = flagged.map_batches(tag_flags, batch_format="pyarrow").union(
        ds.map_batches(tag_docs, batch_format="pyarrow")
    )

    def clean_partition(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], type=pa.int64()),
                "n_removed": pa.array([], type=pa.int64()),
                "clean_text": pa.array([], type=pa.string()),
            }
        )
        if g.num_columns == 0 or g.num_rows == 0:
            return empty
        pos_np = g["pos"].to_numpy(zero_copy_only=False)
        doc_rows = g.filter(pa.array(pos_np < 0))
        flag_rows = g.filter(pa.array(pos_np >= 0))
        if doc_rows.num_rows == 0:
            return empty
        # flagged window starts per doc
        fd = flag_rows["doc_id"].to_numpy(zero_copy_only=False)
        fp = flag_rows["pos"].to_numpy(zero_copy_only=False)
        forder = np.lexsort((fp, fd))
        fd, fp = fd[forder], fp[forder]
        tokens, rows = tokenize_flat(doc_rows["text"])
        toks = tokens.to_pylist()
        dids = doc_rows["doc_id"].to_numpy(zero_copy_only=False)
        out_ids, out_rm, out_tx = [], [], []
        counts = np.bincount(rows, minlength=doc_rows.num_rows) if len(rows) else np.zeros(doc_rows.num_rows, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
        for r in range(doc_rows.num_rows):
            did = int(dids[r])
            nt = int(counts[r])
            doc_toks = toks[starts[r] : starts[r] + nt]
            lo = np.searchsorted(fd, did, "left")
            hi = np.searchsorted(fd, did, "right")
            if lo == hi:
                keep_toks, removed = doc_toks, 0
            else:
                s_arr, e_arr = _spans_of_positions(fp[lo:hi], w)
                mask = np.ones(nt, dtype=bool)
                for s, e in zip(s_arr, e_arr):
                    mask[s - 1 : min(e - 1, nt)] = False
                removed = int((~mask).sum())
                keep_toks = [t for t, k in zip(doc_toks, mask) if k]
            out_ids.append(did)
            out_rm.append(removed)
            out_tx.append(" ".join(keep_toks))
        return pa.table(
            {
                "doc_id": pa.array(out_ids, type=pa.int64()),
                "n_removed": pa.array(out_rm, type=pa.int64()),
                "clean_text": pa.array(out_tx, type=pa.string()),
            }
        )

    return union.groupby("dkey").map_groups(
        lambda g: clean_partition(
            g.drop_columns(["dkey"]) if "dkey" in g.column_names else g
        ),
        batch_format="pyarrow",
    )
