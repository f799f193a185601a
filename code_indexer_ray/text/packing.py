"""Training-sequence packing — the shard-preparation step between curation
and the training loader.

The standard GPT-style packing rule (Radford et al. 2019; The Pile, Gao et
al. 2020): concatenate documents in a fixed order with one EOS token after
each, then cut the token stream into fixed-length training sequences.  A
document's placement is therefore pure arithmetic over the prefix sum of
token counts:

    start_i   = Σ_{j<i} (n_tokens_j + 1)          (the +1 is the EOS)
    bin_first = start_i // seq_len
    bin_last  = (start_i + n_tokens_i - 1) // seq_len   (empty docs: bin_first)

which is exactly a SQL window cumsum — so the operator has an EXACT DuckDB
twin despite being a "stateful" scan in spirit.

Distributed shape (no window functions in Ray Data, and a global
sort+carry is a serial chain): TWO-LEVEL PREFIX SUM —

  1. coarse bucket = doc_id // bucket_width; one small ``groupby(bucket)``
     aggregate yields per-bucket token totals (n_buckets ≈ corpus/width
     rows at the driver — thousands, not billions);
  2. the driver cumsums bucket totals into bucket OFFSETS (broadcast via
     ``ray.put``), and one ``groupby(bucket).map_groups`` computes each
     doc's intra-bucket prefix (vectorized cumsum over the doc_id-sorted
     group) plus its bucket offset.

Token counts use the engine's RE2 BPE-ish pre-tokenizer (text/tokencount.py)
so the twin's ``regexp_extract_all`` count is identical by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .tokencount import BPE_PATTERN

__all__ = ["pack_sequences", "sql_pack_sequences", "DEFAULT_SEQ_LEN"]

DEFAULT_SEQ_LEN = 2048
DEFAULT_BUCKET_WIDTH = 4096  # docs per prefix-sum bucket


def pack_sequences(
    ds,
    *,
    seq_len: int = DEFAULT_SEQ_LEN,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = DEFAULT_BUCKET_WIDTH,
):
    """(doc_id, n_tokens, start_tok, bin_first, bin_last) for every doc.

    ``bin_*`` are the fixed-length training sequences the doc's tokens land
    in after EOS-joined concatenation in doc_id order.
    """
    import ray
    import ray.data as rd  # noqa: F401 — documented dependency
    from ray.data.aggregate import Sum

    if seq_len <= 0:
        raise ValueError("seq_len must be positive")

    def stats(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64())
        n = pc.count_substring_regex(batch[text_col], pattern=BPE_PATTERN).cast(
            pa.int64()
        )
        bucket = pc.divide(ids, bucket_width)
        return pa.table({"doc_id": ids, "n_tokens": n, "bucket": bucket})

    counted = ds.map_batches(stats, batch_format="pyarrow").materialize()

    # pass 1: per-bucket totals (n_tokens + 1 EOS per doc) — driver-small
    totals = (
        counted.map_batches(
            lambda b: pa.table(
                {
                    "bucket": b["bucket"],
                    "w": pc.add(b["n_tokens"], 1).cast(pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .aggregate(Sum("w", alias_name="w"))
        .take_all()
    )
    totals.sort(key=lambda r: r["bucket"])
    offsets: dict[int, int] = {}
    acc = 0
    for r in totals:
        offsets[int(r["bucket"])] = acc
        acc += int(r["w"])
    off_ref = ray.put(offsets)

    def place(g: pa.Table) -> pa.Table:
        offs = ray.get(off_ref)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="mergesort")
        ids, n = ids[order], n[order]
        base = offs[int(g["bucket"][0].as_py())]
        w = n + 1
        start = base + np.concatenate(([0], np.cumsum(w)[:-1]))
        last = start + np.maximum(n - 1, 0)  # empty docs stay in bin_first
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "bin_first": pa.array(start // seq_len, pa.int64()),
                "bin_last": pa.array(last // seq_len, pa.int64()),
            }
        )

    return counted.groupby("bucket").map_groups(place, batch_format="pyarrow")


def sql_pack_sequences(
    seq_len: int = DEFAULT_SEQ_LEN,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Exact DuckDB twin: window cumsum over the same RE2 token counts."""
    bpe = BPE_PATTERN.replace("'", "''")
    return (
        f"WITH n AS (SELECT {id_col}::BIGINT AS doc_id,\n"
        f"    len(regexp_extract_all({text_col}, '{bpe}'))::BIGINT AS n_tokens\n"
        f"  FROM {table}),\n"
        "s AS (SELECT doc_id, n_tokens,\n"
        "    coalesce(sum(n_tokens + 1) OVER (ORDER BY doc_id\n"
        "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_tok\n"
        "  FROM n)\n"
        "SELECT doc_id, n_tokens, start_tok,\n"
        f"  (start_tok // {seq_len})::BIGINT AS bin_first,\n"
        f"  ((start_tok + greatest(n_tokens - 1, 0)) // {seq_len})::BIGINT AS bin_last\n"
        "FROM s"
    )
