"""Exact deduplication: content-hash partition + per-group first.

Pattern: vectorized md5 content hash in ``map_batches`` (cheap, stateless),
then ``groupby(hash).map_groups(min doc_id)`` — the hash partition bounds
every group to the duplicate-set size.  md5 is used so the DuckDB oracle
(``md5(text)``) is bit-identical.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa


def add_content_hash(batch: pa.Table, *, text_col: str = "text", out_col: str = "content_hash") -> pa.Table:
    texts = batch[text_col].to_pylist()
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() if t is not None else None for t in texts]
    return batch.append_column(out_col, pa.array(hashes, type=pa.string()))


def dedup_exact(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id representative per distinct content hash."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col=text_col), batch_format="pyarrow"
    )

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1)

    return hashed.groupby("content_hash").map_groups(first, batch_format="pandas")
