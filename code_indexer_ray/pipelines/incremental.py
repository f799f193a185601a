"""Incremental index maintenance — the batch analog of the reference's watch
mode (SURVEY.md §2.10): instead of per-file watchdog events with a shared
writer, changed pages arrive as a delta Parquet table and flow through

    keep-latest dedup (url/doc_id, warc_ts)      [J1/D1]
      → delta index build (base layout pinned)   [same one-shuffle pipeline]
      → merge_indexes (delete-then-add)          [T4/J2]

giving the reference's exact guarantee — per-document atomic replace,
commit-order-agnostic, eventually consistent (``tantivy_index_manager.py:25-33``)
— with per-partition resumability instead of a writer lock.
"""

from __future__ import annotations

import os

from ..index.build import build_index
from ..index.manifest import IndexManifest, load_manifest
from ..index.merge import merge_indexes
from .ops import keep_latest


def apply_delta(
    base_dir: str,
    delta_input,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    ts_col: str | None = None,
    store_cols: tuple[str, ...] = ("lang", "url"),
    work_dir: str | None = None,
    tombstone_ranges: list[tuple[int, int]] | None = None,
) -> IndexManifest:
    """Apply a table of changed/new documents to an existing index.

    ``delta_input``: parquet path(s) or a Dataset of rows in the corpus
    schema; if ``ts_col`` is given, multiple versions of the same document are
    reduced keep-latest first.  Returns the merged manifest at ``out_dir``.

    Delta doc_ids must fit the base's reserved id space
    (``<= base.doc_id_upper``): at scale the initial build allocates id
    headroom so doc-range shard boundaries stay fixed across increments.
    """
    import ray.data as rd

    base = load_manifest(base_dir)
    work = work_dir or (out_dir.rstrip("/") + "_work")
    delta_src = os.path.join(work, "delta_src")
    os.makedirs(work, exist_ok=True)

    ds = delta_input if hasattr(delta_input, "map_batches") else rd.read_parquet(delta_input)
    if ts_col is not None:
        ds = keep_latest(ds, [id_col], ts_col)
    ds.write_parquet(delta_src)
    # an all-empty delta writes no files at all — materialize the schema so the
    # downstream build still runs (pure-delete watch ticks)
    os.makedirs(delta_src, exist_ok=True)
    if not any(f.endswith(".parquet") for f in os.listdir(delta_src)):
        import pyarrow.dataset as pads
        import pyarrow.parquet as pq

        if hasattr(delta_input, "map_batches"):
            schema = delta_input.schema().base_schema
        else:  # path(s): take the real parquet schema (a 0-row Ray read
            # reports only internal fragment columns)
            schema = pads.dataset(delta_input).schema
        pq.write_table(schema.empty_table(), os.path.join(delta_src, "empty.parquet"))

    delta_idx = os.path.join(work, "delta_idx")
    build_index(
        delta_src,
        delta_idx,
        id_col=id_col,
        text_col=base.text_col,
        store_cols=store_cols,
        num_shards=base.num_shards,
        num_buckets=base.num_buckets,
        doc_id_upper=base.doc_id_upper,
        index_positions=bool(base.metrics.get("index_positions")),
        resume=False,
        # a multi-field base needs the delta indexed under the same field
        # schema or merged dictionaries would mix prefixed and plain keys
        fields=(
            {f: d["col"] for f, d in base.fields.items()} if base.fields else None
        ),
    )
    return merge_indexes(base_dir, delta_idx, out_dir, tombstone_ranges=tombstone_ranges)
