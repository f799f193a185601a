"""Segment merge — incremental index maintenance (T4/J2/D1 in SURVEY.md §2).

The reference's incremental path is delete-then-add per document plus
Tantivy's background segment merging (``tantivy_index_manager.py:955-1035``,
``:1037-1136``).  Ray-native equivalent:

- a *delta* index is built over changed/new documents with the SAME
  (num_shards, num_buckets, doc_id space) layout as the base;
- ``merge_indexes`` k-way merges base and delta per (shard, bucket)
  partition: delta doc_ids act as tombstones on the base (delete-then-add),
  posting lists are merged doc-sorted and re-encoded — producing segments
  byte-identical to a from-scratch rebuild of the updated corpus (asserted in
  tests), so merged indexes keep the determinism invariant;
- each merged partition is written atomically with its manifest → the merge
  itself is resumable, and partitions untouched by the delta are hard-linked/
  copied through without decode.

Merging runs as a Ray task fan-out (one task per partition) — no shuffle at
all, since both sides are already partitioned identically.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import encode_segment_table
from .codec import varbyte_decode
from .manifest import (
    DOCSTORE_DIR,
    IndexManifest,
    PartitionInfo,
    load_manifest,
    publish_manifest,
    write_partition_manifest,
)


def _empty_postings(with_positions: bool) -> pa.Table:
    cols = {
        "term": pa.array([], pa.string()),
        "doc_id": pa.array([], pa.int64()),
        "tf": pa.array([], pa.int64()),
        "norm": pa.array([], pa.uint8()),
    }
    if with_positions:
        cols["pos_enc"] = pa.array([], pa.large_binary())
    return pa.table(cols)


def _binary_flat(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Concatenated payload bytes of a (large_)binary column, zero-copy.

    Segment binary columns are written contiguously (one buffer + offsets,
    ``build._binary_col``), so the data buffer slice between the first and
    last offset IS the term-order concatenation of all per-term encodings."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off_dtype = np.int64 if pa.types.is_large_binary(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=off_dtype)[a.offset : a.offset + len(a) + 1]
    data = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]]


def _tombstone_mask(
    docs: np.ndarray, drop_ids: np.ndarray, drop_ranges: np.ndarray | None
) -> np.ndarray | None:
    """Boolean mask of docs to DROP: explicit ids ∪ [lo, hi] ranges (ranges
    cover whole-file deletions without enumerating ids)."""
    mask = None
    if len(drop_ids):
        mask = np.isin(docs, drop_ids, assume_unique=False)
    if drop_ranges is not None and len(drop_ranges):
        r = np.asarray(drop_ranges, dtype=np.int64).reshape(-1, 2)
        in_range = np.zeros(len(docs), dtype=bool)
        for lo, hi in r:
            in_range |= (docs >= lo) & (docs <= hi)
        mask = in_range if mask is None else (mask | in_range)
    return mask


def _explode_segment(
    tbl: pa.Table, drop_ids: np.ndarray, drop_ranges: np.ndarray | None = None
) -> pa.Table:
    """Segment rows → raw (term, doc_id, tf, norm) postings, minus tombstones.

    Fully vectorized: ONE varbyte decode over the whole partition's
    concatenated doc/tf streams, group-wise cumsum to reconstruct absolute
    doc ids (the delta stream anchors at each term start), dictionary-coded
    term column (no per-posting string materialization)."""
    has_pos = "positions_enc" in tbl.schema.names
    n_terms = tbl.num_rows
    if n_terms == 0:
        return _empty_postings(has_pos)
    dfs = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(dfs.sum())
    deltas = varbyte_decode(_binary_flat(tbl["docs_enc"]), total)
    tfs = varbyte_decode(_binary_flat(tbl["tfs_enc"]), total).astype(np.int64)
    norms = _binary_flat(tbl["norms"])
    if len(norms) != total:
        raise ValueError("corrupt segment: norms length != sum(df)")

    term_starts = np.concatenate(([0], np.cumsum(dfs)[:-1]))
    flat = np.cumsum(deltas.astype(np.int64))
    prev = np.concatenate(([0], flat[term_starts[1:] - 1])) if n_terms > 1 else np.zeros(1, np.int64)
    docs = flat - np.repeat(prev, dfs)
    codes = np.repeat(np.arange(n_terms, dtype=np.int32), dfs)

    pos_col = None
    if has_pos:
        # slice each term's position blob back into per-posting blobs: the
        # per-posting u32 offsets are term-relative, and postings are stored
        # contiguously, so posting i's blob ends where posting i+1's begins
        pcol = tbl["positions_enc"].combine_chunks()
        off_dtype = np.int64 if pa.types.is_large_binary(pcol.type) else np.int32
        term_offs = np.frombuffer(pcol.buffers()[1], dtype=off_dtype)[
            pcol.offset : pcol.offset + n_terms + 1
        ].astype(np.int64)
        pos_data = np.frombuffer(pcol.buffers()[2], dtype=np.uint8)[
            term_offs[0] : term_offs[-1]
        ]
        term_offs = term_offs - term_offs[0]
        rel = _binary_flat(tbl["pos_offsets"]).view(np.uint32).astype(np.int64)
        abs_start = np.repeat(term_offs[:-1], dfs) + rel
        post_offs = np.concatenate((abs_start, [term_offs[-1]]))
        from .build import _binary_col

        pos_col = _binary_col(np.ascontiguousarray(pos_data), post_offs)

    drop = _tombstone_mask(docs, drop_ids, drop_ranges)
    if drop is not None:
        keep = ~drop
        docs, tfs, norms, codes = docs[keep], tfs[keep], norms[keep], codes[keep]
        if pos_col is not None:
            pos_col = pos_col.filter(pa.array(keep))
    if len(docs) == 0:
        return _empty_postings(has_pos)
    term_col = pa.DictionaryArray.from_arrays(
        pa.array(codes, type=pa.int32()), tbl["term"].combine_chunks()
    )
    cols = {
        "term": term_col,
        "doc_id": pa.array(docs),
        "tf": pa.array(tfs),
        "norm": pa.array(np.ascontiguousarray(norms), type=pa.uint8()),
    }
    if pos_col is not None:
        cols["pos_enc"] = pos_col
    return pa.table(cols)


def merge_partition(
    base_file: str | None,
    delta_file: str | None,
    tombstones: np.ndarray,
    out_file: str,
    tombstone_ranges: np.ndarray | None = None,
    field_names: tuple[str, ...] | None = None,
) -> dict:
    """Merge one (shard, bucket) partition; returns stats for the manifest
    (including per-field token sums when ``field_names`` is given — computed
    from the in-memory merged segment, no re-read)."""
    parts = []
    if base_file and os.path.exists(base_file):
        parts.append(_explode_segment(pq.read_table(base_file), tombstones, tombstone_ranges))
    if delta_file and os.path.exists(delta_file):
        parts.append(_explode_segment(pq.read_table(delta_file), np.empty(0, np.int64)))
    if len(parts) == 2 and ("pos_enc" in parts[0].schema.names) != ("pos_enc" in parts[1].schema.names):
        raise ValueError(
            "positions mismatch: base and delta must both be built with the "
            "same index_positions setting"
        )
    merged = pa.concat_tables([p for p in parts if p.num_rows]) if parts else None
    if merged is None or merged.num_rows == 0:
        return {"n_terms": 0, "n_postings": 0, "total_tokens": 0, "n_bytes": 0, "empty": True}
    seg, total_tokens = encode_segment_table(merged)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + f".tmp-{os.getpid()}"
    pq.write_table(seg, tmp, compression="zstd", row_group_size=64 * 1024)
    os.replace(tmp, out_file)
    out = {
        "n_terms": seg.num_rows,
        "n_postings": merged.num_rows,
        "total_tokens": total_tokens,
        "n_bytes": os.path.getsize(out_file),
        "empty": False,
    }
    if field_names:
        from .build import _field_token_sums

        out["field_tokens"] = _field_token_sums(seg, field_names)
    return out


def merge_indexes(
    base_dir: str,
    delta_dir: str | None,
    out_dir: str,
    *,
    tombstone_ranges: list[tuple[int, int]] | None = None,
) -> IndexManifest:
    """Merge a delta index into a base index (delete-then-add semantics).

    Layouts must match (same shards/buckets/doc space — enforced).  Runs one
    Ray task per partition; the doc store is merged with keep-latest-by-doc_id
    (delta wins).  ``tombstone_ranges``: additional [lo, hi] doc-id ranges to
    delete outright (whole-file deletions from the watch driver — input files
    are doc-range partitioned, so a removed file is a removed range).
    """
    import ray

    # In-place merge would rmtree the base/delta doc store before reading it —
    # unrecoverable. Refuse up front.
    out_real = os.path.realpath(out_dir)
    guarded = [base_dir] + ([delta_dir] if delta_dir else [])
    if out_real in (os.path.realpath(d) for d in guarded):
        raise ValueError("out_dir must differ from base_dir and delta_dir (no in-place merge)")

    base = load_manifest(base_dir)
    delta = load_manifest(delta_dir) if delta_dir else None
    if delta is not None and (base.num_shards, base.num_buckets, base.doc_id_upper) != (
        delta.num_shards,
        delta.num_buckets,
        delta.doc_id_upper,
    ):
        raise ValueError(
            "base/delta layouts differ — build the delta with the base's "
            "num_shards/num_buckets/doc_id_upper so partitions align"
        )

    base_fields = base.fields
    delta_fields = delta.fields if delta is not None else base_fields
    if delta is not None and (base_fields or {}).keys() != (delta_fields or {}).keys():
        raise ValueError(
            "base/delta field schemas differ — build the delta with the base's fields="
        )
    field_names = tuple(base_fields) if base_fields else None

    os.makedirs(out_dir, exist_ok=True)
    base_files = {(p["shard"], p["bucket"]): p["path"] for p in base.iter_partitions(base_dir)}
    delta_files = (
        {(p["shard"], p["bucket"]): p["path"] for p in delta.iter_partitions(delta_dir)}
        if delta
        else {}
    )

    # tombstones = every doc present in the delta (delete-then-add per doc);
    # delta_dir=None → tombstone-only merge (pure deletions)
    if delta_dir:
        delta_store = os.path.join(delta_dir, DOCSTORE_DIR)
        tomb = pq.read_table(
            [os.path.join(r, f) for r, _, fs in os.walk(delta_store) for f in fs if f.endswith(".parquet")],
            columns=["doc_id"],
        )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tomb = np.unique(tomb)
    else:
        delta_store = None
        tomb = np.empty(0, dtype=np.int64)
    tomb_ranges = (
        np.asarray(tombstone_ranges, dtype=np.int64).reshape(-1, 2)
        if tombstone_ranges
        else None
    )

    @ray.remote
    def task(shard: int, bucket: int, bf: str | None, df_: str | None) -> dict:
        rel = os.path.join("segments", f"shard={shard:05d}", f"bucket={bucket:03d}.parquet")
        stats = merge_partition(
            os.path.join(base_dir, bf) if bf else None,
            os.path.join(delta_dir, df_) if df_ else None,
            tomb,
            os.path.join(out_dir, rel),
            tomb_ranges,
            field_names,
        )
        stats.update({"shard": shard, "bucket": bucket, "path": rel})
        return stats

    keys = sorted(set(base_files) | set(delta_files))
    results = ray.get(
        [task.remote(s, b, base_files.get((s, b)), delta_files.get((s, b))) for s, b in keys]
    )

    merge_fp = (
        f"merge:{base.metrics.get('fingerprint')}"
        f"+{delta.metrics.get('fingerprint') if delta else 'tombstones'}"
    )
    partitions = []
    total_tokens = 0
    field_totals: dict[str, int] = dict.fromkeys(field_names or (), 0)
    for st in results:
        if st.get("empty"):
            continue
        for f_, n_ in (st.get("field_tokens") or {}).items():
            field_totals[f_] = field_totals.get(f_, 0) + int(n_)
        info = PartitionInfo(
            shard=st["shard"],
            bucket=st["bucket"],
            n_terms=st["n_terms"],
            n_postings=st["n_postings"],
            total_tokens=st["total_tokens"],
            n_bytes=st["n_bytes"],
            path=st["path"],
            build_secs=0.0,
            fingerprint=merge_fp,
            field_tokens=st.get("field_tokens") or {},
        )
        write_partition_manifest(out_dir, info)
        from dataclasses import asdict

        partitions.append(asdict(info))
        total_tokens += st["total_tokens"]

    # doc store: delta rows win, base rows for non-tombstoned docs
    out_store = os.path.join(out_dir, DOCSTORE_DIR)
    shutil.rmtree(out_store, ignore_errors=True)
    _merge_docstore(os.path.join(base_dir, DOCSTORE_DIR), delta_store, out_store, tomb, tomb_ranges)

    num_docs = _count_docstore(out_store)
    manifest = IndexManifest(
        num_docs=num_docs,
        total_tokens=total_tokens,
        num_shards=base.num_shards,
        num_buckets=base.num_buckets,
        doc_id_upper=max(base.doc_id_upper, delta.doc_id_upper) if delta else base.doc_id_upper,
        text_col=base.text_col,
        id_col=base.id_col,
        partitions=partitions,
        metrics={
            "fingerprint": merge_fp,
            "merged_from": [base_dir, delta_dir] if delta_dir else [base_dir],
            "tombstones": int(len(tomb)),
            "tombstone_ranges": [[int(lo), int(hi)] for lo, hi in (tombstone_ranges or [])],
            # build-lineage properties the merged index must keep: positions
            # (or the NEXT delta builds positionless and partition decode
            # raises a payload mismatch) and the FULL build's timestamp (the
            # periodic-reindex age rule measures merge debt since the last
            # full build — resetting it per merge would silence the rule on
            # actively synced indexes)
            "index_positions": bool(base.metrics.get("index_positions")),
            "built_unix": float(base.metrics.get("built_unix") or time.time()),
            # content-freshness stamp (distinct from the age rule above):
            # the validation engine's staleness check compares file mtimes
            # against the LAST content update, which a merge is
            "updated_unix": time.time(),
            **(
                {
                    "fields": {
                        f_: {
                            "col": base_fields[f_]["col"],
                            "total_tokens": field_totals.get(f_, 0),
                        }
                        for f_ in base_fields
                    }
                }
                if base_fields
                else {}
            ),
        },
    )
    publish_manifest(out_dir, manifest)
    return manifest


def _iter_parquet(root: str):
    for r, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                yield os.path.join(r, f)


def _merge_docstore_file(
    path: str,
    store_root: str,
    out_store: str,
    tomb: np.ndarray,
    is_delta: bool,
    tomb_ranges: np.ndarray | None = None,
) -> None:
    """Merge ONE doc-store file (a Ray task body — the merge fans out per file
    instead of rewriting the whole store serially on the driver)."""
    tbl = pq.read_table(path)
    rel = os.path.relpath(path, store_root)
    if is_delta:
        # keep the hive shard=N layout so per-shard metadata loads see delta docs
        d, base_name = os.path.split(rel)
        dst = os.path.join(out_store, d, "delta_" + base_name)
    else:
        docs = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        drop = _tombstone_mask(docs, tomb, tomb_ranges)
        if drop is not None and drop.any():
            tbl = tbl.filter(pa.array(~drop))
        if tbl.num_rows == 0:
            return
        dst = os.path.join(out_store, rel)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    tmp = dst + f".tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, row_group_size=64)
    os.replace(tmp, dst)


def _merge_docstore(
    base_store: str,
    delta_store: str | None,
    out_store: str,
    tomb: np.ndarray,
    tomb_ranges: np.ndarray | None = None,
) -> None:
    import ray

    os.makedirs(out_store, exist_ok=True)
    tomb_ref = ray.put(tomb)

    @ray.remote
    def task(path: str, root: str, is_delta: bool, tref) -> None:
        _merge_docstore_file(path, root, out_store, tref, is_delta, tomb_ranges)

    refs = [task.remote(p, base_store, False, tomb_ref) for p in _iter_parquet(base_store)]
    if delta_store:
        refs += [task.remote(p, delta_store, True, tomb_ref) for p in _iter_parquet(delta_store)]
    ray.get(refs)
    with open(os.path.join(out_store, "_SUCCESS"), "w") as f:
        f.write("ok")


def _count_docstore(store: str) -> int:
    n = 0
    for path in _iter_parquet(store):
        n += pq.ParquetFile(path).metadata.num_rows
    return n
