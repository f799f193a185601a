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

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import encode_segment_table
from .codec import decode_doc_ids, decode_tfs
from .manifest import (
    DOCSTORE_DIR,
    IndexManifest,
    PartitionInfo,
    load_manifest,
    publish_manifest,
    write_partition_manifest,
)


def _explode_segment(tbl: pa.Table, drop_ids: np.ndarray) -> pa.Table:
    """Segment rows → raw (term, doc_id, tf, norm) postings, minus tombstones."""
    terms, docs, tfs, norms = [], [], [], []
    for i in range(tbl.num_rows):
        df = tbl["df"][i].as_py()
        d = decode_doc_ids(tbl["docs_enc"][i].as_py(), df)
        t = decode_tfs(tbl["tfs_enc"][i].as_py(), df)
        nm = np.frombuffer(tbl["norms"][i].as_py(), dtype=np.uint8)
        if len(drop_ids):
            keep = ~np.isin(d, drop_ids, assume_unique=False)
            d, t, nm = d[keep], t[keep], nm[keep]
        if len(d) == 0:
            continue
        terms.extend([tbl["term"][i].as_py()] * len(d))
        docs.append(d)
        tfs.append(t)
        norms.append(nm)
    if not docs:
        return pa.table(
            {
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int64()),
                "norm": pa.array([], pa.uint8()),
            }
        )
    return pa.table(
        {
            "term": pa.array(terms, type=pa.string()),
            "doc_id": pa.array(np.concatenate(docs)),
            "tf": pa.array(np.concatenate(tfs)),
            "norm": pa.array(np.concatenate(norms), type=pa.uint8()),
        }
    )


def merge_partition(
    base_file: str | None, delta_file: str | None, tombstones: np.ndarray, out_file: str
) -> dict:
    """Merge one (shard, bucket) partition; returns stats for the manifest."""
    parts = []
    if base_file and os.path.exists(base_file):
        parts.append(_explode_segment(pq.read_table(base_file), tombstones))
    if delta_file and os.path.exists(delta_file):
        parts.append(_explode_segment(pq.read_table(delta_file), np.empty(0, np.int64)))
    merged = pa.concat_tables([p for p in parts if p.num_rows]) if parts else None
    if merged is None or merged.num_rows == 0:
        return {"n_terms": 0, "n_postings": 0, "total_tokens": 0, "n_bytes": 0, "empty": True}
    seg, total_tokens = encode_segment_table(merged)
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + f".tmp-{os.getpid()}"
    pq.write_table(seg, tmp, compression="zstd", row_group_size=64 * 1024)
    os.replace(tmp, out_file)
    return {
        "n_terms": seg.num_rows,
        "n_postings": merged.num_rows,
        "total_tokens": total_tokens,
        "n_bytes": os.path.getsize(out_file),
        "empty": False,
    }


def merge_indexes(base_dir: str, delta_dir: str, out_dir: str) -> IndexManifest:
    """Merge a delta index into a base index (delete-then-add semantics).

    Layouts must match (same shards/buckets/doc space — enforced).  Runs one
    Ray task per partition; the doc store is merged with keep-latest-by-doc_id
    (delta wins).
    """
    import ray

    # In-place merge would rmtree the base/delta doc store before reading it —
    # unrecoverable. Refuse up front.
    out_real = os.path.realpath(out_dir)
    if out_real in (os.path.realpath(base_dir), os.path.realpath(delta_dir)):
        raise ValueError("out_dir must differ from base_dir and delta_dir (no in-place merge)")

    base = load_manifest(base_dir)
    delta = load_manifest(delta_dir)
    if (base.num_shards, base.num_buckets, base.doc_id_upper) != (
        delta.num_shards,
        delta.num_buckets,
        delta.doc_id_upper,
    ):
        raise ValueError(
            "base/delta layouts differ — build the delta with the base's "
            "num_shards/num_buckets/doc_id_upper so partitions align"
        )

    os.makedirs(out_dir, exist_ok=True)
    base_files = {(p["shard"], p["bucket"]): p["path"] for p in base.partitions}
    delta_files = {(p["shard"], p["bucket"]): p["path"] for p in delta.partitions}

    # tombstones = every doc present in the delta (delete-then-add per doc)
    delta_store = os.path.join(delta_dir, DOCSTORE_DIR)
    tomb = pq.read_table(
        [os.path.join(r, f) for r, _, fs in os.walk(delta_store) for f in fs if f.endswith(".parquet")],
        columns=["doc_id"],
    )["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    tomb = np.unique(tomb)

    @ray.remote
    def task(shard: int, bucket: int, bf: str | None, df_: str | None) -> dict:
        rel = os.path.join("segments", f"shard={shard:05d}", f"bucket={bucket:03d}.parquet")
        stats = merge_partition(
            os.path.join(base_dir, bf) if bf else None,
            os.path.join(delta_dir, df_) if df_ else None,
            tomb,
            os.path.join(out_dir, rel),
        )
        stats.update({"shard": shard, "bucket": bucket, "path": rel})
        return stats

    keys = sorted(set(base_files) | set(delta_files))
    results = ray.get(
        [task.remote(s, b, base_files.get((s, b)), delta_files.get((s, b))) for s, b in keys]
    )

    partitions = []
    total_tokens = 0
    for st in results:
        if st.get("empty"):
            continue
        info = PartitionInfo(
            shard=st["shard"],
            bucket=st["bucket"],
            n_terms=st["n_terms"],
            n_postings=st["n_postings"],
            total_tokens=st["total_tokens"],
            n_bytes=st["n_bytes"],
            path=st["path"],
            build_secs=0.0,
            fingerprint=f"merge:{base.metrics.get('fingerprint')}+{delta.metrics.get('fingerprint')}",
        )
        write_partition_manifest(out_dir, info)
        from dataclasses import asdict

        partitions.append(asdict(info))
        total_tokens += st["total_tokens"]

    # doc store: delta rows win, base rows for non-tombstoned docs
    out_store = os.path.join(out_dir, DOCSTORE_DIR)
    shutil.rmtree(out_store, ignore_errors=True)
    _merge_docstore(os.path.join(base_dir, DOCSTORE_DIR), delta_store, out_store, tomb)

    num_docs = _count_docstore(out_store)
    manifest = IndexManifest(
        num_docs=num_docs,
        total_tokens=total_tokens,
        num_shards=base.num_shards,
        num_buckets=base.num_buckets,
        doc_id_upper=max(base.doc_id_upper, delta.doc_id_upper),
        text_col=base.text_col,
        id_col=base.id_col,
        partitions=partitions,
        metrics={
            "fingerprint": f"merge:{base.metrics.get('fingerprint')}+{delta.metrics.get('fingerprint')}",
            "merged_from": [base_dir, delta_dir],
            "tombstones": int(len(tomb)),
        },
    )
    publish_manifest(out_dir, manifest)
    return manifest


def _iter_parquet(root: str):
    for r, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".parquet"):
                yield os.path.join(r, f)


def _merge_docstore(base_store: str, delta_store: str, out_store: str, tomb: np.ndarray) -> None:
    import pyarrow.compute as pc

    os.makedirs(out_store, exist_ok=True)
    i = 0
    for path in _iter_parquet(base_store):
        tbl = pq.read_table(path)
        if len(tomb):
            tbl = tbl.filter(
                pc.invert(pc.is_in(tbl["doc_id"], value_set=pa.array(tomb, type=pa.int64())))
            )
        if tbl.num_rows:
            rel = os.path.relpath(path, base_store)
            dst = os.path.join(out_store, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            pq.write_table(tbl, dst, row_group_size=64)
            i += 1
    for path in _iter_parquet(delta_store):
        tbl = pq.read_table(path)
        # keep the hive shard=N layout so per-shard metadata loads see delta docs
        rel = os.path.relpath(path, delta_store)
        d, base_name = os.path.split(rel)
        dst = os.path.join(out_store, d, "delta_" + base_name)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        pq.write_table(tbl, dst, row_group_size=64)
    with open(os.path.join(out_store, "_SUCCESS"), "w") as f:
        f.write("ok")


def _count_docstore(store: str) -> int:
    n = 0
    for path in _iter_parquet(store):
        n += pq.ParquetFile(path).metadata.num_rows
    return n
