"""Corpus ingestion: JSONL / CSV / Parquet → the doc-range-partitioned
Parquet layout every pipeline here consumes.

The reference ingests arbitrary on-disk files directly
(``indexing/file_finder.py:151-184`` walks + filters, the chunker reads raw
bytes); web corpora usually arrive as JSONL or CSV shards.  This module is
the Ray-native front door: one task per input file, two passes —

1. **count** — parallel metadata/row counts per file (driver holds one int
   per file);
2. **convert** — each file becomes ``part-{lo:012d}-{hi:012d}.parquet`` with
   ``doc_id`` either taken from an existing id column or assigned
   deterministically as ``file_offset + row_index`` (files processed in
   sorted-name order, so re-ingesting the same input yields byte-identical
   output).

The output directory is exactly the watch-driver / ``build_index`` input
shape: resumable (per-file outputs are atomic; finished files are skipped on
re-run), doc-range named, one file per input shard.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

FORMATS = ("jsonl", "csv", "parquet")


def _read_any(path: str, fmt: str) -> pa.Table:
    if fmt == "jsonl":
        from pyarrow import json as pj

        return pj.read_json(path)
    if fmt == "csv":
        from pyarrow import csv as pcsv

        return pcsv.read_csv(path)
    return pq.read_table(path)


def _infer_format(path: str) -> str:
    ext = path.rsplit(".", 1)[-1].lower()
    if ext in ("jsonl", "ndjson", "json"):
        return "jsonl"
    if ext == "csv":
        return "csv"
    if ext == "parquet":
        return "parquet"
    raise ValueError(f"cannot infer corpus format from {path!r}")


def _count_rows(path: str, fmt: str) -> int:
    if fmt == "parquet":
        return pq.ParquetFile(path).metadata.num_rows  # metadata only
    return _read_any(path, fmt).num_rows


def _convert_one(
    path: str, fmt: str, out_dir: str, offset: int, id_col: str | None
) -> tuple[int, int]:
    """Task body: one input file → one range-named parquet file. Returns the
    (lo, hi) doc-id range written."""
    import numpy as np

    tbl = _read_any(path, fmt)
    if id_col and id_col in tbl.schema.names:
        ids = tbl[id_col].cast(pa.int64())
        tbl = tbl.drop_columns([id_col])
    else:
        ids = pa.array(np.arange(offset, offset + tbl.num_rows), type=pa.int64())
    tbl = pa.table({"doc_id": ids, **{n: tbl[n] for n in tbl.schema.names}})
    tbl = tbl.sort_by("doc_id")
    lo = tbl["doc_id"][0].as_py() if tbl.num_rows else offset
    hi = tbl["doc_id"][-1].as_py() if tbl.num_rows else offset
    dst = os.path.join(out_dir, f"part-{lo:012d}-{hi:012d}.parquet")
    if not os.path.exists(dst):  # idempotent resume
        tmp = dst + f".tmp-{os.getpid()}"
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, dst)
    return lo, hi


def ingest_corpus(
    src_paths: list[str] | str,
    out_dir: str,
    *,
    format: str | None = None,
    id_col: str | None = "doc_id",
) -> dict:
    """Ingest JSONL/CSV/Parquet shards into the canonical corpus layout.

    ``id_col``: name of an existing integer id column to keep (ranges may
    then overlap across files — consumers handle that); ``None`` or a missing
    column assigns sequential ids by sorted-file order (deterministic).
    Returns ``{"files": n, "rows": total, "ranges": [[lo,hi], ...]}``.
    """
    import ray

    if isinstance(src_paths, str):
        root = src_paths
        src_paths = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if not f.startswith(".") and not f.endswith(".tmp")
        )
    src_paths = sorted(src_paths)
    fmts = [format or _infer_format(p) for p in src_paths]
    for f in fmts:
        if f not in FORMATS:
            raise ValueError(f"unsupported format {f!r}")

    count = ray.remote(num_cpus=1)(_count_rows)
    counts = ray.get([count.remote(p, f) for p, f in zip(src_paths, fmts)])
    offsets = [0] * len(counts)
    for i in range(1, len(counts)):
        offsets[i] = offsets[i - 1] + counts[i - 1]

    os.makedirs(out_dir, exist_ok=True)
    convert = ray.remote(num_cpus=1)(_convert_one)
    ranges = ray.get(
        [
            convert.remote(p, f, out_dir, off, id_col)
            for p, f, off in zip(src_paths, fmts, offsets)
        ]
    )
    return {
        "files": len(src_paths),
        "rows": int(sum(counts)),
        "ranges": [[int(lo), int(hi)] for lo, hi in ranges],
    }
