"""Doc-store compaction: coalesce the per-(map-batch, shard) point-read files
into a bounded number of larger files per shard.

Why: the fused build (``build.py``) writes one doc-store file per
(map task, shard) so the corpus is read exactly once and every write is
atomic/idempotent under retries.  That is the right *build-time* shape, but at
cluster scale (10^6 map tasks x many shards) it is a small-file explosion —
the reference hits the same problem and solves it with segment merging
(``tantivy_index_manager.py`` delegates to Tantivy's background merge); this
module is the doc-store half of that story (the postings half is
``merge.py``).

Design (scale-first):

- **Bounded memory per task.**  Files are grouped into *clusters* of
  overlapping doc-id ranges (the filename carries ``part-{lo}-{hi}``; build
  batches are contiguous id ranges so clusters are usually single files),
  then clusters are packed into groups of ~``target_bytes``.  One Ray task
  rewrites one group — it never holds more than ~``target_bytes`` of one
  shard, regardless of corpus size.
- **Point reads unchanged.**  The searcher's point-read index
  (``engine.py::_docstore_index``) is built from per-row-group parquet
  *statistics*, not filenames, so compacted files drop straight in.  Row
  groups grow from 64 rows (build-time scratch granularity) to
  ``row_group_size`` (default 1024) — fewer files and far less metadata to
  scan, at the cost of decoding ~1k rows per point lookup (still sub-ms).
- **Atomic + crash-recoverable swap.**  The compacted store is staged next to
  the live one and swapped with two renames; a crash between the renames is
  detected on the next ``compact_docstore`` call (or by ``recover_docstore``)
  and rolled forward.
"""

from __future__ import annotations

import os
import re
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import DOCSTORE_DIR

_STAGE_SUFFIX = ".compact-stage"
_OLD_SUFFIX = ".pre-compact"

_RANGE_RE = re.compile(r"part-(\d+)-(\d+)\.parquet$")


def _file_ranges(shard_dir: str) -> list[tuple[int, int, str, int]]:
    """(lo_id, hi_id, path, n_bytes) for every doc-store file in a shard dir.

    Ranges come from the ``part-{lo}-{hi}`` filename when present (free), else
    from a metadata-only parquet stat read (merge outputs keep the pattern
    under a ``delta_`` prefix, so this path is rare)."""
    out = []
    for name in sorted(os.listdir(shard_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(shard_dir, name)
        m = _RANGE_RE.search(name)
        if m:
            lo, hi = int(m.group(1)), int(m.group(2))
        else:
            md = pq.ParquetFile(path).metadata
            idx = md.schema.to_arrow_schema().get_field_index("doc_id")
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                los.append(int(st.min))
                his.append(int(st.max))
            if not los:
                continue
            lo, hi = min(los), max(his)
        out.append((lo, hi, path, os.path.getsize(path)))
    out.sort()
    return out


def plan_groups(
    ranges: list[tuple[int, int, str, int]], target_bytes: int
) -> list[list[str]]:
    """Pack doc-id-sorted files into rewrite groups of ~``target_bytes``.

    Overlapping id ranges are first merged into clusters (a cluster must stay
    in one group so each output file covers a disjoint id range and a point
    read touches at most one group's files)."""
    clusters: list[tuple[int, int, list[str], int]] = []
    for lo, hi, path, nbytes in ranges:
        if clusters and lo <= clusters[-1][1]:
            clo, chi, paths, b = clusters[-1]
            clusters[-1] = (clo, max(chi, hi), paths + [path], b + nbytes)
        else:
            clusters.append((lo, hi, [path], nbytes))
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for _, _, paths, nbytes in clusters:
        if cur and cur_bytes + nbytes > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.extend(paths)
        cur_bytes += nbytes
    if cur:
        groups.append(cur)
    return groups


def _rewrite_group(
    paths: list[str], out_dir: str, row_group_size: int, sort_col: str = "doc_id"
) -> tuple[int, str]:
    """One Ray task body: read a group's files, sort by ``sort_col``, write
    ONE compacted file named for its id range.  Returns (rows, dest path)."""
    tbl = pa.concat_tables([pq.read_table(p) for p in paths])
    if tbl.num_rows == 0:
        return 0, ""
    tbl = tbl.sort_by(sort_col)
    lo = tbl[sort_col][0].as_py()
    hi = tbl[sort_col][-1].as_py()
    os.makedirs(out_dir, exist_ok=True)
    dst = os.path.join(out_dir, f"part-{lo:012d}-{hi:012d}.parquet")
    tmp = dst + f".tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd", row_group_size=row_group_size)
    os.replace(tmp, dst)
    return tbl.num_rows, dst


def coalesce_partition_dirs(
    root: str,
    *,
    sort_col: str,
    target_bytes: int = 256 * 1024 * 1024,
    row_group_size: int = 4096,
) -> int:
    """Coalesce every immediate child partition dir of ``root`` (hive
    ``key=value`` layout, e.g. a vector store's ``cell=K`` dirs) in place:
    one Ray task per ~``target_bytes`` of one partition, output files sorted
    by ``sort_col`` and named ``part-{lo}-{hi}``.  In-place per-partition
    (files are replaced only after their compacted successor is on disk);
    used at the tail of a partitioned *build* where the store is not yet
    published, so mid-run crash recovery is the builder's (the build re-runs).
    Returns the resulting file count."""
    import ray

    rewrite = ray.remote(num_cpus=1)(_rewrite_group)
    jobs: list[tuple[object, list[str]]] = []
    for name in sorted(os.listdir(root)):
        pdir = os.path.join(root, name)
        if not os.path.isdir(pdir):
            continue
        # pack files into ~target_bytes groups in name order (no range
        # structure assumed — output files may overlap in sort_col, which the
        # consumers here (full-partition scans) don't care about)
        group: list[str] = []
        group_bytes = 0
        groups: list[list[str]] = []
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(pdir, f)
            nbytes = os.path.getsize(p)
            if group and group_bytes + nbytes > target_bytes:
                groups.append(group)
                group, group_bytes = [], 0
            group.append(p)
            group_bytes += nbytes
        if group:
            groups.append(group)
        for g in groups:
            if len(g) == 1 and _RANGE_RE.search(os.path.basename(g[0])):
                continue  # already coalesced — idempotent re-run
            jobs.append((rewrite.remote(g, pdir, row_group_size, sort_col), g))
    for ref, g in jobs:
        _, dst = ray.get(ref)
        for p in g:
            if p != dst:  # os.replace may have overwritten a same-named input
                os.remove(p)
    return sum(
        1 for _, _, fs in os.walk(root) for f in fs if f.endswith(".parquet")
    )


def recover_docstore(index_dir: str) -> bool:
    """Roll forward a compaction interrupted between the two swap renames.

    Returns True if a recovery was performed."""
    live = os.path.join(index_dir, DOCSTORE_DIR)
    stage = live + _STAGE_SUFFIX
    old = live + _OLD_SUFFIX
    if not os.path.isdir(live) and os.path.isdir(stage):
        # crashed after moving live -> old, before stage -> live
        os.rename(stage, live)
        shutil.rmtree(old, ignore_errors=True)
        return True
    return False


def compact_docstore(
    index_dir: str,
    *,
    target_bytes: int = 256 * 1024 * 1024,
    row_group_size: int = 1024,
) -> dict:
    """Compact ``index_dir``'s doc store in place (atomic swap).

    One Ray task per ~``target_bytes`` rewrite group; shards compact
    independently and in parallel.  Idempotent: re-running on a compacted
    store is a near-no-op (each shard is already one cluster per group).
    Returns ``{"files_before": n, "files_after": m, "rows": r}``."""
    import ray

    recover_docstore(index_dir)
    live = os.path.join(index_dir, DOCSTORE_DIR)
    stage = live + _STAGE_SUFFIX
    old = live + _OLD_SUFFIX
    shutil.rmtree(stage, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)

    rewrite = ray.remote(num_cpus=1)(_rewrite_group)
    refs = []
    files_before = 0
    for shard_name in sorted(os.listdir(live)):
        shard_dir = os.path.join(live, shard_name)
        if not os.path.isdir(shard_dir):
            continue
        ranges = _file_ranges(shard_dir)
        files_before += len(ranges)
        out_shard = os.path.join(stage, shard_name)
        for group in plan_groups(ranges, target_bytes):
            refs.append(rewrite.remote(group, out_shard, row_group_size))
    rows = sum(r for r, _ in ray.get(refs))

    # two-rename swap; recover_docstore rolls forward a crash in between
    os.rename(live, old)
    os.rename(stage, live)
    shutil.rmtree(old, ignore_errors=True)

    files_after = sum(
        1
        for r, _, fs in os.walk(live)
        for f in fs
        if f.endswith(".parquet")
    )
    return {"files_before": files_before, "files_after": files_after, "rows": rows}
