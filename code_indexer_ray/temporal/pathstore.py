"""Path-routed change-history store — point reads for file_at / evolution.

The reference answers "history of this file" from its temporal metadata
sidecar (``storage/temporal_metadata_store.py`` keys vectors by
``commit:path:chunk`` point ids; ``server/query/semantic_query_manager.py``
attaches an ``evolution`` timeline per hit).  Here the same role is a
hash-partitioned parquet store derived from the bucketized change table in
the data plane (exactly the ``scip/store.py`` layout contract):

- ``part = fnv64(path) % num_parts`` routes a path to ONE part file;
- parts are sorted ``(path, commit_ts, change_id)`` @ small row groups, so
  a path's rows are CONTIGUOUS and a point read touches only the covering
  row groups (parquet column statistics);
- rows carry the change METADATA plus the owning time-bucket (``tbucket``)
  — text stays in the bucket doc stores (single source of truth), fetched
  per-winner via the searcher's bounded row-group point reads.

Without the store, ``TemporalSearcher.file_at`` falls back to a filtered
dataset scan (predicate over every fragment of the changes table — fine at
test scale, a corpus scan at 100 TB).  With it, ``file_at`` and the
``show_evolution`` timeline are O(row groups covering one path).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..scip.store import fnv64

PATHSTORE_DIR = "pathstore"
MANIFEST = "pathstore.json"


def _count_changes(part_dir: str) -> int:
    """Row count of the partitioned changes table from parquet METADATA
    (footer reads only — never the data pages)."""
    import pyarrow.dataset as pads

    dset = pads.dataset(part_dir, partitioning="hive")
    return sum(f.metadata.num_rows for f in dset.get_fragments())


def invalidate_path_store(temporal_root: str) -> dict | None:
    """Remove the sidecar (e.g. after an append changed the history) —
    readers fall back to the filtered scan until the next build.  Returns
    the removed store's manifest (so a rebuild keeps its parameters), or
    ``None`` if no store existed."""
    import shutil

    out_dir = os.path.join(temporal_root, PATHSTORE_DIR)
    man = None
    try:
        with open(os.path.join(out_dir, MANIFEST)) as f:
            man = json.load(f)
    except (OSError, ValueError):
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    return man
#: metadata columns each history row keeps (change id rides as ``change_id``)
HISTORY_COLS = ("path", "commit_ts", "change_id", "diff_type", "commit_day", "author", "tbucket")


def build_path_store(
    temporal_root: str,
    *,
    num_parts: int = 16,
    row_group_size: int = 2048,
) -> dict:
    """Derive the path-history store from ``temporal_root``'s partitioned
    ``changes`` table (one streaming pass + one hash-keyed groupby — the
    driver holds only per-part stat rows).  Idempotent: a complete store
    for the same ``num_parts`` is a no-op."""
    import shutil

    import ray.data as rd

    from ..index.build import _hash64_batch

    out_dir = os.path.join(temporal_root, PATHSTORE_DIR)
    part_dir = os.path.join(temporal_root, "changes")
    n_changes = _count_changes(part_dir)
    mpath = os.path.join(out_dir, MANIFEST)
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                man = json.load(f)
            # the row count is the staleness fingerprint: an append grows
            # the changes table, so a stale sidecar can never no-op here
            if man.get("num_parts") == num_parts and man.get("total_rows") == n_changes:
                return man
        except (OSError, ValueError):
            pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def route(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "path": batch["path"],
                "commit_ts": batch["commit_ts"],
                "change_id": batch["doc_id"],  # bucketized tables rename
                "diff_type": batch["diff_type"],
                "commit_day": batch["commit_day"],
                "author": batch["author"],
                # hive partition values read back as strings
                "tbucket": batch["tbucket"].cast(pa.string()).cast(pa.int64()),
            }
        )
        p = t["path"].combine_chunks() if isinstance(t["path"], pa.ChunkedArray) else t["path"]
        enc = p.dictionary_encode()
        hp = (_hash64_batch(enc.dictionary) % np.uint64(num_parts)).astype(np.int64)
        part = hp[enc.indices.to_numpy(zero_copy_only=False)] if len(t) else hp[:0]
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g["part"][0].as_py())
        t = g.sort_by(
            [("path", "ascending"), ("commit_ts", "ascending"), ("change_id", "ascending")]
        ).drop_columns(["part"])
        pq.write_table(
            t, os.path.join(out_dir, f"part-{p:05d}.parquet"), row_group_size=row_group_size
        )
        return pa.table(
            {"part": pa.array([p], type=pa.int64()), "rows": pa.array([len(t)], type=pa.int64())}
        )

    stats = (
        rd.read_parquet(
            part_dir,
            columns=["path", "commit_ts", "doc_id", "diff_type", "commit_day", "author", "tbucket"],
        )
        .map_batches(route, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    man = {
        "num_parts": num_parts,
        "parts": sorted(
            [{"part": int(r["part"]), "rows": int(r["rows"])} for r in stats],
            key=lambda r: r["part"],
        ),
        "total_rows": int(sum(r["rows"] for r in stats)),
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mpath)  # manifest lands LAST: its presence == publish
    return man


class PathHistoryReader:
    """Point-lookup reader over a built store (one part file per path,
    row groups pruned by the sorted ``path`` column's statistics)."""

    def __init__(self, root: str):
        self.root = os.path.join(root, PATHSTORE_DIR)
        with open(os.path.join(self.root, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.num_parts = int(self.manifest["num_parts"])
        self._parts: dict[str, tuple] = {}  # path → (ParquetFile, mins, maxs)

    def _part(self, path: str):
        got = self._parts.get(path)
        if got is None:
            pf = pq.ParquetFile(path)
            idx = pf.schema_arrow.get_field_index("path")
            mins, maxs = [], []
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            got = (pf, mins, maxs)
            while len(self._parts) >= 32:
                try:
                    self._parts.pop(next(iter(self._parts)))
                except (KeyError, RuntimeError, StopIteration):
                    break
            self._parts[path] = got
        return got

    def history(self, doc_path: str) -> pa.Table:
        """Every change row for ``doc_path``, chronological
        ``(commit_ts, change_id)`` order (the store's sort), from the one
        part file the path hashes to."""
        fpath = os.path.join(self.root, f"part-{fnv64(doc_path) % self.num_parts:05d}.parquet")
        if not os.path.exists(fpath):
            return self._empty()
        pf, mins, maxs = self._part(fpath)
        parts = []
        for i in range(len(mins)):
            if mins[i] > doc_path:
                break
            if maxs[i] < doc_path:
                continue
            t = pf.read_row_group(i)
            t = t.filter(pc.equal(t["path"], doc_path))
            if t.num_rows:
                parts.append(t)
        return pa.concat_tables(parts) if parts else self._empty()

    @staticmethod
    def _empty() -> pa.Table:
        return pa.table(
            {
                "path": pa.array([], pa.string()),
                "commit_ts": pa.array([], pa.int64()),
                "change_id": pa.array([], pa.int64()),
                "diff_type": pa.array([], pa.string()),
                "commit_day": pa.array([], pa.string()),
                "author": pa.array([], pa.string()),
                "tbucket": pa.array([], pa.int64()),
            }
        )
