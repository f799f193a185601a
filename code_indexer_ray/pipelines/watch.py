"""Watch-mode incremental driver — the periodic/event loop the reference runs
with watchdog + a debounced handler (``services/fts_watch_handler.py:40-128``,
``smart_indexer`` reconcile), re-expressed for Parquet corpora on Ray:

- the input is a directory of doc-range-partitioned Parquet shards (the
  resumable-output layout every pipeline here writes);
- each tick fingerprints every file (size, mtime_ns); new/modified files
  become a delta build + merge, deleted files become tombstone *ranges*
  (their recorded doc-id min/max — ranges are disjoint because the corpus is
  doc-range partitioned, so a removed file is a removed id range);
- every tick publishes a fresh index *generation* directory and atomically
  repoints ``current`` (the reference's temp-dir + rename swap,
  ``tantivy_index_manager.py:1086-1130``); readers holding the old
  generation keep a consistent snapshot;
- state (fingerprints + per-file doc ranges + generation counter) persists in
  ``watch_state.json`` — the driver process can die and resume.

``tick()`` is the testable unit; ``run()`` wraps it in a poll loop.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow.parquet as pq

from ..index.build import build_index
from ..index.manifest import IndexManifest, atomic_write_json, load_manifest
from .incremental import apply_delta

STATE_NAME = "watch_state.json"
CURRENT_NAME = "current"


def _file_fingerprint(path: str) -> list:
    st = os.stat(path)
    return [st.st_size, st.st_mtime_ns]


def _doc_range(path: str, id_col: str) -> list:
    """[min, max] doc id of one parquet file, from row-group stats."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(id_col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is not None and st.has_min_max:
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    if lo is None:  # stats missing → scan the one column
        col = pq.read_table(path, columns=[id_col])[id_col]
        import pyarrow.compute as pc

        lo, hi = pc.min(col).as_py(), pc.max(col).as_py()
    return [int(lo), int(hi)]


class WatchDriver:
    """Poll-driven incremental indexer over a directory of Parquet shards."""

    def __init__(
        self,
        input_dir: str,
        index_root: str,
        *,
        id_col: str = "doc_id",
        text_col: str = "text",
        store_cols: tuple[str, ...] = ("lang", "url"),
        doc_id_upper: int | None = None,
        num_buckets: int | None = None,
        target_docs_per_shard: int = 250_000,
        compact_every: int | None = 8,
    ):
        self.input_dir = input_dir
        self.index_root = index_root
        self.id_col = id_col
        self.text_col = text_col
        self.store_cols = store_cols
        self.doc_id_upper = doc_id_upper
        self.num_buckets = num_buckets
        self.target_docs_per_shard = target_docs_per_shard
        self.compact_every = compact_every
        os.makedirs(index_root, exist_ok=True)
        self._state = self._load_state()

    # ---- state ----
    def _state_path(self) -> str:
        return os.path.join(self.index_root, STATE_NAME)

    def _load_state(self) -> dict:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {"files": {}, "generation": -1}

    def _save_state(self) -> None:
        atomic_write_json(self._state_path(), self._state)

    def current_index(self) -> str | None:
        """Directory of the live generation (readers open this)."""
        try:
            with open(os.path.join(self.index_root, CURRENT_NAME)) as f:
                rel = f.read().strip()
            return os.path.join(self.index_root, rel)
        except OSError:
            return None

    def _publish(self, gen: int) -> None:
        # atomic pointer swap: tmp file + os.replace (the reference's rename)
        ptr = os.path.join(self.index_root, CURRENT_NAME)
        tmp = ptr + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"gen_{gen:06d}")
        os.replace(tmp, ptr)

    # ---- change detection ----
    def scan(self) -> tuple[list[str], list[str]]:
        """(changed_or_new_files, deleted_files) vs the recorded fingerprints."""
        seen = {}
        for name in sorted(os.listdir(self.input_dir)):
            if name.endswith(".parquet"):
                p = os.path.join(self.input_dir, name)
                seen[name] = _file_fingerprint(p)
        old = self._state["files"]
        changed = [n for n, fp in seen.items() if old.get(n, {}).get("fp") != fp]
        deleted = [n for n in old if n not in seen]
        self._pending = seen
        return changed, deleted

    # ---- the tick ----
    def tick(self) -> IndexManifest | None:
        """One reconcile pass; returns the new manifest or None if no-op.
        The build+publish phase runs under the index root's cross-process
        build lock (reference git_aware_watch_handler: watch ticks take the
        same indexing lock manual builds do)."""
        changed, deleted = self.scan()
        if not changed and not deleted:
            return None
        from ..index.buildlock import BuildLock

        with BuildLock(self.index_root):
            return self._apply(changed, deleted)

    def _apply(self, changed, deleted) -> IndexManifest:
        gen = self._state["generation"] + 1
        gen_dir = os.path.join(self.index_root, f"gen_{gen:06d}")
        shutil.rmtree(gen_dir, ignore_errors=True)
        changed_paths = [os.path.join(self.input_dir, n) for n in changed]

        if self._state["generation"] < 0:
            # first tick: full build over the whole input
            manifest = build_index(
                self.input_dir,
                gen_dir,
                id_col=self.id_col,
                text_col=self.text_col,
                store_cols=self.store_cols,
                doc_id_upper=self.doc_id_upper,
                target_docs_per_shard=self.target_docs_per_shard,
                **({"num_buckets": self.num_buckets} if self.num_buckets else {}),
                resume=False,
            )
        else:
            base_dir = self.current_index()
            ranges = [tuple(self._state["files"][n]["range"]) for n in deleted]
            if changed_paths:
                manifest = apply_delta(
                    base_dir,
                    changed_paths,
                    gen_dir,
                    id_col=self.id_col,
                    store_cols=self.store_cols,
                    work_dir=gen_dir + "_work",
                    tombstone_ranges=ranges or None,
                )
            else:
                # pure-delete tick: tombstone-only merge, no delta build
                from ..index.merge import merge_indexes

                manifest = merge_indexes(
                    base_dir, None, gen_dir, tombstone_ranges=ranges or None
                )

        # periodic doc-store compaction: each merge tick adds delta_ files to
        # the generation's doc store; every ``compact_every`` generations the
        # new (not-yet-published) generation is coalesced back to ~1 file per
        # shard per target_bytes (Tantivy's background-merge analog for the
        # stored-fields half).  Safe here: gen_dir is private until _publish.
        if self.compact_every and gen % self.compact_every == 0:
            from ..index.compact import compact_docstore

            compact_docstore(gen_dir)

        # record fingerprints + doc ranges, advance the generation, swap
        files = {}
        for name, fp in self._pending.items():
            prev = self._state["files"].get(name)
            if name in changed or prev is None:
                rng = _doc_range(os.path.join(self.input_dir, name), self.id_col)
            else:
                rng = prev["range"]
            files[name] = {"fp": fp, "range": rng}
        self._state = {"files": files, "generation": gen}
        self._save_state()
        self._publish(gen)
        shutil.rmtree(gen_dir + "_work", ignore_errors=True)
        return manifest

    def run(self, *, interval_s: float = 5.0, max_ticks: int | None = None) -> None:
        """Poll loop (the watchdog analog). ``max_ticks`` bounds it for tests."""
        n = 0
        while max_ticks is None or n < max_ticks:
            self.tick()
            n += 1
            if max_ticks is None or n < max_ticks:
                time.sleep(interval_s)
