"""Temporal watch-mode driver — the reference's commit-detection loop
(``cli_temporal_watch_handler.py``: refs-file inotify / polling fallback →
incremental temporal indexing, with a progressive-metadata completed set so
a crashed handler never re-indexes or skips a commit) re-expressed for the
Parquet-feed world this engine lives in:

- the feed is a directory of APPEND-ONLY change-row parquet files (each
  file = one batch of commits, the analog of a refs-file advance);
- each tick lists the feed, diffs against persisted fingerprints, and
  appends new files oldest-first via :func:`..temporal.index.append_changes`
  (hot-window rebuild + atomic manifest swaps, pathstore invalidate/rebuild
  — all inherited);
- a MODIFIED or SHRUNK feed file violates the append-only contract and
  raises loudly (temporal history is immutable; the reference's analog is
  a force-push, which it also refuses to reconcile silently);
- crash safety is an explicit per-file protocol (the completed-commit-set
  role): the state records the file as ``in_flight`` WITH the expected
  row delta BEFORE the append, and marks it applied after.  On restart,
  the row count of the changes table (parquet metadata only) tells which
  side of the append the crash fell on:

  * rows unchanged → the append never landed → re-append;
  * rows == expected → the rows landed but windows/manifest may be stale →
    :func:`..temporal.index.repair_append` rebuilds exactly the
    disagreeing windows, then the file is marked applied;
  * anything else → a partial row write (crash inside the parquet sink) —
    detected and raised with the surplus count; never silently doubled.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow.parquet as pq

from ..index.manifest import atomic_write_json
from .index import append_changes, repair_append
from .pathstore import _count_changes

TSTATE_NAME = "temporal_watch_state.json"


def _fingerprint(path: str) -> list:
    st = os.stat(path)
    return [st.st_size, st.st_mtime_ns]


class TemporalWatchDriver:
    def __init__(self, feed_dir: str, index_root: str):
        self.feed_dir = feed_dir
        self.index_root = index_root
        self._state = self._load_state()

    @classmethod
    def initialize(cls, feed_dir: str, index_root: str, **build_kw) -> "TemporalWatchDriver":
        """Bootstrap: build the initial bucketed index over every feed file
        present and record their fingerprints, so the first ``tick`` starts
        from a consistent cursor (the reference's initial full temporal
        index before the watch loop takes over)."""
        from .index import build_temporal_index

        files = sorted(
            f for f in os.listdir(feed_dir) if f.endswith(".parquet")
        )
        paths = [os.path.join(feed_dir, f) for f in files]
        if not paths:
            raise ValueError(f"no .parquet feed files under {feed_dir!r}")
        build_temporal_index(paths, index_root, **build_kw)
        drv = cls(feed_dir, index_root)
        drv._state = {
            "files": {f: _fingerprint(os.path.join(feed_dir, f)) for f in files},
            "in_flight": None,
        }
        drv._save_state()
        return drv

    # ---- state ----------------------------------------------------------
    def _state_path(self) -> str:
        return os.path.join(self.index_root, TSTATE_NAME)

    def _load_state(self) -> dict:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {"files": {}, "in_flight": None}

    def _save_state(self) -> None:
        atomic_write_json(self._state_path(), self._state)

    # ---- recovery -------------------------------------------------------
    def recover(self) -> str | None:
        """Resolve an in-flight append from a crashed tick.  Returns the
        action taken ('reappended', 'repaired', None) or raises on a
        partial row write."""
        inf = self._state.get("in_flight")
        if not inf:
            return None
        part_dir = os.path.join(self.index_root, "changes")
        actual = _count_changes(part_dir)
        name, pre, delta = inf["name"], int(inf["pre_rows"]), int(inf["rows"])
        path = os.path.join(self.feed_dir, name)
        if actual == pre:
            # rows never landed — replay the append
            append_changes(path, self.index_root)
            action = "reappended"
        elif actual == pre + delta:
            # rows landed; windows/manifest may be stale → targeted rebuild
            repair_append(self.index_root)
            action = "repaired"
        else:
            raise RuntimeError(
                f"partial append of {name!r}: changes table has {actual} rows, "
                f"expected {pre} (pre) or {pre + delta} (post) — the row write "
                "crashed midway; re-create the changes partition from the feed "
                "or remove the surplus files before resuming"
            )
        self._state["files"][name] = inf["fp"]
        self._state["in_flight"] = None
        self._save_state()
        return action

    # ---- tick -----------------------------------------------------------
    def scan(self) -> list[str]:
        """New feed files (oldest name first); raises on mutated ones."""
        out = []
        for name in sorted(os.listdir(self.feed_dir)):
            if not name.endswith(".parquet"):
                continue
            fp = _fingerprint(os.path.join(self.feed_dir, name))
            known = self._state["files"].get(name)
            if known is None:
                out.append(name)
            elif known != fp:
                raise ValueError(
                    f"feed file {name!r} changed after it was appended — the "
                    "temporal feed is append-only (new batches are new files)"
                )
        return out

    def tick(self) -> dict:
        """One poll: recover if needed, then append every new feed file.
        Returns {'appended': [names], 'recovered': action|None}."""
        recovered = self.recover()
        appended = []
        for name in self.scan():
            path = os.path.join(self.feed_dir, name)
            fp = _fingerprint(path)
            rows = pq.ParquetFile(path).metadata.num_rows
            pre = _count_changes(os.path.join(self.index_root, "changes"))
            self._state["in_flight"] = {
                "name": name, "fp": fp, "rows": rows, "pre_rows": pre
            }
            self._save_state()  # in-flight marker BEFORE the append
            append_changes(path, self.index_root)
            self._state["files"][name] = fp
            self._state["in_flight"] = None
            self._save_state()
            appended.append(name)
        return {"appended": appended, "recovered": recovered}

    def run(self, *, interval_s: float = 5.0, max_ticks: int | None = None) -> None:
        n = 0
        while max_ticks is None or n < max_ticks:
            self.tick()
            n += 1
            if max_ticks is None or n < max_ticks:
                time.sleep(interval_s)
