"""Date-range temporal search over the bucketed index.

Reference semantics (``temporal_search_service.py:248-360``): query +
``time_range=(start_date, end_date)`` (YYYY-MM-DD, inclusive) +
optional ``diff_types`` / ``author`` / path filters.  Here:

- **bucket routing**: only sub-indexes whose day span overlaps the range
  are opened (manifest lookup — one row per window, driver-tiny).
- **(diff-type, day) filter**: exact and PRE-limit — the composite stored
  ``tkey`` column rides the engine's include-languages filter; the value
  set is |diff_types| × |days in range| strings (range-sized, never
  corpus-sized).
- **scoring**: merged corpus statistics over the SELECTED buckets
  (N = ΣNᵢ, df = Σdfᵢ, avgdl = Σtokensᵢ/ΣNᵢ — the ``search_global``
  federated-stats contract), so a bucket-aligned range scores exactly as a
  monolithic index of that range would; for unaligned ranges the stats
  come from the covering windows while the candidate filter stays
  day-exact (documented divergence, mirroring the include-language
  precedent of corpus stats + candidate gating).
- **author / path filters**: post-filters with the reference's ×3
  over-fetch (O1 semantics): rank the day/type-filtered candidates, cut at
  3·limit, filter, cut at limit.  Author values for the over-fetched set
  (≤ 3·limit rows) come from bounded docstore point-reads — never a
  corpus-sized fetch.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from ..index.manifest import DOCSTORE_DIR
from ..query.engine import UNLIMITED_LIMIT, IndexSearcher
from ..query.globmatch import matches_any
from ..text.analysis import tokenize_query

DIFF_TYPES = ("added", "modified", "deleted")


def _days_between(start_day: str, end_day: str) -> list[str]:
    a = np.datetime64(start_day, "D")
    b = np.datetime64(end_day, "D")
    if b < a:
        raise ValueError(f"end_day {end_day!r} before start_day {start_day!r}")
    return np.datetime_as_string(np.arange(a, b + 1), unit="D").tolist()


class TemporalSearcher:
    def __init__(self, root: str, **searcher_kwargs):
        import json

        from .index import TEMPORAL_MANIFEST

        self.root = root
        with open(os.path.join(root, TEMPORAL_MANIFEST)) as f:
            self.manifest = json.load(f)
        self._kw = dict(searcher_kwargs)
        self._kw.setdefault("lang_col", "tkey")
        self._kw.setdefault("url_col", "path")
        self._searchers: dict[int, IndexSearcher] = {}
        # auto-probe the path-history store (kvstore precedent: built
        # explicitly, picked up when present, parquet scan stays the
        # fallback so stores built before the sidecar existed keep working)
        from .pathstore import MANIFEST as PS_MANIFEST, PATHSTORE_DIR, PathHistoryReader

        self._paths: PathHistoryReader | None = None
        if os.path.isfile(os.path.join(root, PATHSTORE_DIR, PS_MANIFEST)):
            self._paths = PathHistoryReader(root)

    def _searcher(self, bucket: int) -> IndexSearcher:
        s = self._searchers.get(bucket)
        if s is None:
            ent = next(b for b in self.manifest["buckets"] if b["bucket"] == bucket)
            s = IndexSearcher(os.path.join(self.root, ent["dir"]), **self._kw)
            self._searchers[bucket] = s
        return s

    def warm(self, start_day: str | None = None, end_day: str | None = None) -> int:
        """Eagerly open (and cache-warm) the window searchers covering the
        range — the daemon cache-warm step for temporal serving.  Without a
        range, every window warms.  Returns the number warmed.

        This RELOCATES latency to deploy time rather than removing it
        (measured at 1.29M changes / 2 windows: warm 5.8 s, then the FIRST
        query runs at steady-state p50 — 87 ms vs 3.6 s lazy cold; warm
        covers segment tables, per-shard doc metadata and the docstore
        row-group index).  Use it when the first request's latency matters
        more than actor startup."""
        ents = (
            self.manifest["buckets"]
            if start_day is None
            else self.buckets_for(start_day, end_day or start_day)
        )
        for e in ents:
            s = self._searcher(e["bucket"])
            s.warm()
            s._docstore_index()  # hit assembly's row-group index, also cold
        return len(ents)

    def buckets_for(self, start_day: str, end_day: str) -> list[dict]:
        """Manifest rows whose day span overlaps [start_day, end_day]
        (ISO date strings compare lexicographically)."""
        return [
            b
            for b in self.manifest["buckets"]
            if b["min_day"] <= end_day and b["max_day"] >= start_day
        ]

    def _stored_for(self, bucket: int, ids: list[int], cols: list[str]) -> dict[int, dict]:
        """Bounded docstore point-read: the requested stored columns for a
        SMALL id set (over-fetched candidates / final winners).  Uses the
        bucket searcher's row-group index (doc_id-ordered doc store) so a
        top-k fetch reads a handful of row groups — a whole-window
        dataset-filter scan here measured 330 ms/window at 128k changes;
        this path is sub-ms per row group."""
        import pyarrow.parquet as pq

        s = self._searcher(bucket)
        entries = s._docstore_index()
        mins = np.array([e[0] for e in entries], dtype=np.int64)
        need: dict[tuple[str, int], list[int]] = {}
        for i in sorted(set(int(x) for x in ids)):
            j = int(np.searchsorted(mins, i, side="right")) - 1
            while j >= 0 and entries[j][1] >= i:
                need.setdefault((entries[j][2], entries[j][3]), []).append(i)
                if entries[j][0] <= i:
                    break
                j -= 1
        out: dict[int, dict] = {}
        want = set(int(x) for x in ids)
        by_file: dict[str, list[int]] = {}
        for (path, rg), _sub in need.items():
            by_file.setdefault(path, []).append(rg)
        for path, rgs in by_file.items():
            t = pq.ParquetFile(path).read_row_groups(
                sorted(set(rgs)), columns=["doc_id", *cols]
            )
            mask = pc.is_in(
                t["doc_id"], value_set=pa.array(sorted(want), type=pa.int64())
            )
            for r in t.filter(mask).to_pylist():
                out[r["doc_id"]] = r
        return out

    def file_at(self, path: str, day: str, *, include_removed: bool = False) -> dict | None:
        """Content of ``path`` as of end-of-``day`` (the reference's
        temporal content reconstruction): the latest change at or before
        the cut, ``None`` if the path doesn't exist yet or — unless
        ``include_removed`` (reference API-only parameter,
        QUERY_PARAMETERS.md "include_removed") — its latest change is a
        deletion.  With the path-history store this is a true point read
        (one hash-routed part file, pruned row groups, then one docstore
        row-group read for the winner's text); the fallback is the
        partition-pruned parquet filter scan."""
        self._require_diff_root("file_at")
        r = self._winner_at(path, day=day)
        if r is None or (r["diff_type"] == "deleted" and not include_removed):
            return None
        return r

    def file_at_commit(self, path: str, change_id: int, *, include_removed: bool = False) -> dict | None:
        """Content of ``path`` as of commit ``change_id`` (the reference's
        API-only ``at_commit`` parameter with the synthesized change id
        standing in for the git ref): the latest change to ``path`` whose
        ``(commit_ts, change_id)`` is ≤ the named commit's.  The named
        commit may touch any path — its timestamp defines the snapshot
        cut."""
        self._require_diff_root("file_at_commit")
        cut = self._find_change(int(change_id))
        if cut is None:
            raise KeyError(f"unknown change_id {change_id}")
        r = self._winner_at(path, ts=int(cut["commit_ts"]), tid=int(change_id))
        if r is None or (r["diff_type"] == "deleted" and not include_removed):
            return None
        return r

    def history(self, path: str) -> list[dict]:
        """Full change timeline for ``path`` in chronological
        ``(commit_ts, change_id)`` order — the per-hit ``evolution``
        payload (reference ``show_evolution``).  Point read when the path
        store exists; filtered scan fallback otherwise."""
        self._require_diff_root("history")
        if self._paths is not None:
            t = self._paths.history(path)
            return t.drop_columns(["path", "tbucket"]).to_pylist()
        dset = pads.dataset(os.path.join(self.root, "changes"), partitioning="hive")
        t = dset.to_table(
            columns=["doc_id", "diff_type", "commit_day", "commit_ts", "author"],
            filter=pc.field("path") == path,
        )
        rows = t.rename_columns(
            ["change_id" if c == "doc_id" else c for c in t.column_names]
        ).to_pylist()
        rows.sort(key=lambda r: (r["commit_ts"], r["change_id"]))
        return rows

    def _require_diff_root(self, op: str) -> None:
        """Content reconstruction reads the latest change row per path —
        on a message-indexed root the message doc (odd id) would shadow
        the same commit's diff doc, so these operators are served from the
        diff-only root."""
        if self.manifest.get("index_messages"):
            raise ValueError(
                f"{op} is not supported on a message-indexed root; use the "
                "diff-only temporal index for content reconstruction"
            )

    def _find_change(self, change_id: int) -> dict | None:
        """Metadata row for one change id: the buckets are probed
        newest-first with bounded docstore point reads (bucket count is
        manifest-sized, each probe a couple of row groups)."""
        for ent in sorted(self.manifest["buckets"], key=lambda b: -b["bucket"]):
            got = self._stored_for(ent["bucket"], [change_id], ["commit_ts", "commit_day"])
            if change_id in got:
                return got[change_id]
        return None

    def _winner_at(
        self,
        path: str,
        *,
        day: str | None = None,
        ts: int | None = None,
        tid: int | None = None,
    ) -> dict | None:
        """Latest change to ``path`` at or before the cut (a ``day`` string
        or a ``(commit_ts, change_id)`` pair), with its text."""
        if self._paths is not None:
            h = self._paths.history(path)
            if day is not None:
                h = h.filter(pc.less_equal(h["commit_day"], day))
            else:
                keep = pc.or_(
                    pc.less(h["commit_ts"], ts),
                    pc.and_(
                        pc.equal(h["commit_ts"], ts), pc.less_equal(h["change_id"], tid)
                    ),
                )
                h = h.filter(keep)
            if h.num_rows == 0:
                return None
            r = h.slice(h.num_rows - 1, 1).to_pylist()[0]  # store sort = cut order
            stored = self._stored_for(int(r["tbucket"]), [int(r["change_id"])], ["text"])
            return {
                "path": path,
                "change_id": int(r["change_id"]),
                "commit_day": r["commit_day"],
                "commit_ts": int(r["commit_ts"]),
                "diff_type": r["diff_type"],
                "text": stored.get(int(r["change_id"]), {}).get("text", ""),
            }
        # fallback: partition-pruned filter scan over the changes table
        if day is not None:
            cand = [b for b in self.manifest["buckets"] if b["min_day"] <= day]
            if not cand:
                return None
            day_bucket = max(b["bucket"] for b in cand)
            flt = (
                (pc.field("path") == path)
                & (pc.field("commit_day") <= day)
                & (pc.field("tbucket") <= day_bucket)
            )
        else:
            flt = (pc.field("path") == path) & (pc.field("commit_ts") <= ts)
        dset = pads.dataset(os.path.join(self.root, "changes"), partitioning="hive")
        t = dset.to_table(
            columns=["doc_id", "path", "diff_type", "commit_day", "commit_ts", "text"],
            filter=flt,
        )
        if ts is not None and t.num_rows:
            keep = pc.or_(
                pc.less(t["commit_ts"], ts),
                pc.and_(pc.equal(t["commit_ts"], ts), pc.less_equal(t["doc_id"], tid)),
            )
            t = t.filter(keep)
        if t.num_rows == 0:
            return None
        order = np.lexsort(
            (t["doc_id"].to_numpy(zero_copy_only=False),
             t["commit_ts"].to_numpy(zero_copy_only=False))
        )
        r = t.slice(int(order[-1]), 1).to_pylist()[0]
        return {
            "path": r["path"],
            "change_id": r["doc_id"],
            "commit_day": r["commit_day"],
            "commit_ts": r["commit_ts"],
            "diff_type": r["diff_type"],
            "text": r["text"],
        }

    def query(
        self,
        query_text: str,
        *,
        start_day: str,
        end_day: str,
        diff_types: list[str] | None = None,
        authors: list[str] | None = None,
        path_filters: list[str] | None = None,
        limit: int = 10,
        chunk_type: str | None = None,
        show_evolution: bool = False,
        evolution_limit: int | None = None,
    ) -> list[dict]:
        """Top-``limit`` changes matching ALL query terms within the date
        range, ranked by (score desc, change_id asc).  ``limit=0`` means
        unlimited, engine-wide convention.

        ``show_evolution`` (reference API-only parameter, truncated by the
        user-controlled ``evolution_limit`` exactly as
        ``semantic_query_manager.py:1516-1522`` slices
        ``evolution_data[:evolution_limit]``) attaches each hit's full path
        timeline in chronological ``(commit_ts, change_id)`` order — a
        hash-routed point read per distinct hit path (top-k-bounded), never
        a corpus scan, when the path store exists.

        ``chunk_type`` (reference Story #476) filters ``commit_message`` vs
        ``commit_diff`` docs on message-indexed roots
        (``build_temporal_index(index_messages=True)``) with the
        reference's distribution-aware over-fetch multipliers
        (``temporal_search_service.py:383-395``: messages are the rare
        class → ×40; diffs the majority → ×1.5) applied as a post-filter on
        the ranked candidates — the chunk type is the doc-id parity, no
        stored column or extra fan-out."""
        for dt in diff_types or ():
            if dt not in DIFF_TYPES:
                raise ValueError(f"unknown diff_type {dt!r}")
        msg_indexed = bool(self.manifest.get("index_messages"))
        if chunk_type is not None:
            if chunk_type not in ("commit_message", "commit_diff"):
                raise ValueError(f"unknown chunk_type {chunk_type!r}")
            if not msg_indexed:
                raise ValueError(
                    "chunk_type filtering requires a message-indexed root "
                    "(build_temporal_index(index_messages=True))"
                )
        if show_evolution:
            # fail BEFORE the fan-out: evolution reads per-path history,
            # which message-indexed roots cannot reconstruct
            self._require_diff_root("show_evolution")
        terms = sorted(dict.fromkeys(tokenize_query(query_text)))
        if not terms:
            return []
        ents = self.buckets_for(start_day, end_day)
        if not ents:
            return []
        searchers = [(e["bucket"], self._searcher(e["bucket"])) for e in ents]

        # merged federated statistics over the selected windows
        n_docs = sum(s.manifest.num_docs for _, s in searchers)
        total_tokens = sum(s.manifest.total_tokens for _, s in searchers)
        avgdl = total_tokens / n_docs if n_docs else 0.0
        global_df = {t: 0 for t in terms}
        for _, s in searchers:
            for t, df in s._global_df(terms).items():
                global_df[t] += df
        if any(global_df[t] == 0 for t in terms):
            return []

        days = _days_between(start_day, end_day)
        tkeys = [f"{dt}@{day}" for dt in (diff_types or DIFF_TYPES) for day in days]

        needs_post = bool(authors or path_filters)
        depth = limit if limit > 0 else UNLIMITED_LIMIT
        # over-fetch ladder mirrors the reference's branch order
        # (temporal_search_service.py:383-403): chunk_type dominates with
        # its distribution-aware multiplier, other post-filters get ×3.
        # Two divergences where the reference formula under-fetches: a
        # depth+1 floor (int(1·1.5)=1 gives ZERO headroom at limit=1) and
        # chunk_type stacked with author/path filters keeps at least the
        # ×3 those filters get alone.
        if chunk_type is not None and limit > 0:
            m = depth * 40 if chunk_type == "commit_message" else max(int(depth * 1.5), depth + 1)
            if needs_post:
                m = max(m, depth * 3)
        elif needs_post and limit > 0:
            m = depth * 3
        else:
            m = depth

        groups = [[t] for t in terms]
        hits: list[tuple[int, float, str, str, int]] = []  # +bucket
        for bucket, s in searchers:
            per_shard = s._fanout(
                "search_groups", groups, n_docs, avgdl, global_df, m,
                tkeys, self._kw["lang_col"], self._kw["url_col"],
            )
            hits.extend(
                (h[0], h[1], h[2], h[3], bucket) for sh in per_shard for h in sh
            )
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        order = np.lexsort((ids, -scores))[:m]

        # author values for the (bounded) over-fetched set, per bucket
        auth_by_id: dict[int, str] = {}
        if authors:
            by_bucket: dict[int, list[int]] = {}
            for i in order:
                by_bucket.setdefault(hits[i][4], []).append(int(hits[i][0]))
            for b, bids in by_bucket.items():
                for did, row in self._stored_for(b, bids, ["author"]).items():
                    auth_by_id[did] = row["author"]

        selected: list[tuple[int, float, str, str, int]] = []
        want_msg = chunk_type == "commit_message"
        for i in order:
            cid, score, tkey, path, bucket = hits[i]
            if chunk_type is not None and (int(cid) % 2 == 1) != want_msg:
                continue
            if authors and auth_by_id.get(int(cid)) not in authors:
                continue
            if path_filters and not matches_any(path, path_filters):
                continue
            selected.append((int(cid), float(score), tkey, path, bucket))
            if limit > 0 and len(selected) >= limit:
                break

        # assemble hit rows; remaining stored fields via one bounded read
        extra: dict[int, dict] = {}
        by_bucket2: dict[int, list[int]] = {}
        for cid, _, _, _, b in selected:
            by_bucket2.setdefault(b, []).append(cid)
        for b, bids in by_bucket2.items():
            extra.update(self._stored_for(b, bids, ["commit_ts", "author", "message"]))
        evo: dict[str, list[dict]] = {}
        if show_evolution:
            for _cid, _s, _tk, path, _b in selected:
                if path not in evo:
                    rows = self.history(path)
                    if evolution_limit is not None and len(rows) > evolution_limit:
                        rows = rows[:evolution_limit]
                    evo[path] = rows

        out = []
        for cid, score, tkey, path, _b in selected:
            diff_type, day = tkey.split("@", 1)
            e = extra.get(cid, {})
            row = {
                # message-indexed roots double the ids (parity = chunk
                # type); surface the ORIGINAL change id plus the type
                "change_id": cid // 2 if msg_indexed else cid,
                "path": path,
                "diff_type": diff_type,
                "commit_day": day,
                "commit_ts": e.get("commit_ts"),
                "author": e.get("author"),
                "message": e.get("message"),
                "score": score,
            }
            if msg_indexed:
                row["chunk_type"] = (
                    "commit_message" if cid % 2 == 1 else "commit_diff"
                )
            if show_evolution:
                row["evolution"] = evo[path]
            out.append(row)
        return out
