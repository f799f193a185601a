"""Per-branch document visibility — the branch-visibility filter (SURVEY J4),
now native.

Reference: git-aware indexing keeps ONE content point per chunk and mutates a
``hidden_branches`` list on it as branches hide/expose files
(``services/high_throughput_processor.py:1158-1212``); a query on branch B
adds a ``hidden_branches match any [B]`` must-not filter
(``smart_indexer.py:2236``, ``:2388``).

This engine's segments are immutable, so visibility is an APPEND-ONLY op
log beside the index instead of an in-place payload mutation:

- ``_visibility/op-%06d.json`` — one atomic (tmp+rename) file per
  hide/unhide batch: ``{"branch": B, "op": "hide"|"unhide", "ids": [...]}``.
- a doc is hidden on branch B iff the LAST op naming (B, doc) is a hide —
  exactly the reference's list add/remove semantics, replayed.
- ``hidden_ids`` folds the log for one branch; the searcher caches the fold
  keyed by (branch, op-file count), so the common case costs one listdir.

Scale: the log is proportional to branch CHURN (docs touched by branch
operations), not the corpus; a branch's fold is that branch's ops only.
When churn grows, ``compact_log`` snapshots the folded state back into one
``set`` op per branch (hidden := ids exactly), appended BEFORE the
superseded files are removed — a crash between the phases only leaves
redundant history.
"""

from __future__ import annotations

import json
import os

import numpy as np

VIS_DIR = "_visibility"


def _vis_dir(index_dir: str) -> str:
    return os.path.join(index_dir, VIS_DIR)


def _op_seq(fname: str) -> int:
    return int(fname[3 : -len(".json")])


def _op_files(index_dir: str) -> list[str]:
    """Op files in SEQUENCE order (numeric — zero-padding runs out at 10⁶
    ops, so lexicographic order would fold op-1000000 before op-999999)."""
    d = _vis_dir(index_dir)
    if not os.path.isdir(d):
        return []
    return sorted(
        (f for f in os.listdir(d) if f.startswith("op-") and f.endswith(".json")),
        key=_op_seq,
    )


def op_count(index_dir: str) -> int:
    """Cheap cache key: number of visibility ops recorded."""
    return len(_op_files(index_dir))


def _record(index_dir: str, branch: str, op: str, doc_ids) -> str:
    if not branch:
        raise ValueError("branch must be a non-empty string")
    d = _vis_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    ids = sorted(int(x) for x in doc_ids)
    files = _op_files(index_dir)
    seq = _op_seq(files[-1]) + 1 if files else 1
    while True:
        path = os.path.join(d, f"op-{seq:06d}.json")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"branch": branch, "op": op, "ids": ids}, f)
        try:
            # atomic no-clobber publish: a concurrent writer that claimed
            # this seq makes link() fail — bump and retry instead of
            # silently overwriting its op
            os.link(tmp, path)
            os.unlink(tmp)
            return path
        except FileExistsError:
            os.unlink(tmp)
            seq += 1


def hide_docs(index_dir: str, branch: str, doc_ids) -> str:
    """Hide ``doc_ids`` on ``branch`` (reference _hide_file_in_branch)."""
    return _record(index_dir, branch, "hide", doc_ids)


def unhide_docs(index_dir: str, branch: str, doc_ids) -> str:
    """Re-expose ``doc_ids`` on ``branch`` (reference _ensure_file_visible)."""
    return _record(index_dir, branch, "unhide", doc_ids)


def _fold(index_dir: str) -> dict[str, set[int]]:
    """Replay every op in sequence order → {branch: hidden ids}."""
    state: dict[str, set[int]] = {}
    d = _vis_dir(index_dir)
    for fname in _op_files(index_dir):
        with open(os.path.join(d, fname)) as f:
            rec = json.load(f)
        b = rec.get("branch")
        cur = state.setdefault(b, set())
        op = rec.get("op")
        if op == "hide":
            cur.update(rec.get("ids", ()))
        elif op == "set":  # compaction snapshot: hidden := ids exactly
            state[b] = set(rec.get("ids", ()))
        else:
            cur.difference_update(rec.get("ids", ()))
    return state


def hidden_ids(index_dir: str, branch: str) -> np.ndarray:
    """Fold the op log for one branch → sorted int64 doc ids currently
    hidden there.  Last op per (branch, doc) wins."""
    hidden = _fold(index_dir).get(branch, set())
    return np.array(sorted(hidden), dtype=np.int64)


def compact_log(index_dir: str) -> int:
    """Snapshot the folded state back into ONE 'set' op per branch and
    drop the ops it supersedes.  Crash-safe in sequence order: the
    snapshots are appended FIRST (a 'set' op fully determines its branch's
    state regardless of what precedes it), then the superseded files go —
    a crash between the two phases only leaves redundant history.
    Returns the number of op files removed."""
    state = _fold(index_dir)
    old = _op_files(index_dir)
    if not old:
        return 0
    for b in sorted(state):
        _record(index_dir, b, "set", sorted(state[b]))
    d = _vis_dir(index_dir)
    for fname in old:
        os.unlink(os.path.join(d, fname))
    return len(old)
