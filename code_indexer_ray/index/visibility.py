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
op per branch (same crash-safety: new files first, then the old ones are
superseded by sequence order — a snapshot is just a hide op preceded by an
unhide-all marker).
"""

from __future__ import annotations

import json
import os

import numpy as np

VIS_DIR = "_visibility"


def _vis_dir(index_dir: str) -> str:
    return os.path.join(index_dir, VIS_DIR)


def _op_files(index_dir: str) -> list[str]:
    d = _vis_dir(index_dir)
    if not os.path.isdir(d):
        return []
    return sorted(f for f in os.listdir(d) if f.startswith("op-") and f.endswith(".json"))


def op_count(index_dir: str) -> int:
    """Cheap cache key: number of visibility ops recorded."""
    return len(_op_files(index_dir))


def _record(index_dir: str, branch: str, op: str, doc_ids) -> str:
    if not branch:
        raise ValueError("branch must be a non-empty string")
    d = _vis_dir(index_dir)
    os.makedirs(d, exist_ok=True)
    files = _op_files(index_dir)
    seq = int(files[-1][3:9]) + 1 if files else 1
    path = os.path.join(d, f"op-{seq:06d}.json")
    tmp = path + ".tmp"
    ids = sorted(int(x) for x in doc_ids)
    with open(tmp, "w") as f:
        json.dump({"branch": branch, "op": op, "ids": ids}, f)
    os.replace(tmp, path)
    return path


def hide_docs(index_dir: str, branch: str, doc_ids) -> str:
    """Hide ``doc_ids`` on ``branch`` (reference _hide_file_in_branch)."""
    return _record(index_dir, branch, "hide", doc_ids)


def unhide_docs(index_dir: str, branch: str, doc_ids) -> str:
    """Re-expose ``doc_ids`` on ``branch`` (reference _ensure_file_visible)."""
    return _record(index_dir, branch, "unhide", doc_ids)


def hidden_ids(index_dir: str, branch: str) -> np.ndarray:
    """Fold the op log for one branch → sorted int64 doc ids currently
    hidden there.  Last op per (branch, doc) wins."""
    hidden: set[int] = set()
    d = _vis_dir(index_dir)
    for fname in _op_files(index_dir):
        with open(os.path.join(d, fname)) as f:
            rec = json.load(f)
        if rec.get("branch") != branch:
            continue
        if rec.get("op") == "hide":
            hidden.update(rec.get("ids", ()))
        else:
            hidden.difference_update(rec.get("ids", ()))
    return np.array(sorted(hidden), dtype=np.int64)
