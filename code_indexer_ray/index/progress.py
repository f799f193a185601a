"""Build-progress observation — the reference ``progress/`` display +
``services/indexing_progress_log.py`` analog, re-expressed for a
distributed build: progress is DERIVED from the build's own durable
artifacts (the ``_build_plan.json`` written before any work, the
per-partition side manifests the encode groups publish, the heartbeated
build lock, and the final manifest) rather than from an in-process
callback — so any observer process can poll it, including mid-build from
another host sharing the filesystem.

States:

* ``finished`` — published manifest matches the plan fingerprint;
* ``building`` — live lock (heartbeat fresh) and work outstanding;
* ``stalled`` — lock present but its heartbeat exceeded ``stale_after``;
* ``incomplete`` — no lock, plan present, partitions missing (a dead
  build; ``build_index(resume=True)`` will pick it up);
* ``idle`` — nothing at the path.
"""

from __future__ import annotations

import json
import os
import time

from .buildlock import LOCK_FILE
from .manifest import MANIFEST_NAME, completed_partitions

PLAN_NAME = "_build_plan.json"


def _read_json(path: str) -> dict | None:
    try:
        with open(path, encoding="utf-8") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def build_progress(
    out_dir: str, *, stale_after: float = 300.0, now: float | None = None
) -> dict:
    """One observation of the build at ``out_dir`` (see module doc)."""
    now = time.time() if now is None else now
    plan = _read_json(os.path.join(out_dir, PLAN_NAME))
    lock = _read_json(os.path.join(out_dir, LOCK_FILE + ".json"))
    manifest = _read_json(os.path.join(out_dir, MANIFEST_NAME))

    out: dict = {"out_dir": os.path.abspath(out_dir)}
    if plan is None and manifest is None:
        out["state"] = "idle"
        return out

    fingerprint = (plan or {}).get("fingerprint")
    expected = (
        (plan["num_shards"] * plan["num_buckets"]) if plan else None
    )
    done = len(completed_partitions(out_dir, fingerprint)) if plan else 0
    if plan:
        out["plan"] = {
            "num_shards": plan["num_shards"],
            "num_buckets": plan["num_buckets"],
            "num_docs": plan.get("num_docs"),
            "started_unix": plan.get("started_unix"),
        }
        out["partitions_done"] = done
        out["partitions_expected"] = expected
        out["pct"] = round(100.0 * done / expected, 1) if expected else 0.0
        if plan.get("started_unix"):
            out["elapsed_s"] = max(0, int(now) - int(plan["started_unix"]))

    # a published manifest whose fingerprint matches the plan is the
    # completion record (a mismatching one is a PREVIOUS build's — the
    # current plan is still in flight)
    if manifest is not None:
        mfp = (manifest.get("metrics") or {}).get("fingerprint")
        if fingerprint is None or mfp == fingerprint:
            out["state"] = "finished"
            return out

    if lock is not None and "released_at" not in lock and "heartbeat_at" in lock:
        age = now - float(lock["heartbeat_at"])
        out["lock"] = {"pid": lock.get("pid"), "heartbeat_age_s": round(age, 1)}
        out["state"] = "stalled" if age > stale_after else "building"
        return out

    out["state"] = "incomplete" if (expected or 0) > done else "finished"
    return out
