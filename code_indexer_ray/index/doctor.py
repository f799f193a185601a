"""Config doctor — one-pass detect-and-repair over an index root.

Reference analog: ``services/config_fixer.py`` (``cidx fix-config``'s
ConfigurationValidator / ConfigurationRepairer: diagnose a project's
on-disk state, report each problem, apply safe fixes on request) applied to
THIS engine's layout.  ``verify_index`` stays the pure reporter; the doctor
composes it with root-level hygiene and owns the REPAIRS.

Findings (kind → fixable → repair):

  dangling_current     root `current` points at a missing/unloadable
                       generation        → repoint to the newest VALID gen
  missing_current      valid generations exist but no `current` pointer
                       (crash between build and publish) → point at newest
  orphan_generation    non-current generation dir (superseded or abandoned)
                       → delete with ``prune_generations=True`` only
  stale_scratch        leftover ``*_work`` staging dirs / ``*.tmp`` +
                       ``*.tmp-<pid>`` files from crashed builds → delete
  stale_lock           ``_build.lock`` whose heartbeat is stale (holder
                       died)             → clear lock + sidecar
  stale_partition      partition manifest whose fingerprint differs from
                       the published manifest's (resume debris from a
                       DIFFERENT build)  → delete manifest + its segment
  orphan_segment       segment file no partition manifest references
                       → delete
  invalid_index        ``verify_index`` errors on a generation — not
                       auto-fixable (rebuild/sync is the remedy; the doctor
                       names the generation and the first errors)

``diagnose`` never writes; ``repair`` applies exactly the requested fixes
and returns what it did.  The CLI (``cidx doctor --index ROOT [--fix]
[--prune-generations]``) exits 0 when healthy (or fully repaired), 1 when
problems remain — the ``verify`` / ``scip verify`` exit-code contract.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import asdict, dataclass

from .buildlock import LOCK_FILE
from .manifest import MANIFEST_NAME, PARTITION_DIR, SEGMENT_DIR, load_manifest

__all__ = ["Finding", "diagnose", "repair", "doctor"]


class _Released(Exception):
    """Internal: the lock sidecar records a clean release, not a holder."""


@dataclass
class Finding:
    kind: str
    path: str
    detail: str
    fixable: bool

    def to_dict(self) -> dict:
        return asdict(self)


def _generations(root: str) -> list[str]:
    try:
        names = sorted(os.listdir(root))
    except OSError:
        return []
    return [
        n for n in names
        if n.startswith("gen_") and os.path.isdir(os.path.join(root, n))
    ]


def _loadable(gen_dir: str) -> bool:
    try:
        load_manifest(gen_dir)
        return True
    except Exception:  # noqa: BLE001 — any unloadable manifest is invalid
        return False


def _read_current(root: str) -> str | None:
    ptr = os.path.join(root, "current")
    if not os.path.isfile(ptr):
        return None
    try:
        with open(ptr) as f:
            return f.read().strip()
    except OSError:
        return None


def _is_root_of_generations(root: str) -> bool:
    return not os.path.exists(os.path.join(root, MANIFEST_NAME)) and bool(
        _generations(root)
    )


def diagnose(
    root: str,
    *,
    deep: bool = False,
    stale_lock_after: float = 300.0,
    now: float | None = None,
) -> list[Finding]:
    """All findings for an index root (a generation root with a ``current``
    pointer, or a bare single index directory)."""
    now = time.time() if now is None else now
    out: list[Finding] = []
    gens = _generations(root)
    cur = _read_current(root)
    valid_gens = [g for g in gens if _loadable(os.path.join(root, g))]

    # -- current pointer --
    if _is_root_of_generations(root):
        if cur is not None and (cur not in gens or cur not in valid_gens):
            tgt = valid_gens[-1] if valid_gens else None
            out.append(
                Finding(
                    "dangling_current",
                    os.path.join(root, "current"),
                    f"current -> {cur!r} which is "
                    + ("missing" if cur not in gens else "unloadable")
                    + (f"; newest valid generation is {tgt!r}" if tgt else "; NO valid generation exists"),
                    fixable=tgt is not None,
                )
            )
        elif cur is None and valid_gens:
            out.append(
                Finding(
                    "missing_current",
                    os.path.join(root, "current"),
                    f"no current pointer; newest valid generation is {valid_gens[-1]!r}",
                    fixable=True,
                )
            )
        for g in gens:
            if g != cur:
                why = "superseded" if g in valid_gens else "invalid/abandoned"
                out.append(
                    Finding(
                        "orphan_generation",
                        os.path.join(root, g),
                        f"{why} generation (not pointed to by current)",
                        fixable=True,
                    )
                )

    # -- stale build lock --
    lock = os.path.join(root, LOCK_FILE)
    beat = lock + ".json"
    if os.path.exists(beat):
        try:
            with open(beat) as f:
                rec = json.load(f)
            if "released_at" in rec:
                raise _Released
            last = float(rec.get("heartbeat_at") or rec.get("started_at") or 0)
            if now - last > stale_lock_after:
                out.append(
                    Finding(
                        "stale_lock",
                        lock,
                        f"holder pid {rec.get('pid')} last beat "
                        f"{int(now - last)}s ago (> {int(stale_lock_after)}s)",
                        fixable=True,
                    )
                )
        except _Released:
            pass  # cleanly released; sidecar is just history
        except (OSError, ValueError):
            out.append(Finding("stale_lock", lock, "unreadable heartbeat sidecar", True))

    # -- scratch debris (root level + per generation) --
    def scan_scratch(d: str, recurse_tmp: bool) -> None:
        try:
            names = os.listdir(d)
        except OSError:
            return
        for n in names:
            p = os.path.join(d, n)
            if n.endswith("_work") and os.path.isdir(p):
                out.append(Finding("stale_scratch", p, "crashed-build staging dir", True))
            elif ".tmp" in n and os.path.isfile(p):
                out.append(Finding("stale_scratch", p, "orphaned tmp file", True))
        if recurse_tmp:
            for dirpath, _dn, files in os.walk(d):
                for n in files:
                    if ".tmp" in n:
                        out.append(
                            Finding(
                                "stale_scratch", os.path.join(dirpath, n),
                                "orphaned tmp file", True,
                            )
                        )

    scan_scratch(root, recurse_tmp=False)

    # -- per (valid) index dir: fingerprints, orphan segments, verify --
    index_dirs = (
        [os.path.join(root, g) for g in valid_gens]
        if _is_root_of_generations(root)
        else ([root] if os.path.exists(os.path.join(root, MANIFEST_NAME)) else [])
    )
    for d in index_dirs:
        scan_scratch(d, recurse_tmp=True)
        try:
            m = load_manifest(d)
        except Exception:  # pragma: no cover — valid_gens filtered already
            continue
        referenced: set[str] = set()
        fp = m.metrics.get("fingerprint")
        for p in m.iter_partitions(d):
            referenced.add(os.path.normpath(os.path.join(d, p["path"])))
        # loose partition manifests with a FOREIGN fingerprint (resume debris)
        pdir = os.path.join(d, PARTITION_DIR)
        if os.path.isdir(pdir):
            for n in sorted(os.listdir(pdir)):
                if not (n.startswith("s") and n.endswith(".json")):
                    continue
                pp = os.path.join(pdir, n)
                try:
                    with open(pp) as f:
                        rec = json.load(f)
                except (OSError, ValueError):
                    out.append(Finding("stale_partition", pp, "unreadable partition manifest", True))
                    continue
                if fp and rec.get("fingerprint") not in (fp, None):
                    seg = os.path.normpath(os.path.join(d, rec.get("path", "")))
                    out.append(
                        Finding(
                            "stale_partition",
                            pp,
                            f"fingerprint {rec.get('fingerprint')!r} != build {fp!r}"
                            + (f" (segment {os.path.relpath(seg, d)})" if rec.get("path") else ""),
                            fixable=True,
                        )
                    )
                    referenced.discard(seg)  # its segment is debris too
        # orphan segment files
        segroot = os.path.join(d, SEGMENT_DIR)
        for dirpath, _dn, files in os.walk(segroot):
            for n in files:
                p = os.path.normpath(os.path.join(dirpath, n))
                if ".tmp" in n:
                    continue  # already reported as scratch
                if p not in referenced:
                    out.append(
                        Finding("orphan_segment", p, "segment referenced by no partition manifest", True)
                    )
        # integrity (shallow by default)
        from .verify import verify_index

        v = verify_index(d, deep=deep)
        if not v["valid"]:
            out.append(
                Finding(
                    "invalid_index",
                    d,
                    "; ".join(v["errors"][:3]) + ("; …" if len(v["errors"]) > 3 else ""),
                    fixable=False,
                )
            )
    return out


def repair(
    root: str,
    findings: list[Finding],
    *,
    prune_generations: bool = False,
) -> list[dict]:
    """Apply the safe fixes; returns [{kind, path, action}] for what was done.
    ``orphan_generation`` deletion is opt-in (``prune_generations``) — the
    reference's fixer also separates 'repair config' from 'delete data'."""
    actions: list[dict] = []

    def did(f: Finding, action: str) -> None:
        actions.append({"kind": f.kind, "path": f.path, "action": action})

    gens = _generations(root)
    valid_gens = [g for g in gens if _loadable(os.path.join(root, g))]
    for f in findings:
        if not f.fixable:
            continue
        if f.kind in ("dangling_current", "missing_current"):
            if not valid_gens:
                continue
            tmp = f.path + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(valid_gens[-1])
            os.replace(tmp, f.path)
            did(f, f"repointed to {valid_gens[-1]}")
        elif f.kind == "orphan_generation":
            if prune_generations and os.path.isdir(f.path):
                shutil.rmtree(f.path, ignore_errors=True)
                did(f, "deleted")
        elif f.kind == "stale_lock":
            for p in (f.path, f.path + ".json"):
                try:
                    os.unlink(p)
                except OSError:
                    pass
            did(f, "cleared")
        elif f.kind == "stale_scratch":
            if os.path.isdir(f.path):
                shutil.rmtree(f.path, ignore_errors=True)
            else:
                try:
                    os.unlink(f.path)
                except OSError:
                    pass
            did(f, "deleted")
        elif f.kind == "stale_partition":
            try:
                with open(f.path) as fh:
                    rec = json.load(fh)
                seg = rec.get("path")
            except (OSError, ValueError):
                seg = None
            try:
                os.unlink(f.path)
            except OSError:
                pass
            if seg:
                try:
                    os.unlink(os.path.join(os.path.dirname(os.path.dirname(f.path)), seg))
                except OSError:
                    pass
            did(f, "deleted manifest + segment")
        elif f.kind == "orphan_segment":
            try:
                os.unlink(f.path)
                did(f, "deleted")
            except OSError:
                pass
    return actions


def doctor(
    root: str,
    *,
    fix: bool = False,
    prune_generations: bool = False,
    deep: bool = False,
    stale_lock_after: float = 300.0,
) -> dict:
    """Diagnose (optionally repair, then re-diagnose).  ``healthy`` reflects
    the FINAL state; unfixed ``orphan_generation`` rows without
    ``prune_generations`` are reported but don't flip health (they are a
    retention choice, not damage)."""
    findings = diagnose(root, deep=deep, stale_lock_after=stale_lock_after)
    actions: list[dict] = []
    if fix and findings:
        actions = repair(root, findings, prune_generations=prune_generations)
        findings = diagnose(root, deep=deep, stale_lock_after=stale_lock_after)
    blocking = [
        f for f in findings
        if not (f.kind == "orphan_generation" and not prune_generations)
    ]
    return {
        "healthy": not blocking,
        "findings": [f.to_dict() for f in findings],
        "actions": actions,
    }
