"""Index validation engine + auto-recovery — "is this index a faithful,
healthy view of that source tree, and if not, what fixes it?"

Reference ``server/validation/engine.py`` (``IndexValidationEngine``, Story
9: completeness = repository files vs indexed files with a completeness
score and an extra-entry penalty, quality = sampled content checks,
consistency = storage health, comprehensive = all three + recommendations)
and ``auto_recovery.py`` (``AutoRecoveryEngine``: decide full vs
incremental vs optimization recovery from the validation result, then
execute it).

Composed from this engine's own primitives:

- completeness: :func:`~..pipelines.tree.walk_tree` (the ingestion front
  door's exact filter semantics) vs the docstore's stored urls →
  ``missing`` (on disk, not indexed), ``orphaned`` (indexed, no longer on
  disk — the reference's "extra/stale entries"), ``stale`` (file mtime
  newer than the index build stamp);
  score = correctly_indexed / repository_files, penalized by orphans
  (the reference formula).
- quality: a deterministic sample of indexed documents re-read from disk —
  stored sha must equal the md5 of the current bytes (catches silent
  divergence the mtime check can't prove).
- consistency: :func:`~.verify.verify_index` (shallow) +
  :func:`~.doctor.diagnose` findings.
- recovery: the decision DELEGATES to the sync tier —
  ``ingest_tree(id_map=…)`` re-snapshots the checkout with STABLE ids and
  ``sync_repository`` runs its own rule engine (full rebuild vs
  incremental merge vs no-op), which is exactly the reference's
  full/incremental recovery pair.

Driver-side set comparison is deliberate: a SOURCE CHECKOUT is
files-on-one-machine scale (≤ millions), not the 10^12-doc corpus tier —
corpus-scale completeness runs through ``classify_changes`` instead.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

__all__ = [
    "ValidationResult",
    "IndexValidationEngine",
    "AutoRecoveryEngine",
]

SAMPLE_LIMIT = 10  # affected-file lists are capped for readability (reference)


@dataclass
class ValidationResult:
    valid: bool
    score: float
    errors: list[dict] = field(default_factory=list)
    warnings: list[dict] = field(default_factory=list)
    stats: dict = field(default_factory=dict)
    recommendations: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "valid": self.valid,
            "score": round(self.score, 4),
            "errors": self.errors,
            "warnings": self.warnings,
            "stats": self.stats,
            "recommendations": self.recommendations,
        }


class IndexValidationEngine:
    def __init__(
        self,
        tree_root: str,
        index_dir: str,
        *,
        tree_config=None,
        completeness_threshold: float = 0.95,
        url_col: str = "url",
    ):
        from ..pipelines.tree import TreeConfig

        self.tree_root = tree_root
        self.index_dir = index_dir
        self.tree_config = tree_config or TreeConfig()
        self.completeness_threshold = completeness_threshold
        self.url_col = url_col

    # -- data access --

    def _repository_files(self) -> dict[str, int]:
        """relative path → mtime_ms via the ingestion front door's walker."""
        from ..pipelines.tree import walk_tree

        return {
            m["path"]: m["mtime_ms"] for m in walk_tree(self.tree_root, self.tree_config)
        }

    def _indexed_urls(self) -> set[str]:
        import pyarrow.dataset as pads

        from ..index.manifest import DOCSTORE_DIR

        store = os.path.join(self.index_dir, DOCSTORE_DIR)
        ds = pads.dataset(store, format="parquet")
        return set(ds.to_table(columns=[self.url_col])[self.url_col].to_pylist())

    def _built_ms(self) -> int:
        from ..index.manifest import load_manifest

        m = load_manifest(self.index_dir)
        # updated_unix (merge/delta content stamp) wins over built_unix —
        # built_unix deliberately survives merges for the periodic-reindex
        # age rule, so it under-states content freshness on synced indexes
        stamp = m.metrics.get("updated_unix") or m.metrics.get("built_unix") or 0.0
        return int(float(stamp) * 1000)

    # -- validations --

    def validate_completeness(self) -> ValidationResult:
        repo = self._repository_files()
        indexed = self._indexed_urls()
        missing = sorted(set(repo) - indexed)
        orphaned = sorted(indexed - set(repo))
        built = self._built_ms()
        stale = sorted(
            p for p, mt in repo.items() if p in indexed and built and mt > built
        )
        correctly = len(repo) - len(missing)
        score = correctly / len(repo) if repo else 1.0
        if orphaned and repo:
            score = max(0.0, score - len(orphaned) / len(repo))  # extra-entry penalty
        errors, warnings = [], []
        if missing:
            errors.append(
                {
                    "type": "missing_files",
                    "message": f"{len(missing)} files missing from index",
                    "affected_files": missing[:SAMPLE_LIMIT],
                    "total": len(missing),
                }
            )
        if orphaned:
            warnings.append(
                {
                    "type": "orphaned_entries",
                    "message": f"{len(orphaned)} indexed files no longer on disk",
                    "affected_files": orphaned[:SAMPLE_LIMIT],
                    "total": len(orphaned),
                }
            )
        if stale:
            errors.append(
                {
                    "type": "stale_files",
                    "message": f"{len(stale)} files modified after the index build",
                    "affected_files": stale[:SAMPLE_LIMIT],
                    "total": len(stale),
                }
            )
        return ValidationResult(
            valid=score >= self.completeness_threshold and not stale,
            score=score,
            errors=errors,
            warnings=warnings,
            stats={
                "repository_files": len(repo),
                "indexed_files": len(indexed),
                "missing": len(missing),
                "orphaned": len(orphaned),
                "stale": len(stale),
            },
        )

    def validate_quality(self, sample: int = 25) -> ValidationResult:
        """Deterministic docstore sample re-read from disk: stored sha must
        equal the md5 of the CURRENT bytes (the content-level divergence an
        mtime check cannot prove either way)."""
        import pyarrow.dataset as pads

        from ..index.manifest import DOCSTORE_DIR

        store = os.path.join(self.index_dir, DOCSTORE_DIR)
        cols = [self.url_col, "sha"]
        schema_names = pads.dataset(store, format="parquet").schema.names
        if "sha" not in schema_names:
            return ValidationResult(
                valid=True, score=1.0,
                warnings=[{
                    "type": "no_sha_column",
                    "message": "docstore stores no sha column — content-level "
                    "quality check unavailable (ingest with the tree front "
                    "door to get one)",
                }],
                stats={"sampled": 0},
            )
        t = pads.dataset(store, format="parquet").to_table(columns=cols)
        n = t.num_rows
        step = max(1, n // sample)
        mismatched, checked = [], 0
        for i in range(0, n, step):
            url = t[self.url_col][i].as_py()
            sha = t["sha"][i].as_py()
            p = os.path.join(self.tree_root, url)
            if not os.path.exists(p):
                continue  # completeness owns missing/orphaned
            with open(p, "rb") as f:
                actual = hashlib.md5(f.read()).hexdigest()
            checked += 1
            if actual != sha:
                mismatched.append(url)
        score = 1.0 - (len(mismatched) / checked if checked else 0.0)
        errors = []
        if mismatched:
            errors.append(
                {
                    "type": "content_divergence",
                    "message": f"{len(mismatched)}/{checked} sampled files "
                    "diverge from their indexed content",
                    "affected_files": mismatched[:SAMPLE_LIMIT],
                    "total": len(mismatched),
                }
            )
        return ValidationResult(
            valid=not mismatched, score=score, errors=errors,
            stats={"sampled": checked, "mismatched": len(mismatched)},
        )

    def validate_consistency(self) -> ValidationResult:
        from ..index.doctor import diagnose
        from ..index.verify import verify_index

        v = verify_index(self.index_dir, deep=False)
        findings = [
            f.to_dict() for f in diagnose(self.index_dir)
            if f.kind != "orphan_generation"
        ]
        errors = [{"type": "verify", "message": e} for e in v["errors"]]
        errors += [
            {"type": f["kind"], "message": f["detail"], "path": f["path"]}
            for f in findings if f["kind"] == "invalid_index"
        ]
        warnings = [{"type": "verify", "message": w} for w in v["warnings"]]
        warnings += [
            {"type": f["kind"], "message": f["detail"], "path": f["path"]}
            for f in findings if f["kind"] != "invalid_index"
        ]
        return ValidationResult(
            valid=v["valid"] and not errors,
            score=1.0 if v["valid"] else 0.0,
            errors=errors,
            warnings=warnings,
            stats={"doctor_findings": len(findings)},
        )

    def validate_comprehensive(self) -> dict:
        comp = self.validate_completeness()
        qual = self.validate_quality()
        cons = self.validate_consistency()
        recs: list[str] = []
        if comp.stats.get("stale") or comp.stats.get("missing") or qual.errors:
            frac = (
                (comp.stats.get("missing", 0) + comp.stats.get("stale", 0))
                / max(comp.stats.get("repository_files", 1), 1)
            )
            recs.append(
                "full reindex recommended" if frac > 0.3
                else "incremental sync recommended"
            )
        if comp.stats.get("orphaned"):
            recs.append("sync will tombstone the orphaned entries")
        if not cons.valid:
            recs.append("storage damage: run doctor --fix, then rebuild if invalid")
        return {
            "valid": comp.valid and qual.valid and cons.valid,
            "completeness": comp.to_dict(),
            "quality": qual.to_dict(),
            "consistency": cons.to_dict(),
            "recommendations": recs,
        }


class AutoRecoveryEngine:
    """Decide + execute recovery (reference auto_recovery.py), delegating
    the actual rebuild choice to the sync tier's rule engine."""

    def __init__(self, engine: IndexValidationEngine, *, id_map: str | None = None):
        self.engine = engine
        # the STABLE-id sidecar makes re-ingest sync-mergeable; default next
        # to the index
        self.id_map = id_map or os.path.join(engine.index_dir + "_ids.parquet")

    def decide_recovery_action(self, report: dict) -> str:
        if report["valid"]:
            return "none"
        if not report["consistency"]["valid"]:
            return "repair_then_sync"
        return "sync"  # sync's own decision engine picks full vs incremental

    def execute_recovery(self, out_dir: str, *, report: dict | None = None) -> dict:
        report = report or self.engine.validate_comprehensive()
        action = self.decide_recovery_action(report)
        if action == "none":
            return {"action": action, "report": report}
        if action == "repair_then_sync":
            from ..index.doctor import doctor

            doctor(self.engine.index_dir, fix=True)
        from ..pipelines.sync import sync_repository
        from ..pipelines.tree import ingest_tree

        snapshot_dir = out_dir.rstrip("/") + "_snapshot"
        ingest_tree(
            self.engine.tree_root, snapshot_dir,
            config=self.engine.tree_config, id_map=self.id_map,
        )
        sync_report = sync_repository(self.engine.index_dir, snapshot_dir, out_dir)
        return {"action": action, "sync": sync_report, "report": report}
