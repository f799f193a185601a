"""Index validation engine + auto-recovery (`index/validation.py` —
reference server/validation/engine.py + auto_recovery.py): completeness /
quality / consistency over a real tree+index pair, recovery through the
sync tier."""

from __future__ import annotations

import os
import time

import pytest

from code_indexer_ray.index.validation import AutoRecoveryEngine, IndexValidationEngine
from code_indexer_ray.pipelines.tree import TreeConfig, ingest_tree


def _mk(root, rel, data=b"x = 1\n"):
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p, "wb" if isinstance(data, bytes) else "w") as f:
        f.write(data)
    return p


@pytest.fixture()
def world(ray_session, tmp_path):
    from code_indexer_ray.index.build import build_index

    root = str(tmp_path / "repo")
    for i in range(20):
        _mk(root, f"pkg{i % 2}/m{i}.py", f"def f{i}():\n    common()\n".encode())
    imap = str(tmp_path / "ids.parquet")
    corpus = str(tmp_path / "c0")
    cfg = TreeConfig()
    ingest_tree(root, corpus, config=cfg, id_map=imap)
    idx = str(tmp_path / "idx")
    build_index(corpus, idx, store_cols=("lang", "url", "sha"),
                num_shards=1, num_buckets=2, doc_id_upper=4096, resume=False)
    eng = IndexValidationEngine(root, idx, tree_config=cfg)
    return root, idx, imap, eng, tmp_path


@pytest.mark.usefixtures("ray_session")
class TestValidation:
    def test_clean_index_validates(self, world):
        _root, _idx, _imap, eng, _tmp = world
        rep = eng.validate_comprehensive()
        assert rep["valid"], rep
        assert rep["completeness"]["score"] == 1.0
        assert rep["quality"]["stats"]["mismatched"] == 0
        assert rep["recommendations"] == []

    def test_completeness_missing_orphaned_stale(self, world):
        root, _idx, _imap, eng, _tmp = world
        _mk(root, "pkg0/brand_new.py", b"fresh = 1\n")        # missing
        os.unlink(os.path.join(root, "pkg1/m1.py"))            # orphaned
        p = os.path.join(root, "pkg0/m0.py")                   # stale
        with open(p, "wb") as f:
            f.write(b"def f0():\n    changed()\n")
        future = time.time() + 60
        os.utime(p, (future, future))
        out = eng.validate_completeness()
        assert not out.valid
        kinds = {e["type"] for e in out.errors}
        assert kinds == {"missing_files", "stale_files"}
        assert out.warnings[0]["type"] == "orphaned_entries"
        assert out.stats["missing"] == 1 and out.stats["orphaned"] == 1
        assert out.stats["stale"] == 1
        assert out.score < 1.0

    def test_quality_detects_silent_divergence(self, world):
        root, _idx, _imap, eng, _tmp = world
        # rewrite a file but BACKDATE its mtime: completeness can't see it
        p = os.path.join(root, "pkg0/m2.py")
        with open(p, "wb") as f:
            f.write(b"def f2():\n    silently_changed()\n")
        past = time.time() - 10_000
        os.utime(p, (past, past))
        assert eng.validate_completeness().stats["stale"] == 0
        out = eng.validate_quality(sample=50)
        assert not out.valid
        assert out.errors[0]["type"] == "content_divergence"
        assert "pkg0/m2.py" in out.errors[0]["affected_files"]

    def test_consistency_delegates_to_verify(self, world):
        _root, idx, _imap, eng, _tmp = world
        assert eng.validate_consistency().valid
        # truncate a segment → invalid
        segs = []
        for r, _d, fs in os.walk(os.path.join(idx, "segments")):
            segs += [os.path.join(r, f) for f in fs]
        with open(sorted(segs)[0], "wb") as f:
            f.write(b"short")
        out = eng.validate_consistency()
        assert not out.valid and out.errors

    def test_auto_recovery_incremental_then_clean(self, world):
        root, idx, imap, eng, tmp = world
        # drift: modify 2, add 1, delete 1
        for i in (4, 6):
            p = os.path.join(root, f"pkg{i % 2}/m{i}.py")
            with open(p, "wb") as f:
                f.write(f"def f{i}():\n    recovered_term()\n".encode())
        _mk(root, "pkg0/added.py", b"def fresh():\n    recovered_term()\n")
        os.unlink(os.path.join(root, "pkg1/m3.py"))
        rec = AutoRecoveryEngine(eng, id_map=imap)
        rep = eng.validate_comprehensive()
        assert not rep["valid"]
        assert rec.decide_recovery_action(rep) == "sync"
        out_dir = str(tmp / "recovered")
        result = rec.execute_recovery(out_dir, report=rep)
        assert result["sync"]["executed"] == "incremental"
        # the RECOVERED index validates clean against the current tree
        eng2 = IndexValidationEngine(root, out_dir, tree_config=eng.tree_config)
        rep2 = eng2.validate_comprehensive()
        assert rep2["valid"], rep2
        from code_indexer_ray.query.engine import IndexSearcher

        hits = IndexSearcher(out_dir).search("recovered_term", snippet_lines=0)
        assert len(hits) == 3

    def test_no_action_when_valid(self, world):
        root, _idx, imap, eng, tmp = world
        rec = AutoRecoveryEngine(eng, id_map=imap)
        result = rec.execute_recovery(str(tmp / "noop_out"))
        assert result["action"] == "none"
