"""Multi-repo SCIP fan-out (`scip/multi.py` — reference
server/multi/scip_multi_service.py): parallel queries with repository
attribution, skipped-repo handling, per-repo error isolation, timeouts."""

from __future__ import annotations

import os
import threading

import pyarrow as pa
import pytest

from code_indexer_ray.scip.multi import SCIPMultiService


def _mk_store(ray_session, root: str, docs: list[str]) -> str:
    import ray.data as rd

    from code_indexer_ray.scip.store import build_symbol_store

    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    build_symbol_store(rd.from_arrow(tbl), root, num_parts=2,
                       extractor="python_ast")
    return root


SRC_A = "def alpha():\n    beta()\ndef beta():\n    gamma()\ndef gamma():\n    pass\n"
SRC_B = "def beta():\n    delta()\ndef delta():\n    pass\n"


@pytest.fixture(scope="module")
def multi(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scipmulti")
    a = _mk_store(ray_session, str(tmp / "a"), [SRC_A] * 3)
    b = _mk_store(ray_session, str(tmp / "b"), [SRC_B] * 2)
    stores = {"repo-a": a, "repo-b": b, "repo-empty": str(tmp / "nope")}
    svc = SCIPMultiService(stores, max_workers=4)
    yield svc, stores
    svc.close()


@pytest.mark.usefixtures("ray_session")
class TestMultiSCIP:
    def test_definitions_attributed(self, multi):
        svc, _ = multi
        out = svc.definition(["repo-a", "repo-b"], "beta")
        assert set(out["results"]) == {"repo-a", "repo-b"}
        assert len(out["results"]["repo-a"]) == 3  # one def per doc
        assert len(out["results"]["repo-b"]) == 2
        md = out["metadata"]
        assert md["total_results"] == 5
        assert md["repos_searched"] == 2 and md["repos_with_results"] == 2
        assert out["errors"] is None

    def test_missing_store_skipped(self, multi):
        svc, _ = multi
        out = svc.definition(["repo-a", "repo-empty"], "alpha")
        assert out["skipped"] == {"repo-empty": "No SCIP index available"}
        assert "repo-a" in out["results"]

    def test_references_with_context(self, multi):
        svc, _ = multi
        out = svc.references(["repo-a"], "beta")
        rows = out["results"]["repo-a"]
        assert rows and all(r["kind"] == "reference" for r in rows)
        assert {r["context"] for r in rows} == {"alpha"}

    def test_dependencies_and_dependents(self, multi):
        svc, _ = multi
        out = svc.dependencies(["repo-a", "repo-b"], "beta")
        assert {r["symbol"] for r in out["results"]["repo-a"]} == {"gamma"}
        assert {r["symbol"] for r in out["results"]["repo-b"]} == {"delta"}
        out2 = svc.dependents(["repo-a", "repo-b"], "beta")
        assert {r["symbol"] for r in out2["results"]["repo-a"]} == {"alpha"}
        assert out2["results"]["repo-b"] == []
        # transitive variant
        out3 = svc.dependencies(["repo-a"], "alpha", max_depth=3)
        assert {r["symbol"] for r in out3["results"]["repo-a"]} == {"beta", "gamma"}

    def test_callchain(self, multi):
        svc, _ = multi
        out = svc.callchain(["repo-a"], "alpha", "gamma", max_depth=3)
        assert out["results"]["repo-a"][0]["symbol"] == "alpha -> beta -> gamma"

    def test_error_isolation(self, multi, tmp_path):
        svc, stores = multi
        # a corrupt store: manifest exists but parts are garbage
        bad = str(tmp_path / "bad")
        os.makedirs(bad)
        with open(os.path.join(bad, "manifest.json"), "w") as f:
            f.write("{not json")
        svc2 = SCIPMultiService({**{k: v for k, v in stores.items()}, "repo-bad": bad})
        try:
            out = svc2.definition(["repo-a", "repo-bad"], "alpha")
            assert "repo-a" in out["results"]
            assert out["errors"] and "repo-bad" in out["errors"]
        finally:
            svc2.close()

    def test_timeout_marks_not_done(self, multi):
        svc, stores = multi

        gate = threading.Event()

        def slow_resolver(rid):
            if rid == "repo-slow":
                gate.wait(10)  # wedged repo
            return stores.get(rid)

        svc2 = SCIPMultiService(slow_resolver, max_workers=4)
        try:
            out = svc2.definition(
                ["repo-a", "repo-slow"], "alpha", timeout_seconds=0.8
            )
            assert "repo-a" in out["results"]
            assert "timed out" in out["errors"]["repo-slow"]
        finally:
            gate.set()
            svc2.close()

    def test_empty_repo_list_rejected(self, multi):
        svc, _ = multi
        with pytest.raises(ValueError, match="at least one"):
            svc.definition([], "x")
