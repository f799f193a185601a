"""Per-user activated repositories (`server/activated.py` — reference
server/repositories/activated_repo_manager.py): lifecycle, branch switch
via J4 visibility, sync-with-golden audit trail, branch-scoped search."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.activated import ActivatedRepoError, ActivatedRepoManager


@pytest.fixture(scope="module")
def world(ray_session, tmp_path_factory):
    """A registry with one golden repo whose index has a feature branch
    hiding doc 0 (visibility op log)."""
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.index.visibility import hide_docs
    from code_indexer_ray.repos import GlobalRegistry

    tmp = tmp_path_factory.mktemp("act")
    rows = [
        {"doc_id": i, "text": "spark merge common", "lang": "en", "url": f"f{i}.py"}
        for i in range(12)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1,
                num_buckets=2, resume=False)
    hide_docs(idx, "feature-x", [0, 1])
    reg = GlobalRegistry(str(tmp / "reg"))
    reg.register("web", "web-global", idx)
    mgr = ActivatedRepoManager(str(tmp / "srv"), reg)
    return mgr, reg, idx


@pytest.mark.usefixtures("ray_session")
class TestActivation:
    def test_activate_list_deactivate(self, world):
        mgr, reg, idx = world
        rec = mgr.activate_repository("ada", "web-global", user_alias="web")
        assert rec["current_branch"] == "main"
        assert [r["user_alias"] for r in mgr.list_activated_repositories("ada")] == ["web"]
        # duplicate refused
        with pytest.raises(ActivatedRepoError, match="already has"):
            mgr.activate_repository("ada", "web-global", user_alias="web")
        # unknown golden refused (registry raises)
        with pytest.raises(Exception):
            mgr.activate_repository("ada", "ghost-global")
        # other users see their own activations only
        assert mgr.list_activated_repositories("eve") == []
        mgr.activate_repository("eve", "web-global", user_alias="mine")
        assert len(mgr.list_all_activated_repositories()) == 2
        assert len(mgr.find_repos_by_golden_alias("web-global")) == 2
        assert "deactivated" in mgr.deactivate_repository("eve", "mine")
        with pytest.raises(ActivatedRepoError, match="no activated"):
            mgr.deactivate_repository("eve", "mine")

    def test_unknown_branch_refused_create_allows(self, world):
        mgr, _reg, _idx = world
        with pytest.raises(ActivatedRepoError, match="does not exist"):
            mgr.activate_repository("bob", "web-global", branch="nope")
        mgr.activate_repository("bob", "web-global", branch="feature-x")
        assert mgr.get_current_branch("bob", "web-global") == "feature-x"
        with pytest.raises(ActivatedRepoError, match="does not exist"):
            mgr.switch_branch("bob", "web-global", "brand-new")
        rec = mgr.switch_branch("bob", "web-global", "brand-new", create=True)
        assert rec["current_branch"] == "brand-new"

    def test_branch_scoped_search(self, world):
        mgr, _reg, _idx = world
        mgr.activate_repository("carol", "web-global", branch="main")
        on_main = mgr.search("carol", "web-global", "common", {"limit": 50})
        assert {h["doc_id"] for h in on_main} == set(range(12))
        mgr.switch_branch("carol", "web-global", "feature-x")
        on_feat = mgr.search("carol", "web-global", "common", {"limit": 50})
        # docs 0,1 hidden on feature-x — invisible to carol, nobody else
        assert {h["doc_id"] for h in on_feat} == set(range(2, 12))
        # ad-hoc override peeks at another branch without switching
        peek = mgr.search("carol", "web-global", "common",
                          {"limit": 50, "branch": "main"})
        assert {h["doc_id"] for h in peek} == set(range(12))
        assert mgr.get_current_branch("carol", "web-global") == "feature-x"

    def test_sync_with_golden_tracks_refresh(self, world, tmp_path):
        from code_indexer_ray.index.build import build_index

        mgr, reg, idx = world
        mgr.activate_repository("dave", "web-global")
        first = mgr.sync_with_golden_repository("dave", "web-global")
        assert first["changed"] is False  # pointer unmoved since activation

        def build_fn(out_dir):
            rows = [{"doc_id": i, "text": "fresh corpus", "lang": "en",
                     "url": f"g{i}.py"} for i in range(5)]
            src = str(tmp_path / "c2.parquet")
            pq.write_table(pa.Table.from_pylist(rows), src)
            build_index(src, out_dir, store_cols=("lang", "url"), num_shards=1,
                        num_buckets=2, resume=False)

        reg.refresh("web-global", build_fn)
        out = mgr.sync_with_golden_repository("dave", "web-global")
        assert out["changed"] is True
        hits = mgr.search("dave", "web-global", "fresh", {"limit": 10})
        assert len(hits) == 5

    def test_invalid_names(self, world):
        mgr, _reg, _idx = world
        with pytest.raises(ActivatedRepoError, match="invalid"):
            mgr.activate_repository("../evil", "web-global")
        with pytest.raises(ActivatedRepoError, match="invalid"):
            mgr.activate_repository("ok", "web-global", user_alias="a/b")
