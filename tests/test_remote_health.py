"""Tiered remote health check (`query/remote.py::check_remote_health` —
reference remote/health_checker.py RealServerHealthChecker): each tier
probed against REAL servers in every reachable/auth/repo-access state."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.query.remote import check_remote_health, init_remote

GOOD_PW = "Str0ng!pass"


def _index(tmp_path, n=30):
    from code_indexer_ray.index.build import build_index

    rng = np.random.default_rng(23)
    vocab = ["spark", "merge", "window", "alpha"]
    rows = [
        {"doc_id": i, "text": " ".join(vocab[j] for j in rng.integers(0, 4, 10)),
         "lang": "en", "url": f"r{i}.py"}
        for i in range(n)
    ]
    src = str(tmp_path / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    return idx


@pytest.mark.usefixtures("ray_session")
class TestRemoteHealth:
    def test_healthy(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        srv = IndexHTTPServer(_index(tmp_path), port=0, warm=False)
        srv.start()
        try:
            root = str(tmp_path / "proj"); os.makedirs(root)
            init_remote(root, f"http://{srv.host}:{srv.port}")
            res = check_remote_health(root)
            assert res["connection_health"] == "healthy"
            assert res["server_reachable"] and res["authentication_valid"]
            assert res["repository_accessible"]
            assert res["server_info"]["num_docs"] == 30  # /health + /stats merged
            assert res["error_details"] is None
        finally:
            srv.shutdown()

    def test_server_unreachable(self, tmp_path):
        root = str(tmp_path);
        init_remote(root, "http://127.0.0.1:1")  # reserved port: refused
        res = check_remote_health(root, timeout=2)
        assert res["connection_health"] == "server_unreachable"
        assert res["server_reachable"] is False
        assert "connectivity" in res["error_details"]

    def test_configuration_invalid(self, tmp_path):
        res = check_remote_health(str(tmp_path))
        assert res["connection_health"] == "configuration_invalid"

    def test_authentication_failed(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        srv = IndexHTTPServer(
            _index(tmp_path), port=0, warm=False, api_key="sekrit"
        )
        srv.start()
        try:
            root = str(tmp_path / "proj"); os.makedirs(root)
            init_remote(root, f"http://{srv.host}:{srv.port}", api_key="wrong")
            res = check_remote_health(root)
            assert res["connection_health"] == "authentication_failed"
            assert res["server_reachable"] is True
            assert res["authentication_valid"] is False
            # right key: healthy
            init_remote(root, f"http://{srv.host}:{srv.port}",
                        api_key="sekrit", force=True)
            assert check_remote_health(root)["connection_health"] == "healthy"
        finally:
            srv.shutdown()

    def test_repository_not_accessible(self, ray_session, tmp_path):
        """Authenticated issued key whose user's group lacks the repo grant:
        tier 3 classifies the 403 as repository_not_accessible."""
        from code_indexer_ray.server.auth import AuthTier
        from code_indexer_ray.server.http import IndexHTTPServer

        idx = _index(tmp_path)
        tier = AuthTier(str(tmp_path / "auth"), iterations=500,
                        seed_admin=("admin", GOOD_PW))
        tier.users.create_user("bob", GOOD_PW, "normal_user")
        users_group = tier.groups.get_group_by_name("users")
        tier.groups.assign_user_to_group("bob", users_group.id, "admin")
        raw, _kid = tier.api_keys.generate_key("bob")
        srv = IndexHTTPServer(
            idx, port=0, warm=False, auth=tier, repo_name="locked-global"
        )
        srv.start()
        try:
            root = str(tmp_path / "proj"); os.makedirs(root)
            init_remote(root, f"http://{srv.host}:{srv.port}", api_key=raw)
            res = check_remote_health(root)
            assert res["connection_health"] == "repository_not_accessible"
            assert res["authentication_valid"] is True
            assert res["repository_accessible"] is False
            # grant the repo: healthy
            power = tier.groups.get_group_by_name("powerusers")
            tier.groups.assign_user_to_group("bob", power.id, "admin")
            tier.groups.grant_repo_access("locked-global", power.id, "admin")
            assert check_remote_health(root)["connection_health"] == "healthy"
        finally:
            srv.shutdown()

    def test_degraded_no_generation(self, ray_session, tmp_path):
        from code_indexer_ray.server.http import IndexHTTPServer

        root_idx = str(tmp_path / "empty"); os.makedirs(root_idx)
        srv = IndexHTTPServer(root_idx, port=0, warm=False, enable_jobs=True)
        srv.start()
        try:
            root = str(tmp_path / "proj"); os.makedirs(root)
            init_remote(root, f"http://{srv.host}:{srv.port}")
            res = check_remote_health(root)
            assert res["connection_health"] == "degraded"
            assert res["server_reachable"] is True
        finally:
            srv.shutdown()
