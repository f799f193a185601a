"""Group-based access control (`server/groups.py` — reference
group_access_manager.py + access_filtering_service.py, Stories #707/#708/
#710): default-group bootstrap, 1:1 membership, repo grants, invisible-repo
filtering, SSO provisioning hook."""

from __future__ import annotations

import pytest

from code_indexer_ray.server.groups import (
    CIDX_META_REPO,
    AccessFilteringService,
    CidxMetaCannotBeRevokedError,
    DefaultGroupCannotBeDeletedError,
    GroupAccessManager,
    GroupHasUsersError,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


@pytest.fixture()
def gm(tmp_path):
    return GroupAccessManager(str(tmp_path / "groups.sqlite"), now_fn=FakeClock())


class TestGroups:
    def test_default_groups_bootstrapped_idempotently(self, gm, tmp_path):
        names = [g.name for g in gm.get_all_groups()]
        assert names == ["admins", "powerusers", "users"]
        assert all(g.is_default for g in gm.get_all_groups())
        # re-open: no duplicates
        gm2 = GroupAccessManager(str(tmp_path / "groups.sqlite"))
        assert len(gm2.get_all_groups()) == 3

    def test_create_update_delete(self, gm):
        g = gm.create_group("team-x", "x team")
        assert gm.get_group_by_name("team-x").id == g.id
        assert gm.update_group(g.id, description="renamed") is True
        assert gm.get_group(g.id).description == "renamed"
        with pytest.raises(ValueError, match="already exists"):
            gm.create_group("team-x", "dupe")
        assert gm.delete_group(g.id) is True
        assert gm.get_group(g.id) is None
        assert gm.delete_group(9999) is False

    def test_default_group_protected(self, gm):
        admins = gm.get_group_by_name("admins")
        with pytest.raises(DefaultGroupCannotBeDeletedError):
            gm.delete_group(admins.id)

    def test_delete_refused_with_users(self, gm):
        g = gm.create_group("t", "t")
        gm.assign_user_to_group("ada", g.id, "admin")
        with pytest.raises(GroupHasUsersError):
            gm.delete_group(g.id)

    def test_membership_one_to_one(self, gm):
        users = gm.get_group_by_name("users")
        power = gm.get_group_by_name("powerusers")
        gm.assign_user_to_group("ada", users.id, "admin")
        assert gm.get_user_group("ada").name == "users"
        # reassignment REPLACES (1:1)
        gm.assign_user_to_group("ada", power.id, "admin")
        assert gm.get_user_group("ada").name == "powerusers"
        assert gm.get_users_in_group(users.id) == []
        m = gm.get_user_membership("ada")
        assert m.assigned_by == "admin"
        with pytest.raises(KeyError):
            gm.assign_user_to_group("x", 9999, "admin")
        rows, total = gm.get_all_users_with_groups()
        assert total == 1 and rows[0]["group_name"] == "powerusers"

    def test_repo_grants_and_meta_protection(self, gm):
        power = gm.get_group_by_name("powerusers")
        assert gm.grant_repo_access("web-global", power.id, "admin") is True
        assert gm.grant_repo_access("web-global", power.id, "admin") is False  # dup
        assert gm.get_group_repos(power.id) == ["web-global"]
        assert [g.name for g in gm.get_repo_groups("web-global")] == ["powerusers"]
        assert gm.revoke_repo_access("web-global", power.id) is True
        with pytest.raises(CidxMetaCannotBeRevokedError):
            gm.revoke_repo_access(CIDX_META_REPO, power.id)

    def test_auto_assign_golden_repo(self, gm):
        gm.auto_assign_golden_repo("fresh-global")
        names = {g.name for g in gm.get_repo_groups("fresh-global")}
        assert names == {"admins", "powerusers"}  # never 'users'
        m = gm.get_repo_groups("fresh-global")
        assert all(
            gm.get_group_repos(g.id) == ["fresh-global"] for g in m
        )


class TestAccessFiltering:
    @pytest.fixture()
    def svc(self, gm):
        users = gm.get_group_by_name("users")
        power = gm.get_group_by_name("powerusers")
        admins = gm.get_group_by_name("admins")
        gm.assign_user_to_group("norma", users.id, "admin")
        gm.assign_user_to_group("paula", power.id, "admin")
        gm.assign_user_to_group("root", admins.id, "admin")
        gm.grant_repo_access("alpha-global", power.id, "admin")
        gm.grant_repo_access("beta-global", power.id, "admin")
        return AccessFilteringService(gm), gm

    def test_accessible_sets(self, svc):
        s, gm = svc
        assert s.get_accessible_repos("norma") == {CIDX_META_REPO}
        assert s.get_accessible_repos("paula") == {
            CIDX_META_REPO, "alpha-global", "beta-global",
        }
        # admin sees every granted repo regardless of group
        assert s.get_accessible_repos("root") >= {"alpha-global", "beta-global"}
        # unassigned user: meta only
        assert s.get_accessible_repos("ghost") == {CIDX_META_REPO}
        assert s.is_admin_user("root") and not s.is_admin_user("paula")

    def test_invisible_repo_filtering(self, svc):
        s, _ = svc
        hits = [
            {"repository_alias": "alpha-global", "score": 1.0},
            {"repository_alias": "secret-global", "score": 0.9},
            {"repository_alias": CIDX_META_REPO, "score": 0.8},
        ]
        out = s.filter_query_results(hits, "paula")
        assert [h["repository_alias"] for h in out] == ["alpha-global", CIDX_META_REPO]
        # no 403-shaped artifacts: the secret repo simply isn't there
        assert all("secret" not in h["repository_alias"] for h in out)
        # admins: untouched
        assert s.filter_query_results(hits, "root") == hits
        # listing
        repos = ["alpha-global", "secret-global", CIDX_META_REPO]
        assert s.filter_repo_listing(repos, "norma") == [CIDX_META_REPO]
        assert s.filter_repo_listing(repos, "paula") == ["alpha-global", CIDX_META_REPO]

    def test_membership_read_fresh(self, svc):
        s, gm = svc
        assert s.get_accessible_repos("norma") == {CIDX_META_REPO}
        power = gm.get_group_by_name("powerusers")
        gm.assign_user_to_group("norma", power.id, "admin")
        # no caching: next call reflects the change immediately
        assert "alpha-global" in s.get_accessible_repos("norma")


class TestSSOProvisioningHook:
    def test_new_sso_user_lands_in_users_existing_untouched(self, gm):
        gm.ensure_sso_membership("fresh")
        assert gm.get_user_group("fresh").name == "users"
        power = gm.get_group_by_name("powerusers")
        gm.assign_user_to_group("vet", power.id, "admin")
        gm.ensure_sso_membership("vet")  # AC3: unchanged
        assert gm.get_user_group("vet").name == "powerusers"

    def test_oidc_wiring(self, tmp_path):
        from code_indexer_ray.server.auth import UserManager
        from code_indexer_ray.server.oidc import OIDCConfig, OIDCManager, UserInfo

        users = UserManager(str(tmp_path), iterations=500)
        cfg = OIDCConfig(issuer_url="http://u", client_id="c", client_secret="s")
        m = OIDCManager(cfg, users, str(tmp_path / "o.sqlite"))
        m.group_manager = GroupAccessManager(str(tmp_path / "g.sqlite"))
        user = m.match_or_create_user(
            UserInfo(subject="s1", email="a@x.org", email_verified=True,
                     username="sso_ada")
        )
        assert m.group_manager.get_user_group(user.username).name == "users"

        # AC6: a broken group manager never blocks authentication
        class Boom:
            def ensure_sso_membership(self, u):
                raise RuntimeError("db down")

        m.group_manager = Boom()
        again = m.match_or_create_user(
            UserInfo(subject="s1", email="a@x.org", email_verified=True)
        )
        assert again.username == "sso_ada"


class TestOmniAccessIntegration:
    def test_omni_fanout_respects_groups(self, gm, tmp_path):
        """Invisible-repo at the omni tier: a pattern matching everything
        fans out only over the caller's accessible aliases."""
        from code_indexer_ray.query.omni import OmniSearchService

        users = gm.get_group_by_name("users")
        power = gm.get_group_by_name("powerusers")
        gm.assign_user_to_group("norma", users.id, "admin")
        gm.assign_user_to_group("paula", power.id, "admin")
        gm.grant_repo_access("alpha-global", power.id, "admin")

        class FakeRegistry:
            def list_repos(self):
                return [{"alias_name": a} for a in
                        ("alpha-global", "secret-global", CIDX_META_REPO)]

            def search(self, alias, q, params):
                return [{"repository_alias": alias, "doc_id": 1, "score": 1.0,
                         "path": "f", "language": "en", "line": 1, "column": 1}]

        svc = OmniSearchService(
            FakeRegistry(), access_filter=AccessFilteringService(gm)
        )
        out = svc.search(["*"], "q", user_id="paula")
        repos = {r["repository_alias"] for r in out["results"]}
        assert repos == {"alpha-global", CIDX_META_REPO}
        # norma: meta only; secret never appears, no error artifacts
        out2 = svc.search(["*"], "q", user_id="norma")
        assert {r["repository_alias"] for r in out2["results"]} == {CIDX_META_REPO}
        assert out2["errors"] == {}
        # without a user_id the filter is inert (internal/admin callers)
        out3 = svc.search(["*"], "q")
        assert {r["repository_alias"] for r in out3["results"]} == {
            "alpha-global", "secret-global", CIDX_META_REPO,
        }


import json as _json
import urllib.error as _uerr
import urllib.request as _ureq

import numpy as _np
import pyarrow as _pa
import pyarrow.parquet as _pq


def _req(method, url, payload=None, token=None):
    data = _json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"} if data else {}
    if token:
        headers["Authorization"] = "Bearer " + token
    req = _ureq.Request(url, data=data, headers=headers, method=method)
    try:
        with _ureq.urlopen(req, timeout=30) as r:
            return r.status, _json.loads(r.read())
    except _uerr.HTTPError as e:
        return e.code, _json.loads(e.read())


@pytest.mark.usefixtures("ray_session")
class TestHTTPGroupRoutes:
    @pytest.fixture(scope="class")
    def srv(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.auth import AuthTier
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("grpsrv")
        rows = [{"doc_id": 0, "text": "x", "lang": "en", "url": "f.py"}]
        src = str(tmp / "c.parquet")
        _pq.write_table(_pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        tier = AuthTier(str(tmp / "auth"), iterations=500,
                        seed_admin=("admin", "Str0ng!pass"))
        tier.users.create_user("norma", "Str0ng!pass", "normal_user")
        s = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
        s.start()
        yield f"http://{s.host}:{s.port}", tier
        s.shutdown()

    def _tok(self, base, u="admin"):
        code, body = _req("POST", base + "/auth/login",
                          {"username": u, "password": "Str0ng!pass"})
        assert code == 200
        return body["access_token"]

    def test_crud_membership_grants(self, srv):
        base, tier = srv
        tok = self._tok(base)
        code, body = _req("GET", base + "/api/admin/groups", token=tok)
        assert code == 200
        assert [g["name"] for g in body["groups"]] == ["admins", "powerusers", "users"]
        code, body = _req("POST", base + "/api/admin/groups",
                          {"name": "team-q", "description": "q"}, token=tok)
        assert code == 200
        gid = body["group"]["id"]
        code, _ = _req("POST", base + f"/api/admin/groups/{gid}/members",
                       {"username": "norma"}, token=tok)
        assert code == 200
        assert tier.groups.get_user_group("norma").name == "team-q"
        code, _ = _req("POST", base + f"/api/admin/groups/{gid}/repos",
                       {"repo": "alpha-global"}, token=tok)
        assert code == 200
        assert tier.groups.get_group_repos(gid) == ["alpha-global"]
        code, _ = _req("DELETE", base + f"/api/admin/groups/{gid}/repos/alpha-global",
                       token=tok)
        assert code == 200
        # delete refused while populated → 409
        code, err = _req("DELETE", base + f"/api/admin/groups/{gid}", token=tok)
        assert code == 409 and "assigned user" in err["error"]
        # default group delete → 409
        admins_id = tier.groups.get_group_by_name("admins").id
        code, err = _req("DELETE", base + f"/api/admin/groups/{admins_id}", token=tok)
        assert code == 409

    def test_non_admin_403(self, srv):
        base, _ = srv
        tok = self._tok(base, "norma")
        assert _req("GET", base + "/api/admin/groups", token=tok)[0] == 403
