"""API client tier (`query/client.py` — reference api_clients/ analog)
driven against a LIVE authed IndexHTTPServer: session login + sliding-token
follow + re-login-on-401, admin users/groups/keys, jobs trigger/wait."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.query.client import AdminClient, JobsClient, RemoteSession
from code_indexer_ray.query.remote import RemoteAuthError, RemoteQueryError

ADMIN_PW = "s3cret!pass"


@pytest.fixture(scope="module")
def live(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.auth import AuthTier
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("apiclient")
    rows = [
        {"doc_id": i, "text": f"spark merge doc{i}", "lang": "en", "url": f"u{i}"}
        for i in range(80)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2,
                num_buckets=2, resume=False)
    tier = AuthTier(str(tmp / "auth"), iterations=500, seed_admin=("admin", ADMIN_PW))
    srv = IndexHTTPServer(idx, port=0, auth=tier, enable_jobs=True, warm=False)
    srv.start()
    base = f"http://127.0.0.1:{srv.port}"
    yield base, tier, src, str(tmp)
    srv.shutdown()


def _session(base, **kw):
    kw.setdefault("username", "admin")
    kw.setdefault("password", ADMIN_PW)
    return RemoteSession(base, **kw)


class TestSession:
    def test_login_and_authed_request(self, live):
        base, *_ = live
        s = _session(base)
        out = s.request("GET", "/stats")
        assert out["num_docs"] == 80
        assert s._access  # lazy login happened

    def test_sliding_token_follow(self, live):
        base, *_ = live
        s = _session(base)
        s.request("GET", "/stats")
        tok1 = s._access
        s.request("GET", "/stats")
        # every authed response re-stamps (sliding sessions): adopt it
        assert s._access is not None and isinstance(s._access, str)
        assert tok1 is not None

    def test_relogin_once_on_revoked_token(self, live):
        base, *_ = live
        s = _session(base)
        s.request("GET", "/stats")
        s._access = "junk-token"  # simulate expiry/revocation
        out = s.request("GET", "/stats")  # must re-login once, not raise
        assert out["num_docs"] == 80

    def test_bad_password_raises(self, live):
        base, *_ = live
        s = RemoteSession(base, username="admin", password="wrong!1pw")
        with pytest.raises(RemoteAuthError):
            s.request("GET", "/stats")

    def test_api_key_mode_and_self_service_keys(self, live):
        base, *_ = live
        s = _session(base)
        made = s.create_key(name="ci")
        assert made["api_key"] and made["key_id"]
        ks = RemoteSession(base, api_key=made["api_key"])
        assert ks.request("GET", "/stats")["num_docs"] == 80
        assert any(k["key_id"] == made["key_id"] for k in s.my_keys())
        s.revoke_key(made["key_id"])
        with pytest.raises(RemoteAuthError):
            ks.request("GET", "/stats")

    def test_requires_credentials(self, live):
        base, *_ = live
        with pytest.raises(ValueError):
            RemoteSession(base)


class TestAdmin:
    def test_user_lifecycle(self, live):
        base, *_ = live
        a = AdminClient(_session(base))
        u = a.create_user("carol", "an0ther!pass", "normal_user")
        assert u["username"] == "carol"
        assert any(x["username"] == "carol" for x in a.users())
        assert a.set_role("carol", "power_user")["role"] == "power_user"
        # carol can log in and query, but admin routes 403
        cs = RemoteSession(base, username="carol", password="an0ther!pass")
        assert cs.request("GET", "/stats")["num_docs"] == 80
        with pytest.raises(RemoteQueryError) as ei:
            AdminClient(cs).users()
        assert ei.value.status == 403
        a.delete_user("carol")
        assert not any(x["username"] == "carol" for x in a.users())

    def test_group_lifecycle_and_domain_409(self, live):
        base, *_ = live
        a = AdminClient(_session(base))
        g = a.create_group("team-q", "q team")
        assert any(x["name"] == "team-q" for x in a.groups())
        a.update_group(g["id"], "renamed")
        a.create_user("dave", "yet!another1pw", "normal_user")
        a.assign_user("dave", g["id"])
        assert a.grant_repo("alpha", g["id"])["message"] == "granted"
        assert a.revoke_repo("alpha", g["id"])["message"] == "revoked"
        # populated group refuses deletion -> 409 surfaced as RemoteQueryError
        with pytest.raises(RemoteQueryError) as ei:
            a.delete_group(g["id"])
        assert ei.value.status == 409
        a.delete_user("dave")

    def test_admin_keys_for_user(self, live):
        base, *_ = live
        a = AdminClient(_session(base))
        a.create_user("erin", "pass!word1x", "normal_user")
        made = a.create_key("erin", name="erin-ci")
        assert RemoteSession(base, api_key=made["api_key"]).request("GET", "/stats")
        assert any(k["key_id"] == made["key_id"] for k in a.keys("erin"))
        a.revoke_key("erin", made["key_id"])
        assert not any(k["key_id"] == made["key_id"] for k in a.keys("erin"))
        a.delete_user("erin")


class TestJobs:
    def test_build_job_end_to_end(self, live):
        base, tier, src, tmp = live
        j = JobsClient(_session(base))
        with pytest.raises(RemoteQueryError):  # unknown id -> 404
            j.get("nope")
        jid = j.trigger_index(input=src, num_shards=2, num_buckets=2)
        done = j.wait(jid, timeout=120)
        assert done["state"] == "completed"
        assert any(row["job_id"] == jid for row in j.list())


def test_cancel_unknown_raises(live):
    base, *_ = live
    j = JobsClient(_session(base))
    with pytest.raises(RemoteQueryError):
        j.cancel("nonexistent")
