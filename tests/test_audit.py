"""Security audit trail (`server/audit.py` — reference
server/auth/audit_logger.py): event contract, file hygiene, and the live
HTTP hook points (login failure, rate limit, password change, refresh
replay incident, OAuth events)."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.audit import AuditLogger
from code_indexer_ray.server.auth import AuthTier

GOOD_PW = "Str0ng!pass"


class TestAuditLogger:
    def test_line_contract_and_filters(self, tmp_path):
        clock = lambda: 1_700_000_000.0  # noqa: E731
        a = AuditLogger(str(tmp_path / "audit.log"), now_fn=clock)
        a.log_password_change_success("ada", "10.0.0.1", user_agent="curl")
        a.log_password_change_failure("ada", "10.0.0.1", "wrong password")
        a.log_authentication_failure("eve", "invalid_credentials", "nope")
        raw = open(str(tmp_path / "audit.log")).read().splitlines()
        assert raw[0].startswith("PASSWORD_CHANGE_SUCCESS: {")
        entry = json.loads(raw[0].partition(": ")[2])
        assert entry["username"] == "ada" and entry["ip_address"] == "10.0.0.1"
        assert entry["timestamp"].startswith("2023-11-")
        # filters
        assert len(a.read_events(username="ada")) == 2
        assert a.read_events(event_type="authentication_failure")[0]["username"] == "eve"
        assert len(a.read_events(limit=1)) == 1

    def test_file_mode_0600(self, tmp_path):
        a = AuditLogger(str(tmp_path / "audit.log"))
        a.log_security_incident("x", "token_replay_attack", "1.2.3.4")
        assert oct(os.stat(str(tmp_path / "audit.log")).st_mode & 0o777) == "0o600"

    def test_empty_read(self, tmp_path):
        a = AuditLogger(str(tmp_path / "none.log"))
        assert a.read_events() == []


def _req(method, url, payload=None, token=None):
    data = json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"} if data else {}
    if token:
        headers["Authorization"] = "Bearer " + token
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def audit_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("auditsrv")
    rows = [{"doc_id": i, "text": "spark", "lang": "en", "url": f"f{i}.py"}
            for i in range(20)]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    tier = AuthTier(str(tmp / "auth"), iterations=500, seed_admin=("admin", GOOD_PW))
    srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
    srv.start()
    yield f"http://{srv.host}:{srv.port}", tier
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestHTTPAuditHooks:
    def _login(self, base, u, p):
        return _req("POST", base + "/auth/login", {"username": u, "password": p})

    def test_login_failure_logged(self, audit_srv):
        base, tier = audit_srv
        code, _ = self._login(base, "admin", "Wrong1!pass")
        assert code == 401
        ev = tier.audit.read_events(event_type="authentication_failure")
        assert ev and ev[-1]["username"] == "admin"
        assert ev[-1]["additional_context"]["ip_address"] != ""

    def test_password_change_success_and_failure_logged(self, audit_srv):
        base, tier = audit_srv
        tok = self._login(base, "admin", GOOD_PW)[1]["access_token"]
        code, _ = _req("POST", base + "/api/users/change-password",
                       {"old_password": "Wrong1!pass", "new_password": "N3w!passw"},
                       token=tok)
        assert code == 401
        assert tier.audit.read_events(event_type="password_change_failure")
        code, _ = _req("POST", base + "/api/users/change-password",
                       {"old_password": GOOD_PW, "new_password": "N3w!passw"},
                       token=tok)
        assert code == 200
        ok = tier.audit.read_events(event_type="password_change_success")
        assert ok and ok[-1]["username"] == "admin"
        # restore for other tests
        tier.users.set_password("admin", GOOD_PW)

    def test_refresh_success_and_replay_incident_logged(self, audit_srv):
        base, tier = audit_srv
        pair = self._login(base, "admin", GOOD_PW)[1]
        code, new = _req("POST", base + "/auth/refresh",
                         {"refresh_token": pair["refresh_token"]})
        assert code == 200
        assert tier.audit.read_events(event_type="token_refresh_success")
        # replay the ROTATED token → family revoked → security incident
        code, _ = _req("POST", base + "/auth/refresh",
                       {"refresh_token": pair["refresh_token"]})
        assert code == 401
        inc = tier.audit.read_events(event_type="security_incident")
        assert inc and inc[-1]["incident_type"] == "token_replay_attack"

    def test_oauth_events_logged(self, audit_srv):
        import secrets

        from code_indexer_ray.server.oauth import s256_challenge

        base, tier = audit_srv
        code, client = _req("POST", base + "/oauth/register",
                            {"client_name": "cli",
                             "redirect_uris": ["http://localhost/cb"]})
        assert code == 200
        assert tier.audit.read_events(event_type="oauth_client_registration")
        verifier = secrets.token_urlsafe(32)
        code, authz = _req("POST", base + "/oauth/authorize", {
            "client_id": client["client_id"], "redirect_uri": "http://localhost/cb",
            "response_type": "code", "code_challenge": s256_challenge(verifier),
            "state": "s", "username": "admin", "password": GOOD_PW,
        })
        assert code == 200
        assert tier.audit.read_events(event_type="oauth_authorization")[-1][
            "username"] == "admin"
        code, _tok = _req("POST", base + "/oauth/token", {
            "grant_type": "authorization_code", "code": authz["code"],
            "code_verifier": verifier, "client_id": client["client_id"],
        })
        assert code == 200
        assert tier.audit.read_events(event_type="oauth_token_exchange")
