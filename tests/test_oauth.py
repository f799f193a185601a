"""OAuth 2.1 tier (`server/oauth.py` — reference server/auth/oauth/):
PKCE code flow, sliding/hard expiration, refresh rotation, revocation,
client_credentials via the API-key tier, and the live HTTP endpoints."""

from __future__ import annotations

import json
import secrets
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.auth import AuthTier, UserManager
from code_indexer_ray.server.oauth import (
    OAuthError,
    OAuthManager,
    PKCEVerificationError,
    s256_challenge,
)

GOOD_PW = "Str0ng!pass"


class FakeClock:
    def __init__(self, t=1_000_000.0):
        self.t = t

    def __call__(self):
        return self.t


@pytest.fixture()
def om(tmp_path):
    clock = FakeClock()
    users = UserManager(str(tmp_path), iterations=500, now_fn=clock)
    users.create_user("ada", GOOD_PW, "normal_user")
    from code_indexer_ray.server.apikeys import ApiKeyManager

    keys = ApiKeyManager(str(tmp_path), users, iterations=500, now_fn=clock)
    m = OAuthManager(
        str(tmp_path / "oauth.sqlite"), users=users, api_keys=keys, now_fn=clock
    )
    return m, users, keys, clock


def _flow_code(m, user="ada"):
    client = m.register_client("cli", ["http://localhost/cb"])
    verifier = secrets.token_urlsafe(32)
    code = m.generate_authorization_code(
        client["client_id"], user, s256_challenge(verifier),
        "http://localhost/cb", "st8",
    )
    return client, verifier, code


class TestManager:
    def test_discovery(self, om):
        m, *_ = om
        d = m.get_discovery_metadata()
        assert d["authorization_endpoint"].endswith("/oauth/authorize")
        assert set(d["grant_types_supported"]) == {
            "authorization_code", "refresh_token", "client_credentials",
        }

    def test_register_validation(self, om):
        m, *_ = om
        with pytest.raises(OAuthError, match="client_name"):
            m.register_client("  ", ["http://x"])
        c = m.register_client("app", ["http://x/cb"], scope="read")
        assert m.get_client(c["client_id"])["redirect_uris"] == ["http://x/cb"]
        assert c["client_secret_expires_at"] == 0
        assert m.get_client("nope") is None

    def test_code_flow_happy_path(self, om):
        m, *_ = om
        client, verifier, code = _flow_code(m)
        tok = m.exchange_code_for_token(code, verifier, client["client_id"])
        assert tok["token_type"] == "Bearer"
        assert tok["expires_in"] == 8 * 3600
        info = m.validate_token(tok["access_token"])
        assert info["user_id"] == "ada"

    def test_code_single_use(self, om):
        m, *_ = om
        client, verifier, code = _flow_code(m)
        m.exchange_code_for_token(code, verifier, client["client_id"])
        with pytest.raises(OAuthError, match="already used"):
            m.exchange_code_for_token(code, verifier, client["client_id"])

    def test_code_expiry_10min(self, om):
        m, _u, _k, clock = om
        client, verifier, code = _flow_code(m)
        clock.t += 10 * 60 + 1
        with pytest.raises(OAuthError, match="expired"):
            m.exchange_code_for_token(code, verifier, client["client_id"])

    def test_pkce_verification(self, om):
        m, *_ = om
        client, verifier, code = _flow_code(m)
        with pytest.raises(PKCEVerificationError):
            m.exchange_code_for_token(code, "wrong-verifier", client["client_id"])

    def test_authorize_validations(self, om):
        m, *_ = om
        client = m.register_client("cli", ["http://localhost/cb"])
        with pytest.raises(OAuthError, match="code_challenge"):
            m.generate_authorization_code(client["client_id"], "ada", " ",
                                          "http://localhost/cb", "s")
        with pytest.raises(OAuthError, match="Invalid client_id"):
            m.generate_authorization_code("ghost", "ada", "c", "http://localhost/cb", "s")
        with pytest.raises(OAuthError, match="Invalid redirect_uri"):
            m.generate_authorization_code(client["client_id"], "ada", "c",
                                          "http://evil/cb", "s")

    def test_access_token_expiry_and_sliding(self, om):
        m, _u, _k, clock = om
        client, verifier, code = _flow_code(m)
        tok = m.exchange_code_for_token(code, verifier, client["client_id"])["access_token"]
        # fresh token: > 4h remain → no extension
        assert m.extend_token_on_activity(tok) is False
        # 5h later: 3h remain (< 4h threshold) → extended to 8h again
        clock.t += 5 * 3600
        assert m.extend_token_on_activity(tok) is True
        clock.t += 7 * 3600  # inside the extended window
        assert m.validate_token(tok) is not None
        clock.t += 2 * 3600  # past it, no further activity
        assert m.validate_token(tok) is None

    def test_hard_expiration_caps_sliding(self, om):
        m, _u, _k, clock = om
        client, verifier, code = _flow_code(m)
        tok = m.exchange_code_for_token(code, verifier, client["client_id"])["access_token"]
        # keep the token hot past the 30-day hard cap
        for _ in range(200):
            clock.t += 5 * 3600
            if not m.extend_token_on_activity(tok):
                break
        assert m.validate_token(tok) is None or (
            m.validate_token(tok)["expires_at"] <= 1_000_000.0 + 30 * 86400
        )
        clock.t = 1_000_000.0 + 31 * 86400
        assert m.validate_token(tok) is None

    def test_refresh_rotation(self, om):
        m, *_ = om
        client, verifier, code = _flow_code(m)
        pair = m.exchange_code_for_token(code, verifier, client["client_id"])
        new = m.refresh_access_token(pair["refresh_token"], client["client_id"])
        assert new["access_token"] != pair["access_token"]
        assert new["refresh_token"] != pair["refresh_token"]
        # old refresh token is gone (rotated in place)
        with pytest.raises(OAuthError, match="Invalid refresh token"):
            m.refresh_access_token(pair["refresh_token"], client["client_id"])
        assert m.validate_token(new["access_token"]) is not None

    def test_revocation_both_hints(self, om):
        m, *_ = om
        client, verifier, code = _flow_code(m)
        pair = m.exchange_code_for_token(code, verifier, client["client_id"])
        out = m.revoke_token(pair["access_token"], "access_token")
        assert out == {"username": "ada", "token_type": "access_token"}
        assert m.validate_token(pair["access_token"]) is None
        # unknown token: still a 200-shaped answer
        assert m.revoke_token("nope") == {"username": None, "token_type": None}
        # revoke by refresh token without hint
        client, verifier, code = _flow_code(m)
        pair = m.exchange_code_for_token(code, verifier, client["client_id"])
        out = m.revoke_token(pair["refresh_token"])
        assert out["token_type"] == "refresh_token"

    def test_client_credentials_via_api_key(self, om):
        m, _users, keys, _clock = om
        raw, _ = keys.generate_key("ada", name="machine")
        tok = m.handle_client_credentials_grant("ada", raw)
        assert "refresh_token" not in tok  # machine grants get no refresh
        info = m.validate_token(tok["access_token"])
        assert info["user_id"] == "ada"
        assert info["client_id"] == "client_credentials"
        with pytest.raises(OAuthError, match="Invalid client credentials"):
            m.handle_client_credentials_grant("ada", "cidx_sk_" + "0" * 32)
        with pytest.raises(OAuthError, match="required"):
            m.handle_client_credentials_grant("", raw)


# ---- live HTTP endpoints ----


def _req(method, url, payload=None, token=None):
    data = json.dumps(payload).encode() if payload is not None else None
    headers = {"Content-Type": "application/json"} if data else {}
    if token:
        headers["Authorization"] = "Bearer " + token
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read()), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), dict(e.headers)


@pytest.fixture(scope="module")
def oauth_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("oauthsrv")
    rows = [
        {"doc_id": i, "text": "spark merge window", "lang": "en", "url": f"f{i}.py"}
        for i in range(40)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    tier = AuthTier(str(tmp / "auth"), iterations=500, seed_admin=("admin", GOOD_PW))
    tier.users.create_user("norma", GOOD_PW, "normal_user")
    srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
    srv.start()
    yield f"http://{srv.host}:{srv.port}", tier
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestHTTPOAuth:
    def test_discovery_public_and_issuer_stamped(self, oauth_srv):
        base, _ = oauth_srv
        code, body, _ = _req("GET", base + "/.well-known/oauth-authorization-server")
        assert code == 200
        assert body["issuer"] == base
        assert body["token_endpoint"] == base + "/oauth/token"

    def test_full_pkce_flow_over_http(self, oauth_srv):
        base, _ = oauth_srv
        code_, client, _ = _req(
            "POST", base + "/oauth/register",
            {"client_name": "cli", "redirect_uris": ["http://localhost/cb"]},
        )
        assert code_ == 200
        verifier = secrets.token_urlsafe(32)
        code_, authz, _ = _req(
            "POST", base + "/oauth/authorize",
            {
                "client_id": client["client_id"],
                "redirect_uri": "http://localhost/cb",
                "response_type": "code",
                "code_challenge": s256_challenge(verifier),
                "state": "xyz",
                "username": "norma",
                "password": GOOD_PW,
            },
        )
        assert code_ == 200 and authz["state"] == "xyz"
        code_, tok, _ = _req(
            "POST", base + "/oauth/token",
            {
                "grant_type": "authorization_code",
                "code": authz["code"],
                "code_verifier": verifier,
                "client_id": client["client_id"],
            },
        )
        assert code_ == 200 and tok["token_type"] == "Bearer"
        # the opaque token works as a Bearer on protected routes, role-scoped
        code_, hits, headers = _req(
            "GET", base + "/search?q=spark&limit=3", token=tok["access_token"]
        )
        assert code_ == 200 and hits["hits"]
        assert "X-Renewed-Token" not in headers  # oauth sessions don't mint JWTs
        code_, _err, _ = _req(
            "GET", base + "/api/admin/users", token=tok["access_token"]
        )
        assert code_ == 403  # normal_user scope
        # refresh rotation over HTTP
        code_, new, _ = _req(
            "POST", base + "/oauth/token",
            {"grant_type": "refresh_token", "refresh_token": tok["refresh_token"]},
        )
        assert code_ == 200 and new["access_token"] != tok["access_token"]
        # revoke → token rejected
        code_, _b, _ = _req(
            "POST", base + "/oauth/revoke", {"token": new["access_token"]}
        )
        assert code_ == 200
        code_, _b, _ = _req(
            "GET", base + "/search?q=spark", token=new["access_token"]
        )
        assert code_ == 401

    def test_error_mapping(self, oauth_srv):
        base, _ = oauth_srv
        code_, body, _ = _req(
            "POST", base + "/oauth/token", {"grant_type": "password"}
        )
        assert code_ == 400 and body["error"] == "unsupported_grant_type"
        code_, body, _ = _req(
            "POST", base + "/oauth/token",
            {"grant_type": "authorization_code", "code": "x",
             "code_verifier": "v", "client_id": "ghost"},
        )
        assert code_ == 400 and body["error"] == "invalid_grant"
        code_, body, _ = _req(
            "POST", base + "/oauth/token",
            {"grant_type": "client_credentials", "client_id": "norma",
             "client_secret": "cidx_sk_" + "0" * 32},
        )
        assert code_ == 401 and body["error"] == "invalid_client"
        # bad user credentials on authorize
        code_, body, _ = _req(
            "POST", base + "/oauth/authorize",
            {"client_id": "x", "redirect_uri": "http://x", "response_type": "code",
             "code_challenge": "c", "state": "s", "username": "norma",
             "password": "wrong"},
        )
        assert code_ == 401
        # missing PKCE
        code_, body, _ = _req(
            "POST", base + "/oauth/authorize",
            {"client_id": "x", "redirect_uri": "http://x", "response_type": "code",
             "state": "s", "username": "norma", "password": GOOD_PW},
        )
        assert code_ == 400 and "code_challenge" in body["error_description"]

    def test_client_credentials_over_http(self, oauth_srv):
        base, tier = oauth_srv
        raw, _ = tier.api_keys.generate_key("norma", name="svc")
        code_, tok, _ = _req(
            "POST", base + "/oauth/token",
            {"grant_type": "client_credentials", "client_id": "norma",
             "client_secret": raw},
        )
        assert code_ == 200 and "refresh_token" not in tok
        assert _req("GET", base + "/search?q=merge&limit=2",
                    token=tok["access_token"])[0] == 200
