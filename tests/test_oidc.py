"""OIDC SSO tier (`server/oidc.py` — reference server/auth/oidc/): identity
links, auto-link/JIT resolution, CSRF states, and the live /auth/sso routes
driven against a LOCAL fake IdP speaking the OIDC wire format."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.parse
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.auth import AuthTier, UserManager
from code_indexer_ray.server.oidc import (
    OIDCConfig,
    OIDCError,
    OIDCManager,
    OIDCProvider,
    StateManager,
    UserInfo,
)

GOOD_PW = "Str0ng!pass"


class FakeClock:
    def __init__(self, t=1_000_000.0):
        self.t = t

    def __call__(self):
        return self.t


# ---- fake IdP ----


class FakeIdP:
    """Minimal OIDC provider: discovery, token endpoint validating our
    fixed code + verifier + client creds, bearer-gated userinfo."""

    def __init__(self, claims: dict):
        self.claims = dict(claims)
        self.good_code = "authcode-123"
        self.access_token = "idp-access-tok"
        self.token_requests: list[dict] = []
        idp = self

        class H(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _json(self, code, obj):
                data = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/.well-known/openid-configuration":
                    base = f"http://{idp.host}:{idp.port}"
                    self._json(200, {
                        "issuer": base,
                        "authorization_endpoint": f"{base}/authorize",
                        "token_endpoint": f"{base}/token",
                        "userinfo_endpoint": f"{base}/userinfo",
                    })
                elif self.path == "/userinfo":
                    if self.headers.get("Authorization") != f"Bearer {idp.access_token}":
                        self._json(401, {"error": "invalid_token"})
                    else:
                        self._json(200, idp.claims)
                else:
                    self._json(404, {})

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                form = dict(urllib.parse.parse_qsl(self.rfile.read(n).decode()))
                idp.token_requests.append(form)
                if self.path != "/token":
                    self._json(404, {})
                    return
                if form.get("code") != idp.good_code:
                    self._json(400, {"error": "invalid_grant"})
                    return
                self._json(200, {
                    "access_token": idp.access_token,
                    "token_type": "Bearer",
                    "id_token": "unused",
                })

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.httpd.daemon_threads = True
        self.host, self.port = self.httpd.server_address[:2]
        threading.Thread(target=self.httpd.serve_forever, daemon=True).start()

    @property
    def issuer(self) -> str:
        return f"http://{self.host}:{self.port}"

    def stop(self):
        self.httpd.shutdown()
        self.httpd.server_close()


CLAIMS = {
    "sub": "idp-sub-42",
    "email": "ada@example.org",
    "email_verified": True,
    "preferred_username": "ada_sso",
    "name": "Ada L.",
}


@pytest.fixture(scope="module")
def idp():
    srv = FakeIdP(CLAIMS)
    yield srv
    srv.stop()


class TestStateManager:
    def test_one_time_and_expiry(self):
        clock = FakeClock()
        sm = StateManager(now_fn=clock)
        tok = sm.create_state({"a": 1})
        assert sm.update_state_data(tok, {"a": 2}) is True
        assert sm.validate_state(tok) == {"a": 2}
        assert sm.validate_state(tok) is None  # consumed
        tok2 = sm.create_state({"b": 1})
        clock.t += 5 * 60 + 1
        assert sm.validate_state(tok2) is None  # expired
        assert sm.update_state_data("ghost", {}) is False


class TestProvider:
    def test_discovery_and_auth_url(self, idp):
        cfg = OIDCConfig(issuer_url=idp.issuer, client_id="cid", client_secret="sec")
        p = OIDCProvider(cfg)
        md = p.discover_metadata()
        assert md["token_endpoint"] == idp.issuer + "/token"
        url = p.get_authorization_url("st", "http://me/cb", "chal")
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlparse(url).query))
        assert q == {
            "response_type": "code", "client_id": "cid",
            "redirect_uri": "http://me/cb", "scope": "openid email profile",
            "state": "st", "code_challenge": "chal",
            "code_challenge_method": "S256",
        }

    def test_exchange_and_userinfo(self, idp):
        cfg = OIDCConfig(issuer_url=idp.issuer, client_id="cid", client_secret="sec")
        p = OIDCProvider(cfg)
        toks = p.exchange_code_for_token(idp.good_code, "ver", "http://me/cb")
        assert toks["access_token"] == idp.access_token
        sent = idp.token_requests[-1]
        assert sent["client_id"] == "cid" and sent["client_secret"] == "sec"
        assert sent["code_verifier"] == "ver"
        info = p.get_user_info(toks["access_token"])
        assert info.subject == "idp-sub-42" and info.email_verified
        assert info.username == "ada_sso"
        with pytest.raises(OIDCError, match="400"):
            p.exchange_code_for_token("bad", "v", "http://me/cb")
        with pytest.raises(OIDCError, match="401"):
            p.get_user_info("wrong")

    def test_unreachable_idp(self):
        cfg = OIDCConfig(issuer_url="http://127.0.0.1:1", client_id="c",
                         client_secret="s", http_timeout=0.5)
        with pytest.raises(OIDCError, match="unreachable"):
            OIDCProvider(cfg).discover_metadata()


class TestManagerResolution:
    @pytest.fixture()
    def mgr(self, tmp_path):
        clock = FakeClock()
        users = UserManager(str(tmp_path), iterations=500, now_fn=clock)
        cfg = OIDCConfig(issuer_url="http://unused", client_id="c", client_secret="s")
        m = OIDCManager(cfg, users, str(tmp_path / "oauth.sqlite"), now_fn=clock)
        return m, users, clock

    def test_jit_provisioning(self, mgr):
        m, users, _ = mgr
        info = UserInfo(subject="s1", email="new@x.org", email_verified=True,
                        username="jit_user")
        user = m.match_or_create_user(info)
        assert user.username == "jit_user" and user.role.value == "normal_user"
        assert users.get_user("jit_user").email == "new@x.org"
        # second login: subject fast path, same user, no duplicate
        again = m.match_or_create_user(info)
        assert again.username == "jit_user"
        # JIT users cannot password-login (throwaway secret)
        assert users.authenticate("jit_user", "anything") is None

    def test_email_auto_link(self, mgr):
        m, users, _ = mgr
        users.create_user("existing", GOOD_PW, "power_user", email="ada@x.org")
        info = UserInfo(subject="s2", email="ADA@x.org", email_verified=True,
                        username="ignored")
        user = m.match_or_create_user(info)
        assert user.username == "existing"  # case-insensitive email link
        # linked: a later login with a DIFFERENT email still maps by subject
        user2 = m.match_or_create_user(
            UserInfo(subject="s2", email="changed@x.org", email_verified=True)
        )
        assert user2.username == "existing"

    def test_unverified_email_rules(self, mgr):
        m, users, _ = mgr
        users.create_user("eve", GOOD_PW, "normal_user", email="eve@x.org")
        info = UserInfo(subject="s3", email="eve@x.org", email_verified=False,
                        username="eve_sso")
        # default require_email_verification=True: no auto-link, no JIT
        assert m.match_or_create_user(info) is None

    def test_jit_disabled_and_collision(self, tmp_path):
        clock = FakeClock()
        users = UserManager(str(tmp_path), iterations=500, now_fn=clock)
        users.create_user("taken", GOOD_PW, "normal_user")
        cfg = OIDCConfig(issuer_url="http://u", client_id="c", client_secret="s",
                         enable_jit_provisioning=False)
        m = OIDCManager(cfg, users, str(tmp_path / "o.sqlite"), now_fn=clock)
        assert m.match_or_create_user(
            UserInfo(subject="sX", email="x@x.org", email_verified=True, username="u1")
        ) is None
        cfg2 = OIDCConfig(issuer_url="http://u", client_id="c", client_secret="s")
        m2 = OIDCManager(cfg2, users, str(tmp_path / "o2.sqlite"), now_fn=clock)
        # username collision → refused (reference: admin must link manually)
        assert m2.match_or_create_user(
            UserInfo(subject="sY", email="y@x.org", email_verified=True,
                     username="taken")
        ) is None
        # missing username claim → refused
        assert m2.match_or_create_user(
            UserInfo(subject="sZ", email="z@x.org", email_verified=True)
        ) is None

    def test_stale_link_cleanup(self, mgr):
        m, users, _ = mgr
        info = UserInfo(subject="s9", email="gone@x.org", email_verified=True,
                        username="doomed")
        m.match_or_create_user(info)
        users.delete_user("doomed")
        # stale link detected + cleaned; JIT re-provisions fresh
        user = m.match_or_create_user(info)
        assert user.username == "doomed"


# ---- live HTTP flow ----


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
def sso_srv(ray_session, tmp_path_factory, idp):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("ssosrv")
    rows = [{"doc_id": i, "text": "spark merge", "lang": "en", "url": f"f{i}.py"}
            for i in range(30)]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    cfg = OIDCConfig(issuer_url=idp.issuer, client_id="cidx", client_secret="shh")
    tier = AuthTier(str(tmp / "auth"), iterations=500,
                    seed_admin=("admin", GOOD_PW), oidc_config=cfg)
    srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
    srv.start()
    yield f"http://{srv.host}:{srv.port}", tier, idp
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestHTTPSSOFlow:
    def test_full_sso_login(self, sso_srv):
        base, tier, idp = sso_srv
        code, body = _req("POST", base + "/auth/sso/login", {})
        assert code == 200
        q = dict(urllib.parse.parse_qsl(
            urllib.parse.urlparse(body["authorization_url"]).query))
        assert q["client_id"] == "cidx" and q["code_challenge_method"] == "S256"
        assert q["state"] == body["state"]
        assert q["redirect_uri"] == base + "/auth/sso/callback"
        # the user "returns from the IdP" with the code
        code, pair = _req(
            "GET",
            base + f"/auth/sso/callback?code={idp.good_code}&state={body['state']}",
        )
        assert code == 200, pair
        assert pair["role"] == "normal_user"
        # JIT-provisioned user, linked, token works on protected routes
        assert tier.users.get_user("ada_sso") is not None
        code, hits = _req("GET", base + "/search?q=spark&limit=2",
                          token=pair["access_token"])
        assert code == 200 and hits["hits"]
        # state is one-time: replaying the callback fails
        code, err = _req(
            "GET",
            base + f"/auth/sso/callback?code={idp.good_code}&state={body['state']}",
        )
        assert code == 400 and "state" in err["error"].lower()

    def test_oauth_bridge_flow(self, sso_srv):
        """SSO login feeding an OAuth client (reference flow=oauth_authorize):
        the callback mints an OAuth authorization code instead of a JWT."""
        import secrets as _s

        from code_indexer_ray.server.oauth import s256_challenge

        base, tier, idp = sso_srv
        client = tier.oauth.register_client("cc", ["http://localhost/cb"])
        verifier = _s.token_urlsafe(32)
        code, body = _req("POST", base + "/auth/sso/login", {
            "flow": "oauth_authorize",
            "client_id": client["client_id"],
            "redirect_uri": "http://localhost/cb",
            "code_challenge": s256_challenge(verifier),
            "oauth_state": "oast",
        })
        assert code == 200
        code, out = _req(
            "GET",
            base + f"/auth/sso/callback?code={idp.good_code}&state={body['state']}",
        )
        assert code == 200 and out["state"] == "oast"
        # the minted OAuth code exchanges for tokens bound to the SSO user
        code, tok = _req("POST", base + "/oauth/token", {
            "grant_type": "authorization_code", "code": out["code"],
            "code_verifier": verifier, "client_id": client["client_id"],
        })
        assert code == 200
        info = tier.oauth.validate_token(tok["access_token"])
        assert info["user_id"] == "ada_sso"

    def test_bad_code_from_idp(self, sso_srv):
        base, _tier, _idp = sso_srv
        code, body = _req("POST", base + "/auth/sso/login", {})
        code, err = _req(
            "GET", base + f"/auth/sso/callback?code=WRONG&state={body['state']}"
        )
        assert code == 400 and "token endpoint" in err["error"]

    def test_unconfigured_server_404s(self, ray_session, tmp_path):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [{"doc_id": 0, "text": "x", "lang": "en", "url": "f.py"}]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp_path / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
        tier = AuthTier(str(tmp_path / "auth"), iterations=500,
                        seed_admin=("admin", GOOD_PW))
        srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            assert _req("POST", base + "/auth/sso/login", {})[0] == 404
        finally:
            srv.shutdown()
