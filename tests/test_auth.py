"""Auth tier (reference ``server/auth/*`` + ``password_policy.py``):
password policy/hashing, role inheritance, JWT lifecycle, refresh-token
rotation + replay revocation, token-bucket login limiting, password-change
lockout — plus the live HTTP wiring (401/403/429 mapping, sliding-session
header, admin user CRUD) and the ``users`` CLI group."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.auth import (
    AuthError,
    AuthTier,
    InvalidTokenError,
    JWTManager,
    PasswordChangeRateLimiter,
    PasswordManager,
    PasswordPolicy,
    RateLimitedError,
    RefreshTokenManager,
    RefreshTokenError,
    TokenBucket,
    TokenExpiredError,
    TokenReplayAttackError,
    User,
    UserManager,
    UserRole,
)

GOOD_PW = "s3cret!pass"


class Clock:
    def __init__(self, t=1_000_000.0):
        self.t = float(t)

    def __call__(self) -> float:
        return self.t

    def advance(self, s: float) -> None:
        self.t += s


# ---------------------------------------------------------------------------


class TestPasswordPolicy:
    def test_valid(self):
        ok, msg = PasswordPolicy.validate(GOOD_PW)
        assert ok and msg == "Password meets requirements"

    @pytest.mark.parametrize(
        "pw,frag",
        [
            ("", "at least 8 characters"),
            ("a1!", "at least 8 characters"),
            ("abcdefgh!", "Must contain numbers"),
            ("abcdefgh1", "Must contain special characters"),
        ],
    )
    def test_violations(self, pw, frag):
        ok, msg = PasswordPolicy.validate(pw)
        assert not ok and msg.startswith("Password too weak: ") and frag in msg

    def test_combined_message_joins_with_and(self):
        ok, msg = PasswordPolicy.validate("abcdefgh")
        assert not ok
        assert "Must contain numbers and Must contain special characters" in msg


class TestPasswordManager:
    def test_roundtrip_and_salt(self):
        pm = PasswordManager(iterations=1000)
        h1, h2 = pm.hash_password(GOOD_PW), pm.hash_password(GOOD_PW)
        assert h1 != h2  # random salts
        assert pm.verify_password(GOOD_PW, h1) and pm.verify_password(GOOD_PW, h2)
        assert not pm.verify_password("wrong!1pw", h1)

    def test_verify_uses_stored_iterations(self):
        old = PasswordManager(iterations=500).hash_password(GOOD_PW)
        assert PasswordManager(iterations=2000).verify_password(GOOD_PW, old)

    def test_malformed_hash(self):
        pm = PasswordManager(iterations=500)
        assert not pm.verify_password(GOOD_PW, "garbage")
        assert not pm.verify_password(GOOD_PW, "bcrypt$1$aa$bb")


class TestRoles:
    def test_inheritance_matrix(self):
        def u(role):
            return User("x", "h", role, "now")

        normal, power, admin = (
            u(UserRole.NORMAL_USER),
            u(UserRole.POWER_USER),
            u(UserRole.ADMIN),
        )
        for user in (normal, power, admin):  # public always allowed
            assert user.has_permission(None) and user.has_permission("public")
        assert normal.has_permission("query_repos")
        assert normal.has_permission("repository:read")
        assert not normal.has_permission("activate_repos")
        assert not normal.has_permission("manage_users")
        assert power.has_permission("query_repos")  # inherited
        assert power.has_permission("activate_repos")
        assert power.has_permission("repository:write")
        assert not power.has_permission("manage_golden_repos")
        for p in (
            "query_repos",
            "repository:read",
            "activate_repos",
            "repository:write",
            "manage_users",
            "manage_golden_repos",
            "repository:admin",
        ):
            assert admin.has_permission(p)
        assert not admin.has_permission("made_up_permission")


class TestUserManager:
    @pytest.fixture()
    def um(self, tmp_path):
        return UserManager(str(tmp_path / "auth"), iterations=500)

    def test_crud(self, um):
        u = um.create_user("alice", GOOD_PW, "admin")
        assert u.role is UserRole.ADMIN and u.created_at
        assert um.get_user("alice").username == "alice"
        um.create_user("bob", GOOD_PW, UserRole.NORMAL_USER)
        assert [x.username for x in um.all_users()] == ["alice", "bob"]
        assert um.update_role("bob", "power_user").role is UserRole.POWER_USER
        um.delete_user("bob")
        assert um.get_user("bob") is None
        with pytest.raises(KeyError):
            um.delete_user("bob")

    def test_duplicate_and_policy(self, um):
        um.create_user("alice", GOOD_PW, "normal_user")
        with pytest.raises(ValueError, match="already exists"):
            um.create_user("alice", GOOD_PW, "normal_user")
        with pytest.raises(ValueError, match="Password too weak"):
            um.create_user("carol", "short", "normal_user")
        with pytest.raises(ValueError, match="invalid username"):
            um.create_user(" pad ", GOOD_PW, "normal_user")

    def test_last_admin_protected(self, um):
        um.create_user("root", GOOD_PW, "admin")
        with pytest.raises(ValueError, match="last admin"):
            um.delete_user("root")
        um.create_user("root2", GOOD_PW, "admin")
        um.delete_user("root")  # now allowed

    def test_authenticate(self, um):
        um.create_user("alice", GOOD_PW, "normal_user")
        assert um.authenticate("alice", GOOD_PW).username == "alice"
        assert um.authenticate("alice", "wrong!1pw") is None
        assert um.authenticate("nobody", GOOD_PW) is None

    def test_change_and_set_password(self, um):
        um.create_user("alice", GOOD_PW, "normal_user")
        with pytest.raises(AuthError):
            um.change_password("alice", "wrong!1pw", "newpw!234")
        um.change_password("alice", GOOD_PW, "newpw!234")
        assert um.authenticate("alice", "newpw!234") is not None
        with pytest.raises(ValueError, match="Password too weak"):
            um.set_password("alice", "weak")
        um.set_password("alice", "reset!999")
        assert um.authenticate("alice", "reset!999") is not None

    def test_store_file_mode(self, um):
        um.create_user("alice", GOOD_PW, "normal_user")
        mode = os.stat(os.path.join(um.auth_dir, "users.json")).st_mode & 0o777
        assert mode == 0o600


class TestJWT:
    def test_lifecycle(self):
        clk = Clock()
        jm = JWTManager("secret", token_expiration_minutes=10, now_fn=clk)
        tok = jm.create_token({"username": "a", "role": "admin", "created_at": "t"})
        p = jm.validate_token(tok)
        assert p["username"] == "a" and p["role"] == "admin" and p["jti"]
        assert p["exp"] == pytest.approx(clk.t + 600)
        clk.advance(599)
        jm.validate_token(tok)
        clk.advance(2)
        with pytest.raises(TokenExpiredError):
            jm.validate_token(tok)

    def test_tamper_and_wrong_secret(self):
        jm = JWTManager("secret")
        tok = jm.create_token({"username": "a", "role": "admin"})
        h, b, s = tok.split(".")
        with pytest.raises(InvalidTokenError):
            jm.validate_token(f"{h}.{b}.AAAA{s[4:]}")
        with pytest.raises(InvalidTokenError):
            JWTManager("other").validate_token(tok)
        with pytest.raises(InvalidTokenError):
            jm.validate_token("not-a-token")

    def test_extend(self):
        clk = Clock()
        jm = JWTManager("secret", token_expiration_minutes=10, now_fn=clk)
        tok = jm.create_token({"username": "a", "role": "admin"})
        clk.advance(500)
        tok2 = jm.extend_token_expiration(tok)
        p1, p2 = jm.validate_token(tok), jm.validate_token(tok2)
        assert p2["exp"] > p1["exp"] and p2["jti"] == p1["jti"]
        clk.advance(550)  # original now expired, extended still live
        with pytest.raises(TokenExpiredError):
            jm.validate_token(tok)
        jm.validate_token(tok2)


class TestRefreshTokens:
    def test_rotation_chain(self, tmp_path):
        clk = Clock()
        rm = RefreshTokenManager(str(tmp_path), now_fn=clk)
        t0 = rm.issue("alice")
        user, t1 = rm.rotate(t0)
        assert user == "alice"
        _, t2 = rm.rotate(t1)
        assert len({t0, t1, t2}) == 3

    def test_replay_revokes_family(self, tmp_path):
        rm = RefreshTokenManager(str(tmp_path))
        t0 = rm.issue("alice")
        _, t1 = rm.rotate(t0)
        with pytest.raises(TokenReplayAttackError):
            rm.rotate(t0)  # replay of the rotated-away token
        with pytest.raises(RefreshTokenError, match="revoked"):
            rm.rotate(t1)  # whole family is dead

    def test_expiry_and_purge(self, tmp_path):
        clk = Clock()
        rm = RefreshTokenManager(
            str(tmp_path), refresh_token_lifetime_days=1, now_fn=clk
        )
        t0 = rm.issue("alice")
        clk.advance(2 * 86400)
        with pytest.raises(RefreshTokenError, match="expired"):
            rm.rotate(t0)
        assert rm.purge_expired() == 1

    def test_revoke_user(self, tmp_path):
        rm = RefreshTokenManager(str(tmp_path))
        t0 = rm.issue("alice")
        assert rm.revoke_user("alice") == 1
        with pytest.raises(RefreshTokenError, match="revoked"):
            rm.rotate(t0)

    def test_unknown_token(self, tmp_path):
        rm = RefreshTokenManager(str(tmp_path))
        with pytest.raises(RefreshTokenError, match="unknown"):
            rm.rotate("bogus")


class TestTokenBucket:
    def test_burst_then_refill(self):
        clk = Clock(0.0)
        b = TokenBucket(capacity=10, refill_rate=1 / 6.0, time_fn=clk)
        for _ in range(10):
            ok, _ = b.consume()
            assert ok
        ok, retry = b.consume()
        assert not ok and retry == pytest.approx(6.0)
        clk.advance(6.0)
        ok, _ = b.consume()
        assert ok

    def test_refund(self):
        clk = Clock(0.0)
        b = TokenBucket(capacity=2, time_fn=clk)
        b.consume(), b.consume()
        assert not b.consume()[0]
        b.refund()
        assert b.consume()[0]


class TestPasswordChangeLimiter:
    def test_lockout_and_expiry(self):
        clk = Clock()
        rl = PasswordChangeRateLimiter(now_fn=clk)
        for _ in range(4):
            rl.record_failed_attempt("alice")
        assert rl.check_rate_limit("alice") is None
        rl.record_failed_attempt("alice")
        clk.advance(1)  # int(remaining/60)+1 → 15 once inside the window
        msg = rl.check_rate_limit("alice")
        assert msg == "Too many failed attempts. Try again in 15 minutes."
        clk.advance(14 * 60 + 9)  # 50 s remaining → "1 minutes"
        assert "Try again in 1 minutes" in rl.check_rate_limit("alice")
        clk.advance(51)
        assert rl.check_rate_limit("alice") is None

    def test_success_resets(self):
        rl = PasswordChangeRateLimiter(now_fn=Clock())
        for _ in range(4):
            rl.record_failed_attempt("alice")
        rl.record_successful_attempt("alice")
        rl.record_failed_attempt("alice")
        assert rl.check_rate_limit("alice") is None


class TestAuthTier:
    def test_login_and_refresh(self, tmp_path):
        tier = AuthTier(
            str(tmp_path), iterations=500, seed_admin=("admin", GOOD_PW)
        )
        pair = tier.login("admin", GOOD_PW)
        assert pair["token_type"] == "bearer" and pair["role"] == "admin"
        user = tier.authenticate_bearer("Bearer " + pair["access_token"])
        assert user.username == "admin"
        pair2 = tier.refresh_pair(pair["refresh_token"])
        assert pair2["access_token"] and pair2["refresh_token"] != pair["refresh_token"]
        with pytest.raises(AuthError):
            tier.login("admin", "wrong!1pw")
        with pytest.raises(InvalidTokenError):
            tier.authenticate_bearer(None)
        with pytest.raises(InvalidTokenError):
            tier.authenticate_bearer("Bearer junk")

    def test_login_rate_limit_and_refund(self, tmp_path):
        mono = Clock(0.0)
        tier = AuthTier(
            str(tmp_path), iterations=500, seed_admin=("admin", GOOD_PW), mono_fn=mono
        )
        # successful logins refund: far more than capacity in a row is fine
        for _ in range(15):
            tier.login("admin", GOOD_PW)
        # failures burn tokens: capacity exhausted → RateLimitedError
        for _ in range(10):
            with pytest.raises(AuthError):
                tier.login("admin", "wrong!1pw")
        with pytest.raises(RateLimitedError) as ei:
            tier.login("admin", GOOD_PW)
        assert ei.value.retry_after > 0
        mono.advance(12.0)  # two tokens refilled
        tier.login("admin", GOOD_PW)

    def test_secret_survives_restart(self, tmp_path):
        t1 = AuthTier(str(tmp_path), iterations=500, seed_admin=("admin", GOOD_PW))
        tok = t1.login("admin", GOOD_PW)["access_token"]
        t2 = AuthTier(str(tmp_path), iterations=500)
        assert t2.authenticate_bearer("Bearer " + tok).username == "admin"


# ---------------------------------------------------------------------------
# live HTTP wiring
# ---------------------------------------------------------------------------


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
def auth_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 4, 12)),
            "lang": "en",
            "url": f"f{i}.py",
        }
        for i in range(60)
    ]
    tmp = tmp_path_factory.mktemp("authsrv")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, resume=False)
    tier = AuthTier(
        str(tmp / "auth"), iterations=500, seed_admin=("admin", GOOD_PW)
    )
    tier.users.create_user("norma", GOOD_PW, "normal_user")
    srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
    srv.start()
    yield f"http://{srv.host}:{srv.port}", tier
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestHTTPAuth:
    def _login(self, base, username, password):
        code, body, _ = _req(
            "POST", base + "/auth/login", {"username": username, "password": password}
        )
        assert code == 200, body
        return body

    def test_unauthenticated_401_health_open(self, auth_srv):
        base, _ = auth_srv
        code, body, _ = _req("GET", base + "/search?q=spark")
        assert code == 401 and "bearer" in body["error"]
        code, _, _ = _req("GET", base + "/health")
        assert code == 200

    def test_login_search_and_sliding_token(self, auth_srv):
        base, _ = auth_srv
        pair = self._login(base, "admin", GOOD_PW)
        code, body, headers = _req("GET", base + "/search?q=spark", token=pair["access_token"])
        assert code == 200 and body["hits"]
        renewed = headers.get("X-Renewed-Token")
        assert renewed  # sliding session token on every authed response
        code, body, _ = _req("GET", base + "/stats", token=renewed)
        assert code == 200 and body["num_docs"] == 60

    def test_bad_credentials_and_method(self, auth_srv):
        base, _ = auth_srv
        code, body, _ = _req(
            "POST", base + "/auth/login", {"username": "admin", "password": "nope!1pw"}
        )
        assert code == 401
        code, _, _ = _req("GET", base + "/auth/login")
        assert code == 405

    def test_role_enforcement(self, auth_srv):
        base, _ = auth_srv
        tok = self._login(base, "norma", GOOD_PW)["access_token"]
        code, body, _ = _req("GET", base + "/search?q=merge", token=tok)
        assert code == 200
        code, body, _ = _req("GET", base + "/api/admin/users", token=tok)
        assert code == 403 and "manage_users" in body["error"]

    def test_admin_user_crud_and_revocation(self, auth_srv):
        base, tier = auth_srv
        admin = self._login(base, "admin", GOOD_PW)["access_token"]
        code, body, _ = _req(
            "POST",
            base + "/api/admin/users",
            {"username": "temp", "password": GOOD_PW, "role": "power_user"},
            token=admin,
        )
        assert code == 200 and body["user"]["role"] == "power_user"
        code, body, _ = _req("GET", base + "/api/admin/users", token=admin)
        assert "temp" in [u["username"] for u in body["users"]]
        code, body, _ = _req(
            "PUT", base + "/api/admin/users/temp", {"role": "normal_user"}, token=admin
        )
        assert code == 200 and body["user"]["role"] == "normal_user"
        temp_tok = self._login(base, "temp", GOOD_PW)["access_token"]
        code, body, _ = _req("DELETE", base + "/api/admin/users/temp", token=admin)
        assert code == 200
        # deleted user's still-unexpired token no longer authenticates
        code, body, _ = _req("GET", base + "/search?q=spark", token=temp_tok)
        assert code == 401 and "no longer exists" in body["error"]
        code, body, _ = _req("DELETE", base + "/api/admin/users/temp", token=admin)
        assert code == 404
        # weak password on create → 400
        code, body, _ = _req(
            "POST",
            base + "/api/admin/users",
            {"username": "w", "password": "weak", "role": "normal_user"},
            token=admin,
        )
        assert code == 400 and "Password too weak" in body["error"]

    def test_change_password_flow_and_lockout(self, auth_srv):
        base, tier = auth_srv
        tier.users.create_user("carol", GOOD_PW, "normal_user")
        tok = self._login(base, "carol", GOOD_PW)["access_token"]
        code, body, _ = _req(
            "PUT",
            base + "/api/users/change-password",
            {"old_password": "wrong!1pw", "new_password": "fresh!234"},
            token=tok,
        )
        assert code == 401
        code, body, _ = _req(
            "PUT",
            base + "/api/users/change-password",
            {"old_password": GOOD_PW, "new_password": "fresh!234"},
            token=tok,
        )
        assert code == 200
        self._login(base, "carol", "fresh!234")
        # five failures → 429 with the reference lockout message
        tier.users.create_user("dave", GOOD_PW, "normal_user")
        dtok = self._login(base, "dave", GOOD_PW)["access_token"]
        for _ in range(5):
            code, _, _ = _req(
                "PUT",
                base + "/api/users/change-password",
                {"old_password": "wrong!1pw", "new_password": "fresh!234"},
                token=dtok,
            )
            assert code == 401
        code, body, _ = _req(
            "PUT",
            base + "/api/users/change-password",
            {"old_password": GOOD_PW, "new_password": "fresh!234"},
            token=dtok,
        )
        assert code == 429 and "Too many failed attempts" in body["error"]

    def test_refresh_rotation_and_replay(self, auth_srv):
        base, _ = auth_srv
        pair = self._login(base, "norma", GOOD_PW)
        code, body, _ = _req(
            "POST", base + "/auth/refresh", {"refresh_token": pair["refresh_token"]}
        )
        assert code == 200 and body["refresh_token"] != pair["refresh_token"]
        # replaying the consumed token → 401 and the family is revoked
        code, body2, _ = _req(
            "POST", base + "/auth/refresh", {"refresh_token": pair["refresh_token"]}
        )
        assert code == 401 and "reuse" in body2["error"]
        code, body3, _ = _req(
            "POST", base + "/auth/refresh", {"refresh_token": body["refresh_token"]}
        )
        assert code == 401 and "revoked" in body3["error"]

    def test_login_rate_limit_http(self, auth_srv):
        base, tier = auth_srv
        tier.users.create_user("erin", GOOD_PW, "normal_user")
        saw_429 = False
        for _ in range(12):
            code, body, headers = _req(
                "POST",
                base + "/auth/login",
                {"username": "erin", "password": "nope!1pw"},
            )
            if code == 429:
                saw_429 = True
                assert int(headers["Retry-After"]) >= 1
                break
            assert code == 401
        assert saw_429


def test_users_cli(tmp_path):
    auth_dir = str(tmp_path / "auth")

    def run(*args, stdin=None):
        return subprocess.run(
            [sys.executable, "-m", "code_indexer_ray", "users", *args],
            capture_output=True,
            text=True,
            input=stdin,
            env={**os.environ, "RAY_ADDRESS": "local"},
        )

    r = run("create", "--auth-dir", auth_dir, "--username", "admin",
            "--role", "admin", "--password", GOOD_PW)
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["user"]["role"] == "admin"
    r = run("create", "--auth-dir", auth_dir, "--username", "bob", stdin=GOOD_PW + "\n")
    assert r.returncode == 0, r.stderr
    r = run("list", "--auth-dir", auth_dir)
    names = [json.loads(line)["username"] for line in r.stdout.splitlines()]
    assert names == ["admin", "bob"]
    r = run("set-role", "--auth-dir", auth_dir, "--username", "bob",
            "--role", "power_user")
    assert json.loads(r.stdout)["user"]["role"] == "power_user"
    r = run("passwd", "--auth-dir", auth_dir, "--username", "bob",
            "--password", "newpw!234")
    assert r.returncode == 0
    assert UserManager(auth_dir).authenticate("bob", "newpw!234") is not None
    r = run("delete", "--auth-dir", auth_dir, "--username", "bob")
    assert r.returncode == 0
    # weak password → clean JSON error, exit 2
    r = run("create", "--auth-dir", auth_dir, "--username", "x",
            "--password", "weak")
    assert r.returncode == 2 and "Password too weak" in json.loads(r.stderr)["error"]


class TestReviewRegressions:
    """Fixes from the seventh-session code review."""

    def test_keepalive_no_stale_renewed_token(self, auth_srv):
        """A 401 on a keep-alive connection must not carry the PREVIOUS
        request's X-Renewed-Token (token leak across requests)."""
        import http.client

        base, tier = auth_srv
        host = base[len("http://"):]
        pair = tier.login("admin", GOOD_PW)
        conn = http.client.HTTPConnection(host, timeout=30)
        try:
            conn.request("GET", "/search?q=spark",
                         headers={"Authorization": "Bearer " + pair["access_token"]})
            r1 = conn.getresponse()
            r1.read()
            assert r1.status == 200 and r1.getheader("X-Renewed-Token")
            conn.request("GET", "/search?q=spark",
                         headers={"Authorization": "Bearer junk"})
            r2 = conn.getresponse()
            r2.read()
            assert r2.status == 401
            assert r2.getheader("X-Renewed-Token") is None
        finally:
            conn.close()

    def test_change_password_rejects_get(self, auth_srv):
        base, tier = auth_srv
        code, body, _ = _req(
            "POST", base + "/auth/login",
            {"username": "admin", "password": GOOD_PW},
        )
        tok = body["access_token"]
        code, body, _ = _req(
            "GET",
            base + "/api/users/change-password?old_password=a&new_password=b",
            token=tok,
        )
        assert code == 405

    def test_password_limiter_dormant_cleanup(self):
        clk = Clock()
        rl = PasswordChangeRateLimiter(now_fn=clk)
        rl.record_failed_attempt("dormant")
        rl.record_failed_attempt("dormant")
        clk.advance(15 * 60 + 1)
        rl.record_failed_attempt("other")  # triggers the sweep
        assert "dormant" not in rl._attempts
        assert "other" in rl._attempts


def _req_key(method, url, api_key, payload=None):
    data = json.dumps(payload).encode() if payload is not None else None
    headers = {"X-API-Key": api_key}
    if data:
        headers["Content-Type"] = "application/json"
    req = urllib.request.Request(url, data=data, headers=headers, method=method)
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read()), dict(r.headers)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read()), dict(e.headers)


class TestApiKeyManager:
    """Issued/revocable per-user keys (reference server/auth/api_key_manager.py)."""

    @pytest.fixture()
    def mgr(self, tmp_path):
        from code_indexer_ray.server.apikeys import ApiKeyManager
        from code_indexer_ray.server.auth import UserManager

        users = UserManager(str(tmp_path), iterations=500)
        users.create_user("ada", GOOD_PW, "normal_user")
        users.create_user("root", GOOD_PW, "admin")
        return ApiKeyManager(str(tmp_path), users, iterations=500), users

    def test_generate_format_and_stored_hashed(self, mgr, tmp_path):
        m, _u = mgr
        raw, kid = m.generate_key("ada", name="ci")
        assert raw.startswith("cidx_sk_") and len(raw) == len("cidx_sk_") + 32
        stored = json.load(open(str(tmp_path / "api_keys.json")))
        assert raw not in json.dumps(stored)  # never stored raw
        assert stored[kid]["key_hash"].startswith("pbkdf2_sha256$")
        assert stored[kid]["key_prefix"] == raw[:12]

    def test_authenticate_and_role_scoping(self, mgr):
        m, users = mgr
        raw, _ = m.generate_key("ada")
        user = m.authenticate(raw)
        assert user.username == "ada"
        assert user.has_permission("query_repos")
        assert not user.has_permission("manage_users")
        # promotion widens every existing key instantly (live-role rule)
        users.update_role("ada", "admin")
        assert m.authenticate(raw).has_permission("manage_users")

    def test_list_without_hashes_and_revoke(self, mgr):
        m, _u = mgr
        raw1, k1 = m.generate_key("ada", name="a")
        raw2, k2 = m.generate_key("ada", name="b")
        keys = m.list_keys("ada")
        assert [k["key_id"] for k in keys] == [k1, k2]
        assert all("key_hash" not in k and "digest" not in k for k in keys)
        assert m.revoke("ada", k1) is True
        assert m.authenticate(raw1) is None
        assert m.authenticate(raw2).username == "ada"
        # revoking someone else's key_id is "not found"
        raw3, k3 = m.generate_key("root")
        assert m.revoke("ada", k3) is False
        assert m.authenticate(raw3) is not None

    def test_unknown_user_and_garbage_keys(self, mgr):
        m, users = mgr
        with pytest.raises(KeyError):
            m.generate_key("nobody")
        assert m.authenticate(None) is None
        assert m.authenticate("Bearer xyz") is None
        assert m.authenticate("cidx_sk_" + "0" * 32) is None
        # orphaned key: user deleted after issue
        raw, _ = m.generate_key("ada")
        users.delete_user("ada")
        assert m.authenticate(raw) is None

    def test_validate_user_key_reference_surface(self, mgr):
        m, _u = mgr
        raw, _ = m.generate_key("ada")
        assert m.validate_user_key("ada", raw) is True
        assert m.validate_user_key("root", raw) is False

    def test_last_used_stamped(self, mgr):
        m, _u = mgr
        raw, kid = m.generate_key("ada")
        assert m.list_keys("ada")[0]["last_used_at"] is None
        m.authenticate(raw)
        assert m.list_keys("ada")[0]["last_used_at"] is not None


@pytest.mark.usefixtures("ray_session")
class TestHTTPApiKeys:
    def _login(self, base, username, password):
        code, body, _ = _req(
            "POST", base + "/auth/login", {"username": username, "password": password}
        )
        assert code == 200, body
        return body

    def test_self_service_lifecycle_and_key_authed_search(self, auth_srv):
        base, tier = auth_srv
        tok = self._login(base, "norma", GOOD_PW)["access_token"]
        # issue
        code, body, _ = _req("POST", base + "/api/keys", {"name": "laptop"}, token=tok)
        assert code == 200 and body["api_key"].startswith("cidx_sk_")
        raw, kid = body["api_key"], body["key_id"]
        # key-authed search works, carries the user's role, no sliding JWT
        code, hits, headers = _req_key("GET", base + "/search?q=spark&limit=3", raw)
        assert code == 200 and hits["hits"]
        assert "X-Renewed-Token" not in headers
        # normal_user key cannot reach admin routes (role-scoped)
        code, err, _ = _req_key("GET", base + "/api/admin/users", raw)
        assert code == 403
        # list shows metadata, never the raw key
        code, body, _ = _req("GET", base + "/api/keys", token=tok)
        assert code == 200
        assert [k["key_id"] for k in body["keys"]] == [kid]
        assert raw not in json.dumps(body)
        # revoke → key stops working
        code, _, _ = _req("DELETE", base + f"/api/keys/{kid}", token=tok)
        assert code == 200
        code, err, _ = _req_key("GET", base + "/search?q=spark", raw)
        assert code == 401 and "revoked" in err["error"] or "invalid" in err["error"]

    def test_admin_issues_and_revokes_for_other_users(self, auth_srv):
        base, tier = auth_srv
        admin_tok = self._login(base, "admin", GOOD_PW)["access_token"]
        code, body, _ = _req(
            "POST", base + "/api/admin/keys",
            {"username": "norma", "name": "svc"}, token=admin_tok,
        )
        assert code == 200
        raw, kid = body["api_key"], body["key_id"]
        assert _req_key("GET", base + "/search?q=spark&limit=2", raw)[0] == 200
        code, body, _ = _req(
            "GET", base + "/api/admin/keys?username=norma", token=admin_tok
        )
        assert code == 200 and kid in [k["key_id"] for k in body["keys"]]
        code, _, _ = _req(
            "DELETE", base + f"/api/admin/keys/{kid}?username=norma", token=admin_tok
        )
        assert code == 200
        assert _req_key("GET", base + "/search?q=spark", raw)[0] == 401
        # non-admin cannot use the admin key routes
        norma_tok = self._login(base, "norma", GOOD_PW)["access_token"]
        code, _, _ = _req(
            "POST", base + "/api/admin/keys", {"username": "admin"}, token=norma_tok
        )
        assert code == 403

    def test_bogus_key_rejected(self, auth_srv):
        base, _ = auth_srv
        code, err, _ = _req_key("GET", base + "/search?q=spark", "cidx_sk_" + "f" * 32)
        assert code == 401


@pytest.mark.usefixtures("ray_session")
class TestRepoAccessFiltering:
    """Single-index /search group visibility (VERDICT r4 task #8): a server
    that names its registry repo enforces the same invisible-repo rule the
    omni fan-out applies — granted group searches, non-granted gets 403,
    admins always pass, and an unnamed server keeps the old behavior."""

    @pytest.fixture(scope="class")
    def repo_srv(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.auth import AuthTier
        from code_indexer_ray.server.http import IndexHTTPServer

        rng = np.random.default_rng(13)
        vocab = ["spark", "merge", "window", "batch"]
        rows = [
            {
                "doc_id": i,
                "text": " ".join(vocab[j] for j in rng.integers(0, 4, 12)),
                "lang": "en",
                "url": f"f{i}.py",
            }
            for i in range(40)
        ]
        tmp = tmp_path_factory.mktemp("reposrv")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=2, resume=False)
        tier = AuthTier(
            str(tmp / "auth"), iterations=500, seed_admin=("admin", GOOD_PW)
        )
        tier.users.create_user("granted", GOOD_PW, "normal_user")
        tier.users.create_user("blocked", GOOD_PW, "normal_user")
        users_group = tier.groups.get_group_by_name("users")
        power = tier.groups.get_group_by_name("powerusers")
        tier.groups.assign_user_to_group("granted", power.id, "admin")
        tier.groups.assign_user_to_group("blocked", users_group.id, "admin")
        tier.groups.grant_repo_access("web-global", power.id, "admin")
        srv = IndexHTTPServer(
            idx, port=0, warm=False, auth=tier, repo_name="web-global"
        )
        srv.start()
        yield f"http://{srv.host}:{srv.port}", tier, idx
        srv.shutdown()

    def _tok(self, base, username):
        code, body, _ = _req(
            "POST", base + "/auth/login", {"username": username, "password": GOOD_PW}
        )
        assert code == 200, body
        return body["access_token"]

    def test_granted_group_searches(self, repo_srv):
        base, _, _ = repo_srv
        tok = self._tok(base, "granted")
        code, body, _ = _req("GET", base + "/search?q=spark", token=tok)
        assert code == 200 and body["hits"]

    def test_non_granted_group_403_all_searcher_routes(self, repo_srv):
        base, _, _ = repo_srv
        tok = self._tok(base, "blocked")
        for route in ("/search?q=spark", "/stats", "/suggest?prefix=sp"):
            code, body, _ = _req("GET", base + route, token=tok)
            assert code == 403 and "not accessible" in body["error"], (route, body)
        # health stays open even for the blocked group
        code, _, _ = _req("GET", base + "/health", token=tok)
        assert code == 200

    def test_admin_always_passes(self, repo_srv):
        base, _, _ = repo_srv
        tok = self._tok(base, "admin")
        code, body, _ = _req("GET", base + "/search?q=merge", token=tok)
        assert code == 200 and body["hits"]

    def test_revocation_takes_effect_live(self, repo_srv):
        base, tier, _ = repo_srv
        power = tier.groups.get_group_by_name("powerusers")
        tok = self._tok(base, "granted")
        assert tier.groups.revoke_repo_access("web-global", power.id) is True
        try:
            code, body, _ = _req("GET", base + "/search?q=spark", token=tok)
            assert code == 403, body  # membership read fresh per call
        finally:
            tier.groups.grant_repo_access("web-global", power.id, "admin")
        code, body, _ = _req("GET", base + "/search?q=spark", token=tok)
        assert code == 200

    def test_unnamed_server_unchanged(self, ray_session, repo_srv, tmp_path_factory):
        # same auth tier, NO repo_name → no repo gate (back-compat)
        from code_indexer_ray.server.http import IndexHTTPServer

        _, tier, idx = repo_srv
        srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            tok = self._tok(base, "blocked")
            code, body, _ = _req("GET", base + "/search?q=spark", token=tok)
            assert code == 200
        finally:
            srv.shutdown()
