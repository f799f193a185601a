"""Authentication/authorization tier for the HTTP server.

Reference surface (all reproduced here on the standard library only):

- ``password_policy.py`` — min-8 / digits / special-character validation
  with the reference's exact "Password too weak: ..." message shapes.
- ``server/auth/password_manager.py`` — salted password hashing.  The
  reference uses bcrypt via pwdlib; bcrypt is not in this container, so we
  hash with PBKDF2-HMAC-SHA256 (stdlib ``hashlib.pbkdf2_hmac``) at 100k
  iterations with a random 16-byte salt.  Same contract (hash is a
  self-describing string, verify is constant-time), different KDF —
  documented divergence.
- ``server/auth/user_manager.py:21-110`` — ``UserRole`` and the inherited
  permission model: ADMIN ⊃ POWER_USER ⊃ NORMAL_USER with the reference's
  exact base permission sets; users persisted to ``users.json`` (atomic
  replace, 0600).
- ``server/auth/jwt_manager.py`` — HS256 JWTs with float-precision
  ``exp``/``iat``, a ``jti`` claim, 10-minute default expiry and
  activity-based extension (``extend_token_expiration``).  The reference
  uses python-jose; the JWS compact serialization here is built directly on
  ``hmac``/``base64`` (same wire format for HS256).
- ``server/auth/refresh_token_manager.py`` — 7-day refresh tokens in
  SQLite, grouped into token FAMILIES; rotation invalidates the previous
  token and REUSE of a rotated token (replay) revokes the whole family.
- ``server/auth/token_bucket.py`` — per-username token buckets (capacity
  10, one token per 6 s) guarding /auth/login, with the reference's refund
  of the consumed token on SUCCESSFUL authentication.
- ``server/auth/rate_limiter.py`` — password-change lockout: 5 failed
  attempts → 15-minute lock, with the reference's retry message.
- ``server/auth/timing_attack_prevention.py`` — unknown-user
  authentication still burns one KDF verification against a dummy hash so
  response time does not reveal username existence.

Everything takes an injectable ``time_fn``/``now_fn`` so tests drive clocks
deterministically instead of sleeping.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import secrets
import sqlite3
import threading
import time
import uuid
from dataclasses import dataclass
from enum import Enum
from typing import Callable, Optional

__all__ = [
    "PasswordPolicy",
    "PasswordManager",
    "UserRole",
    "User",
    "UserManager",
    "JWTManager",
    "TokenExpiredError",
    "InvalidTokenError",
    "RefreshTokenManager",
    "RefreshTokenError",
    "TokenReplayAttackError",
    "TokenBucket",
    "TokenBucketManager",
    "PasswordChangeRateLimiter",
    "AuthError",
]


class AuthError(Exception):
    """Base class for auth failures that map to HTTP 401/403."""


# ---------------------------------------------------------------------------
# password policy (reference password_policy.py)
# ---------------------------------------------------------------------------


class PasswordPolicy:
    """Password strength rules with the reference's message shapes."""

    MIN_LENGTH = 8
    REQUIRE_NUMBERS = True
    REQUIRE_SYMBOLS = True
    VALID_SPECIAL_CHARS = "!@#$%^&*()_+-=[]{}|;:,.<>?"

    @staticmethod
    def validate(password: str) -> tuple[bool, str]:
        if not password:
            return False, "Password too weak: Must be at least 8 characters long"
        violations = []
        if len(password) < PasswordPolicy.MIN_LENGTH:
            violations.append("Must be at least 8 characters long")
        if PasswordPolicy.REQUIRE_NUMBERS and not any(c.isdigit() for c in password):
            violations.append("Must contain numbers")
        if PasswordPolicy.REQUIRE_SYMBOLS and not any(
            c in PasswordPolicy.VALID_SPECIAL_CHARS for c in password
        ):
            violations.append("Must contain special characters")
        if violations:
            return False, "Password too weak: " + " and ".join(violations)
        return True, "Password meets requirements"


# ---------------------------------------------------------------------------
# password hashing (reference server/auth/password_manager.py; PBKDF2 here)
# ---------------------------------------------------------------------------


class PasswordManager:
    """Salted PBKDF2-HMAC-SHA256 hashing, self-describing hash strings.

    Format: ``pbkdf2_sha256$<iterations>$<salt_hex>$<digest_hex>`` — verify
    re-derives with the ITERATION COUNT STORED IN THE HASH, so old hashes
    keep verifying after the default changes (the reference's
    backward-compatible-with-passlib contract).
    """

    def __init__(self, iterations: int = 100_000):
        self.iterations = int(iterations)

    def hash_password(self, password: str) -> str:
        salt = secrets.token_bytes(16)
        dk = hashlib.pbkdf2_hmac(
            "sha256", password.encode("utf-8"), salt, self.iterations
        )
        return f"pbkdf2_sha256${self.iterations}${salt.hex()}${dk.hex()}"

    def verify_password(self, plain_password: str, hashed_password: str) -> bool:
        try:
            scheme, iters, salt_hex, digest_hex = hashed_password.split("$")
            if scheme != "pbkdf2_sha256":
                return False
            dk = hashlib.pbkdf2_hmac(
                "sha256",
                plain_password.encode("utf-8"),
                bytes.fromhex(salt_hex),
                int(iters),
            )
            return hmac.compare_digest(dk.hex(), digest_hex)
        except (ValueError, TypeError):
            return False


# ---------------------------------------------------------------------------
# roles + permission inheritance (reference server/auth/user_manager.py:21-110)
# ---------------------------------------------------------------------------


class UserRole(str, Enum):
    ADMIN = "admin"
    POWER_USER = "power_user"
    NORMAL_USER = "normal_user"


_BASE_PERMISSIONS = {
    UserRole.NORMAL_USER: {"query_repos", "repository:read"},
    UserRole.POWER_USER: {"activate_repos", "repository:write"},
    UserRole.ADMIN: {"manage_users", "manage_golden_repos", "repository:admin"},
}


@dataclass
class User:
    username: str
    password_hash: str
    role: UserRole
    created_at: str
    email: Optional[str] = None  # optional; the OIDC tier links/JITs by it

    def has_permission(self, permission: Optional[str]) -> bool:
        """Inherited permission check: admin ⊃ power_user ⊃ normal_user."""
        if permission is None or permission == "public":
            return True
        perms = set(_BASE_PERMISSIONS[UserRole.NORMAL_USER])
        if self.role in (UserRole.POWER_USER, UserRole.ADMIN):
            perms |= _BASE_PERMISSIONS[UserRole.POWER_USER]
        if self.role == UserRole.ADMIN:
            perms |= _BASE_PERMISSIONS[UserRole.ADMIN]
        return permission in perms

    def to_public(self) -> dict:
        out = {
            "username": self.username,
            "role": self.role.value,
            "created_at": self.created_at,
        }
        if self.email:
            out["email"] = self.email
        return out


# ---------------------------------------------------------------------------
# user store (reference server/auth/user_manager.py — users.json backend)
# ---------------------------------------------------------------------------


class UserManager:
    """CRUD + authentication over an atomic ``users.json`` (0600)."""

    USERS_FILENAME = "users.json"

    def __init__(
        self,
        auth_dir: str,
        *,
        iterations: int = 100_000,
        now_fn: Callable[[], float] = time.time,
    ):
        self.auth_dir = str(auth_dir)
        os.makedirs(self.auth_dir, exist_ok=True)
        self._path = os.path.join(self.auth_dir, self.USERS_FILENAME)
        self._pw = PasswordManager(iterations)
        self._now_fn = now_fn
        self._lock = threading.RLock()
        # constant-cost verification target for unknown usernames
        # (timing_attack_prevention parity): a throwaway hash computed once
        self._dummy_hash = self._pw.hash_password(secrets.token_hex(16))

    # -- storage --

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path, encoding="utf-8") as f:
            return json.load(f)

    def _save(self, users: dict[str, dict]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(users, f, indent=1, sort_keys=True)
        os.chmod(tmp, 0o600)
        os.replace(tmp, self._path)

    def _mk(self, name: str, rec: dict) -> User:
        return User(
            name, rec["password_hash"], UserRole(rec["role"]), rec["created_at"],
            email=rec.get("email"),
        )

    # -- CRUD --

    def create_user(
        self,
        username: str,
        password: str,
        role: UserRole | str,
        *,
        email: str | None = None,
    ) -> User:
        role = UserRole(role)
        if not username or "/" in username or username != username.strip():
            raise ValueError(f"invalid username {username!r}")
        ok, msg = PasswordPolicy.validate(password)
        if not ok:
            raise ValueError(msg)
        with self._lock:
            users = self._load()
            if username in users:
                raise ValueError(f"user {username!r} already exists")
            from datetime import datetime, timezone

            users[username] = {
                "password_hash": self._pw.hash_password(password),
                "role": role.value,
                "created_at": datetime.fromtimestamp(
                    self._now_fn(), tz=timezone.utc
                ).isoformat(),
            }
            if email:
                users[username]["email"] = email
            self._save(users)
            return self._mk(username, users[username])

    def get_user_by_email(self, email: str) -> Optional[User]:
        """First user whose stored email matches (case-insensitive) —
        the OIDC auto-link lookup (reference user_manager.get_user_by_email)."""
        if not email:
            return None
        with self._lock:
            for name, rec in self._load().items():
                if (rec.get("email") or "").lower() == email.lower():
                    return self._mk(name, rec)
        return None

    def get_user(self, username: str) -> Optional[User]:
        with self._lock:
            rec = self._load().get(username)
            return self._mk(username, rec) if rec else None

    def all_users(self) -> list[User]:
        with self._lock:
            return [self._mk(n, r) for n, r in sorted(self._load().items())]

    def update_role(self, username: str, role: UserRole | str) -> User:
        role = UserRole(role)
        with self._lock:
            users = self._load()
            if username not in users:
                raise KeyError(f"user {username!r} not found")
            users[username]["role"] = role.value
            self._save(users)
            return self._mk(username, users[username])

    def delete_user(self, username: str) -> None:
        with self._lock:
            users = self._load()
            if username not in users:
                raise KeyError(f"user {username!r} not found")
            last_admin = (
                users[username]["role"] == UserRole.ADMIN.value
                and sum(r["role"] == UserRole.ADMIN.value for r in users.values()) == 1
            )
            if last_admin:
                raise ValueError("cannot delete the last admin user")
            del users[username]
            self._save(users)

    def change_password(self, username: str, old: str, new: str) -> None:
        """Self-service change: verifies the old password first."""
        with self._lock:
            users = self._load()
            rec = users.get(username)
            if rec is None or not self._pw.verify_password(old, rec["password_hash"]):
                raise AuthError("current password is incorrect")
            ok, msg = PasswordPolicy.validate(new)
            if not ok:
                raise ValueError(msg)
            rec["password_hash"] = self._pw.hash_password(new)
            self._save(users)

    def set_password(self, username: str, new: str) -> None:
        """Admin reset: no old-password check (reference admin route)."""
        ok, msg = PasswordPolicy.validate(new)
        if not ok:
            raise ValueError(msg)
        with self._lock:
            users = self._load()
            if username not in users:
                raise KeyError(f"user {username!r} not found")
            users[username]["password_hash"] = self._pw.hash_password(new)
            self._save(users)

    # -- authentication --

    def authenticate(self, username: str, password: str) -> Optional[User]:
        """Password check; unknown usernames still cost one verification."""
        with self._lock:
            rec = self._load().get(username)
        if rec is None:
            self._pw.verify_password(password, self._dummy_hash)
            return None
        if not self._pw.verify_password(password, rec["password_hash"]):
            return None
        return self._mk(username, rec)


# ---------------------------------------------------------------------------
# JWT (reference server/auth/jwt_manager.py — HS256 compact serialization)
# ---------------------------------------------------------------------------


class TokenExpiredError(AuthError):
    pass


class InvalidTokenError(AuthError):
    pass


def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def _b64url_dec(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


class JWTManager:
    """HS256 JWTs: ``{username, role, created_at, exp, iat, jti}`` claims,
    10-minute default lifetime, activity-based extension."""

    def __init__(
        self,
        secret_key: str,
        token_expiration_minutes: float = 10,
        *,
        now_fn: Callable[[], float] = time.time,
    ):
        self.secret_key = secret_key
        self.token_expiration_minutes = float(token_expiration_minutes)
        self._now_fn = now_fn

    def _sign(self, signing_input: bytes) -> str:
        mac = hmac.new(self.secret_key.encode("utf-8"), signing_input, hashlib.sha256)
        return _b64url(mac.digest())

    def _encode(self, payload: dict) -> str:
        header = _b64url(json.dumps({"alg": "HS256", "typ": "JWT"}).encode())
        body = _b64url(json.dumps(payload, separators=(",", ":")).encode())
        signing_input = f"{header}.{body}".encode("ascii")
        return f"{header}.{body}.{self._sign(signing_input)}"

    def create_token(self, user_data: dict) -> str:
        now = self._now_fn()
        payload = {
            "username": user_data["username"],
            "role": user_data["role"],
            "created_at": user_data.get("created_at"),
            "exp": now + self.token_expiration_minutes * 60.0,
            "iat": now,
            "jti": str(uuid.uuid4()),
        }
        return self._encode(payload)

    def validate_token(self, token: str) -> dict:
        try:
            header_b64, body_b64, sig = token.split(".")
            signing_input = f"{header_b64}.{body_b64}".encode("ascii")
            if not hmac.compare_digest(sig, self._sign(signing_input)):
                raise InvalidTokenError("Invalid token: signature mismatch")
            payload = json.loads(_b64url_dec(body_b64))
            header = json.loads(_b64url_dec(header_b64))
            if header.get("alg") != "HS256":
                raise InvalidTokenError("Invalid token: unsupported algorithm")
        except InvalidTokenError:
            raise
        except Exception as e:
            raise InvalidTokenError(f"Invalid token: {e}") from None
        if float(payload.get("exp", 0)) < self._now_fn():
            raise TokenExpiredError("Token has expired")
        return dict(payload)

    def extend_token_expiration(self, token: str) -> str:
        """Sliding sessions: re-issue with a fresh ``exp`` (same jti)."""
        payload = self.validate_token(token)
        now = self._now_fn()
        payload["exp"] = now + self.token_expiration_minutes * 60.0
        payload["iat"] = now
        payload.setdefault("jti", str(uuid.uuid4()))
        return self._encode(payload)


# ---------------------------------------------------------------------------
# refresh tokens (reference server/auth/refresh_token_manager.py — SQLite,
# token families, rotation, replay-attack family revocation)
# ---------------------------------------------------------------------------


class RefreshTokenError(AuthError):
    pass


class TokenReplayAttackError(RefreshTokenError):
    pass


class RefreshTokenManager:
    """Rotating refresh tokens in SQLite.

    Tokens are stored HASHED (sha256) and belong to a family created at
    login.  ``rotate`` marks the presented token used and issues the next
    one in the family; presenting an already-used token is a replay attack
    and revokes the family (reference refresh_token_manager.py:64-70).
    """

    def __init__(
        self,
        auth_dir: str,
        *,
        refresh_token_lifetime_days: float = 7,
        now_fn: Callable[[], float] = time.time,
    ):
        os.makedirs(str(auth_dir), exist_ok=True)
        self._db_path = os.path.join(str(auth_dir), "refresh_tokens.sqlite")
        self.lifetime_s = float(refresh_token_lifetime_days) * 86400.0
        self._now_fn = now_fn
        self._lock = threading.Lock()
        with self._conn() as con:
            con.execute(
                """CREATE TABLE IF NOT EXISTS refresh_tokens (
                    token_hash TEXT PRIMARY KEY,
                    family_id TEXT NOT NULL,
                    username TEXT NOT NULL,
                    used INTEGER NOT NULL DEFAULT 0,
                    expires_at REAL NOT NULL
                )"""
            )
            con.execute(
                """CREATE TABLE IF NOT EXISTS token_families (
                    family_id TEXT PRIMARY KEY,
                    username TEXT NOT NULL,
                    revoked INTEGER NOT NULL DEFAULT 0
                )"""
            )
            con.execute(
                "CREATE INDEX IF NOT EXISTS idx_token_expires"
                " ON refresh_tokens (expires_at)"
            )

    def _conn(self) -> sqlite3.Connection:
        con = sqlite3.connect(self._db_path)
        con.isolation_level = None  # autocommit; each statement is atomic
        return con

    @staticmethod
    def _hash(token: str) -> str:
        return hashlib.sha256(token.encode("utf-8")).hexdigest()

    def issue(self, username: str) -> str:
        """New family + its first token (login)."""
        token = secrets.token_urlsafe(32)
        family = str(uuid.uuid4())
        with self._lock, self._conn() as con:
            con.execute(
                "INSERT INTO token_families (family_id, username) VALUES (?, ?)",
                (family, username),
            )
            con.execute(
                "INSERT INTO refresh_tokens"
                " (token_hash, family_id, username, expires_at) VALUES (?, ?, ?, ?)",
                (self._hash(token), family, username, self._now_fn() + self.lifetime_s),
            )
        return token

    def rotate(self, token: str) -> tuple[str, str]:
        """Validate + rotate; returns ``(username, new_token)``.

        Raises ``TokenReplayAttackError`` (and revokes the family) when the
        presented token was already rotated away.
        """
        h = self._hash(token)
        with self._lock, self._conn() as con:
            row = con.execute(
                "SELECT family_id, username, used, expires_at"
                " FROM refresh_tokens WHERE token_hash = ?",
                (h,),
            ).fetchone()
            if row is None:
                raise RefreshTokenError("unknown refresh token")
            family, username, used, expires_at = row
            revoked = con.execute(
                "SELECT revoked FROM token_families WHERE family_id = ?", (family,)
            ).fetchone()
            if revoked and revoked[0]:
                raise RefreshTokenError("refresh token family revoked")
            if used:
                con.execute(
                    "UPDATE token_families SET revoked = 1 WHERE family_id = ?",
                    (family,),
                )
                raise TokenReplayAttackError(
                    "refresh token reuse detected; family revoked"
                )
            if expires_at < self._now_fn():
                raise RefreshTokenError("refresh token expired")
            con.execute(
                "UPDATE refresh_tokens SET used = 1 WHERE token_hash = ?", (h,)
            )
            new = secrets.token_urlsafe(32)
            con.execute(
                "INSERT INTO refresh_tokens"
                " (token_hash, family_id, username, expires_at) VALUES (?, ?, ?, ?)",
                (self._hash(new), family, username, self._now_fn() + self.lifetime_s),
            )
        return username, new

    def revoke_user(self, username: str) -> int:
        """Revoke every family for a user (logout-all / user deletion)."""
        with self._lock, self._conn() as con:
            cur = con.execute(
                "UPDATE token_families SET revoked = 1 WHERE username = ?", (username,)
            )
            return cur.rowcount

    def purge_expired(self) -> int:
        with self._lock, self._conn() as con:
            cur = con.execute(
                "DELETE FROM refresh_tokens WHERE expires_at < ?", (self._now_fn(),)
            )
            return cur.rowcount


# ---------------------------------------------------------------------------
# login rate limiting (reference server/auth/token_bucket.py)
# ---------------------------------------------------------------------------


class TokenBucket:
    """Fractional-refill token bucket (capacity 10, 1 token / 6 s)."""

    def __init__(
        self,
        capacity: int = 10,
        refill_rate: float = 1 / 6.0,
        time_fn: Callable[[], float] = time.monotonic,
    ):
        self.capacity = float(capacity)
        self.tokens = float(capacity)
        self.refill_rate = float(refill_rate)
        self._time_fn = time_fn
        self.last_refill = time_fn()

    def _refill(self) -> None:
        now = self._time_fn()
        elapsed = max(0.0, now - self.last_refill)
        if elapsed > 0:
            self.tokens = min(self.capacity, self.tokens + elapsed * self.refill_rate)
            self.last_refill = now

    def consume(self) -> tuple[bool, float]:
        self._refill()
        if self.tokens >= 1.0:
            self.tokens -= 1.0
            return True, 0.0
        needed = 1.0 - self.tokens
        retry = needed / self.refill_rate if self.refill_rate > 0 else float("inf")
        return False, retry

    def refund(self) -> None:
        self._refill()
        self.tokens = min(self.capacity, self.tokens + 1.0)


class TokenBucketManager:
    """Per-username buckets; full buckets are dropped on cleanup."""

    def __init__(
        self,
        capacity: int = 10,
        refill_rate: float = 1 / 6.0,
        time_fn: Callable[[], float] = time.monotonic,
    ):
        self._buckets: dict[str, TokenBucket] = {}
        self._lock = threading.Lock()
        self._capacity = capacity
        self._refill_rate = refill_rate
        self._time_fn = time_fn

    def consume(self, username: str) -> tuple[bool, float]:
        with self._lock:
            # opportunistic bound: full buckets carry no state worth keeping,
            # so sweep them before (possibly) adding a new one — without this
            # a credential-stuffing run with millions of distinct usernames
            # grows the map forever (cleanup() was otherwise never called)
            if len(self._buckets) >= 10_000:
                self._cleanup_locked()
            b = self._buckets.get(username)
            if b is None:
                b = self._buckets[username] = TokenBucket(
                    self._capacity, self._refill_rate, self._time_fn
                )
            return b.consume()

    def refund(self, username: str) -> None:
        with self._lock:
            b = self._buckets.get(username)
            if b is not None:
                b.refund()

    def cleanup(self) -> int:
        with self._lock:
            return self._cleanup_locked()

    def _cleanup_locked(self) -> int:
        full = []
        for k, b in self._buckets.items():
            b._refill()
            if b.tokens >= b.capacity:
                full.append(k)
        for k in full:
            del self._buckets[k]
        return len(full)


# ---------------------------------------------------------------------------
# password-change lockout (reference server/auth/rate_limiter.py)
# ---------------------------------------------------------------------------


class PasswordChangeRateLimiter:
    """5 failed attempts → 15-minute lockout, reference retry message."""

    def __init__(self, *, now_fn: Callable[[], float] = time.time):
        self._attempts: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._max_attempts = 5
        self._lockout_s = 15 * 60.0
        self._now_fn = now_fn

    def check_rate_limit(self, username: str) -> Optional[str]:
        with self._lock:
            now = self._now_fn()
            self._cleanup(now)
            data = self._attempts.get(username)
            if data is None:
                return None
            locked_until = data.get("locked_until")
            if locked_until and now < locked_until:
                remaining_minutes = int((locked_until - now) / 60) + 1
                return (
                    "Too many failed attempts."
                    f" Try again in {remaining_minutes} minutes."
                )
            return None

    def record_failed_attempt(self, username: str) -> None:
        with self._lock:
            now = self._now_fn()
            self._cleanup(now)
            data = self._attempts.setdefault(username, {"count": 0})
            data["count"] += 1
            data["last_attempt"] = now
            if data["count"] >= self._max_attempts:
                data["locked_until"] = now + self._lockout_s

    def record_successful_attempt(self, username: str) -> None:
        with self._lock:
            self._attempts.pop(username, None)

    def _cleanup(self, now: float) -> None:
        # drop expired lockouts AND dormant sub-threshold records (1-4
        # failures with no attempt for a full lockout window) — otherwise
        # partial-failure entries accumulate per username forever
        expired = [
            k
            for k, d in self._attempts.items()
            if (d.get("locked_until") and now >= d["locked_until"])
            or (
                not d.get("locked_until")
                and now - d.get("last_attempt", now) >= self._lockout_s
            )
        ]
        for k in expired:
            del self._attempts[k]


# ---------------------------------------------------------------------------
# server-side bundle
# ---------------------------------------------------------------------------


def load_or_create_secret(auth_dir: str) -> str:
    """Stable per-auth-dir JWT signing secret (0600, created once) so
    tokens survive server restarts (reference: secret in server config)."""
    os.makedirs(str(auth_dir), exist_ok=True)
    path = os.path.join(str(auth_dir), "jwt_secret")
    if not os.path.exists(path):
        tmp = path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(secrets.token_urlsafe(48))
        os.chmod(tmp, 0o600)
        os.replace(tmp, path)
    with open(path, encoding="utf-8") as f:
        return f.read().strip()


class AuthTier:
    """Everything the HTTP server needs, constructed from one directory.

    ``seed_admin=`` creates the initial admin on first start if the user
    store is empty (the reference server installer's default-admin step).
    """

    def __init__(
        self,
        auth_dir: str,
        *,
        token_minutes: float = 10,
        refresh_days: float = 7,
        iterations: int = 100_000,
        seed_admin: tuple[str, str] | None = None,
        now_fn: Callable[[], float] = time.time,
        mono_fn: Callable[[], float] = time.monotonic,
        oidc_config=None,
    ):
        self.users = UserManager(auth_dir, iterations=iterations, now_fn=now_fn)
        self.jwt = JWTManager(
            load_or_create_secret(auth_dir), token_minutes, now_fn=now_fn
        )
        self.refresh = RefreshTokenManager(
            auth_dir, refresh_token_lifetime_days=refresh_days, now_fn=now_fn
        )
        self.login_buckets = TokenBucketManager(time_fn=mono_fn)
        self.pw_limiter = PasswordChangeRateLimiter(now_fn=now_fn)
        # per-user issued/revocable API keys (reference api_key_manager.py)
        from .apikeys import ApiKeyManager

        self.api_keys = ApiKeyManager(
            auth_dir, self.users, iterations=iterations, now_fn=now_fn
        )
        # OAuth 2.1 tier (reference server/auth/oauth/): PKCE code flow,
        # refresh rotation, client_credentials via the API-key tier; the
        # serving layer stamps the real issuer URL when it binds
        from .oauth import OAuthManager

        self.oauth = OAuthManager(
            os.path.join(auth_dir, "oauth.sqlite"),
            users=self.users,
            api_keys=self.api_keys,
            now_fn=now_fn,
        )
        # group-based access control (Stories 707/708/710)
        from .groups import AccessFilteringService, GroupAccessManager

        self.groups = GroupAccessManager(
            os.path.join(auth_dir, "groups.sqlite"), now_fn=now_fn
        )
        self.access_filter = AccessFilteringService(self.groups)
        # security audit trail (reference server/auth/audit_logger.py)
        from .audit import AuditLogger

        self.audit = AuditLogger(
            os.path.join(auth_dir, "security_audit.log"), now_fn=now_fn
        )
        # OIDC SSO (reference server/auth/oidc/): configured per deployment;
        # shares the oauth DB for identity links, one state manager
        self.oidc = None
        self.oidc_states = None
        if oidc_config is not None and getattr(oidc_config, "enabled", False):
            from .oidc import OIDCManager, StateManager

            self.oidc = OIDCManager(
                oidc_config, self.users,
                os.path.join(auth_dir, "oauth.sqlite"), now_fn=now_fn,
            )
            self.oidc.group_manager = self.groups
            self.oidc_states = StateManager(now_fn=now_fn)
        if seed_admin is not None and not self.users.all_users():
            name, password = seed_admin
            self.users.create_user(name, password, UserRole.ADMIN)

    # -- request-path helpers (raise AuthError subclasses on failure) --

    def login(self, username: str, password: str) -> dict:
        """Rate-limited credential check → access + refresh token pair."""
        allowed, retry_after = self.login_buckets.consume(username)
        if not allowed:
            raise RateLimitedError(retry_after)
        user = self.users.authenticate(username, password)
        if user is None:
            raise AuthError("invalid username or password")
        # successful auth refunds the consumed token (reference
        # token_bucket.py refund-on-success)
        self.login_buckets.refund(username)
        return {
            "access_token": self.jwt.create_token(user.to_public()),
            "refresh_token": self.refresh.issue(username),
            "token_type": "bearer",
            "role": user.role.value,
        }

    def refresh_pair(self, refresh_token: str) -> dict:
        username, new_refresh = self.refresh.rotate(refresh_token)
        user = self.users.get_user(username)
        if user is None:
            raise AuthError("user no longer exists")
        return {
            "access_token": self.jwt.create_token(user.to_public()),
            "refresh_token": new_refresh,
            "token_type": "bearer",
            "role": user.role.value,
        }

    def authenticate_bearer(self, authorization: Optional[str]) -> User:
        """Validate an ``Authorization: Bearer`` header → live User."""
        if not authorization or not authorization.startswith("Bearer "):
            raise InvalidTokenError("missing bearer token")
        payload = self.jwt.validate_token(authorization[len("Bearer ") :])
        user = self.users.get_user(payload["username"])
        if user is None:
            raise InvalidTokenError("user no longer exists")
        if user.role.value != payload.get("role"):
            # role changed since issue: the stored role wins (re-login not
            # required, but stale elevated claims never grant access)
            pass
        return user


class RateLimitedError(AuthError):
    """Maps to HTTP 429 with a Retry-After hint."""

    def __init__(self, retry_after: float):
        super().__init__("rate limited")
        self.retry_after = retry_after
