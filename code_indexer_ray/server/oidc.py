"""OIDC single-sign-on tier — login through an external identity provider.

Reference ``server/auth/oidc/`` (``oidc_provider.py``: metadata discovery at
``{issuer}/.well-known/openid-configuration``, PKCE authorization-URL
construction, code→token exchange, userinfo fetch; ``oidc_manager.py``:
subject-keyed identity links in the oauth DB with stale-link cleanup,
verified-email auto-link, JIT provisioning from a configured username claim
with collision refusal; ``state_manager.py``: 5-minute one-time CSRF state
tokens; ``routes.py``: ``/auth/sso/login`` + ``/auth/sso/callback``,
including the bridge that turns an SSO login into an OAuth authorization
code when the state carries ``flow=oauth_authorize``).

Stdlib recast: ``urllib`` for the three IdP calls (tests run a LOCAL fake
IdP speaking the same wire format — no network in this container),
``sqlite3`` for identity links (same table shape, sharing the oauth DB),
injectable clock.  Divergence, documented: the reference finishes a browser
login with a cookie session + redirect; this engine's serving surface is
session-less JSON, so the callback returns the same access/refresh token
pair ``/auth/login`` issues (the JWT IS the session here).
"""

from __future__ import annotations

import json
import secrets
import sqlite3
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass
from typing import Callable, Optional

__all__ = [
    "OIDCConfig",
    "OIDCError",
    "OIDCProvider",
    "OIDCManager",
    "StateManager",
    "UserInfo",
]


class OIDCError(Exception):
    pass


@dataclass(frozen=True)
class OIDCConfig:
    """Reference OIDC config surface (the subset that shapes behavior)."""

    enabled: bool = True
    issuer_url: str = ""
    client_id: str = ""
    client_secret: str = ""
    scopes: str = "openid email profile"
    enable_jit_provisioning: bool = True
    require_email_verification: bool = True
    default_role: str = "normal_user"
    username_claim: str = "preferred_username"
    http_timeout: float = 10.0


@dataclass
class UserInfo:
    subject: str
    email: str | None = None
    email_verified: bool = False
    username: str | None = None
    name: str | None = None


class StateManager:
    """One-time CSRF state tokens, 5-minute lifetime (reference
    state_manager.py, with an injectable clock instead of wall time)."""

    LIFETIME_SECONDS = 5 * 60

    def __init__(self, now_fn: Callable[[], float] = time.time):
        self._now = now_fn
        self._states: dict[str, dict] = {}
        self._lock = threading.Lock()

    def create_state(self, data: dict) -> str:
        token = secrets.token_urlsafe(32)
        with self._lock:
            self._states[token] = {
                "data": data,
                "expires_at": self._now() + self.LIFETIME_SECONDS,
            }
        return token

    def update_state_data(self, token: str, data: dict) -> bool:
        with self._lock:
            if token in self._states:
                self._states[token]["data"] = data
                return True
            return False

    def validate_state(self, token: str) -> Optional[dict]:
        """Data for a live token, consuming it (one-time use)."""
        with self._lock:
            entry = self._states.get(token)
            if entry is None:
                return None
            if self._now() > entry["expires_at"]:
                del self._states[token]
                return None
            del self._states[token]
            return entry["data"]


class OIDCProvider:
    """The three IdP calls (reference oidc_provider.py), on urllib."""

    def __init__(self, config: OIDCConfig):
        self.config = config
        self._metadata: dict | None = None

    # -- wire helpers --

    def _get_json(self, url: str, headers: dict | None = None) -> dict:
        req = urllib.request.Request(url, headers=headers or {})
        try:
            with urllib.request.urlopen(req, timeout=self.config.http_timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            raise OIDCError(f"IdP returned {e.code} for {url}") from e
        except (urllib.error.URLError, OSError) as e:
            raise OIDCError(f"IdP unreachable: {e}") from e

    def _post_form(self, url: str, form: dict) -> dict:
        data = urllib.parse.urlencode(form).encode()
        req = urllib.request.Request(
            url, data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.config.http_timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            body = ""
            try:
                body = e.read().decode()[:200]
            except OSError:
                pass
            raise OIDCError(f"token endpoint returned {e.code}: {body}") from e
        except (urllib.error.URLError, OSError) as e:
            raise OIDCError(f"IdP unreachable: {e}") from e

    # -- protocol steps --

    def discover_metadata(self) -> dict:
        base = self.config.issuer_url.rstrip("/")
        md = self._get_json(f"{base}/.well-known/openid-configuration")
        for k in ("authorization_endpoint", "token_endpoint", "userinfo_endpoint"):
            if k not in md:
                raise OIDCError(f"IdP discovery metadata lacks {k!r}")
        self._metadata = md
        return md

    def _md(self) -> dict:
        if self._metadata is None:
            self.discover_metadata()
        return self._metadata  # type: ignore[return-value]

    def get_authorization_url(
        self, state: str, redirect_uri: str, code_challenge: str
    ) -> str:
        q = urllib.parse.urlencode(
            {
                "response_type": "code",
                "client_id": self.config.client_id,
                "redirect_uri": redirect_uri,
                "scope": self.config.scopes,
                "state": state,
                "code_challenge": code_challenge,
                "code_challenge_method": "S256",
            }
        )
        return f"{self._md()['authorization_endpoint']}?{q}"

    def exchange_code_for_token(
        self, code: str, code_verifier: str, redirect_uri: str
    ) -> dict:
        return self._post_form(
            self._md()["token_endpoint"],
            {
                "grant_type": "authorization_code",
                "code": code,
                "code_verifier": code_verifier,
                "redirect_uri": redirect_uri,
                "client_id": self.config.client_id,
                "client_secret": self.config.client_secret,
            },
        )

    def get_user_info(self, access_token: str) -> UserInfo:
        claims = self._get_json(
            self._md()["userinfo_endpoint"],
            headers={"Authorization": f"Bearer {access_token}"},
        )
        if "sub" not in claims:
            raise OIDCError("userinfo response lacks 'sub'")
        return UserInfo(
            subject=str(claims["sub"]),
            email=claims.get("email"),
            email_verified=bool(claims.get("email_verified", False)),
            username=claims.get(self.config.username_claim),
            name=claims.get("name"),
        )


class OIDCManager:
    """Identity linking + user resolution (reference oidc_manager.py)."""

    def __init__(
        self,
        config: OIDCConfig,
        users,
        db_path: str,
        *,
        now_fn: Callable[[], float] = time.time,
    ):
        self.config = config
        self.users = users
        self.db_path = db_path
        self._now = now_fn
        self._lock = threading.Lock()
        self.provider: OIDCProvider | None = None
        #: optional GroupAccessManager (Story #708): every SSO login ensures
        #: membership — new users land in 'users', existing stay untouched,
        #: and failures never block authentication
        self.group_manager = None
        with self._conn() as conn:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS oidc_identity_links ("
                " username TEXT NOT NULL, subject TEXT PRIMARY KEY,"
                " email TEXT, linked_at REAL NOT NULL, last_login REAL NOT NULL)"
            )

    def _conn(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path, timeout=30)
        conn.row_factory = sqlite3.Row
        return conn

    def ensure_provider_initialized(self) -> OIDCProvider:
        """Lazy discovery (reference: on-demand so an unreachable IdP never
        blocks server startup; failures leave provider unset for retry)."""
        if self.provider is None:
            if not self.config.enabled:
                raise OIDCError("OIDC is not enabled")
            p = OIDCProvider(self.config)
            p.discover_metadata()
            self.provider = p
        return self.provider

    def link_oidc_identity(self, username: str, subject: str, email: str | None) -> None:
        now = self._now()
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT OR REPLACE INTO oidc_identity_links VALUES (?, ?, ?, ?, ?)",
                (username, subject, email, now, now),
            )

    def match_or_create_user(self, info: UserInfo):
        """Reference resolution order: subject link (stale links cleaned) →
        verified-email auto-link → JIT provisioning from the username claim
        (collision refused) → None (unauthorized)."""
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT username FROM oidc_identity_links WHERE subject = ?",
                (info.subject,),
            ).fetchone()
            if row is not None:
                user = self.users.get_user(row["username"])
                if user is not None:
                    conn.execute(
                        "UPDATE oidc_identity_links SET last_login = ?"
                        " WHERE subject = ?",
                        (self._now(), info.subject),
                    )
                    self._ensure_group_membership(user.username)
                    return user
                # stale link: its user was deleted — clean and fall through
                conn.execute(
                    "DELETE FROM oidc_identity_links WHERE subject = ?",
                    (info.subject,),
                )

        email_ok = info.email and (
            not self.config.require_email_verification or info.email_verified
        )
        if email_ok:
            existing = self.users.get_user_by_email(info.email)
            if existing is not None:
                self.link_oidc_identity(existing.username, info.subject, info.email)
                self._ensure_group_membership(existing.username)
                return existing

        if not self.config.enable_jit_provisioning:
            return None
        if self.config.require_email_verification and not info.email_verified:
            return None
        if not info.username:
            return None  # username claim absent — cannot provision
        if self.users.get_user(info.username) is not None:
            return None  # collision: admin must link manually (reference rule)
        # JIT: password-less principal — a random throwaway secret satisfies
        # the policy and is never disclosed, so password login is impossible
        throwaway = secrets.token_urlsafe(24) + "aA1!"
        user = self.users.create_user(
            info.username, throwaway, self.config.default_role, email=info.email
        )
        self.link_oidc_identity(user.username, info.subject, info.email)
        self._ensure_group_membership(user.username)
        return user

    def _ensure_group_membership(self, username: str) -> None:
        if self.group_manager is None:
            return
        try:
            self.group_manager.ensure_sso_membership(username)
        except Exception:  # noqa: BLE001 — AC6: never block authentication
            pass
