"""OAuth 2.1 tier — PKCE authorization-code, refresh, and client-credentials
grants over SQLite, next to the JWT + API-key tiers.

Reference ``server/auth/oauth/oauth_manager.py`` (``OAuthManager``: dynamic
client registration, 10-minute single-use authorization codes bound to an
S256 PKCE challenge + exact redirect_uri, opaque 48-byte bearer tokens with
8-hour sliding expiration under a 30-day hard cap — extension only when
less than 4 hours remain — refresh-token rotation, RFC 7009 revocation that
always reports success, and RFC 8414 discovery metadata) and ``routes.py``
(programmatic JSON ``/oauth/authorize`` authenticating the resource owner
with username+password, ``/oauth/token`` with the OAuth error-code mapping,
``/oauth/revoke`` 200-always).  Implementation is independent: sync
``sqlite3`` + ``secrets`` + injectable clock (the reference reads wall time
inline; a fake ``now_fn`` here drives expiry tests without sleeps), unix
floats for timestamps instead of ISO strings (contract parity is in the
lifetimes and flows, not the column formatting).

``client_credentials`` divergence, documented: the reference verifies
machine credentials against its MCPCredentialManager; this engine's machine
credentials ARE the issued API keys (``server/apikeys.py``), so the grant
accepts ``client_id = username`` + ``client_secret = cidx_sk_…`` and mints
an access token for that user (no refresh token, per the reference).
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import secrets
import sqlite3
import threading
import time
from typing import Callable, Optional

__all__ = ["OAuthManager", "OAuthError", "PKCEVerificationError"]


class OAuthError(Exception):
    pass


class PKCEVerificationError(OAuthError):
    pass


def s256_challenge(verifier: str) -> str:
    """RFC 7636 S256: BASE64URL(SHA256(verifier)), unpadded."""
    return (
        base64.urlsafe_b64encode(hashlib.sha256(verifier.encode()).digest())
        .decode()
        .rstrip("=")
    )


class OAuthManager:
    ACCESS_TOKEN_LIFETIME_HOURS = 8
    REFRESH_TOKEN_LIFETIME_DAYS = 30
    HARD_EXPIRATION_DAYS = 30
    EXTENSION_THRESHOLD_HOURS = 4
    CODE_LIFETIME_MINUTES = 10

    def __init__(
        self,
        db_path: str,
        *,
        issuer: str = "http://localhost:8765",
        users=None,
        api_keys=None,
        now_fn: Callable[[], float] = time.time,
    ):
        self.issuer = issuer.rstrip("/")
        self.users = users
        self.api_keys = api_keys
        self._now = now_fn
        self.db_path = db_path
        os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
        self._lock = threading.Lock()
        with self._conn() as conn:
            conn.execute(
                "CREATE TABLE IF NOT EXISTS oauth_clients ("
                " client_id TEXT PRIMARY KEY, client_name TEXT NOT NULL,"
                " redirect_uris TEXT NOT NULL, created_at REAL NOT NULL,"
                " metadata TEXT)"
            )
            conn.execute(
                "CREATE TABLE IF NOT EXISTS oauth_codes ("
                " code TEXT PRIMARY KEY, client_id TEXT NOT NULL,"
                " user_id TEXT NOT NULL, code_challenge TEXT NOT NULL,"
                " redirect_uri TEXT NOT NULL, expires_at REAL NOT NULL,"
                " used INTEGER DEFAULT 0)"
            )
            conn.execute(
                "CREATE TABLE IF NOT EXISTS oauth_tokens ("
                " token_id TEXT PRIMARY KEY, client_id TEXT NOT NULL,"
                " user_id TEXT NOT NULL, access_token TEXT,"
                " refresh_token TEXT, expires_at REAL NOT NULL,"
                " created_at REAL NOT NULL, last_activity REAL NOT NULL,"
                " hard_expires_at REAL NOT NULL)"
            )

    def _conn(self) -> sqlite3.Connection:
        conn = sqlite3.connect(self.db_path, timeout=30)
        conn.row_factory = sqlite3.Row
        return conn

    # -- discovery + registration ------------------------------------------

    def get_discovery_metadata(self) -> dict:
        return {
            "issuer": self.issuer,
            "authorization_endpoint": f"{self.issuer}/oauth/authorize",
            "token_endpoint": f"{self.issuer}/oauth/token",
            "registration_endpoint": f"{self.issuer}/oauth/register",
            "response_types_supported": ["code"],
            "grant_types_supported": [
                "authorization_code",
                "refresh_token",
                "client_credentials",
            ],
        }

    def register_client(
        self,
        client_name: str,
        redirect_uris: list[str],
        grant_types: list[str] | None = None,
        response_types: list[str] | None = None,
        token_endpoint_auth_method: str | None = None,
        scope: str | None = None,
    ) -> dict:
        if not client_name or not client_name.strip():
            raise OAuthError("client_name cannot be empty")
        if not redirect_uris:
            raise OAuthError("redirect_uris cannot be empty")
        client_id = secrets.token_urlsafe(32)
        meta = {
            "token_endpoint_auth_method": token_endpoint_auth_method or "none",
            "grant_types": grant_types or ["authorization_code", "refresh_token"],
            "response_types": response_types or ["code"],
            "scope": scope,
        }
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT INTO oauth_clients VALUES (?, ?, ?, ?, ?)",
                (client_id, client_name, json.dumps(redirect_uris), self._now(),
                 json.dumps(meta)),
            )
        return {
            "client_id": client_id,
            "client_name": client_name,
            "redirect_uris": redirect_uris,
            "client_secret_expires_at": 0,  # public client: no secret issued
            **{k: meta[k] for k in ("token_endpoint_auth_method", "grant_types", "response_types")},
        }

    def get_client(self, client_id: str) -> Optional[dict]:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM oauth_clients WHERE client_id = ?", (client_id,)
            ).fetchone()
        if row is None:
            return None
        return {
            "client_id": row["client_id"],
            "client_name": row["client_name"],
            "redirect_uris": json.loads(row["redirect_uris"]),
            "created_at": row["created_at"],
        }

    # -- authorization code ------------------------------------------------

    def generate_authorization_code(
        self, client_id: str, user_id: str, code_challenge: str,
        redirect_uri: str, state: str,
    ) -> str:
        if not code_challenge or not code_challenge.strip():
            raise OAuthError("code_challenge required")
        client = self.get_client(client_id)
        if client is None:
            raise OAuthError(f"Invalid client_id: {client_id}")
        if redirect_uri not in client["redirect_uris"]:
            raise OAuthError(f"Invalid redirect_uri: {redirect_uri}")
        code = secrets.token_urlsafe(32)
        with self._lock, self._conn() as conn:
            conn.execute(
                "INSERT INTO oauth_codes VALUES (?, ?, ?, ?, ?, ?, 0)",
                (code, client_id, user_id, code_challenge, redirect_uri,
                 self._now() + self.CODE_LIFETIME_MINUTES * 60),
            )
        return code

    def exchange_code_for_token(
        self, code: str, code_verifier: str, client_id: str
    ) -> dict:
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM oauth_codes WHERE code = ? AND client_id = ?",
                (code, client_id),
            ).fetchone()
            if row is None:
                raise OAuthError("Invalid authorization code")
            if row["used"]:
                raise OAuthError("Authorization code already used")
            if self._now() > row["expires_at"]:
                raise OAuthError("Authorization code expired")
            if s256_challenge(code_verifier) != row["code_challenge"]:
                raise PKCEVerificationError("PKCE verification failed")
            conn.execute("UPDATE oauth_codes SET used = 1 WHERE code = ?", (code,))
            return self._mint(conn, row["client_id"], row["user_id"], refresh=True)

    def _mint(self, conn, client_id: str, user_id: str, *, refresh: bool) -> dict:
        now = self._now()
        access_token = secrets.token_urlsafe(48)
        refresh_token = secrets.token_urlsafe(48) if refresh else None
        conn.execute(
            "INSERT INTO oauth_tokens VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (
                secrets.token_urlsafe(32), client_id, user_id, access_token,
                refresh_token, now + self.ACCESS_TOKEN_LIFETIME_HOURS * 3600,
                now, now, now + self.HARD_EXPIRATION_DAYS * 86400,
            ),
        )
        out = {
            "access_token": access_token,
            "token_type": "Bearer",
            "expires_in": int(self.ACCESS_TOKEN_LIFETIME_HOURS * 3600),
        }
        if refresh_token:
            out["refresh_token"] = refresh_token
        return out

    # -- bearer validation + sliding expiration ----------------------------

    def validate_token(self, access_token: str) -> Optional[dict]:
        with self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM oauth_tokens WHERE access_token = ?", (access_token,)
            ).fetchone()
        if row is None or self._now() > row["expires_at"]:
            return None
        return {
            "token_id": row["token_id"],
            "client_id": row["client_id"],
            "user_id": row["user_id"],
            "expires_at": row["expires_at"],
            "created_at": row["created_at"],
        }

    def extend_token_on_activity(self, access_token: str) -> bool:
        """Sliding expiration under the hard cap: extend only when < 4 h
        remain (reference EXTENSION_THRESHOLD_HOURS rule)."""
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM oauth_tokens WHERE access_token = ?", (access_token,)
            ).fetchone()
            if row is None:
                return False
            now = self._now()
            remaining_h = (row["expires_at"] - now) / 3600
            if remaining_h >= self.EXTENSION_THRESHOLD_HOURS:
                return False
            new_exp = min(
                now + self.ACCESS_TOKEN_LIFETIME_HOURS * 3600, row["hard_expires_at"]
            )
            conn.execute(
                "UPDATE oauth_tokens SET expires_at = ?, last_activity = ?"
                " WHERE access_token = ?",
                (new_exp, now, access_token),
            )
            return True

    # -- refresh + revocation ---------------------------------------------

    def refresh_access_token(self, refresh_token: str, client_id: str) -> dict:
        with self._lock, self._conn() as conn:
            row = conn.execute(
                "SELECT * FROM oauth_tokens WHERE refresh_token = ?", (refresh_token,)
            ).fetchone()
            if row is None:
                raise OAuthError("Invalid refresh token")
            now = self._now()
            new_access = secrets.token_urlsafe(48)
            new_refresh = secrets.token_urlsafe(48)
            conn.execute(
                "UPDATE oauth_tokens SET access_token = ?, refresh_token = ?,"
                " expires_at = ?, last_activity = ? WHERE refresh_token = ?",
                (new_access, new_refresh,
                 now + self.ACCESS_TOKEN_LIFETIME_HOURS * 3600, now, refresh_token),
            )
            return {
                "access_token": new_access,
                "token_type": "Bearer",
                "expires_in": int(self.ACCESS_TOKEN_LIFETIME_HOURS * 3600),
                "refresh_token": new_refresh,
            }

    def revoke_token(
        self, token: str, token_type_hint: str | None = None
    ) -> dict[str, Optional[str]]:
        """RFC 7009: the endpoint returns 200 whether or not the token
        existed; the return value reports what (if anything) was revoked."""
        with self._lock, self._conn() as conn:
            if token_type_hint == "access_token":
                row = conn.execute(
                    "SELECT * FROM oauth_tokens WHERE access_token = ?", (token,)
                ).fetchone()
            elif token_type_hint == "refresh_token":
                row = conn.execute(
                    "SELECT * FROM oauth_tokens WHERE refresh_token = ?", (token,)
                ).fetchone()
            else:
                row = conn.execute(
                    "SELECT * FROM oauth_tokens WHERE access_token = ?"
                    " OR refresh_token = ?",
                    (token, token),
                ).fetchone()
            if row is None:
                return {"username": None, "token_type": None}
            conn.execute(
                "DELETE FROM oauth_tokens WHERE token_id = ?", (row["token_id"],)
            )
            return {
                "username": row["user_id"],
                "token_type": "access_token"
                if row["access_token"] == token
                else "refresh_token",
            }

    # -- client_credentials grant (machine tokens via the API-key tier) ----

    def handle_client_credentials_grant(
        self, client_id: str, client_secret: str, scope: str | None = None
    ) -> dict:
        if not client_id or not client_secret:
            raise OAuthError("client_id and client_secret required")
        if self.api_keys is None:
            raise OAuthError("client credential verification not available")
        if not self.api_keys.validate_user_key(client_id, client_secret):
            raise OAuthError("Invalid client credentials")
        with self._lock, self._conn() as conn:
            # no refresh token for machine grants (reference rule); the
            # tracking client_id is the literal grant name, as the reference
            # records it
            out = self._mint(conn, "client_credentials", client_id, refresh=False)
        return out
