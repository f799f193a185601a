"""Per-user issued / revocable API keys next to the JWT tier.

Reference ``server/auth/api_key_manager.py`` (``ApiKeyManager``): keys are
``cidx_sk_`` + 32 hex chars (128-bit entropy), stored HASHED with the same
PBKDF2 password hasher, listed without hashes (key_id / name / created_at /
display prefix = first 12 chars), revocable by key_id
(``user_manager.add_api_key`` / ``get_api_keys`` / ``delete_api_key`` /
``validate_user_api_key``).

One deliberate addition over the reference: the reference validates a key
only per-username (it PBKDF2-verifies against that user's stored hashes);
a bare ``X-API-Key`` header carries no username, so this store also keeps a
SHA-256 lookup digest per key.  That is cryptographically sound here —
API keys are 128-bit random strings, not human passwords, so offline
brute-force is moot — and makes bare-key authentication O(1): digest →
record → PBKDF2 verify (the stored PBKDF2 hash stays the authoritative
validator, preserving the reference's storage contract).

Role scoping: a key authenticates AS its user; permissions come from the
user's CURRENT role record, so a demotion instantly narrows every key the
user holds (same live-role rule as the JWT path).
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
import threading
import uuid
from typing import Callable, Optional

from .auth import PasswordManager, User, UserManager

__all__ = ["ApiKeyManager"]


class ApiKeyManager:
    KEY_PREFIX = "cidx_sk_"
    KEY_LENGTH = 16  # bytes → 32 hex chars, 128-bit entropy (reference)
    KEYS_FILENAME = "api_keys.json"

    def __init__(
        self,
        auth_dir: str,
        users: UserManager,
        *,
        iterations: int = 100_000,
        now_fn: Callable[[], float] = None,
    ):
        import time

        self.users = users
        self._pw = PasswordManager(iterations)
        self._path = os.path.join(str(auth_dir), self.KEYS_FILENAME)
        self._lock = threading.RLock()
        self._now_fn = now_fn or time.time

    # -- storage (atomic 0600 JSON, the users.json pattern) --

    def _load(self) -> dict[str, dict]:
        if not os.path.exists(self._path):
            return {}
        with open(self._path, encoding="utf-8") as f:
            return json.load(f)

    def _save(self, keys: dict[str, dict]) -> None:
        tmp = self._path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(keys, f, indent=1, sort_keys=True)
        os.chmod(tmp, 0o600)
        os.replace(tmp, self._path)

    @staticmethod
    def _digest(raw_key: str) -> str:
        return hashlib.sha256(raw_key.encode()).hexdigest()

    # -- lifecycle --

    def generate_key(self, username: str, name: str | None = None) -> tuple[str, str]:
        """(raw_key, key_id); the raw key is shown ONCE and never stored."""
        if self.users.get_user(username) is None:
            raise KeyError(f"unknown user {username!r}")
        raw_key = f"{self.KEY_PREFIX}{secrets.token_hex(self.KEY_LENGTH)}"
        key_id = str(uuid.uuid4())
        with self._lock:
            keys = self._load()
            keys[key_id] = {
                "username": username,
                "name": name,
                "key_prefix": raw_key[:12],  # display prefix (reference)
                "key_hash": self._pw.hash_password(raw_key),
                "digest": self._digest(raw_key),
                "created_at": self._now_fn(),
                "last_used_at": None,
            }
            self._save(keys)
        return raw_key, key_id

    def list_keys(self, username: str) -> list[dict]:
        """Key metadata WITHOUT hashes (reference get_api_keys)."""
        with self._lock:
            keys = self._load()
        return sorted(
            (
                {
                    "key_id": kid,
                    "name": rec.get("name"),
                    "key_prefix": rec.get("key_prefix"),
                    "created_at": rec.get("created_at"),
                    "last_used_at": rec.get("last_used_at"),
                }
                for kid, rec in keys.items()
                if rec["username"] == username
            ),
            key=lambda r: (r["created_at"], r["key_id"]),
        )

    def revoke(self, username: str, key_id: str) -> bool:
        """True if the user's key existed and is now gone (reference
        delete_api_key semantics — a key_id under another user is 'not
        found', not someone else's key to revoke)."""
        with self._lock:
            keys = self._load()
            rec = keys.get(key_id)
            if rec is None or rec["username"] != username:
                return False
            del keys[key_id]
            self._save(keys)
            return True

    def revoke_all(self, username: str) -> int:
        """Drop every key of a user (user-deletion hygiene); returns count."""
        with self._lock:
            keys = self._load()
            doomed = [k for k, r in keys.items() if r["username"] == username]
            for k in doomed:
                del keys[k]
            if doomed:
                self._save(keys)
            return len(doomed)

    # -- authentication --

    def authenticate(self, raw_key: str | None) -> Optional[User]:
        """Bare-key auth: digest lookup → PBKDF2 verify → LIVE user record
        (role scoping follows the user's current role).  None on any miss."""
        if not raw_key or not raw_key.startswith(self.KEY_PREFIX):
            return None
        digest = self._digest(raw_key)
        with self._lock:
            keys = self._load()
            hit_id = None
            for kid, rec in keys.items():
                if rec.get("digest") == digest:
                    hit_id = kid
                    break
            if hit_id is None:
                return None
            rec = keys[hit_id]
            if not self._pw.verify_password(raw_key, rec["key_hash"]):
                return None  # digest collision / tampered store
            user = self.users.get_user(rec["username"])
            if user is None:
                return None  # orphaned key: its user was deleted
            rec["last_used_at"] = self._now_fn()
            self._save(keys)
            return user

    def validate_user_key(self, username: str, raw_key: str) -> bool:
        """Reference validate_user_api_key: PBKDF2-verify against the named
        user's stored hashes only."""
        with self._lock:
            keys = self._load()
        return any(
            rec["username"] == username
            and self._pw.verify_password(raw_key, rec["key_hash"])
            for rec in keys.values()
        )
