"""Security audit trail — structured event log for the auth tier.

Reference ``server/auth/audit_logger.py`` (``PasswordChangeAuditLogger``):
every security-relevant event appends one structured entry to a dedicated
audit file — ``EVENT_LABEL: {json}`` lines carrying event_type, username,
ip_address, timestamp, user_agent and free-form context — covering password
changes (success/failure/rate-limit/concurrent-conflict), token refresh
(success/failure), security incidents (token replay → family revocation),
authentication failures, and the OAuth events (client registration,
authorization, token exchange).

Recast: plain append-only file writes under a lock (the reference routes
through the ``logging`` module; a direct appender keeps the line format a
stable CONTRACT rather than a logging-config artifact), injectable clock,
0600 file, plus a small query helper (``read_events``) so tests and the
doctor can assert on the trail without parsing conventions leaking
everywhere.
"""

from __future__ import annotations

import json
import os
import threading
import time
from datetime import datetime, timezone
from typing import Callable

__all__ = ["AuditLogger"]


class AuditLogger:
    """Append-only structured security events (reference audit_logger.py)."""

    def __init__(
        self,
        log_file_path: str,
        *,
        now_fn: Callable[[], float] = time.time,
    ):
        self.log_file_path = log_file_path
        os.makedirs(os.path.dirname(os.path.abspath(log_file_path)), exist_ok=True)
        self._now = now_fn
        self._lock = threading.Lock()

    # -- core writer --

    def _write(self, label: str, entry: dict) -> None:
        entry = dict(entry)
        entry["timestamp"] = datetime.fromtimestamp(
            self._now(), tz=timezone.utc
        ).isoformat()
        line = f"{label}: {json.dumps(entry, sort_keys=True)}\n"
        with self._lock:
            fresh = not os.path.exists(self.log_file_path)
            with open(self.log_file_path, "a", encoding="utf-8") as f:
                f.write(line)
            if fresh:
                os.chmod(self.log_file_path, 0o600)

    # -- event surface (reference method-for-method) --

    def log_password_change_success(
        self, username: str, ip_address: str, user_agent: str | None = None,
        additional_context: dict | None = None,
    ) -> None:
        self._write("PASSWORD_CHANGE_SUCCESS", {
            "event_type": "password_change_success", "username": username,
            "ip_address": ip_address, "user_agent": user_agent,
            "additional_context": additional_context or {},
        })

    def log_password_change_failure(
        self, username: str, ip_address: str, reason: str,
        user_agent: str | None = None, additional_context: dict | None = None,
    ) -> None:
        self._write("PASSWORD_CHANGE_FAILURE", {
            "event_type": "password_change_failure", "username": username,
            "ip_address": ip_address, "reason": reason, "user_agent": user_agent,
            "additional_context": additional_context or {},
        })

    def log_rate_limit_triggered(
        self, username: str, ip_address: str, limit_type: str = "password_change",
        user_agent: str | None = None,
    ) -> None:
        self._write("RATE_LIMIT_TRIGGERED", {
            "event_type": "rate_limit_triggered", "username": username,
            "ip_address": ip_address, "limit_type": limit_type,
            "user_agent": user_agent,
        })

    def log_token_refresh_success(
        self, username: str, ip_address: str, user_agent: str | None = None,
    ) -> None:
        self._write("TOKEN_REFRESH_SUCCESS", {
            "event_type": "token_refresh_success", "username": username,
            "ip_address": ip_address, "user_agent": user_agent,
        })

    def log_token_refresh_failure(
        self, username: str, ip_address: str, reason: str,
        user_agent: str | None = None,
    ) -> None:
        self._write("TOKEN_REFRESH_FAILURE", {
            "event_type": "token_refresh_failure", "username": username,
            "ip_address": ip_address, "reason": reason, "user_agent": user_agent,
        })

    def log_security_incident(
        self, username: str, incident_type: str, ip_address: str,
        user_agent: str | None = None, additional_context: dict | None = None,
    ) -> None:
        self._write("SECURITY_INCIDENT", {
            "event_type": "security_incident", "incident_type": incident_type,
            "username": username, "ip_address": ip_address,
            "user_agent": user_agent,
            "additional_context": additional_context or {},
        })

    def log_authentication_failure(
        self, username: str, error_type: str, message: str,
        additional_context: dict | None = None,
    ) -> None:
        self._write("AUTHENTICATION_FAILURE", {
            "event_type": "authentication_failure", "username": username,
            "error_type": error_type, "message": message,
            "additional_context": additional_context or {},
        })

    def log_oauth_client_registration(
        self, client_id: str, client_name: str, ip_address: str,
    ) -> None:
        self._write("OAUTH_CLIENT_REGISTRATION", {
            "event_type": "oauth_client_registration", "client_id": client_id,
            "client_name": client_name, "ip_address": ip_address,
        })

    def log_oauth_authorization(
        self, username: str, client_id: str, ip_address: str,
        user_agent: str | None = None,
    ) -> None:
        self._write("OAUTH_AUTHORIZATION", {
            "event_type": "oauth_authorization", "username": username,
            "client_id": client_id, "ip_address": ip_address,
            "user_agent": user_agent,
        })

    def log_oauth_token_exchange(
        self, client_id: str, grant_type: str, ip_address: str,
        username: str | None = None, success: bool = True,
    ) -> None:
        self._write("OAUTH_TOKEN_EXCHANGE", {
            "event_type": "oauth_token_exchange", "client_id": client_id,
            "grant_type": grant_type, "ip_address": ip_address,
            "username": username, "success": success,
        })

    # -- query helper (not in the reference; tests + doctor read the trail) --

    def read_events(
        self,
        *,
        event_type: str | None = None,
        username: str | None = None,
        limit: int | None = None,
    ) -> list[dict]:
        if not os.path.exists(self.log_file_path):
            return []
        out: list[dict] = []
        with self._lock, open(self.log_file_path, encoding="utf-8") as f:
            for line in f:
                _, _, payload = line.partition(": ")
                try:
                    entry = json.loads(payload)
                except json.JSONDecodeError:
                    continue
                if event_type and entry.get("event_type") != event_type:
                    continue
                if username and entry.get("username") != username:
                    continue
                out.append(entry)
        return out[-limit:] if limit else out
