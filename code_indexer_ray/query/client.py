"""Authenticated API client tier — the reference ``api_clients/`` analog
(``base_client.py``, ``auth_client.py``, ``jwt_token_manager.py``,
``admin_client.py``, ``jobs_client.py``) over this server's routes.

``RemoteSession`` is the transport: username/password login to
``/auth/login`` (or a static API key), ``Authorization: Bearer`` on every
call, the sliding-session follow (every authed response may carry
``X-Renewed-Token`` — the reference's ``jwt_manager.extend_token_expiration``
contract; the session adopts it immediately), refresh-token rotation via
``/auth/refresh``, and the re-login-once-on-401 retry the reference's
``network_error_handler`` implements.  ``AdminClient`` and ``JobsClient``
are thin typed surfaces over ``/api/admin/*`` and ``/index /sync /jobs``.

All stdlib urllib — no Ray, usable from any process.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.parse
import urllib.request

from .remote import RemoteAuthError, RemoteQueryError, validate_server_url


class RemoteSession:
    """Authenticated transport with sliding-token follow.

    Exactly one of (``username``+``password``) or ``api_key`` is required.
    With credentials, login is lazy (first request) and re-attempted ONCE
    when a request comes back 401 mid-session (expired/revoked token);
    a second 401 raises — matching the reference's single-retry rule.
    """

    def __init__(
        self,
        server_url: str,
        *,
        username: str | None = None,
        password: str | None = None,
        api_key: str | None = None,
        timeout: float = 30.0,
    ):
        self.base = validate_server_url(server_url)
        if api_key is None and not (username and password):
            raise ValueError("username+password or api_key required")
        self.username, self.password, self.api_key = username, password, api_key
        self.timeout = timeout
        self._access: str | None = None
        self._refresh: str | None = None

    # -- auth --------------------------------------------------------------
    def login(self) -> dict:
        out = self._raw(
            "POST", "/auth/login",
            body={"username": self.username, "password": self.password},
            auth=False,
        )
        self._access = out["access_token"]
        self._refresh = out.get("refresh_token")
        return out

    def refresh(self) -> dict:
        """Rotate the pair via /auth/refresh (falls back to login when the
        server rejects the refresh token — rotation replay revokes families)."""
        if not self._refresh:
            return self.login()
        try:
            out = self._raw(
                "POST", "/auth/refresh",
                body={"refresh_token": self._refresh}, auth=False,
            )
        except (RemoteAuthError, RemoteQueryError):
            return self.login()
        self._access = out["access_token"]
        self._refresh = out.get("refresh_token", self._refresh)
        return out

    # -- transport ---------------------------------------------------------
    def _raw(self, method: str, path: str, *, params: dict | None = None,
             body: dict | None = None, auth: bool = True) -> dict:
        url = self.base + path
        if params:
            clean = {k: v for k, v in params.items() if v is not None}
            if clean:
                url += "?" + urllib.parse.urlencode(clean)
        headers = {"Content-Type": "application/json"}
        if auth:
            if self.api_key:
                headers["X-API-Key"] = self.api_key
            else:
                if self._access is None:
                    self.login()
                headers["Authorization"] = "Bearer " + self._access
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(url, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                renewed = r.headers.get("X-Renewed-Token")
                if renewed:
                    self._access = renewed  # sliding session: adopt immediately
                return json.loads(r.read() or b"{}")
        except urllib.error.HTTPError as e:
            try:
                msg = json.loads(e.read()).get("error", "")
            except Exception:
                msg = ""
            if e.code == 401:
                raise RemoteAuthError(f"authentication failed: {msg}") from e
            raise RemoteQueryError(e.code, msg) from e

    def request(self, method: str, path: str, *, params: dict | None = None,
                body: dict | None = None) -> dict:
        """One authed request with the single re-login retry on 401."""
        try:
            return self._raw(method, path, params=params, body=body)
        except RemoteAuthError:
            if self.api_key or not self.username:
                raise  # static keys can't be re-minted client-side
            self.refresh()
            return self._raw(method, path, params=params, body=body)

    # -- self-service key management (/api/keys) ---------------------------
    def my_keys(self) -> list[dict]:
        return self.request("GET", "/api/keys")["keys"]

    def create_key(self, name: str | None = None) -> dict:
        """Returns {"api_key": raw, "key_id": id} — raw shown once only."""
        return self.request("POST", "/api/keys", body={"name": name})

    def revoke_key(self, key_id: str) -> dict:
        return self.request("DELETE", f"/api/keys/{key_id}")

    def change_password(self, old: str, new: str) -> dict:
        out = self.request(
            "PUT", "/api/users/change-password",
            body={"old_password": old, "new_password": new},
        )
        self.password = new
        return out


class AdminClient:
    """``api_clients/admin_client.py`` analog: users, groups, API keys —
    every call needs a ``manage_users``-scoped session (admin role)."""

    def __init__(self, session: RemoteSession):
        self.s = session

    # users
    def users(self) -> list[dict]:
        return self.s.request("GET", "/api/admin/users")["users"]

    def create_user(self, username: str, password: str, role: str) -> dict:
        return self.s.request(
            "POST", "/api/admin/users",
            body={"username": username, "password": password, "role": role},
        )["user"]

    def set_role(self, username: str, role: str) -> dict:
        return self.s.request(
            "PUT", f"/api/admin/users/{username}", body={"role": role}
        )["user"]

    def reset_password(self, username: str, password: str) -> dict:
        return self.s.request(
            "PUT", f"/api/admin/users/{username}", body={"password": password}
        )["user"]

    def delete_user(self, username: str) -> dict:
        return self.s.request("DELETE", f"/api/admin/users/{username}")

    # groups
    def groups(self) -> list[dict]:
        return self.s.request("GET", "/api/admin/groups")["groups"]

    def create_group(self, name: str, description: str = "") -> dict:
        return self.s.request(
            "POST", "/api/admin/groups",
            body={"name": name, "description": description},
        )["group"]

    def update_group(self, group_id: int, description: str) -> dict:
        return self.s.request(
            "PUT", f"/api/admin/groups/{group_id}", body={"description": description}
        )

    def delete_group(self, group_id: int) -> dict:
        return self.s.request("DELETE", f"/api/admin/groups/{group_id}")

    def assign_user(self, username: str, group_id: int) -> dict:
        return self.s.request(
            "POST", f"/api/admin/groups/{group_id}/members",
            body={"username": username},
        )

    def grant_repo(self, repo: str, group_id: int) -> dict:
        return self.s.request(
            "POST", f"/api/admin/groups/{group_id}/repos", body={"repo": repo}
        )

    def revoke_repo(self, repo: str, group_id: int) -> dict:
        return self.s.request(
            "DELETE", f"/api/admin/groups/{group_id}/repos/{repo}"
        )

    # API keys on behalf of any user
    def keys(self, username: str) -> list[dict]:
        return self.s.request(
            "GET", "/api/admin/keys", params={"username": username}
        )["keys"]

    def create_key(self, username: str, name: str | None = None) -> dict:
        return self.s.request(
            "POST", "/api/admin/keys", body={"username": username, "name": name}
        )

    def revoke_key(self, username: str, key_id: str) -> dict:
        return self.s.request(
            "DELETE", f"/api/admin/keys/{key_id}", params={"username": username}
        )


class JobsClient:
    """``api_clients/jobs_client.py`` analog over /index /sync /jobs."""

    def __init__(self, session: RemoteSession):
        self.s = session

    def trigger_index(self, **params) -> str:
        return self.s.request("POST", "/index", body=params)["job_id"]

    def trigger_sync(self, **params) -> str:
        return self.s.request("POST", "/sync", body=params)["job_id"]

    def list(self, limit: int = 50) -> list[dict]:
        return self.s.request("GET", "/jobs", params={"limit": limit})["jobs"]

    def get(self, job_id: str) -> dict:
        return self.s.request("GET", f"/jobs/{job_id}")

    def cancel(self, job_id: str) -> dict:
        return self.s.request("POST", f"/jobs/{job_id}/cancel")

    def wait(self, job_id: str, *, timeout: float = 300.0, poll: float = 0.2) -> dict:
        """Poll until the job leaves running/pending; raises TimeoutError.
        Polling an endpoint that answers from the registry (never the
        searcher lock) is the intended cheap status check."""
        import time

        deadline = time.monotonic() + timeout
        while True:
            job = self.get(job_id)
            if job.get("state") not in ("pending", "running"):
                return job
            if time.monotonic() >= deadline:
                raise TimeoutError(f"job {job_id} still {job.get('state')} after {timeout}s")
            time.sleep(poll)
