"""MCP stdio↔HTTP bridge — the MCP-bundle client tier.

Reference analog: ``mcpb/`` (bridge.py:27 ``Bridge`` — newline-delimited
JSON-RPC stdio loop forwarding each request to the CIDX server;
auto_login.py — username/password → bearer token at startup;
token_refresh.py — re-login + single retry on 401 mid-session;
protocol.py — parse/invalid errors with MCP's id-0 convention).

A desktop MCP client (Claude Desktop etc.) speaks stdio; the index lives
behind a remote ``IndexHTTPServer``.  This bridge forwards raw JSON-RPC
lines to the server's ``/mcp`` endpoint so the client sees the full remote
tool surface with the server's auth + group repo-visibility enforced
server-side:

- credentials: an API key (``X-API-Key``, issued ``cidx_sk_`` keys or the
  plain deployment key) OR username/password (auto-login to
  ``/auth/login`` for a JWT; on 401 mid-session re-login once and retry —
  sliding sessions make this the steady state, hard expiry the retry);
- parse errors → JSON-RPC ``-32700`` with id 0 (MCP forbids null ids);
- transport failures → ``-32000`` carrying the HTTP error detail;
- notifications (no ``id``) forward but emit nothing (the server replies
  204).
"""

from __future__ import annotations

import json
import sys
import urllib.error
import urllib.request

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
SERVER_ERROR = -32000


def _err(req_id, code: int, message: str) -> dict:
    return {"jsonrpc": "2.0", "error": {"code": code, "message": message},
            "id": req_id if req_id is not None else 0}


class BridgeClient:
    """HTTP side of the bridge: POST /mcp with bearer/API-key auth and the
    reference's relogin-once-on-401 behavior."""

    def __init__(self, server_url: str, *, api_key: str | None = None,
                 username: str | None = None, password: str | None = None,
                 timeout: float = 30.0):
        self.base = server_url.rstrip("/")
        self.api_key = api_key
        self.username = username
        self.password = password
        self.timeout = timeout
        self._bearer: str | None = None
        if username is not None:
            self._login()

    def _login(self) -> None:
        req = urllib.request.Request(
            self.base + "/auth/login",
            data=json.dumps(
                {"username": self.username, "password": self.password}
            ).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            self._bearer = json.loads(r.read())["access_token"]

    def _post(self, request: dict) -> tuple[int, dict | None]:
        headers = {"Content-Type": "application/json"}
        if self._bearer:
            headers["Authorization"] = "Bearer " + self._bearer
        elif self.api_key:
            headers["X-API-Key"] = self.api_key
        req = urllib.request.Request(
            self.base + "/mcp", data=json.dumps(request).encode(),
            headers=headers, method="POST",
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            if r.status == 204:
                return 204, None
            body = r.read()
            renewed = r.headers.get("X-Renewed-Token")
            if renewed:
                self._bearer = renewed  # sliding session follows the server
            return r.status, json.loads(body)

    def forward(self, request: dict) -> dict | None:
        """One JSON-RPC dict → response dict (None for notifications)."""
        try:
            try:
                status, out = self._post(request)
            except urllib.error.HTTPError as e:
                if e.code == 401 and self.username is not None:
                    # hard-expired session: re-login ONCE and retry
                    self._login()
                    status, out = self._post(request)
                else:
                    raise
        except urllib.error.HTTPError as e:
            try:
                detail = json.loads(e.read()).get("error", "")
            except Exception:  # noqa: BLE001
                detail = ""
            return _err(request.get("id"), SERVER_ERROR,
                        f"server returned {e.code}: {detail}")
        except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
            return _err(request.get("id"), SERVER_ERROR, f"cannot reach server: {e}")
        return out if status != 204 else None


class Bridge:
    """stdio loop: one JSON-RPC request per line in, one response per line
    out (nothing for notifications) — reference bridge.py run_stdio_loop."""

    def __init__(self, client: BridgeClient):
        self.client = client

    def process_line(self, line: str) -> dict | None:
        try:
            request = json.loads(line)
        except json.JSONDecodeError as e:
            return _err(None, PARSE_ERROR, f"Parse error: {e}")
        if not isinstance(request, dict) or "method" not in request:
            rid = request.get("id") if isinstance(request, dict) else None
            return _err(rid, INVALID_REQUEST, "Invalid Request: missing 'method'")
        return self.client.forward(request)

    def run(self, stdin=None, stdout=None) -> None:
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            out = self.process_line(line)
            if out is not None:
                stdout.write(json.dumps(out) + "\n")
                stdout.flush()
