"""Remote mode — a project root whose queries execute on a CIDX HTTP server
(reference ``remote/``: ``config.py``, ``initialization.py``,
``query_execution.py``, ``staleness_detector.py``, ``url_validator.py``,
``api_clients/base_client.py``).

The reference's remote mode links a local checkout to a server: an on-disk
remote config (mode marker + server URL + credentials) switches every query
command to transparent HTTP execution with identical syntax and output, a
retrying API client maps transport/auth failures to typed errors, and a
staleness detector annotates each hit with whether the local working copy
changed after the server indexed it (stale results are demoted, never
hidden).  Here the server is this package's own ``IndexHTTPServer`` (same
JSON surface the daemons serve), the credential is the server's X-API-Key,
and the staleness cut is the server index's build timestamp from ``/stats``
(this engine's index is immutable-per-generation, so one timestamp governs
every doc in a generation).

Scale: remote mode ships QUERIES, not data — the client holds zero
corpus-sized state and the server side is the shard-group / term-routed
engine fan-out.  Retries are bounded with exponential backoff so a dead
server fails fast instead of hammering it.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.parse
import urllib.request

from ..index.manifest import atomic_write_json

REMOTE_CONFIG_NAME = ".remote-config.json"


class RemoteError(RuntimeError):
    """Base for remote-mode failures."""


class RemoteConfigError(RemoteError):
    """Missing / invalid remote configuration (reference
    RemoteConfigurationError)."""


class RemoteConnectionError(RemoteError):
    """Server unreachable after retries (reference NetworkError)."""


class RemoteAuthError(RemoteError):
    """Server rejected the credential (reference AuthenticationError)."""


class RemoteQueryError(RemoteError):
    """Server answered with a non-auth error (carries the server message)."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status


def validate_server_url(url: str) -> str:
    """Normalized URL or RemoteConfigError (reference url_validator.py:
    scheme must be http/https, host required; trailing slash dropped)."""
    parsed = urllib.parse.urlparse(url)
    if parsed.scheme not in ("http", "https"):
        raise RemoteConfigError(f"server URL must be http(s), got {url!r}")
    if not parsed.netloc:
        raise RemoteConfigError(f"server URL has no host: {url!r}")
    return url.rstrip("/")


def _config_path(root: str) -> str:
    return os.path.join(root, REMOTE_CONFIG_NAME)


def init_remote(root: str, server_url: str, *, api_key: str | None = None,
                force: bool = False) -> dict:
    """Create the remote config at ``root`` (reference
    ``create_remote_configuration``).  A root that is already an index or
    proxy root is a mode conflict (the reference's initializers refuse to
    stack modes); ``force`` only overwrites an existing REMOTE config."""
    from .proxy import detect_mode

    mode = detect_mode(root)
    if mode in ("index", "proxy"):
        raise RemoteConfigError(f"{root} is already a {mode} root")
    path = _config_path(root)
    if os.path.exists(path) and not force:
        raise RemoteConfigError(f"remote config already exists at {path} (use force)")
    cfg = {
        "mode": "remote",
        "server_url": validate_server_url(server_url),
        "api_key": api_key,
    }
    os.makedirs(root, exist_ok=True)
    atomic_write_json(path, cfg)
    os.chmod(path, 0o600)  # credential file: owner-only (reference chmod)
    return cfg


#: side files a remote link may leave next to the config (reference
#: remote_uninstall.py removes .remote-config/.credential-cache/
#: .server-session/.remote-metadata; this engine keeps everything in the
#: one config file, the others are listed for forward compatibility)
_REMOTE_SIDE_FILES = (
    ".remote-tokens.json", ".remote-session.json", ".remote-metadata.json",
)


def uninstall_remote(root: str, *, dry_run: bool = False) -> dict:
    """Safely unlink a root from its server (reference
    ``remote_uninstall.py::RemoteUninstaller``): remove ONLY the remote
    config + credential side files at ``root`` — never project files — and
    return ``{"removed": [...], "preserved_root": root}``.  ``dry_run``
    previews without deleting.  Raises ``RemoteConfigError`` when the root
    has no remote config (nothing to uninstall)."""
    cfg = _config_path(root)
    if not os.path.exists(cfg):
        raise RemoteConfigError(f"no remote config at {cfg}")
    targets = [cfg] + [
        p for name in _REMOTE_SIDE_FILES
        if os.path.exists(p := os.path.join(root, name))
    ]
    if not dry_run:
        for p in targets:
            os.remove(p)
    return {
        "removed": [os.path.basename(p) for p in targets],
        "dry_run": dry_run,
        "preserved_root": os.path.abspath(root),
    }


def load_remote_config(root: str) -> dict:
    """Nearest remote config at or above ``root`` (the mode detector's
    walk), or RemoteConfigError."""
    cur = os.path.abspath(root)
    for _ in range(11):
        path = _config_path(cur)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        parent = os.path.dirname(cur)
        if parent == cur:
            break
        cur = parent
    raise RemoteConfigError(f"no remote config at or above {root}")


class RemoteClient:
    """Retrying JSON client for ``IndexHTTPServer`` (reference
    api_clients/base_client.py + remote_query_client.py).

    Transport errors retry ``retries`` times with exponential backoff and
    then raise :class:`RemoteConnectionError`; 401 raises
    :class:`RemoteAuthError` immediately (a bad key never gets better by
    retrying); other HTTP errors raise :class:`RemoteQueryError` carrying
    the server's JSON error message.  5xx responses are retried too — the
    reference treats them as transient server conditions."""

    def __init__(self, root_or_config: str | dict, *, retries: int = 3,
                 backoff: float = 0.2, timeout: float = 30.0):
        cfg = (root_or_config if isinstance(root_or_config, dict)
               else load_remote_config(root_or_config))
        self.base = validate_server_url(cfg["server_url"])
        self.api_key = cfg.get("api_key")
        self.retries = retries
        self.backoff = backoff
        self.timeout = timeout

    # -- transport ---------------------------------------------------------
    def _request(self, path: str, params: dict | None = None,
                 body: dict | None = None) -> dict:
        url = self.base + path
        if params:
            clean = {k: v for k, v in params.items() if v is not None}
            if clean:
                url += "?" + urllib.parse.urlencode(clean)
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["X-API-Key"] = self.api_key
        data = json.dumps(body).encode() if body is not None else None
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            req = urllib.request.Request(url, data=data, headers=headers)
            try:
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    return json.loads(r.read())
            except urllib.error.HTTPError as e:
                try:
                    msg = json.loads(e.read()).get("error", "")
                except Exception:
                    msg = ""
                if e.code == 401:
                    raise RemoteAuthError(f"authentication failed: {msg}") from e
                if e.code >= 500:  # transient server side — retry
                    last = RemoteQueryError(e.code, msg)
                else:
                    raise RemoteQueryError(e.code, msg) from e
            except (urllib.error.URLError, ConnectionError, TimeoutError) as e:
                last = e
            if attempt < self.retries:
                time.sleep(self.backoff * (2 ** attempt))
        if isinstance(last, RemoteQueryError):
            raise last
        raise RemoteConnectionError(f"cannot reach {self.base}: {last}") from last

    # -- API surface (mirrors the server routes) ---------------------------
    def health(self) -> dict:
        return self._request("/health")

    def stats(self) -> dict:
        return self._request("/stats")

    def search(self, q: str, **params) -> list[dict]:
        """Transparent remote query (reference execute_remote_query):
        the full REST parameter surface, identical hit dicts."""
        return self._request("/search", params={"q": q, **params})["hits"]

    def batch(self, queries: list[dict]) -> list[dict]:
        return self._request("/batch", body={"queries": queries})["results"]

    def mget(self, ids: list[int]) -> list[dict]:
        return self._request("/mget", params={"ids": ",".join(map(str, ids))})["docs"]

    def suggest(self, word: str, max_distance: int = 2):
        return self._request(
            "/suggest", params={"word": word, "max_distance": max_distance}
        )["suggestion"]

    def complete(self, prefix: str, limit: int = 10) -> list:
        return self._request(
            "/complete", params={"prefix": prefix, "limit": limit}
        )["completions"]


# -- staleness detection (reference staleness_detector.py) -----------------

def apply_staleness(hits: list[dict], local_mtimes: dict[str, float],
                    index_timestamp: float | None, *,
                    path_key: str = "path") -> list[dict]:
    """Annotate and re-order hits by local-vs-index freshness.

    A hit is STALE when the local copy of its file changed after the server
    indexed it (``local_mtime > index_timestamp``) — the remote result no
    longer reflects the working tree.  Mirrors the reference's
    EnhancedQueryResultItem fields (``is_stale``, ``local_file_mtime``,
    ``staleness_delta_seconds``, indicator) and its
    ``_sort_with_staleness_priority``: fresh results first, score order
    within each class — stale hits are DEMOTED, never dropped.  Hits whose
    path has no local counterpart are fresh by definition (nothing local to
    contradict the server)."""
    out = []
    for h in hits:
        h = dict(h)
        mtime = local_mtimes.get(h.get(path_key))
        stale = (mtime is not None and index_timestamp is not None
                 and mtime > index_timestamp)
        h["local_file_mtime"] = mtime
        h["is_stale"] = bool(stale)
        h["staleness_delta_seconds"] = (
            round(mtime - index_timestamp, 3) if stale else 0.0
        )
        h["staleness_indicator"] = (
            f"local +{h['staleness_delta_seconds']}s" if stale else ""
        )
        out.append(h)
    out.sort(key=lambda h: (h["is_stale"], -h.get("score", 0.0)))
    return out


# ---------------------------------------------------------------------------
# Tiered remote health check (reference remote/health_checker.py:47
# RealServerHealthChecker): connectivity -> authentication -> repository
# access -> server info, each tier only attempted when the previous one
# held, classified into the reference's connection_health vocabulary.
# Real HTTP against the configured server; no fallback to fake data.


def check_remote_health(root_or_config: str | dict, *, timeout: float = 10.0) -> dict:
    """Comprehensive health result for the linked server.

    Returns {server_reachable, authentication_valid, repository_accessible,
    connection_health, server_info, error_details, check_timestamp} with
    connection_health one of: healthy / server_unreachable /
    authentication_failed / repository_not_accessible / degraded.
    """
    ts = time.time()
    out = {
        "server_reachable": False,
        "authentication_valid": False,
        "repository_accessible": False,
        "connection_health": "server_unreachable",
        "server_info": None,
        "error_details": None,
        "check_timestamp": round(ts, 3),
    }
    try:
        client = RemoteClient(root_or_config, retries=1, timeout=timeout)
    except (RemoteConfigError, ValueError) as e:
        out["connection_health"] = "configuration_invalid"
        out["error_details"] = str(e)
        return out

    # tier 1: unauthenticated connectivity (/health is public by contract)
    try:
        info = client.health()
    except RemoteError as e:
        out["error_details"] = f"connectivity: {e}"
        return out
    out["server_reachable"] = True
    out["server_info"] = info

    # tier 2: authentication (/stats requires credentials when configured).
    # A 403 here means the credentials ARE valid but the repo-visibility
    # gate blocks the searcher tier — that's tier 3's classification.
    stats = {}
    try:
        stats = client.stats()
    except RemoteAuthError as e:
        out["connection_health"] = "authentication_failed"
        out["error_details"] = f"authentication: {e}"
        return out
    except RemoteQueryError as e:
        if e.status == 403:
            out["authentication_valid"] = True
            out["connection_health"] = "repository_not_accessible"
            out["error_details"] = f"repository: {e}"
            return out
        out["connection_health"] = "degraded"
        out["error_details"] = f"stats: {e}"
        return out
    except RemoteError as e:
        out["connection_health"] = "degraded"
        out["error_details"] = f"stats: {e}"
        return out
    out["authentication_valid"] = True
    out["server_info"] = {**info, **stats}

    # tier 3: repository access (a 1-hit probe query exercises the group
    # repo-visibility gate — 403 = authenticated but repo invisible)
    try:
        client.search("a", limit=1, snippet_lines=0)
    except RemoteQueryError as e:
        if e.status == 403:
            out["connection_health"] = "repository_not_accessible"
            out["error_details"] = f"repository: {e}"
            return out
        if e.status == 503:  # no generation published yet: reachable+authed
            out["connection_health"] = "degraded"
            out["error_details"] = f"repository: {e}"
            return out
        out["connection_health"] = "degraded"
        out["error_details"] = f"search: {e}"
        return out
    except RemoteError as e:
        out["connection_health"] = "degraded"
        out["error_details"] = f"search: {e}"
        return out
    out["repository_accessible"] = True
    out["connection_health"] = "healthy"
    return out
