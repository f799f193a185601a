"""HTTP JSON API over a warm :class:`IndexSearcher` — the reference's
server surface (``server/app.py``: FastAPI app with ``/health``, query and
stats routes, API-key auth; ``server/mcp/`` tool endpoints) recast as a
dependency-free stdlib ``ThreadingHTTPServer``.

Routes (all JSON):

    GET  /health                       liveness + index identity
    GET  /stats                        manifest summary (docs/tokens/shards)
    GET  /search?q=...&limit=10        full query-string grammar (query/parser.py:
                                       boolean, fuzzy, wildcard, phrase, lang:/path:
                                       facets, field:term clauses on fields= builds);
                                       with --vector-store: search_mode=
                                       semantic|fts|hybrid (semantic = vector
                                       top-k, hybrid = RRF of both legs)
    POST /search      {"q": ..., "limit": ..., "snippet_lines": ...}
    POST /batch       {"queries": [{"id": ..., "q": ..., "limit": ...}, ...]}
    GET  /mget?ids=1,2,3               stored fields by doc address
    GET  /suggest?word=...             spell suggestion ("did you mean")
    GET  /complete?prefix=...&limit=   df-ranked prefix completion

With ``enable_jobs=True`` (the reference's background-job routes,
``server/repositories/background_jobs.py``), builds run server-side:

    POST /index       {"input": parquet, ...build params}  → 202 {"job_id"}
    POST /sync        {"input": snapshot, ...sync params}  → 202 {"job_id"}
                      (change analysis + reindexing decision engine choose
                      full rebuild vs incremental merge vs no-op)
    GET  /jobs                         recent job records (newest first)
    GET  /jobs/<id>                    one job record
    POST /jobs/<id>/cancel             cancel pending / stamp running

A completed build publishes a fresh ``gen_%06d`` under the server root and
repoints ``current``; the follower logic below picks it up on the next
request, so POST /index → poll /jobs/<id> → /search hits the new corpus
with no restart.

Auth: pass ``api_key=`` to require ``X-API-Key`` on every route except
``/health`` (the reference's credential-manager analog, scoped to what a
sandboxed stdlib server can honestly provide).

Concurrency model: the server thread-pool accepts requests concurrently and
searcher routes check out one of ``pool_size`` INDEPENDENT searcher
replicas over the same immutable generation (driver-side merge state —
result cache, row-group cache, lazy shard readers — is not thread-safe, so
each replica is serialized by slot ownership; N slots ⇒ N overlapping
searches per process).  The engine's other parallel axis stays the Ray
actor pool (``remote=True`` + ``shard_group_size``) for intra-query shard
work.  Cross-process scale-out = replicas of this server over the same
index directory, like any stateless query tier.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from ..query.engine import IndexSearcher
from ..query.parser import search_query_string

_MAX_BODY = 8 * 1024 * 1024  # reject absurd request bodies outright


def _ip(h) -> str:
    try:
        return h.client_address[0]
    except (AttributeError, IndexError, TypeError):
        return "unknown"


def _flag(params: dict, key: str) -> bool:
    v = params.get(key)
    if isinstance(v, str):
        return v.lower() in ("1", "true", "yes")
    return bool(v)


_SEARCH_MODES = ("semantic", "fts", "hybrid")


def rest_search(searcher, q: str, params: dict, semantic=None) -> list[dict]:
    """REST/MCP parameter surface + validation rules of the reference
    (QUERY_PARAMETERS.md): limit 1-100 (0 = this engine's unlimited),
    snippet_lines 0-50, regex+fuzzy mutually exclusive, accuracy
    enum-validated (and ignored on the FTS route, exactly the reference's
    non-composite warning path), min_score as a ×3-over-fetch post-filter.
    Shared by the HTTP /search|/batch routes and the MCP search_code tool
    (reference exposes the identical surface on both, mcp/tools.py:372).

    ``search_mode`` (reference "Search Mode Selection"): ``semantic`` /
    ``fts`` / ``hybrid``.  ``semantic`` is the reference's default and the
    default HERE when the server was configured with a vector store
    (``semantic=`` a :class:`~..query.semantic.SemanticTier`); a server
    without one defaults to ``fts`` and 400s explicit semantic/hybrid
    requests.  Per the reference's validation table, FTS-only parameters
    (fuzzy / regex / case_sensitive / edit_distance) are rejected in
    semantic mode, and ``accuracy`` resolves the vector leg's ``nprobe``
    (it stays validated-but-inert on pure FTS, the reference's
    non-composite warning path).  ``branch`` visibility is an FTS index
    feature and is rejected on the modes with a vector leg."""
    limit = int(params.get("limit", 10))
    if "limit" in params and limit != 0 and not (1 <= limit <= 100):
        raise ValueError("limit must be 0 (unlimited) or 1-100")
    snippet_lines = int(params.get("snippet_lines", 0))
    if not (0 <= snippet_lines <= 50):
        raise ValueError("snippet_lines must be 0-50")
    if params.get("accuracy") is not None:
        from ..ann.accuracy import validate_accuracy

        validate_accuracy(params["accuracy"])
    mode = params.get("search_mode")
    if mode is None:
        mode = "semantic" if semantic is not None else "fts"
    if mode not in _SEARCH_MODES:
        raise ValueError(f"search_mode must be one of {_SEARCH_MODES}, got {mode!r}")
    if mode != "fts" and semantic is None:
        raise ValueError(
            f"search_mode={mode!r} requires a vector store (--vector-store)"
        )
    fuzzy = _flag(params, "fuzzy")
    regex = _flag(params, "regex")
    if fuzzy and regex:
        raise ValueError("regex and fuzzy are mutually exclusive")
    if mode == "semantic":
        for p in ("fuzzy", "regex", "case_sensitive"):
            if _flag(params, p):
                raise ValueError(
                    f"{p} is only applicable when search_mode is fts or hybrid"
                )
        if int(params.get("edit_distance", 0) or 0):
            raise ValueError(
                "edit_distance is only applicable when search_mode is fts or hybrid"
            )
    if mode != "fts":
        if limit == 0:
            raise ValueError("limit=0 (unlimited) is FTS-only; k-NN needs a finite k")
        if params.get("branch"):
            raise ValueError("branch visibility is only applicable to search_mode=fts")
        if regex:
            # QUERY_PARAMETERS.md marks regex "(FTS-only)" — a raw pattern
            # has no embedding and no grammar form for the lexical leg
            raise ValueError("regex is only applicable when search_mode is fts")
        return _vector_mode_search(
            searcher, semantic, mode, q, params, limit, snippet_lines
        )
    kw = {}
    if params.get("branch"):  # branch-visibility filter (J4)
        kw["branch"] = params["branch"]
    if params.get("language"):
        kw["languages"] = [params["language"]]
    if params.get("exclude_language"):
        kw["exclude_languages"] = [params["exclude_language"]]
    if params.get("path_filter"):
        kw["path_filters"] = [params["path_filter"]]
    if params.get("exclude_path"):
        kw["exclude_paths"] = [params["exclude_path"]]
    fx = params.get("file_extensions")
    if fx:
        kw["file_extensions"] = fx.split(",") if isinstance(fx, str) else list(fx)
    ed = int(params.get("edit_distance", 0) or 0)
    if fuzzy and not ed:
        ed = 1  # reference: --fuzzy means edit distance 1
    if ed:
        kw["edit_distance"] = ed
    if _flag(params, "case_sensitive"):
        kw["case_sensitive"] = True

    ms = params.get("min_score")
    fetch = limit
    if ms is not None and limit > 0:
        fetch = limit * 3  # O1 over-fetch convention for post-filters
    try:
        if regex:
            # an explicit regex request carries a RAW pattern — the
            # query-string grammar (which owns '*'/'?' wildcards) must
            # not reinterpret it (reference REST passes it through too)
            hits = searcher.search(
                q, limit=fetch, snippet_lines=snippet_lines, use_regex=True, **kw
            )
        else:
            hits = search_query_string(
                searcher, q, limit=fetch, snippet_lines=snippet_lines, **kw
            )
    except TypeError as e:
        # a grammar construct (wildcard → regex) colliding with an
        # explicit structured parameter is a caller error, not a crash
        raise ValueError(str(e)) from e
    if ms is not None:
        ms_f = float(ms)
        hits = [h for h in hits if h["score"] >= ms_f]
        if limit > 0:
            hits = hits[:limit]
    return hits


def _vector_mode_search(
    searcher, tier, mode: str, q: str, params: dict, limit: int, snippet_lines: int
) -> list[dict]:
    """semantic / hybrid dispatch (validation already done by rest_search)."""
    from ..query.semantic import hybrid_hits, semantic_hits

    fx = params.get("file_extensions")
    filters = dict(
        language=params.get("language") or None,
        exclude_language=params.get("exclude_language") or None,
        path_filter=params.get("path_filter") or None,
        exclude_path=params.get("exclude_path") or None,
        file_extensions=(fx.split(",") if isinstance(fx, str) else list(fx)) if fx else None,
    )
    ms = params.get("min_score")
    npb = params.get("nprobe")
    common = dict(
        limit=limit,
        snippet_lines=snippet_lines,
        nprobe=int(npb) if npb is not None else None,
        accuracy=params.get("accuracy"),
        min_score=float(ms) if ms is not None else None,
    )
    if mode == "semantic":
        return semantic_hits(searcher, tier, q, **common, **filters)
    # hybrid: the lexical leg uses the engine-native filter kwargs (same
    # params rest_search's FTS path builds), incl. fuzzy/case options
    lex_kw = {}
    if filters["language"]:
        lex_kw["languages"] = [filters["language"]]
    if filters["exclude_language"]:
        lex_kw["exclude_languages"] = [filters["exclude_language"]]
    if filters["path_filter"]:
        lex_kw["path_filters"] = [filters["path_filter"]]
    if filters["exclude_path"]:
        lex_kw["exclude_paths"] = [filters["exclude_path"]]
    if filters["file_extensions"]:
        lex_kw["file_extensions"] = filters["file_extensions"]
    ed = int(params.get("edit_distance", 0) or 0)
    if _flag(params, "fuzzy") and not ed:
        ed = 1
    if ed:
        lex_kw["edit_distance"] = ed
    if _flag(params, "case_sensitive"):
        lex_kw["case_sensitive"] = True
    return hybrid_hits(
        searcher, tier, q, lexical_kw=lex_kw, **common, **filters
    )


class GenerationFollower:
    """Tracks the live index generation under a root directory — the
    reference watch-daemon behavior (the watch loop publishes fresh
    generation dirs and atomically repoints ``current``; a daemon must
    follow without restarting).  Shared by the HTTP and MCP tiers.

    A ``current`` pointer file in the root (WatchDriver layout) redirects to
    the live generation; the change stamp is (resolved dir, manifest
    mtime_ns) so both a pointer flip and an in-place re-publish are
    detected.  ``defer_missing=True`` lets a jobs-enabled server start over
    an empty root: ``searcher`` stays None until a generation is published.
    """

    def __init__(
        self,
        root: str,
        ctor: dict,
        *,
        follow: bool = True,
        warm: bool = False,
        defer_missing: bool = False,
        pool_size: int = 1,
    ):
        self._root = root
        self._follow = follow
        self._ctor = ctor
        self._pool_size = max(1, int(pool_size))
        self.index_dir, self._stamp = self._resolve()
        if self._stamp[1] is None and defer_missing:
            self.searchers: list[IndexSearcher] = []
        else:
            self.searchers = self._build(self.index_dir, warm=warm)

    def _build(self, d: str, *, warm: bool = False) -> list:
        """``pool_size`` INDEPENDENT searcher replicas over the same
        immutable generation — driver-side caches (result cache, row-group
        cache, lazy shard readers) are not thread-safe, so intra-process
        query concurrency comes from replicas, each serialized by its own
        pool slot, not from sharing one searcher."""
        out = [IndexSearcher(d, **self._ctor) for _ in range(self._pool_size)]
        if warm:
            for s in out:
                s.warm()
        return out

    @property
    def searcher(self) -> IndexSearcher | None:
        return self.searchers[0] if self.searchers else None

    def _resolve(self) -> tuple[str, tuple]:
        d = self._root
        cur = os.path.join(d, "current")
        if os.path.isfile(cur):
            try:
                with open(cur) as f:
                    d = os.path.join(self._root, f.read().strip())
            except OSError:
                pass
        try:
            mt = os.stat(os.path.join(d, "manifest.json")).st_mtime_ns
        except OSError:
            mt = None
        return d, (d, mt)

    def refresh(self) -> None:
        """Swap to the live generation if it changed — one stat per call
        (two with a pointer file).  The new searcher starts cold and
        lazy-loads (no warm() stall inside a request); the old one is
        dropped and its readers/actors are garbage-collected."""
        if not self._follow:
            return
        d, stamp = self._resolve()
        if stamp != self._stamp:
            self.searchers = self._build(d) if stamp[1] is not None else []
            self.index_dir, self._stamp = d, stamp


class IndexHTTPServer:
    """Owns the searcher, the lock and the listening socket.

    ``port=0`` binds an ephemeral port (tests); ``.port`` reports the bound
    port either way.  ``start()`` serves on a daemon thread and returns it;
    ``serve_forever()`` blocks (CLI); ``shutdown()`` stops either mode.
    """

    def __init__(
        self,
        index_dir: str,
        *,
        host: str = "127.0.0.1",
        port: int = 8765,
        remote: bool = False,
        shard_group_size: int = 1,
        lang_col: str | None = "lang",
        url_col: str | None = "url",
        api_key: str | None = None,
        warm: bool = True,
        follow: bool = True,
        enable_jobs: bool = False,
        scip_store: str | None = None,
        temporal_index: str | None = None,
        vector_store: str | None = None,
        auth_dir: str | None = None,
        auth=None,
        payload_cache: str | None = None,
        pool_size: int = 1,
        enable_metrics: bool = False,
        repo_name: str | None = None,
        auto_update=None,
    ):
        # optional AutoUpdateService (reference server/auto_update): status
        # rides /health so operators see "update available" on the
        # liveness route they already poll
        self.auto_update = auto_update
        # registry alias this single index serves (reference
        # access_filtering_service.py, Story #707): when auth + groups are
        # configured AND the deployment names the repo, the plain /search
        # tier enforces the same group visibility the omni fan-out applies —
        # without this a group-restricted user could point /search at a
        # registry-managed root and bypass invisible-repo filtering
        # (VERDICT r4 task #8 / builder NOTES_r4 gap).
        self.repo_name = repo_name
        # semantic/hybrid search_mode tier (reference default mode); lazy
        # like the scip/temporal tiers — first semantic request loads it
        self._vector_root = vector_store
        self._semantic = None
        self._scip_root = scip_store
        self._scip = None
        # temporal routes (reference REST temporal parameters: time_range,
        # at_commit, include_removed, show_evolution, chunk_type, ...)
        self._temporal_root = temporal_index
        self._temporal = None
        self._temporal_lock = threading.Lock()
        # SymbolStore's part cache + shared ParquetFile handles are not
        # thread-safe; scip routes serialize under their own lock (separate
        # from the searcher lock so code-intel and search don't queue on
        # each other)
        self._scip_lock = threading.Lock()
        self.jobs = None
        if enable_jobs:
            from .jobs import JobManager

            self.jobs = JobManager(index_dir)
        # jobs-enabled server over an empty root: no generation published
        # yet — searcher comes up on the first request after a build
        self._follower = GenerationFollower(
            index_dir,
            dict(
                remote=remote,
                shard_group_size=shard_group_size,
                lang_col=lang_col,
                url_col=url_col,
            ),
            follow=follow,
            warm=warm,
            defer_missing=self.jobs is not None,
            pool_size=pool_size,
        )
        self.api_key = api_key
        # JWT auth tier (reference server/auth/*): pass a prebuilt AuthTier
        # (tests inject fake clocks) or an auth_dir to build the default one.
        # When configured, every route except /health /auth/login
        # /auth/refresh requires Authorization: Bearer and a role whose
        # inherited permissions cover the route; X-API-Key is then ignored.
        if auth is None and auth_dir is not None:
            from .auth import AuthTier

            auth = AuthTier(auth_dir)
        self.auth = auth
        # payload cache (reference server/cache/payload_cache.py, Story
        # #679): /mget?truncate=true parks oversized stored text behind a
        # handle; /payload pages it back out
        self.payload = None
        if payload_cache is not None:
            from .payload import PayloadCache, PayloadCacheConfig

            db = payload_cache
            if os.path.isdir(db) or not db.endswith(".sqlite"):
                db = os.path.join(db, "payload_cache.sqlite")
            self.payload = PayloadCache(db, PayloadCacheConfig.from_env())
            self.payload.start_background_cleanup()
        # searcher-replica pool (VERDICT r3 #7): searcher calls used to
        # serialize behind ONE process-wide lock, capping a single
        # deployment's QPS at one core of scoring.  pool_size > 1 keeps N
        # independent replicas over the same immutable generation; each
        # request checks out a slot (its replica is serialized by slot
        # ownership alone), so N searches overlap.  Non-searcher routes
        # (/health, /payload, jobs, auth) never touch the pool.
        import queue as _queue

        self._slots: _queue.Queue = _queue.Queue()
        for i in range(max(1, int(pool_size))):
            self._slots.put(i)
        self._refresh_lock = threading.Lock()
        self._tls = threading.local()
        # metrics tier (reference server/telemetry/ Story #695/#696 metric
        # vocabulary; stdlib registry + Prometheus text exposition — the
        # OTEL SDK is unavailable here).  Lazy: nothing sampled unless
        # enabled AND scraped/recorded.
        self.metrics = None
        if enable_metrics:
            from .metrics import MachineMetricsCollector, MetricsRegistry

            self.metrics = MetricsRegistry()
            self._m_requests = self.metrics.counter(
                "http.server.request", "requests by route/method/status"
            )
            self._m_duration = self.metrics.histogram(
                "http.server.request.duration", "request latency (seconds)"
            )
            MachineMetricsCollector().register(self.metrics)
            if self.jobs is not None:
                self.metrics.gauge(
                    "cidx.jobs", "job records by state", callback=self._job_states
                )
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet by default; the CLI prints the URL
                pass

            def do_GET(self):
                server._timed_dispatch(self, body=None)

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                if n > _MAX_BODY:
                    server._reply(self, 413, {"error": "request body too large"})
                    return
                raw = self.rfile.read(n) if n else b""
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if (
                    self.path.startswith("/web")
                    and ctype == "application/x-www-form-urlencoded"
                ):
                    # browser form posts (the /web HTML tier)
                    body = {k: v[-1] for k, v in parse_qs(raw.decode()).items()}
                    server._timed_dispatch(self, body=body)
                    return
                try:
                    body = json.loads(raw) if raw else {}
                except json.JSONDecodeError:
                    server._reply(self, 400, {"error": "invalid JSON body"})
                    return
                server._timed_dispatch(self, body=body)

            do_PUT = do_POST

            def do_DELETE(self):
                server._dispatch(self, body=None)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.host, self.port = self.httpd.server_address[:2]
        if self.auth is not None and getattr(self.auth, "oauth", None) is not None:
            # discovery metadata must advertise THIS server's real endpoints
            self.auth.oauth.issuer = f"http://{self.host}:{self.port}"
        self._thread: threading.Thread | None = None

    # ---- lifecycle ----

    def start(self) -> threading.Thread:
        t = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        t.start()
        self._thread = t
        return t

    def serve_forever(self) -> None:
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        if self.jobs is not None:
            self.jobs.stop()
        if self.payload is not None:
            self.payload.stop_background_cleanup()

    # ---- index-generation following: delegated to GenerationFollower;
    # refresh runs under the dispatch lock (one stat per request) ----

    @property
    def searcher(self) -> IndexSearcher | None:
        # inside a dispatched request: the replica checked out for this
        # thread's pool slot; outside (warm-up, tests): replica 0
        got = getattr(self._tls, "searcher", None)
        if got is not None:
            return got
        return self._follower.searcher

    @property
    def index_dir(self) -> str:
        return self._follower.index_dir

    def _refresh(self) -> None:
        self._follower.refresh()

    # ---- request plumbing ----

    def _reply(self, h, code: int, payload: dict | list) -> None:
        h._last_status = code
        data = json.dumps(payload).encode()
        h.send_response(code)
        h.send_header("Content-Type", "application/json")
        h.send_header("Content-Length", str(len(data)))
        renewed = getattr(h, "_renewed_token", None)
        if renewed:
            # sliding sessions (reference jwt_manager.extend_token_expiration):
            # every authed response carries a re-stamped token
            h.send_header("X-Renewed-Token", renewed)
        retry = getattr(h, "_retry_after", None)
        if retry is not None:
            h.send_header("Retry-After", str(int(retry) + 1))
        h.end_headers()
        h.wfile.write(data)

    # routes reachable without credentials when the auth tier is on
    _PUBLIC_ROUTES = frozenset({
        "/health", "/auth/login", "/auth/refresh",
        # OAuth 2.1 surface (reference server/auth/oauth/routes.py): the
        # protocol endpoints are public by definition
        "/.well-known/oauth-authorization-server",
        "/oauth/register", "/oauth/authorize", "/oauth/token", "/oauth/revoke",
        "/auth/sso/login", "/auth/sso/callback",
    })

    @staticmethod
    def _required_permission(route: str, method: str) -> str | None:
        """Reference role model: query routes need ``query_repos`` (all
        roles), build-triggering routes need ``activate_repos``
        (power_user+), user management needs ``manage_users`` (admin).
        ``None`` = any authenticated user."""
        if route.startswith("/api/admin/"):
            return "manage_users"
        if route == "/api/users/change-password":
            return None
        if route == "/api/keys" or route.startswith("/api/keys/"):
            return None  # any authenticated user manages their OWN keys
        if route in ("/index", "/sync") or (
            route.startswith("/jobs/") and route.endswith("/cancel")
        ):
            return "activate_repos"
        return "query_repos"

    def _job_states(self) -> dict:
        states = {"pending": 0, "running": 0, "completed": 0, "failed": 0,
                  "cancelled": 0}
        for rec in self.jobs.list(limit=10_000):
            st = rec.get("state")
            if st in states:
                states[st] += 1
        return states

    def _timed_dispatch(self, h, body: dict | None) -> None:
        if self.metrics is None:
            self._dispatch(h, body)
            return
        import time as _time

        t0 = _time.perf_counter()
        self._dispatch(h, body)
        # top-level route segment only — path parameters (job ids, key ids)
        # must not explode series cardinality
        seg = urlparse(h.path).path.strip("/").split("/", 1)[0] or "-"
        self._m_requests.inc(
            route="/" + seg, method=h.command,
            status=str(getattr(h, "_last_status", 0)),
        )
        self._m_duration.observe(_time.perf_counter() - t0, route="/" + seg)

    def _dispatch(self, h, body: dict | None) -> None:
        # per-REQUEST response-header state: one Handler instance serves many
        # requests on a keep-alive connection, so stale attributes from the
        # previous request must never leak into this response (a 401 carrying
        # the prior request's renewed JWT would be a token leak)
        h._renewed_token = None
        h._retry_after = None
        url = urlparse(h.path)
        route = url.path.rstrip("/") or "/"
        method = h.command
        if route == "/metrics" and self.metrics is not None:
            # Prometheus text exposition; liveness-class route (like /health)
            data = self.metrics.render().encode()
            h._last_status = 200
            h.send_response(200)
            h.send_header("Content-Type", "text/plain; version=0.0.4")
            h.send_header("Content-Length", str(len(data)))
            h.end_headers()
            h.wfile.write(data)
            return
        params = {k: v[-1] for k, v in parse_qs(url.query).items()}
        if body:
            params.update(body)
        if route == "/web" or route.startswith("/web/"):
            # HTML tier: cookie-session auth of its own (browser flows have
            # no Authorization header); pages re-use the REST data paths
            self._web_tier().handle(h, route, method, params)
            return
        user = None
        if self.auth is not None:
            from .auth import AuthError

            if route not in self._PUBLIC_ROUTES:
                issued_key = h.headers.get("X-API-Key")
                if issued_key and issued_key.startswith("cidx_sk_"):
                    # issued-key path (reference api_key_manager): the key
                    # authenticates AS its user; role scoping comes from the
                    # LIVE user record.  No sliding JWT on key requests.
                    user = self.auth.api_keys.authenticate(issued_key)
                    if user is None:
                        self._reply(h, 401, {"error": "invalid or revoked API key"})
                        return
                else:
                    authz = h.headers.get("Authorization") or ""
                    oauth_user = None
                    if authz.startswith("Bearer ") and getattr(self.auth, "oauth", None):
                        # opaque OAuth 2.1 access token (no JWT dots): DB
                        # lookup, live-role user, sliding extension under the
                        # hard cap — no X-Renewed-Token (the token itself is
                        # the session)
                        tok = authz[len("Bearer "):]
                        if "." not in tok:
                            info = self.auth.oauth.validate_token(tok)
                            if info is not None:
                                oauth_user = self.auth.users.get_user(info["user_id"])
                                if oauth_user is not None:
                                    self.auth.oauth.extend_token_on_activity(tok)
                    if oauth_user is not None:
                        user = oauth_user
                    else:
                        try:
                            user = self.auth.authenticate_bearer(h.headers.get("Authorization"))
                        except AuthError as e:
                            self._reply(h, 401, {"error": str(e)})
                            return
                        h._renewed_token = self.auth.jwt.create_token(user.to_public())
                perm = self._required_permission(route, method)
                if not user.has_permission(perm):
                    h._renewed_token = None
                    self._reply(
                        h,
                        403,
                        {"error": f"role {user.role.value!r} lacks permission {perm!r}"},
                    )
                    return
        elif route != "/health" and self.api_key is not None:
            if h.headers.get("X-API-Key") != self.api_key:
                self._reply(h, 401, {"error": "missing or invalid X-API-Key"})
                return
        if route.startswith("/oauth/") or route == "/.well-known/oauth-authorization-server":
            self._dispatch_oauth(h, route, method, params)
            return
        if route.startswith("/auth/sso/"):
            self._dispatch_sso(h, route, method, params)
            return
        if route.startswith("/auth/") or route.startswith("/api/"):
            self._dispatch_auth(h, route, method, params, user)
            return
        if route in ("/index", "/sync") or route == "/jobs" or route.startswith("/jobs/"):
            self._dispatch_jobs(h, route, params)
            return
        if route.startswith("/scip/"):
            self._dispatch_scip(h, route, params)
            return
        if route.startswith("/temporal/"):
            self._dispatch_temporal(h, route, params)
            return
        fn = _ROUTES.get(route)
        if fn is None and route != "/mcp":
            self._reply(h, 404, {"error": f"unknown route {route!r}"})
            return
        # group visibility on the single-index searcher tier (incl. the
        # /mcp JSON-RPC endpoint): same rule the omni fan-out applies
        # (admins everywhere; others only granted repos)
        if (
            route != "/health"
            and user is not None
            and self.repo_name is not None
            and getattr(self.auth, "access_filter", None) is not None
        ):
            af = self.auth.access_filter
            uid = user.username
            role_admin = getattr(getattr(user, "role", None), "value", None) == "admin"
            if (
                not role_admin
                and not af.is_admin_user(uid)
                and self.repo_name not in af.get_accessible_repos(uid)
            ):
                self._reply(
                    h,
                    403,
                    {"error": f"repository {self.repo_name!r} is not accessible to your group"},
                )
                return
        if route == "/mcp":
            # MCP-over-HTTP (reference server MCP endpoint; the mcpb stdio
            # bridge forwards raw JSON-RPC lines here).  Notifications get
            # 204 — no JSON-RPC response exists for them.
            if method != "POST":
                self._reply(h, 405, {"error": "POST a JSON-RPC request"})
                return
            try:
                out = self._mcp_tier().process(body if body is not None else {})
            except Exception as e:  # noqa: BLE001 — protocol-level failure
                self._reply(h, 500, {"error": f"{type(e).__name__}: {e}"})
                return
            if out is None:
                h._last_status = 204
                h.send_response(204)
                h.send_header("Content-Length", "0")
                h.end_headers()
                return
            self._reply(h, 200, out)
            return
        # check out a replica slot: slot ownership alone serializes THIS
        # replica; other slots' requests run concurrently (VERDICT r3 #7)
        slot = self._slots.get()
        try:
            with self._refresh_lock:
                self._refresh()
                replicas = self._follower.searchers
            self._tls.searcher = replicas[slot % len(replicas)] if replicas else None
            if self._tls.searcher is None and route != "/health":
                self._reply(h, 503, {"error": "no index generation published yet"})
                return
            out = fn(self, params)
        except (ValueError, KeyError) as e:
            self._reply(h, 400, {"error": str(e)})
            return
        except Exception as e:  # noqa: BLE001 — the server must not die on a bad request
            self._reply(h, 500, {"error": f"{type(e).__name__}: {e}"})
            return
        finally:
            self._tls.searcher = None
            self._slots.put(slot)
        self._reply(h, 200, out)

    def _dispatch_sso(self, h, route: str, method: str, params: dict) -> None:
        """OIDC SSO routes (reference server/auth/oidc/routes.py):
        /auth/sso/login starts the flow (server-held PKCE verifier in the
        one-time state; returns the IdP authorization URL), /auth/sso/callback
        finishes it (state → code exchange → userinfo → match/link/JIT →
        this server's token pair, or an OAuth authorization code when the
        state carries flow=oauth_authorize)."""
        from .oidc import OIDCError
        from .oauth import OAuthError, s256_challenge

        if self.auth is None or getattr(self.auth, "oidc", None) is None:
            self._reply(h, 404, {"error": "oidc tier not configured"})
            return
        om = self.auth.oidc
        states = self.auth.oidc_states
        try:
            if route == "/auth/sso/login":
                provider = om.ensure_provider_initialized()
                import secrets as _secrets

                verifier = _secrets.token_urlsafe(32)
                redirect_uri = f"http://{self.host}:{self.port}/auth/sso/callback"
                data = {"code_verifier": verifier, "redirect_to": params.get("redirect_to")}
                # OAuth-bridge flow: an OAuth client may delegate its user
                # authentication to SSO (reference flow=oauth_authorize)
                if params.get("flow") == "oauth_authorize":
                    for k in ("client_id", "redirect_uri", "code_challenge", "oauth_state"):
                        if not params.get(k):
                            raise ValueError(f"missing required parameter {k!r}")
                    data.update(
                        flow="oauth_authorize",
                        client_id=params["client_id"],
                        redirect_uri=params["redirect_uri"],
                        code_challenge=params["code_challenge"],
                        oauth_state=params["oauth_state"],
                    )
                state = states.create_state(data)
                url = provider.get_authorization_url(
                    state, redirect_uri, s256_challenge(verifier)
                )
                out = {"authorization_url": url, "state": state}
            elif route == "/auth/sso/callback":
                code, state = params.get("code"), params.get("state")
                if not code or not state:
                    raise ValueError("code and state required")
                data = states.validate_state(state)
                if data is None:
                    self._reply(h, 400, {"error": "Invalid state"})
                    return
                provider = om.ensure_provider_initialized()
                redirect_uri = f"http://{self.host}:{self.port}/auth/sso/callback"
                tokens = provider.exchange_code_for_token(
                    code, data["code_verifier"], redirect_uri
                )
                info = provider.get_user_info(tokens["access_token"])
                user = om.match_or_create_user(info)
                if user is None:
                    self._reply(h, 403, {
                        "error": "User not authorized. Please contact administrator."
                    })
                    return
                if data.get("flow") == "oauth_authorize":
                    oauth_code = self.auth.oauth.generate_authorization_code(
                        client_id=data["client_id"],
                        user_id=user.username,
                        code_challenge=data["code_challenge"],
                        redirect_uri=data["redirect_uri"],
                        state=data["oauth_state"],
                    )
                    out = {
                        "code": oauth_code,
                        "state": data["oauth_state"],
                        "redirect_uri": data["redirect_uri"],
                    }
                else:
                    # session-less server: the session IS the token pair
                    out = {
                        "access_token": self.auth.jwt.create_token(user.to_public()),
                        "refresh_token": self.auth.refresh.issue(user.username),
                        "token_type": "bearer",
                        "role": user.role.value,
                    }
            else:
                self._reply(h, 404, {"error": f"unknown route {route!r}"})
                return
        except (OIDCError, OAuthError) as e:
            self._reply(h, 502 if "unreachable" in str(e) else 400, {"error": str(e)})
            return
        except ValueError as e:
            self._reply(h, 400, {"error": str(e)})
            return
        self._reply(h, 200, out)

    def _dispatch_oauth(self, h, route: str, method: str, params: dict) -> None:
        """OAuth 2.1 protocol endpoints (reference server/auth/oauth/routes.py,
        programmatic JSON flow): discovery, dynamic client registration,
        resource-owner-authenticated authorization (PKCE required), token
        grants with the OAuth error-code mapping, RFC 7009 revocation."""
        from .auth import AuthError
        from .oauth import OAuthError

        if self.auth is None or getattr(self.auth, "oauth", None) is None:
            self._reply(h, 404, {"error": "oauth tier not configured"})
            return
        om = self.auth.oauth
        # the issuer is this server's real base URL (stamped at bind time)
        if route == "/.well-known/oauth-authorization-server":
            self._reply(h, 200, om.get_discovery_metadata())
            return
        if method != "POST":
            self._reply(h, 405, {"error": "POST required"})
            return

        def need(key: str) -> str:
            v = params.get(key)
            if not v:
                raise ValueError(f"missing required parameter {key!r}")
            return str(v)

        try:
            if route == "/oauth/register":
                uris = params.get("redirect_uris")
                if not isinstance(uris, list) or not uris:
                    raise ValueError("redirect_uris must be a non-empty list")
                out = om.register_client(
                    need("client_name"), [str(u) for u in uris],
                    grant_types=params.get("grant_types"),
                    response_types=params.get("response_types"),
                    token_endpoint_auth_method=params.get("token_endpoint_auth_method"),
                    scope=params.get("scope"),
                )
                self.auth.audit.log_oauth_client_registration(
                    out["client_id"], out["client_name"], _ip(h)
                )
            elif route == "/oauth/authorize":
                if params.get("response_type") != "code":
                    raise ValueError("Invalid response_type. Must be 'code'")
                if not params.get("code_challenge"):
                    raise ValueError("code_challenge required (PKCE)")
                username, password = need("username"), need("password")
                user = self.auth.users.authenticate(username, password)
                if user is None:
                    self._reply(h, 401, {"error": "Invalid credentials"})
                    return
                code = om.generate_authorization_code(
                    client_id=need("client_id"),
                    user_id=user.username,
                    code_challenge=need("code_challenge"),
                    redirect_uri=need("redirect_uri"),
                    state=need("state"),
                )
                self.auth.audit.log_oauth_authorization(
                    user.username, params["client_id"], _ip(h),
                    user_agent=h.headers.get("User-Agent"),
                )
                out = {"code": code, "state": params["state"]}
            elif route == "/oauth/token":
                grant = need("grant_type")
                if grant == "authorization_code":
                    out = om.exchange_code_for_token(
                        need("code"), need("code_verifier"), need("client_id")
                    )
                    self.auth.audit.log_oauth_token_exchange(
                        params["client_id"], grant, _ip(h)
                    )
                elif grant == "refresh_token":
                    out = om.refresh_access_token(
                        need("refresh_token"), params.get("client_id") or ""
                    )
                elif grant == "client_credentials":
                    try:
                        out = om.handle_client_credentials_grant(
                            need("client_id"), need("client_secret"),
                            scope=params.get("scope"),
                        )
                    except OAuthError as e:
                        if "Invalid client credentials" in str(e):
                            self._reply(h, 401, {
                                "error": "invalid_client",
                                "error_description": str(e),
                            })
                            return
                        raise
                else:
                    self._reply(h, 400, {
                        "error": "unsupported_grant_type",
                        "error_description": f"Unsupported grant_type: {grant}",
                    })
                    return
            elif route == "/oauth/revoke":
                # RFC 7009: 200 whether or not the token existed
                om.revoke_token(need("token"), params.get("token_type_hint"))
                out = {}
            else:
                self._reply(h, 404, {"error": f"unknown route {route!r}"})
                return
        except OAuthError as e:
            self._reply(h, 400, {"error": "invalid_grant", "error_description": str(e)})
            return
        except AuthError as e:
            self._reply(h, 401, {"error": str(e)})
            return
        except ValueError as e:
            self._reply(h, 400, {"error": "invalid_request", "error_description": str(e)})
            return
        self._reply(h, 200, out)

    def _dispatch_auth(self, h, route: str, method: str, params: dict, user) -> None:
        """Auth + user-management routes (reference server/routers/auth.py +
        users admin routes).  Error mapping: 400 validation, 401 credential,
        404 unknown user, 405 wrong method, 429 rate limited."""
        from .auth import AuthError, RateLimitedError

        if self.auth is None:
            self._reply(h, 404, {"error": "auth tier not configured"})
            return

        def need(key: str) -> str:
            v = params.get(key)
            if not v:
                raise ValueError(f"missing required parameter {key!r}")
            return str(v)

        try:
            if route == "/auth/login":
                if method != "POST":
                    self._reply(h, 405, {"error": "POST required"})
                    return
                uname = need("username")
                try:
                    out = self.auth.login(uname, need("password"))
                except RateLimitedError:
                    self.auth.audit.log_rate_limit_triggered(
                        uname, _ip(h), limit_type="login",
                        user_agent=h.headers.get("User-Agent"),
                    )
                    raise
                except AuthError as e:
                    self.auth.audit.log_authentication_failure(
                        uname, "invalid_credentials", str(e),
                        additional_context={"ip_address": _ip(h)},
                    )
                    raise
            elif route == "/auth/refresh":
                if method != "POST":
                    self._reply(h, 405, {"error": "POST required"})
                    return
                try:
                    out = self.auth.refresh_pair(need("refresh_token"))
                except AuthError as e:
                    from .auth import TokenReplayAttackError

                    if isinstance(e, TokenReplayAttackError):
                        # family revocation fired (reference: token replay is
                        # a SECURITY_INCIDENT, not a mere failure)
                        self.auth.audit.log_security_incident(
                            "unknown", "token_replay_attack", _ip(h),
                            user_agent=h.headers.get("User-Agent"),
                            additional_context={"message": str(e)},
                        )
                    else:
                        self.auth.audit.log_token_refresh_failure(
                            "unknown", _ip(h), str(e),
                            user_agent=h.headers.get("User-Agent"),
                        )
                    raise
                self.auth.audit.log_token_refresh_success(
                    self.auth.jwt.validate_token(out["access_token"])["username"],
                    _ip(h),
                    user_agent=h.headers.get("User-Agent"),
                )
            elif route == "/api/users/change-password":
                if method not in ("PUT", "POST"):
                    # never mutate on GET — passwords in a query string land
                    # in proxy/access logs
                    self._reply(h, 405, {"error": "PUT or POST required"})
                    return
                lock_msg = self.auth.pw_limiter.check_rate_limit(user.username)
                if lock_msg:
                    self.auth.audit.log_rate_limit_triggered(
                        user.username, _ip(h),
                        user_agent=h.headers.get("User-Agent"),
                    )
                    self._reply(h, 429, {"error": lock_msg})
                    return
                old, new = need("old_password"), need("new_password")
                try:
                    self.auth.users.change_password(user.username, old, new)
                except AuthError as e:
                    self.auth.pw_limiter.record_failed_attempt(user.username)
                    self.auth.audit.log_password_change_failure(
                        user.username, _ip(h), str(e),
                        user_agent=h.headers.get("User-Agent"),
                    )
                    raise
                self.auth.pw_limiter.record_successful_attempt(user.username)
                self.auth.audit.log_password_change_success(
                    user.username, _ip(h),
                    user_agent=h.headers.get("User-Agent"),
                )
                out = {"message": "password changed"}
            elif route == "/api/keys" and method == "GET":
                out = {"keys": self.auth.api_keys.list_keys(user.username)}
            elif route == "/api/keys" and method == "POST":
                raw, kid = self.auth.api_keys.generate_key(
                    user.username, params.get("name")
                )
                # the raw key appears in THIS response only (reference: shown
                # once at creation, never retrievable again)
                out = {"api_key": raw, "key_id": kid}
            elif route.startswith("/api/keys/"):
                if method != "DELETE":
                    self._reply(h, 405, {"error": "DELETE required"})
                    return
                kid = route[len("/api/keys/") :]
                if not self.auth.api_keys.revoke(user.username, kid):
                    raise KeyError(f"key {kid!r} not found")
                out = {"message": f"key {kid!r} revoked"}
            elif route == "/api/admin/keys" and method == "GET":
                out = {"keys": self.auth.api_keys.list_keys(need("username"))}
            elif route == "/api/admin/keys" and method == "POST":
                raw, kid = self.auth.api_keys.generate_key(
                    need("username"), params.get("name")
                )
                out = {"api_key": raw, "key_id": kid}
            elif route.startswith("/api/admin/keys/"):
                if method != "DELETE":
                    self._reply(h, 405, {"error": "DELETE required"})
                    return
                kid = route[len("/api/admin/keys/") :]
                if not self.auth.api_keys.revoke(need("username"), kid):
                    raise KeyError(f"key {kid!r} not found")
                out = {"message": f"key {kid!r} revoked"}
            elif route == "/api/admin/groups" and method == "GET":
                out = {
                    "groups": [
                        {
                            "id": g.id, "name": g.name,
                            "description": g.description,
                            "is_default": g.is_default,
                            "user_count": len(self.auth.groups.get_users_in_group(g.id)),
                            "repos": self.auth.groups.get_group_repos(g.id),
                        }
                        for g in self.auth.groups.get_all_groups()
                    ]
                }
            elif route == "/api/admin/groups" and method == "POST":
                g = self.auth.groups.create_group(
                    need("name"), str(params.get("description") or "")
                )
                out = {"group": {"id": g.id, "name": g.name,
                                 "description": g.description,
                                 "is_default": g.is_default}}
            elif route.startswith("/api/admin/groups/"):
                from .groups import (
                    CidxMetaCannotBeRevokedError,
                    DefaultGroupCannotBeDeletedError,
                    GroupHasUsersError,
                )

                rest = route[len("/api/admin/groups/"):]
                parts = rest.split("/")
                gid = int(parts[0])
                try:
                    if len(parts) == 1 and method == "DELETE":
                        if not self.auth.groups.delete_group(gid):
                            raise KeyError(f"group {gid} not found")
                        out = {"message": f"group {gid} deleted"}
                    elif len(parts) == 1 and method == "PUT":
                        if not self.auth.groups.update_group(
                            gid, description=need("description")
                        ):
                            raise KeyError(f"group {gid} not found")
                        out = {"message": f"group {gid} updated"}
                    elif len(parts) == 2 and parts[1] == "members" and method == "POST":
                        self.auth.groups.assign_user_to_group(
                            need("username"), gid, user.username
                        )
                        out = {"message": "user assigned"}
                    elif len(parts) == 2 and parts[1] == "repos" and method == "POST":
                        granted = self.auth.groups.grant_repo_access(
                            need("repo"), gid, user.username
                        )
                        out = {"message": "granted" if granted else "already granted"}
                    elif len(parts) == 3 and parts[1] == "repos" and method == "DELETE":
                        if not self.auth.groups.revoke_repo_access(parts[2], gid):
                            raise KeyError(f"no grant of {parts[2]!r} to group {gid}")
                        out = {"message": "revoked"}
                    else:
                        self._reply(h, 404, {"error": f"unknown route {route!r}"})
                        return
                except (DefaultGroupCannotBeDeletedError, GroupHasUsersError,
                        CidxMetaCannotBeRevokedError) as e:
                    self._reply(h, 409, {"error": str(e)})
                    return
            elif route == "/api/admin/users" and method == "GET":
                out = {"users": [u.to_public() for u in self.auth.users.all_users()]}
            elif route == "/api/admin/users" and method == "POST":
                u = self.auth.users.create_user(
                    need("username"), need("password"), need("role")
                )
                out = {"user": u.to_public()}
            elif route.startswith("/api/admin/users/"):
                name = route[len("/api/admin/users/") :]
                if method == "DELETE":
                    self.auth.users.delete_user(name)
                    self.auth.refresh.revoke_user(name)
                    self.auth.api_keys.revoke_all(name)
                    out = {"message": f"user {name!r} deleted"}
                elif method == "PUT":
                    if "role" in params:
                        self.auth.users.update_role(name, str(params["role"]))
                    if "password" in params:
                        self.auth.users.set_password(name, str(params["password"]))
                    u = self.auth.users.get_user(name)
                    if u is None:
                        raise KeyError(f"user {name!r} not found")
                    out = {"user": u.to_public()}
                else:
                    self._reply(h, 405, {"error": "PUT or DELETE required"})
                    return
            else:
                self._reply(h, 404, {"error": f"unknown route {route!r}"})
                return
        except RateLimitedError as e:
            h._retry_after = e.retry_after
            self._reply(h, 429, {"error": "too many login attempts"})
            return
        except AuthError as e:
            self._reply(h, 401, {"error": str(e)})
            return
        except KeyError as e:
            self._reply(h, 404, {"error": str(e).strip("'\"")})
            return
        except ValueError as e:
            self._reply(h, 400, {"error": str(e)})
            return
        self._reply(h, 200, out)

    def _dispatch_jobs(self, h, route: str, params: dict) -> None:
        """Job routes: registry ops under the manager's own lock — never the
        searcher lock, so status polls stay instant during a long build."""
        if self.jobs is None:
            self._reply(h, 404, {"error": "jobs are not enabled on this server"})
            return
        try:
            if route == "/index":
                if h.command != "POST":
                    raise ValueError("POST /index with a JSON body")
                job_id = self.jobs.submit_build(params)
                self._reply(h, 202, {"job_id": job_id})
            elif route == "/sync":
                if h.command != "POST":
                    raise ValueError("POST /sync with a JSON body")
                job_id = self.jobs.submit_sync(params)
                self._reply(h, 202, {"job_id": job_id})
            elif route == "/jobs":
                self._reply(h, 200, {"jobs": self.jobs.list(int(params.get("limit", 50)))})
            elif route.endswith("/cancel"):
                if h.command != "POST":
                    raise ValueError("POST /jobs/<id>/cancel")
                self._reply(h, 200, self.jobs.cancel(route[len("/jobs/") : -len("/cancel")]))
            else:
                self._reply(h, 200, self.jobs.get(route[len("/jobs/") :]))
        except KeyError as e:
            self._reply(h, 404, {"error": str(e)})
        except ValueError as e:
            self._reply(h, 400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001
            self._reply(h, 500, {"error": f"{type(e).__name__}: {e}"})

    # ---- temporal routes (reference REST temporal parameter surface,
    # QUERY_PARAMETERS.md: time_range, diff_type, author, chunk_type,
    # at_commit, include_removed, show_evolution, evolution_limit) ----

    def _dispatch_temporal(self, h, route: str, params: dict) -> None:
        if self._temporal_root is None:
            self._reply(
                h, 503, {"error": "no temporal index configured (--temporal-index)"}
            )
            return
        try:
            with self._temporal_lock:
                return self._temporal_call(h, route, params)
        except (ValueError, KeyError) as e:
            self._reply(h, 400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — the server must not die on a bad request
            self._reply(h, 500, {"error": f"{type(e).__name__}: {e}"})

    def _temporal_call(self, h, route: str, params: dict) -> None:
        if self._temporal is None:
            from ..temporal.search import TemporalSearcher

            self._temporal = TemporalSearcher(self._temporal_root)
        ts = self._temporal

        def need(key: str) -> str:
            v = params.get(key)
            if not v:
                raise ValueError(f"missing required parameter {key!r}")
            return v

        if route == "/temporal/search":
            tr = need("time_range")  # reference REST field: YYYY-MM-DD..YYYY-MM-DD
            if ".." not in tr:
                raise ValueError("time_range must be YYYY-MM-DD..YYYY-MM-DD")
            start_day, end_day = tr.split("..", 1)
            dt = params.get("diff_type")
            if isinstance(dt, str):
                dt = dt.split(",")
            evl = params.get("evolution_limit")
            rows = ts.query(
                need("q"),
                start_day=start_day,
                end_day=end_day,
                diff_types=dt or None,
                authors=[params["author"]] if params.get("author") else None,
                path_filters=[params["path_filter"]] if params.get("path_filter") else None,
                limit=int(params.get("limit", 10)),
                chunk_type=params.get("chunk_type"),
                show_evolution=_flag(params, "show_evolution"),
                evolution_limit=int(evl) if evl is not None else None,
            )
            out = {"hits": rows}
        elif route == "/temporal/file-at":
            inc = _flag(params, "include_removed")
            if params.get("at_commit") is not None:
                hit = ts.file_at_commit(
                    need("path"), int(params["at_commit"]), include_removed=inc
                )
            else:
                hit = ts.file_at(need("path"), need("day"), include_removed=inc)
            out = {"file": hit}
        elif route == "/temporal/history":
            out = {"history": ts.history(need("path"))}
        else:
            self._reply(h, 404, {"error": f"unknown route {route!r}"})
            return
        self._reply(h, 200, out)

    # ---- SCIP code-intelligence routes (reference
    # server/routers/scip_queries.py: /scip/definition /references
    # /dependencies /dependents /impact /callchain) ----

    def _dispatch_scip(self, h, route: str, params: dict) -> None:
        if self._scip_root is None:
            self._reply(h, 503, {"error": "no symbol store configured (--scip-store)"})
            return
        try:
            with self._scip_lock:
                return self._scip_call(h, route, params)
        except ValueError as e:
            self._reply(h, 400, {"error": str(e)})
        except Exception as e:  # noqa: BLE001 — the server must not die on a bad request
            self._reply(h, 500, {"error": f"{type(e).__name__}: {e}"})

    def _scip_call(self, h, route: str, params: dict) -> None:
        if self._scip is None:
            from ..scip.store import SymbolStore

            self._scip = SymbolStore(self._scip_root)
        s = self._scip

        def need(key: str) -> str:
            v = params.get(key)
            if not v:
                raise ValueError(f"missing required parameter {key!r}")
            return v

        if route == "/scip/definition":
            out = {"definitions": s.definitions(need("symbol")).to_pylist()}
        elif route == "/scip/references":
            out = {"references": s.references(need("symbol")).to_pylist()}
        elif route == "/scip/dependencies":
            out = {"dependencies": s.dependencies(need("symbol")).to_pylist()}
        elif route == "/scip/dependents":
            out = {"dependents": s.dependents(need("symbol")).to_pylist()}
        elif route == "/scip/impact":
            out = {
                "impact": s.analyze_impact(
                    need("symbol"), max_depth=int(params.get("depth", 3))
                ).to_pylist()
            }
        elif route == "/scip/callchain":
            mc = params.get("max_chains")
            out = {
                "chains": s.trace_call_chain(
                    need("from"),
                    need("to"),
                    max_depth=int(params.get("depth", 3)),
                    max_chains=int(mc) if mc is not None else None,
                ).to_pylist()
            }
        else:
            self._reply(h, 404, {"error": f"unknown route {route!r}"})
            return
        self._reply(h, 200, out)

    # ---- routes ----

    def _r_health(self, params: dict) -> dict:
        if self.searcher is None:
            out = {"status": "ok", "num_docs": 0, "num_shards": 0,
                   "fields": None, "index_dir": None}
        else:
            m = self.searcher.manifest
            out = {
                "status": "ok",
                "num_docs": m.num_docs,
                "num_shards": m.num_shards,
                "fields": sorted(m.fields) if m.fields else None,
                "index_dir": self.index_dir,
            }
        if self.auto_update is not None:
            out["update"] = self.auto_update.status()
        return out

    def _r_stats(self, params: dict) -> dict:
        m = self.searcher.manifest
        # index build timestamp = manifest file mtime (this engine's index
        # is immutable per generation) — remote-mode staleness detection
        # compares local working-copy mtimes against it
        try:
            from ..index.manifest import MANIFEST_NAME

            ts = round(os.path.getmtime(os.path.join(self.index_dir, MANIFEST_NAME)), 3)
        except OSError:
            ts = None
        return {
            "num_docs": m.num_docs,
            "total_tokens": m.total_tokens,
            "avgdl": round(m.avgdl, 4),
            "num_shards": m.num_shards,
            "num_buckets": m.num_buckets,
            "partitions": m.n_partitions,
            "index_timestamp": ts,
        }

    def _mcp_tier(self):
        """Lazy MCPServer sharing this server's index root + tier config —
        the /mcp JSON-RPC endpoint the mcpb stdio bridge forwards to."""
        if getattr(self, "_mcp", None) is None:
            from .mcp import MCPServer

            ctor = self._follower._ctor
            m = MCPServer(
                self._follower._root,
                lang_col=ctor.get("lang_col"),
                url_col=ctor.get("url_col"),
                remote=ctor.get("remote", False),
                shard_group_size=ctor.get("shard_group_size", 1),
                scip_store=self._scip_root,
                temporal_index=self._temporal_root,
                vector_store=self._vector_root,
                warm=False,
            )
            m.jobs = self.jobs  # share the ONE job manager (never two per root)
            self._mcp = m
        return self._mcp

    def _web_tier(self):
        if getattr(self, "_web", None) is None:
            from .web import WebTier

            self._web = WebTier(self)
        return self._web

    def _semantic_tier(self):
        if self._vector_root is not None and self._semantic is None:
            from ..query.semantic import SemanticTier

            self._semantic = SemanticTier(self._vector_root)
        return self._semantic

    def _hits(self, q: str, params: dict) -> list[dict]:
        return rest_search(self.searcher, q, params, semantic=self._semantic_tier())

    def _r_search(self, params: dict) -> dict:
        q = params.get("q")
        if not q:
            raise ValueError("missing required parameter 'q'")
        return {"hits": self._hits(q, params)}

    def _r_batch(self, params: dict) -> dict:
        queries = params.get("queries")
        if not isinstance(queries, list):
            raise ValueError("POST /batch needs a JSON body {'queries': [...]}")
        results = []
        for spec in queries:
            q = spec.get("q")
            if not q:
                raise ValueError("every batch entry needs 'q'")
            results.append({"id": spec.get("id"), "hits": self._hits(q, spec)})
        return {"results": results}

    def _r_mget(self, params: dict) -> dict:
        raw = params.get("ids")
        if raw is None:
            raise ValueError("missing required parameter 'ids'")
        if isinstance(raw, str):
            ids = [int(x) for x in raw.split(",") if x]
        else:
            ids = [int(x) for x in raw]
        docs = self.searcher.mget(ids)
        if _flag(params, "truncate") and self.payload is not None:
            # Story #679 payload control: oversized text → preview + handle
            for d in docs:
                t = d.pop("text", "")
                d.update(self.payload.truncate_result(t))
        return {"docs": docs}

    def _r_payload(self, params: dict) -> dict:
        if self.payload is None:
            raise ValueError("payload cache not configured")
        from .payload import CacheNotFoundError

        handle = params.get("handle")
        if not handle:
            raise ValueError("missing required parameter 'handle'")
        try:
            r = self.payload.retrieve(handle, page=int(params.get("page", 0)))
        except CacheNotFoundError as e:
            raise KeyError(str(e)) from None  # maps to 400; 404-ish message
        return {
            "content": r.content,
            "page": r.page,
            "total_pages": r.total_pages,
            "has_more": r.has_more,
        }

    def _r_suggest(self, params: dict) -> dict:
        word = params.get("word")
        if not word:
            raise ValueError("missing required parameter 'word'")
        out = self.searcher.suggest(word, max_distance=int(params.get("max_distance", 2)))
        return {"suggestion": out}

    def _r_complete(self, params: dict) -> dict:
        prefix = params.get("prefix")
        if not prefix:
            raise ValueError("missing required parameter 'prefix'")
        return {"completions": self.searcher.complete(prefix, limit=int(params.get("limit", 10)))}


_ROUTES = {
    "/health": IndexHTTPServer._r_health,
    "/stats": IndexHTTPServer._r_stats,
    "/search": IndexHTTPServer._r_search,
    "/batch": IndexHTTPServer._r_batch,
    "/mget": IndexHTTPServer._r_mget,
    "/payload": IndexHTTPServer._r_payload,
    "/suggest": IndexHTTPServer._r_suggest,
    "/complete": IndexHTTPServer._r_complete,
}
