"""MCP (Model Context Protocol) server surface — the reference's
``server/mcp/`` (JSON-RPC 2.0 ``initialize`` / ``tools/list`` /
``tools/call`` dispatch, ``protocol.py:211-260``; tool declarations with
JSON-schema inputs, ``tools.py``) recast over this engine, stdlib-only.

The reference exposes 22 tools, most of which manage golden repos; the
honest mapping to THIS engine's capabilities is:

    search_code        full query-string grammar → ranked hits
    get_file_content   stored fields by doc_id (mget)
    check_health       liveness + index identity
    get_statistics     manifest summary (docs / tokens / shards)
    suggest            spell suggestion ("did you mean")
    complete           df-ranked prefix completion
    sync_repository    submit a background build job (jobs-enabled only)
    get_job_status     one job record / recent job list

Transport: newline-delimited JSON-RPC 2.0 over stdio (``serve_stdio``),
matching the MCP stdio transport, plus a direct ``process(dict)`` entry
point the tests and embedders drive.  Notifications (no ``id``) get no
response, per JSON-RPC.  Errors use the standard codes: -32700 parse,
-32600 invalid request, -32601 unknown method, -32602 invalid params;
tool-level failures return ``isError: true`` content instead of a protocol
error, mirroring the reference's ``_mcp_response`` convention.
"""

from __future__ import annotations

import json
import sys
from typing import Any, Callable

from ..query.engine import IndexSearcher

PROTOCOL_VERSION = "2025-06-18"
SERVER_INFO = {"name": "code-indexer-ray", "version": "0.3"}

PARSE_ERROR = -32700
INVALID_REQUEST = -32600
METHOD_NOT_FOUND = -32601
INVALID_PARAMS = -32602


def _tool(name: str, description: str, properties: dict, required: list[str]) -> dict:
    return {
        "name": name,
        "description": description,
        "inputSchema": {
            "type": "object",
            "properties": properties,
            "required": required,
        },
    }


class MCPServer:
    """Owns a searcher (with the same generation-follower semantics as the
    HTTP tier) and optionally a :class:`~code_indexer_ray.server.jobs.JobManager`."""

    def __init__(
        self,
        index_dir: str,
        *,
        lang_col: str | None = "lang",
        url_col: str | None = "url",
        remote: bool = False,
        shard_group_size: int = 1,
        enable_jobs: bool = False,
        warm: bool = False,
        scip_store: str | None = None,
        temporal_index: str | None = None,
        vector_store: str | None = None,
    ):
        from .http import GenerationFollower

        self._vector_root = vector_store
        self._semantic = None
        self._scip_root = scip_store
        self._scip = None
        self._temporal_root = temporal_index
        self._temporal = None
        self.index_root = index_dir
        self.jobs = None
        if enable_jobs:
            from .jobs import JobManager

            self.jobs = JobManager(index_dir)
        self._follower = GenerationFollower(
            index_dir,
            dict(
                remote=remote,
                shard_group_size=shard_group_size,
                lang_col=lang_col,
                url_col=url_col,
            ),
            warm=warm,
            defer_missing=enable_jobs,
        )

    # ---- searcher access ----------------------------------------------------

    @property
    def searcher(self) -> IndexSearcher:
        self._follower.refresh()
        s = self._follower.searcher
        if s is None:
            raise ValueError("no index generation published yet")
        return s

    def _semantic_tier(self):
        if self._vector_root is not None and self._semantic is None:
            from ..query.semantic import SemanticTier

            self._semantic = SemanticTier(self._vector_root)
        return self._semantic

    # ---- tool registry ------------------------------------------------------

    def tools(self) -> list[dict]:
        out = [
            _tool(
                "search_code",
                "Full-text search with the complete query grammar (boolean, "
                "phrase, fuzzy~, wildcard*, lang:/path: filters, field:term).",
                {
                    "query": {"type": "string", "description": "query string"},
                    "limit": {"type": "integer", "default": 10},
                    "snippet_lines": {"type": "integer", "default": 0},
                    "language": {"type": "string"},
                    "exclude_language": {"type": "string"},
                    "path_filter": {"type": "string"},
                    "exclude_path": {"type": "string"},
                    "file_extensions": {"type": "array", "items": {"type": "string"}},
                    "fuzzy": {"type": "boolean", "default": False},
                    "edit_distance": {"type": "integer", "default": 0},
                    "regex": {"type": "boolean", "default": False},
                    "case_sensitive": {"type": "boolean", "default": False},
                    "min_score": {"type": "number"},
                    "search_mode": {
                        "type": "string",
                        "enum": ["semantic", "fts", "hybrid"],
                        "description": "semantic/hybrid need --vector-store; "
                        "defaults to semantic when configured, else fts",
                    },
                    "accuracy": {
                        "type": "string",
                        "enum": ["fast", "balanced", "high"],
                        "description": "search accuracy profile (validated; "
                        "the FTS route ignores it, as the reference does for "
                        "backends that cannot honor it)",
                    },
                },
                ["query"],
            ),
            _tool(
                "get_file_content",
                "Stored fields (path, text, metadata) for document ids.",
                {"doc_ids": {"type": "array", "items": {"type": "integer"}}},
                ["doc_ids"],
            ),
            _tool("check_health", "Server liveness and index identity.", {}, []),
            _tool(
                "run_doctor",
                "Diagnose (and optionally repair) the index root: dangling "
                "current pointers, orphaned generations/segments, crashed-"
                "build debris, stale locks, foreign-fingerprint partitions "
                "(reference fix-config doctor).",
                {
                    "fix": {"type": "boolean", "default": False},
                    "prune_generations": {"type": "boolean", "default": False},
                    "deep": {"type": "boolean", "default": False},
                },
                [],
            ),
            _tool("get_statistics", "Corpus statistics from the manifest.", {}, []),
            _tool(
                "suggest",
                "Spell suggestion for a (possibly misspelled) word.",
                {
                    "word": {"type": "string"},
                    "max_distance": {"type": "integer", "default": 2},
                },
                ["word"],
            ),
            _tool(
                "complete",
                "Document-frequency-ranked prefix completion.",
                {"prefix": {"type": "string"}, "limit": {"type": "integer", "default": 10}},
                ["prefix"],
            ),
        ]
        if self.jobs is not None:
            out.append(
                _tool(
                    "sync_repository",
                    "Sync the index with a new corpus snapshot: change analysis "
                    "+ reindexing decision engine choose full rebuild vs "
                    "incremental merge; returns a job_id to poll.",
                    {
                        "input": {"type": "string", "description": "snapshot parquet path"},
                        "url_col": {"type": "string", "default": "url"},
                        "ts_col": {"type": "string"},
                        "force_full": {"type": "boolean", "default": False},
                        "search_accuracy": {"type": "number", "default": 1.0},
                        "store_cols": {"type": "array", "items": {"type": "string"},
                                       "description": "bootstrap build only"},
                    },
                    ["input"],
                )
            )
            out.append(
                _tool(
                    "get_job_status",
                    "One job record by id, or the recent job list without an id.",
                    {"job_id": {"type": "string"}, "limit": {"type": "integer", "default": 20}},
                    [],
                )
            )
        if self._scip_root is not None:
            # code-intelligence tools over the persisted symbol store
            # (reference exposes the same verbs via scip_queries routes)
            out.append(
                _tool(
                    "get_definition",
                    "Definition sites of a symbol from the symbol store.",
                    {"symbol": {"type": "string"}},
                    ["symbol"],
                )
            )
            out.append(
                _tool(
                    "get_references",
                    "Call sites of a symbol, with enclosing callers.",
                    {"symbol": {"type": "string"}},
                    ["symbol"],
                )
            )
            out.append(
                _tool(
                    "analyze_impact",
                    "Transitive dependents of a symbol (BFS, first-visit depth).",
                    {
                        "symbol": {"type": "string"},
                        "depth": {"type": "integer", "default": 3},
                    },
                    ["symbol"],
                )
            )
            out.append(
                _tool(
                    "trace_call_chain",
                    "Simple call chains from one symbol to another.",
                    {
                        "from_symbol": {"type": "string"},
                        "to_symbol": {"type": "string"},
                        "depth": {"type": "integer", "default": 3},
                    },
                    ["from_symbol", "to_symbol"],
                )
            )
        if self._temporal_root is not None:
            # temporal query tools (reference exposes the temporal parameter
            # surface through the MCP query tool, QUERY_PARAMETERS.md)
            out.append(
                _tool(
                    "temporal_search",
                    "Date-range BM25 over the commit history with diff-type/"
                    "author/chunk-type filters and an optional per-hit "
                    "evolution timeline.",
                    {
                        "query": {"type": "string"},
                        "time_range": {
                            "type": "string",
                            "description": "YYYY-MM-DD..YYYY-MM-DD (inclusive)",
                        },
                        "diff_type": {"type": "array", "items": {"type": "string"}},
                        "author": {"type": "string"},
                        "chunk_type": {
                            "type": "string",
                            "enum": ["commit_message", "commit_diff"],
                        },
                        "limit": {"type": "integer", "default": 10},
                        "show_evolution": {"type": "boolean", "default": False},
                        "evolution_limit": {"type": "integer"},
                    },
                    ["query", "time_range"],
                )
            )
            out.append(
                _tool(
                    "get_file_at",
                    "Content of a path as of end-of-day or as of a commit id "
                    "(include_removed surfaces deleted-at-cut paths).",
                    {
                        "path": {"type": "string"},
                        "day": {"type": "string"},
                        "at_commit": {"type": "integer"},
                        "include_removed": {"type": "boolean", "default": False},
                    },
                    ["path"],
                )
            )
        return out

    # ---- tool handlers --------------------------------------------------------

    @property
    def scip(self):
        if self._scip_root is None:
            raise ValueError("no symbol store configured (--scip-store)")
        if self._scip is None:
            from ..scip.store import SymbolStore

            self._scip = SymbolStore(self._scip_root)
        return self._scip

    def _t_get_definition(self, p: dict) -> dict:
        return {"definitions": self.scip.definitions(p["symbol"]).to_pylist()}

    def _t_get_references(self, p: dict) -> dict:
        return {"references": self.scip.references(p["symbol"]).to_pylist()}

    def _t_analyze_impact(self, p: dict) -> dict:
        return {
            "impact": self.scip.analyze_impact(
                p["symbol"], max_depth=int(p.get("depth", 3))
            ).to_pylist()
        }

    def _t_trace_call_chain(self, p: dict) -> dict:
        return {
            "chains": self.scip.trace_call_chain(
                p["from_symbol"], p["to_symbol"], max_depth=int(p.get("depth", 3))
            ).to_pylist()
        }

    def _t_search_code(self, p: dict) -> dict:
        from .http import rest_search

        hits = rest_search(self.searcher, p["query"], p, semantic=self._semantic_tier())
        return {"hits": hits, "total": len(hits)}

    def _t_get_file_content(self, p: dict) -> dict:
        return {"docs": self.searcher.mget([int(x) for x in p["doc_ids"]])}

    def _t_check_health(self, p: dict) -> dict:
        try:
            m = self.searcher.manifest
        except ValueError:
            return {"status": "ok", "num_docs": 0, "index_dir": None}
        return {
            "status": "ok",
            "num_docs": m.num_docs,
            "num_shards": m.num_shards,
            "index_dir": self._follower.index_dir,
        }


    def _t_run_doctor(self, args: dict) -> dict:
        from ..index.doctor import doctor

        return doctor(
            self.index_root,
            fix=bool(args.get("fix", False)),
            prune_generations=bool(args.get("prune_generations", False)),
            deep=bool(args.get("deep", False)),
        )

    def _t_get_statistics(self, p: dict) -> dict:
        m = self.searcher.manifest
        return {
            "num_docs": m.num_docs,
            "total_tokens": m.total_tokens,
            "avgdl": round(m.avgdl, 4),
            "num_shards": m.num_shards,
            "num_buckets": m.num_buckets,
        }

    def _t_suggest(self, p: dict) -> dict:
        return {
            "suggestion": self.searcher.suggest(
                p["word"], max_distance=int(p.get("max_distance", 2))
            )
        }

    def _t_complete(self, p: dict) -> dict:
        return {
            "completions": self.searcher.complete(p["prefix"], limit=int(p.get("limit", 10)))
        }

    def _t_sync_repository(self, p: dict) -> dict:
        if self.jobs is None:
            raise ValueError("jobs are not enabled on this server")
        return {"job_id": self.jobs.submit_sync(dict(p))}

    def _t_get_job_status(self, p: dict) -> dict:
        if self.jobs is None:
            raise ValueError("jobs are not enabled on this server")
        if p.get("job_id"):
            return self.jobs.get(p["job_id"])
        return {"jobs": self.jobs.list(int(p.get("limit", 20)))}

    @property
    def temporal(self):
        if self._temporal_root is None:
            raise ValueError("no temporal index configured (--temporal-index)")
        if self._temporal is None:
            from ..temporal.search import TemporalSearcher

            self._temporal = TemporalSearcher(self._temporal_root)
        return self._temporal

    def _t_temporal_search(self, p: dict) -> dict:
        tr = p["time_range"]
        if ".." not in tr:
            raise ValueError("time_range must be YYYY-MM-DD..YYYY-MM-DD")
        start_day, end_day = tr.split("..", 1)
        evl = p.get("evolution_limit")
        rows = self.temporal.query(
            p["query"],
            start_day=start_day,
            end_day=end_day,
            diff_types=p.get("diff_type") or None,
            authors=[p["author"]] if p.get("author") else None,
            limit=int(p.get("limit", 10)),
            chunk_type=p.get("chunk_type"),
            show_evolution=bool(p.get("show_evolution")),
            evolution_limit=int(evl) if evl is not None else None,
        )
        return {"hits": rows, "total": len(rows)}

    def _t_get_file_at(self, p: dict) -> dict:
        inc = bool(p.get("include_removed"))
        if p.get("at_commit") is not None:
            hit = self.temporal.file_at_commit(
                p["path"], int(p["at_commit"]), include_removed=inc
            )
        elif p.get("day"):
            hit = self.temporal.file_at(p["path"], p["day"], include_removed=inc)
        else:
            raise ValueError("pass either day or at_commit")
        return {"file": hit}

    # ---- JSON-RPC dispatch ------------------------------------------------------

    def _handler(self, name: str) -> Callable[[dict], dict] | None:
        fn = getattr(self, f"_t_{name}", None)
        if fn is None:
            return None
        if name in ("sync_repository", "get_job_status") and self.jobs is None:
            return None  # undeclared tools are unknown tools
        if (
            name in ("get_definition", "get_references", "analyze_impact", "trace_call_chain")
            and self._scip_root is None
        ):
            return None
        if name in ("temporal_search", "get_file_at") and self._temporal_root is None:
            return None
        return fn

    @staticmethod
    def _error(req_id: Any, code: int, message: str) -> dict:
        return {"jsonrpc": "2.0", "error": {"code": code, "message": message}, "id": req_id}

    @staticmethod
    def _result(req_id: Any, result: dict) -> dict:
        return {"jsonrpc": "2.0", "result": result, "id": req_id}

    def process(self, request: Any) -> dict | None:
        """One JSON-RPC request dict → response dict (None for notifications)."""
        if not isinstance(request, dict):
            return self._error(None, INVALID_REQUEST, "request must be an object")
        req_id = request.get("id")
        is_notification = "id" not in request
        if request.get("jsonrpc") != "2.0":
            return self._error(req_id, INVALID_REQUEST, "jsonrpc must be '2.0'")
        method = request.get("method")
        if not isinstance(method, str):
            return self._error(req_id, INVALID_REQUEST, "missing 'method'")
        params = request.get("params") or {}

        if method == "initialize":
            out = self._result(
                req_id,
                {
                    "protocolVersion": PROTOCOL_VERSION,
                    "capabilities": {"tools": {}},
                    "serverInfo": SERVER_INFO,
                },
            )
        elif method == "tools/list":
            out = self._result(req_id, {"tools": self.tools()})
        elif method == "tools/call":
            name = params.get("name")
            if not isinstance(name, str):
                return None if is_notification else self._error(
                    req_id, INVALID_PARAMS, "tools/call needs params.name"
                )
            fn = self._handler(name)
            if fn is None:
                return None if is_notification else self._error(
                    req_id, INVALID_PARAMS, f"unknown tool {name!r}"
                )
            args = params.get("arguments") or {}
            try:
                payload = fn(args)
                out = self._result(
                    req_id,
                    {
                        "content": [{"type": "text", "text": json.dumps(payload)}],
                        "isError": False,
                    },
                )
            except (ValueError, KeyError, TypeError) as e:
                # tool failure is CONTENT, not a protocol error (reference
                # handlers.py `_mcp_response` convention)
                out = self._result(
                    req_id,
                    {
                        "content": [{"type": "text", "text": f"{type(e).__name__}: {e}"}],
                        "isError": True,
                    },
                )
        elif method.startswith("notifications/"):
            return None
        else:
            out = self._error(req_id, METHOD_NOT_FOUND, f"unknown method {method!r}")
        return None if is_notification else out

    # ---- stdio transport ----------------------------------------------------------

    def serve_stdio(self, stdin=None, stdout=None) -> None:
        """Newline-delimited JSON-RPC over stdio (the MCP stdio transport)."""
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                request = json.loads(line)
            except json.JSONDecodeError:
                response: dict | None = self._error(None, PARSE_ERROR, "parse error")
            else:
                response = self.process(request)
            if response is not None:
                stdout.write(json.dumps(response) + "\n")
                stdout.flush()

    def close(self) -> None:
        if self.jobs is not None:
            self.jobs.stop()
