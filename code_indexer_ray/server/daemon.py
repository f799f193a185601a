"""Local daemon mode — warm repeated CLI queries without an HTTP server.

Reference ``daemon/service.py:24`` (``CIDXDaemonService``: rpyc over a unix
socket, ``exposed_query_fts`` at ``:201``, ``exposed_ping``/``status``/
``clear_cache``/``shutdown`` management ops, cached index at ``:1277-1323``)
and ``daemon/socket_helper.py`` (hash-named sockets under ``/tmp`` to dodge
the 108-char AF_UNIX limit), recast stdlib-only:

- :class:`DaemonServer`: ``ThreadingUnixStreamServer`` speaking
  newline-delimited JSON (one request object per line, one response per
  line; connections are keep-alive so a client can pipeline).  The index
  tier reuses the HTTP server's building blocks — a
  :class:`~.http.GenerationFollower` (follows ``current`` repoints, replica
  pool) and :func:`~.http.rest_search` (identical parameter surface +
  validation), so daemon answers are byte-identical to ``/search``.
- :func:`socket_path_for`: deterministic per-index socket path
  (``/tmp/cidx_ray/<sha256(realpath)[:16]>.sock`` — reference
  ``generate_repo_hash``).
- :class:`DaemonClient`: tiny blocking client (socket + json imports only —
  the CLI fast path must not pay for Ray or the engine import).

The CLI's ``search`` command transparently delegates when the daemon socket
is live (reference ``cli_daemon_fast.py`` fast path) and falls back to the
in-process engine otherwise; ``--no-daemon`` forces local.

Protocol ops: ``ping``, ``status``, ``search`` (params = the REST surface),
``batch``, ``mget``, ``suggest``, ``complete``, ``clear_cache``,
``shutdown``.
"""

from __future__ import annotations

import hashlib
import json
import os
import queue
import socket
import socketserver
import threading
import time

__all__ = ["DaemonServer", "DaemonClient", "socket_path_for", "daemon_alive"]

SOCKET_DIR = "/tmp/cidx_ray"
_MAX_LINE = 8 * 1024 * 1024


def socket_path_for(index_dir: str) -> str:
    """Deterministic hash-named socket (reference socket_helper: short paths
    under /tmp beat the AF_UNIX 108-char limit)."""
    h = hashlib.sha256(os.path.realpath(index_dir).encode()).hexdigest()[:16]
    return os.path.join(SOCKET_DIR, f"{h}.sock")


def daemon_alive(sock_path: str, timeout: float = 0.25) -> bool:
    """True iff something ACCEPTS on the socket (a stale file is not alive)."""
    if not os.path.exists(sock_path):
        return False
    try:
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(timeout)
        s.connect(sock_path)
        s.close()
        return True
    except OSError:
        return False


class DaemonServer:
    """Unix-socket daemon over one index root.

    ``pool_size`` replicas allow concurrent clients (same slot-checkout
    model as the HTTP tier); the follower picks up generation repoints, so
    a build/sync that publishes a new ``current`` serves on the next
    request with no restart (reference AC11 staleness detection — here the
    generation DIR changes, which the follower's stamp catches)."""

    def __init__(
        self,
        index_dir: str,
        *,
        socket_path: str | None = None,
        lang_col: str | None = "lang",
        url_col: str | None = "url",
        pool_size: int = 2,
        warm: bool = True,
    ):
        from .http import GenerationFollower

        self.index_root = index_dir
        self.socket_path = socket_path or socket_path_for(index_dir)
        os.makedirs(os.path.dirname(self.socket_path), exist_ok=True)
        if os.path.exists(self.socket_path):
            if daemon_alive(self.socket_path):
                raise RuntimeError(f"daemon already serving {self.socket_path}")
            os.unlink(self.socket_path)  # stale socket from a dead process
        self._follower = GenerationFollower(
            index_dir,
            dict(lang_col=lang_col, url_col=url_col),
            follow=True,
            warm=warm,
            pool_size=pool_size,
        )
        self._slots: queue.Queue = queue.Queue()
        for i in range(max(1, int(pool_size))):
            self._slots.put(i)
        self._refresh_lock = threading.Lock()
        self.started_at = time.time()
        self.query_count = 0
        self._count_lock = threading.Lock()
        server = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                while True:
                    try:
                        line = self.rfile.readline(_MAX_LINE)
                    except OSError:
                        return
                    if not line:
                        return
                    req: dict = {}
                    try:
                        req = json.loads(line)
                        resp = server._handle(req)
                    except Exception as e:  # noqa: BLE001 — daemon must not die
                        resp = {"ok": False, "error": f"{type(e).__name__}: {e}"}
                    try:
                        self.wfile.write(json.dumps(resp).encode() + b"\n")
                        self.wfile.flush()
                    except OSError:
                        return
                    if req.get("op") == "shutdown" and resp.get("ok"):
                        return

        class Server(socketserver.ThreadingUnixStreamServer):
            daemon_threads = True
            allow_reuse_address = True

        self._srv = Server(self.socket_path, Handler)
        self._thread: threading.Thread | None = None
        # pid file next to the socket so `daemon stop` can escalate
        with open(self.socket_path + ".pid", "w") as f:
            f.write(str(os.getpid()))

    # -- lifecycle --

    def start(self) -> threading.Thread:
        t = threading.Thread(target=self._srv.serve_forever, daemon=True)
        t.start()
        self._thread = t
        return t

    def serve_forever(self) -> None:
        self._srv.serve_forever()

    def shutdown(self) -> None:
        self._srv.shutdown()
        self._srv.server_close()
        for p in (self.socket_path, self.socket_path + ".pid"):
            try:
                os.unlink(p)
            except OSError:
                pass

    # -- ops --

    def _checkout(self):
        slot = self._slots.get()
        with self._refresh_lock:
            self._follower.refresh()
            reps = self._follower.searchers
        return slot, (reps[slot % len(reps)] if reps else None)

    def _handle(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"ok": True, "result": {"pong": True, "pid": os.getpid()}}
        if op == "status":
            with self._refresh_lock:
                self._follower.refresh()
                s = self._follower.searcher
            return {
                "ok": True,
                "result": {
                    "index_root": self.index_root,
                    "index_dir": self._follower.index_dir,
                    "num_docs": int(s.manifest.num_docs) if s else None,
                    "uptime_secs": time.time() - self.started_at,
                    "query_count": self.query_count,
                    "pid": os.getpid(),
                },
            }
        if op == "shutdown":
            threading.Thread(target=self.shutdown, daemon=True).start()
            return {"ok": True, "result": {"stopping": True}}
        if op == "clear_cache":
            # drop + rebuild replicas (reference exposed_clear_cache)
            with self._refresh_lock:
                self._follower.searchers = self._follower._build(
                    self._follower.index_dir
                )
            return {"ok": True, "result": {"cleared": True}}
        if op in ("search", "batch", "mget", "suggest", "complete"):
            slot, searcher = self._checkout()
            try:
                if searcher is None:
                    return {"ok": False, "error": "no index generation published yet"}
                with self._count_lock:
                    self.query_count += 1
                return {"ok": True, "result": self._query(op, searcher, req)}
            except (ValueError, KeyError) as e:
                return {"ok": False, "error": str(e)}
            finally:
                self._slots.put(slot)
        return {"ok": False, "error": f"unknown op {op!r}"}

    def _query(self, op: str, searcher, req: dict):
        from .http import rest_search

        if op == "search":
            params = dict(req.get("params") or {})
            return rest_search(searcher, req.get("q", ""), params)
        if op == "batch":
            out = []
            for item in req.get("queries") or []:
                params = dict(item.get("params") or {})
                out.append(
                    {
                        "id": item.get("id"),
                        "hits": rest_search(searcher, item.get("q", ""), params),
                    }
                )
            return out
        if op == "mget":
            return searcher.mget([int(i) for i in req.get("ids") or []])
        if op == "suggest":
            return searcher.suggest(
                req.get("word", ""), max_distance=int(req.get("max_distance", 2))
            )
        if op == "complete":
            return searcher.complete(
                req.get("prefix", ""), limit=int(req.get("limit", 10))
            )
        raise ValueError(f"unknown query op {op!r}")


class DaemonClient:
    """Blocking JSON-line client; keep-alive (one socket, many requests)."""

    def __init__(self, socket_path: str, timeout: float = 30.0):
        self.socket_path = socket_path
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._sock.settimeout(timeout)
        self._sock.connect(socket_path)
        self._rfile = self._sock.makefile("rb")

    def request(self, op: str, **kw) -> dict:
        payload = {"op": op, **kw}
        self._sock.sendall(json.dumps(payload).encode() + b"\n")
        line = self._rfile.readline(_MAX_LINE)
        if not line:
            raise ConnectionError("daemon closed the connection")
        resp = json.loads(line)
        if not resp.get("ok"):
            raise RuntimeError(resp.get("error", "daemon error"))
        return resp["result"]

    def close(self) -> None:
        try:
            self._rfile.close()
            self._sock.close()
        except OSError:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
