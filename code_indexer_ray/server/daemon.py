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
``shutdown`` — plus the reference daemon's indexing/watch trio
(``exposed_index`` at ``daemon/service.py:690``, ``exposed_index_blocking``
at ``:458``, ``exposed_get_index_progress`` at ``:743``,
``exposed_watch_start/stop/status`` at ``:913-999``): ``index`` spawns a
BACKGROUND build subprocess (the daemon itself stays Ray-free — the CLI
child owns the Ray session, exactly like ``daemon start``) into a fresh
generation and repoints ``current`` on success, ``index_status`` polls it,
``index_blocking`` waits; ``watch_start/stop/status`` manage one watch-loop
subprocess over the index root.
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


def _child_env() -> dict:
    """Subprocess env with the package's parent dir on PYTHONPATH (the daemon
    may have been launched via sys.path manipulation the child won't inherit)."""
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_parent + os.pathsep + env.get("PYTHONPATH", "")
    return env


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
        auto_update=None,
    ):
        # optional AutoUpdateService (reference server/auto_update): its
        # status rides the daemon `status` op so `cidx daemon status` shows
        # "update available" without a server restart
        self.auto_update = auto_update
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
            defer_missing=True,  # daemon over an empty root: first `index`
                                 # op publishes gen 0; queries 503 until then
        )
        self._slots: queue.Queue = queue.Queue()
        for i in range(max(1, int(pool_size))):
            self._slots.put(i)
        self._refresh_lock = threading.Lock()
        self.started_at = time.time()
        self.query_count = 0
        self._count_lock = threading.Lock()
        # background build / watch subprocess state (reference daemon
        # indexing_thread + watch_manager analogs; one of each at a time)
        self._job_lock = threading.Lock()
        self._build_proc = None
        self._build_state: dict = {"running": False}
        self._watch_proc = None
        self._watch_state: dict = {"running": False}
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
        with self._job_lock:
            for proc in (self._watch_proc, self._build_proc):
                if proc is not None and proc.poll() is None:
                    proc.terminate()
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
            result = {
                "index_root": self.index_root,
                "index_dir": self._follower.index_dir,
                "num_docs": int(s.manifest.num_docs) if s else None,
                "uptime_secs": time.time() - self.started_at,
                "query_count": self.query_count,
                "pid": os.getpid(),
            }
            if self.auto_update is not None:
                result["update"] = self.auto_update.status()
            return {"ok": True, "result": result}
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
        if op in ("index", "index_blocking", "index_status"):
            return self._op_index(op, req)
        if op in ("watch_start", "watch_stop", "watch_status"):
            return self._op_watch(op, req)
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

    # -- background build / watch (reference daemon indexing + watch ops) --

    def _next_generation(self) -> tuple[int, str]:
        gens = [
            int(n[4:])
            for n in os.listdir(self.index_root)
            if n.startswith("gen_") and n[4:].isdigit()
        ]
        g = max(gens, default=-1) + 1
        return g, os.path.join(self.index_root, f"gen_{g:06d}")

    def _publish(self, gen_name: str) -> None:
        ptr = os.path.join(self.index_root, "current")
        tmp = ptr + ".tmp"
        with open(tmp, "w") as f:
            f.write(gen_name)
        os.replace(tmp, ptr)

    def _op_index(self, op: str, req: dict) -> dict:
        import subprocess
        import sys

        if op == "index_status":
            with self._job_lock:
                if self._build_proc is not None and self._build_proc.poll() is not None:
                    self._reap_build()
                return {"ok": True, "result": dict(self._build_state)}
        if os.path.exists(os.path.join(self.index_root, "manifest.json")):
            return {
                "ok": False,
                "error": "index root is a bare index, not a generation root — "
                "builds need the gen_XXXXXX/current layout",
            }
        inp = req.get("input")
        if not inp:
            return {"ok": False, "error": "missing required parameter 'input'"}
        with self._job_lock:
            if self._build_proc is not None and self._build_proc.poll() is None:
                return {"ok": False, "error": "a build is already running"}
            gen, gen_dir = self._next_generation()
            cmd = [
                sys.executable, "-m", "code_indexer_ray", "build",
                "--input", str(inp), "--out", gen_dir, "--no-resume",
            ]
            if req.get("store_cols"):
                cmd += ["--store-cols", ",".join(req["store_cols"])]
            if req.get("doc_id_upper") is not None:
                cmd += ["--doc-id-upper", str(int(req["doc_id_upper"]))]
            log = os.path.join(self.index_root, f"gen_{gen:06d}.build.log")
            lf = open(log, "ab")
            self._build_proc = subprocess.Popen(
                cmd, stdout=lf, stderr=lf, stdin=subprocess.DEVNULL,
                env=_child_env(),
            )
            self._build_state = {
                "running": True, "generation": gen, "gen_dir": gen_dir,
                "pid": self._build_proc.pid, "log": log, "error": None,
            }
        if op == "index":
            return {"ok": True, "result": dict(self._build_state)}
        # index_blocking: wait, then publish
        self._build_proc.wait()
        with self._job_lock:
            self._reap_build()
            return {"ok": True, "result": dict(self._build_state)}

    def _reap_build(self) -> None:
        """Caller holds _job_lock; build subprocess has exited."""
        proc = self._build_proc
        if proc is None or self._build_state.get("running") is False:
            return
        rc = proc.poll()
        if rc is None:
            return
        st = self._build_state
        st["running"] = False
        st["returncode"] = rc
        if rc == 0:
            self._publish(os.path.basename(st["gen_dir"]))
            st["published"] = True
        else:
            st["error"] = f"build exited {rc} (see {st['log']})"

    def _op_watch(self, op: str, req: dict) -> dict:
        import subprocess
        import sys

        with self._job_lock:
            if op == "watch_status":
                running = self._watch_proc is not None and self._watch_proc.poll() is None
                self._watch_state["running"] = running
                return {"ok": True, "result": dict(self._watch_state)}
            if op == "watch_stop":
                if self._watch_proc is None or self._watch_proc.poll() is not None:
                    self._watch_state["running"] = False
                    return {"ok": True, "result": {"stopped": False, "running": False}}
                self._watch_proc.terminate()
                try:
                    self._watch_proc.wait(timeout=15)
                except subprocess.TimeoutExpired:
                    self._watch_proc.kill()
                self._watch_state["running"] = False
                return {"ok": True, "result": {"stopped": True, "running": False}}
            # watch_start
            if self._watch_proc is not None and self._watch_proc.poll() is None:
                return {"ok": False, "error": "watch is already running"}
            inp = req.get("input")
            if not inp:
                return {"ok": False, "error": "missing required parameter 'input'"}
            cmd = [
                sys.executable, "-m", "code_indexer_ray", "watch",
                "--input", str(inp), "--index-root", self.index_root,
                "--interval", str(float(req.get("interval", 5.0))),
            ]
            if req.get("store_cols"):
                cmd += ["--store-cols", ",".join(req["store_cols"])]
            log = os.path.join(self.index_root, "watch.log")
            lf = open(log, "ab")
            self._watch_proc = subprocess.Popen(
                cmd, stdout=lf, stderr=lf, stdin=subprocess.DEVNULL,
                env=_child_env(),
            )
            self._watch_state = {
                "running": True, "pid": self._watch_proc.pid,
                "input": str(inp), "log": log,
            }
            return {"ok": True, "result": dict(self._watch_state)}

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
