"""Container-lifecycle cleanup sidecar — privileged path reaper.

Reference analog: ``docker/cleanup.sh`` + ``Dockerfile.cleaner`` (a
root-privileged netcat HTTP loop that removes requested paths matching an
allow-list — the sidecar the server uses to reap index debris its own uid
cannot delete).  This implementation keeps the contract (tiny HTTP
service, path allow-list, idempotent removal) with a STRONGER safety rule:
the request path must REALPATH-resolve inside an allowed root, so neither
``..`` traversal nor a symlink planted inside the root can escape it —
the reference's regex check (``^/data/.*`` or ``.*code-indexer.*``) allows
both.

Routes:
- ``GET /health``            → {"status": "ok", "allowed_roots": [...]}
- ``POST /cleanup`` {"path"} → {"removed": bool, "path": ...}; 403 outside
  the allow-list, 200 removed=false when already absent (idempotent).
"""

from __future__ import annotations

import json
import os
import shutil
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

__all__ = ["CleanupService"]


class CleanupService:
    def __init__(self, allowed_roots: list[str], *, host: str = "127.0.0.1",
                 port: int = 8091):
        self.allowed_roots = [os.path.realpath(r) for r in allowed_roots]
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def _reply(self, code: int, payload: dict) -> None:
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path.rstrip("/") in ("", "/health"):
                    self._reply(200, {"status": "ok",
                                      "allowed_roots": service.allowed_roots})
                else:
                    self._reply(404, {"error": "unknown route"})

            def do_POST(self):
                if self.path.rstrip("/") != "/cleanup":
                    self._reply(404, {"error": "unknown route"})
                    return
                n = int(self.headers.get("Content-Length") or 0)
                try:
                    body = json.loads(self.rfile.read(n) or b"{}")
                except json.JSONDecodeError:
                    self._reply(400, {"error": "invalid JSON body"})
                    return
                path = body.get("path")
                if not path:
                    self._reply(400, {"error": "missing 'path'"})
                    return
                code, payload = service.cleanup(str(path))
                self._reply(code, payload)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.httpd.daemon_threads = True
        self.host, self.port = self.httpd.server_address[:2]
        self._thread: threading.Thread | None = None

    def _allowed(self, path: str) -> bool:
        """Realpath containment: the TARGET (symlinks resolved) must live
        under an allowed root — stricter than the reference's regex."""
        real = os.path.realpath(path)
        return any(
            real == root or real.startswith(root + os.sep)
            for root in self.allowed_roots
        )

    def cleanup(self, path: str) -> tuple[int, dict]:
        if not self._allowed(path):
            return 403, {"error": f"path not allowed for cleanup: {path}"}
        if not os.path.lexists(path):
            return 200, {"removed": False, "path": path}  # idempotent
        real = os.path.realpath(path)
        if os.path.isdir(real) and not os.path.islink(path):
            shutil.rmtree(real, ignore_errors=True)
        else:
            try:
                os.unlink(path)
            except OSError as e:
                return 500, {"error": str(e)}
        return 200, {"removed": True, "path": path}

    # -- lifecycle ------------------------------------------------------
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
