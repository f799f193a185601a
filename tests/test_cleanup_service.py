"""Cleanup sidecar (`server/cleanup.py` — reference docker/cleanup.sh
analog): realpath-contained allow-list (escape attempts that the
reference's regex would PASS must 403 here), idempotent removal, health."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from code_indexer_ray.server.cleanup import CleanupService


def _post(base, payload):
    req = urllib.request.Request(
        base + "/cleanup", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=15) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture()
def svc(tmp_path):
    root = str(tmp_path / "data")
    os.makedirs(root)
    s = CleanupService([root], port=0)
    s.start()
    yield f"http://{s.host}:{s.port}", root, str(tmp_path)
    s.shutdown()


class TestCleanupService:
    def test_health(self, svc):
        base, root, _ = svc
        with urllib.request.urlopen(base + "/health", timeout=15) as r:
            body = json.loads(r.read())
        assert body["status"] == "ok"
        assert body["allowed_roots"] == [os.path.realpath(root)]

    def test_removes_inside_root(self, svc):
        base, root, _ = svc
        victim = os.path.join(root, "gen-003")
        os.makedirs(os.path.join(victim, "shard0"))
        with open(os.path.join(victim, "shard0", "seg.bin"), "w") as f:
            f.write("x")
        code, body = _post(base, {"path": victim})
        assert code == 200 and body["removed"] is True
        assert not os.path.exists(victim)
        # idempotent second call
        code, body = _post(base, {"path": victim})
        assert code == 200 and body["removed"] is False

    def test_outside_root_403(self, svc):
        base, _, outside = svc
        target = os.path.join(outside, "precious.txt")
        with open(target, "w") as f:
            f.write("keep me")
        code, body = _post(base, {"path": target})
        assert code == 403 and "not allowed" in body["error"]
        assert os.path.exists(target)

    def test_traversal_403(self, svc):
        base, root, outside = svc
        target = os.path.join(outside, "p2.txt")
        with open(target, "w") as f:
            f.write("keep")
        sneaky = os.path.join(root, "..", "p2.txt")
        code, _ = _post(base, {"path": sneaky})
        assert code == 403
        assert os.path.exists(target)

    def test_symlink_escape_403_but_inner_symlink_removed(self, svc):
        """A symlink INSIDE the root pointing OUTSIDE: the reference's regex
        (path matches the root prefix) would delete through it — here the
        TARGET containment rule refuses."""
        base, root, outside = svc
        target = os.path.join(outside, "p3.txt")
        with open(target, "w") as f:
            f.write("keep")
        link = os.path.join(root, "link")
        os.symlink(target, link)
        code, _ = _post(base, {"path": link})
        assert code == 403  # resolves outside → refused
        assert os.path.exists(target) and os.path.lexists(link)
        # a symlink resolving INSIDE the root is removed (link only)
        inner = os.path.join(root, "real.txt")
        with open(inner, "w") as f:
            f.write("x")
        link2 = os.path.join(root, "link2")
        os.symlink(inner, link2)
        code, body = _post(base, {"path": link2})
        assert code == 200 and body["removed"] is True
        assert not os.path.lexists(link2) and os.path.exists(inner)

    def test_bad_requests(self, svc):
        base, _, _ = svc
        code, body = _post(base, {})
        assert code == 400 and "path" in body["error"]
        req = urllib.request.Request(
            base + "/cleanup", data=b"not json",
            headers={"Content-Type": "application/json"}, method="POST",
        )
        try:
            urllib.request.urlopen(req, timeout=15)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

    def test_standalone_module_import(self):
        """The cleaner container runs cleanup.py as a bare file — it must
        import with no package context (stdlib only)."""
        import importlib.util
        import sys

        import code_indexer_ray.server.cleanup as mod

        spec = importlib.util.spec_from_file_location("cleanup_standalone", mod.__file__)
        standalone = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(standalone)
        assert hasattr(standalone, "CleanupService")
        sys.modules.pop("cleanup_standalone", None)
