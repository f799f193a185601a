"""MCP-over-HTTP endpoint + stdio bridge (`server/mcpb.py` — reference
mcpb/bridge.py + auto_login.py + token_refresh.py): the /mcp route on the
HTTP server, the forwarding loop, auto-login, 401 re-login retry, the
repo-visibility gate, and protocol-level error classes."""

from __future__ import annotations

import io
import json
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.mcpb import Bridge, BridgeClient

GOOD_PW = "Str0ng!pass"


def _index(tmp_path, n=40):
    from code_indexer_ray.index.build import build_index

    rng = np.random.default_rng(29)
    vocab = ["spark", "merge", "window", "batch"]
    rows = [
        {"doc_id": i, "text": " ".join(vocab[j] for j in rng.integers(0, 4, 12)),
         "lang": "en", "url": f"m{i}.py"}
        for i in range(n)
    ]
    src = str(tmp_path / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, resume=False)
    return idx


def _rpc(base, payload, headers=None):
    req = urllib.request.Request(
        base + "/mcp", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **(headers or {})},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, (json.loads(r.read()) if r.status != 204 else None)


@pytest.mark.usefixtures("ray_session")
class TestMCPOverHTTP:
    @pytest.fixture(scope="class")
    def srv(self, ray_session, tmp_path_factory):
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("mcphttp")
        srv = IndexHTTPServer(_index(tmp), port=0, warm=False)
        srv.start()
        yield f"http://{srv.host}:{srv.port}"
        srv.shutdown()

    def test_initialize_and_tools_list(self, srv):
        code, out = _rpc(srv, {"jsonrpc": "2.0", "id": 1, "method": "initialize"})
        assert code == 200 and out["result"]["protocolVersion"]
        code, out = _rpc(srv, {"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        names = {t["name"] for t in out["result"]["tools"]}
        assert "search_code" in names and "check_health" in names

    def test_tools_call_search(self, srv):
        code, out = _rpc(
            srv,
            {"jsonrpc": "2.0", "id": 3, "method": "tools/call",
             "params": {"name": "search_code",
                        "arguments": {"query": "spark", "limit": 5}}},
        )
        assert code == 200 and out["result"]["isError"] is False
        payload = json.loads(out["result"]["content"][0]["text"])
        assert payload["hits"] and payload["hits"][0]["path"].startswith("m")

    def test_notification_204(self, srv):
        code, out = _rpc(
            srv, {"jsonrpc": "2.0", "method": "notifications/initialized"}
        )
        assert code == 204 and out is None

    def test_get_405(self, srv):
        req = urllib.request.Request(srv + "/mcp", method="GET")
        try:
            urllib.request.urlopen(req, timeout=15)
            raise AssertionError("expected 405")
        except urllib.error.HTTPError as e:
            assert e.code == 405


@pytest.mark.usefixtures("ray_session")
class TestBridge:
    @pytest.fixture(scope="class")
    def auth_srv(self, ray_session, tmp_path_factory):
        from code_indexer_ray.server.auth import AuthTier
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("mcpbridge")
        idx = _index(tmp)
        tier = AuthTier(str(tmp / "auth"), iterations=500,
                        seed_admin=("admin", GOOD_PW))
        tier.users.create_user("bob", GOOD_PW, "normal_user")
        users_group = tier.groups.get_group_by_name("users")
        tier.groups.assign_user_to_group("bob", users_group.id, "admin")
        srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier)
        srv.start()
        yield f"http://{srv.host}:{srv.port}", tier
        srv.shutdown()

    def test_auto_login_and_forward(self, auth_srv):
        base, _ = auth_srv
        client = BridgeClient(base, username="admin", password=GOOD_PW)
        out = client.forward(
            {"jsonrpc": "2.0", "id": 1, "method": "tools/call",
             "params": {"name": "search_code",
                        "arguments": {"query": "merge", "limit": 3}}}
        )
        assert out["result"]["isError"] is False
        payload = json.loads(out["result"]["content"][0]["text"])
        assert len(payload["hits"]) == 3

    def test_relogin_once_on_401(self, auth_srv):
        base, _ = auth_srv
        client = BridgeClient(base, username="admin", password=GOOD_PW)
        client._bearer = "ey.expired.garbage"  # hard-expired session
        out = client.forward({"jsonrpc": "2.0", "id": 2, "method": "tools/list"})
        assert "result" in out  # re-login + retry succeeded transparently
        assert client._bearer and client._bearer != "ey.expired.garbage"

    def test_api_key_and_invalid_key_error(self, auth_srv):
        base, tier = auth_srv
        raw, _ = tier.api_keys.generate_key("admin")
        client = BridgeClient(base, api_key=raw)
        out = client.forward({"jsonrpc": "2.0", "id": 3, "method": "tools/list"})
        assert "result" in out
        bad = BridgeClient(base, api_key="cidx_sk_" + "0" * 32)
        out = bad.forward({"jsonrpc": "2.0", "id": 4, "method": "tools/list"})
        assert out["error"]["code"] == -32000 and "401" in out["error"]["message"]

    def test_repo_gate_surfaces_as_server_error(self, ray_session, tmp_path):
        from code_indexer_ray.server.auth import AuthTier
        from code_indexer_ray.server.http import IndexHTTPServer

        idx = _index(tmp_path, n=10)
        tier = AuthTier(str(tmp_path / "auth"), iterations=500,
                        seed_admin=("admin", GOOD_PW))
        tier.users.create_user("eve", GOOD_PW, "normal_user")
        users_group = tier.groups.get_group_by_name("users")
        tier.groups.assign_user_to_group("eve", users_group.id, "admin")
        srv = IndexHTTPServer(idx, port=0, warm=False, auth=tier,
                              repo_name="secret-global")
        srv.start()
        try:
            base = f"http://{srv.host}:{srv.port}"
            client = BridgeClient(base, username="eve", password=GOOD_PW)
            out = client.forward({"jsonrpc": "2.0", "id": 5, "method": "tools/list"})
            assert out["error"]["code"] == -32000
            assert "403" in out["error"]["message"]
            assert "not accessible" in out["error"]["message"]
        finally:
            srv.shutdown()

    def test_stdio_loop_and_protocol_errors(self, auth_srv):
        base, tier = auth_srv
        raw, _ = tier.api_keys.generate_key("admin")
        client = BridgeClient(base, api_key=raw)
        stdin = io.StringIO(
            "not json\n"
            '{"jsonrpc": "2.0", "id": 9}\n'
            '{"jsonrpc": "2.0", "method": "notifications/initialized"}\n'
            '{"jsonrpc": "2.0", "id": 10, "method": "tools/list"}\n'
        )
        stdout = io.StringIO()
        Bridge(client).run(stdin=stdin, stdout=stdout)
        lines = [json.loads(x) for x in stdout.getvalue().splitlines()]
        # 3 responses: parse error (id 0), invalid request, tools/list result
        # — the notification produced NO line
        assert len(lines) == 3
        assert lines[0]["error"]["code"] == -32700 and lines[0]["id"] == 0
        assert lines[1]["error"]["code"] == -32600 and lines[1]["id"] == 9
        assert "tools" in lines[2]["result"]
