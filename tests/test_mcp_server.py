"""MCP JSON-RPC server (reference ``server/mcp/`` analog): protocol
handshake, tool listing, tool-call parity with direct engine calls,
JSON-RPC error mapping, stdio transport framing, generation following, and
the jobs-enabled tool pair (sync_repository / get_job_status) end-to-end
over an EMPTY index root."""

from __future__ import annotations

import io
import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.mcp import (
    INVALID_PARAMS,
    INVALID_REQUEST,
    METHOD_NOT_FOUND,
    PARSE_ERROR,
    MCPServer,
)


def _corpus(path: str, n: int = 200, seed: int = 7) -> None:
    rng = np.random.default_rng(seed)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(4, 40)))),
            "lang": ["en", "de", "fr"][i % 3],
            "url": f"src{i % 4}/f{i}.py",
        }
        for i in range(n)
    ]
    pq.write_table(pa.Table.from_pylist(rows), path)


def _call(srv: MCPServer, name: str, args: dict | None = None, req_id: int = 1) -> dict:
    resp = srv.process(
        {
            "jsonrpc": "2.0",
            "id": req_id,
            "method": "tools/call",
            "params": {"name": name, "arguments": args or {}},
        }
    )
    assert resp is not None and "result" in resp, resp
    return resp["result"]


def _payload(result: dict) -> dict:
    assert result["isError"] is False, result
    return json.loads(result["content"][0]["text"])


@pytest.fixture(scope="module")
def mcp_idx(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    tmp = tmp_path_factory.mktemp("mcp")
    src = str(tmp / "c.parquet")
    _corpus(src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2, resume=False)
    srv = MCPServer(out)
    yield srv, IndexSearcher(out), out
    srv.close()


class TestProtocol:
    def test_initialize(self, mcp_idx):
        srv, _, _ = mcp_idx
        resp = srv.process({"jsonrpc": "2.0", "id": 0, "method": "initialize", "params": {}})
        res = resp["result"]
        assert res["serverInfo"]["name"] == "code-indexer-ray"
        assert "tools" in res["capabilities"]
        assert resp["id"] == 0

    def test_tools_list_without_jobs(self, mcp_idx):
        srv, _, _ = mcp_idx
        resp = srv.process({"jsonrpc": "2.0", "id": 1, "method": "tools/list"})
        tools = {t["name"] for t in resp["result"]["tools"]}
        assert tools == {
            "search_code",
            "get_file_content",
            "check_health",
            "get_statistics",
            "suggest",
            "complete",
            "run_doctor",
        }
        for t in resp["result"]["tools"]:
            assert t["inputSchema"]["type"] == "object"
            assert "description" in t and t["description"]

    def test_unknown_method(self, mcp_idx):
        srv, _, _ = mcp_idx
        resp = srv.process({"jsonrpc": "2.0", "id": 2, "method": "resources/list"})
        assert resp["error"]["code"] == METHOD_NOT_FOUND

    def test_invalid_request_shapes(self, mcp_idx):
        srv, _, _ = mcp_idx
        assert srv.process([1, 2])["error"]["code"] == INVALID_REQUEST
        assert srv.process({"id": 3, "method": "x"})["error"]["code"] == INVALID_REQUEST
        assert (
            srv.process({"jsonrpc": "2.0", "id": 4})["error"]["code"] == INVALID_REQUEST
        )

    def test_notifications_get_no_response(self, mcp_idx):
        srv, _, _ = mcp_idx
        assert srv.process({"jsonrpc": "2.0", "method": "notifications/initialized"}) is None
        # a notification calling an unknown tool is still silent
        assert (
            srv.process(
                {"jsonrpc": "2.0", "method": "tools/call", "params": {"name": "nope"}}
            )
            is None
        )

    def test_unknown_tool_is_invalid_params(self, mcp_idx):
        srv, _, _ = mcp_idx
        resp = srv.process(
            {"jsonrpc": "2.0", "id": 5, "method": "tools/call", "params": {"name": "nope"}}
        )
        assert resp["error"]["code"] == INVALID_PARAMS
        # jobs tools are unknown when jobs are disabled
        resp = srv.process(
            {
                "jsonrpc": "2.0",
                "id": 6,
                "method": "tools/call",
                "params": {"name": "sync_repository", "arguments": {"input": "x"}},
            }
        )
        assert resp["error"]["code"] == INVALID_PARAMS

    def test_tool_failure_is_content_not_protocol_error(self, mcp_idx):
        srv, _, _ = mcp_idx
        res = _call(srv, "search_code", {})  # missing required 'query'
        assert res["isError"] is True
        assert "KeyError" in res["content"][0]["text"]


class TestTools:
    def test_search_code_matches_engine(self, mcp_idx):
        from code_indexer_ray.query.parser import search_query_string

        srv, s, _ = mcp_idx
        got = _payload(_call(srv, "search_code", {"query": "spark merge", "limit": 5}))
        want = search_query_string(s, "spark merge", limit=5)
        assert got["total"] == 5
        assert [(h["doc_id"], round(h["score"], 9)) for h in got["hits"]] == [
            (h["doc_id"], round(h["score"], 9)) for h in want
        ]

    def test_search_code_filters_and_snippets(self, mcp_idx):
        srv, _, _ = mcp_idx
        got = _payload(
            _call(srv, "search_code", {"query": "spark lang:de", "snippet_lines": 1})
        )
        assert got["hits"], "expected de hits"
        for h in got["hits"]:
            assert h["language"] == "de"
            assert "snippet" in h

    def test_get_file_content(self, mcp_idx):
        srv, s, _ = mcp_idx
        ids = [h["doc_id"] for h in _payload(_call(srv, "search_code", {"query": "batch"}))["hits"][:3]]
        got = _payload(_call(srv, "get_file_content", {"doc_ids": ids}))["docs"]
        want = s.mget(ids)
        assert got == want
        assert all(d["text"] for d in got)

    def test_health_and_statistics(self, mcp_idx):
        srv, s, out = mcp_idx
        h = _payload(_call(srv, "check_health"))
        assert h["status"] == "ok" and h["num_docs"] == 200 and h["index_dir"] == out
        st = _payload(_call(srv, "get_statistics"))
        assert st["num_docs"] == 200
        assert st["total_tokens"] == s.manifest.total_tokens
        assert st["num_shards"] == 3 and st["num_buckets"] == 2

    def test_suggest_and_complete(self, mcp_idx):
        srv, s, _ = mcp_idx
        sg = _payload(_call(srv, "suggest", {"word": "spakr"}))["suggestion"]
        assert sg == s.suggest("spakr")
        comp = _payload(_call(srv, "complete", {"prefix": "s", "limit": 5}))["completions"]
        assert comp == s.complete("s", limit=5)
        assert comp and all(c["term"].startswith("s") for c in comp)


class TestStdio:
    def test_stdio_roundtrip_framing(self, mcp_idx):
        srv, _, _ = mcp_idx
        lines = [
            json.dumps({"jsonrpc": "2.0", "id": 1, "method": "initialize"}),
            "",  # blank line skipped
            "{not json",  # parse error
            json.dumps({"jsonrpc": "2.0", "method": "notifications/initialized"}),
            json.dumps(
                {
                    "jsonrpc": "2.0",
                    "id": 2,
                    "method": "tools/call",
                    "params": {"name": "check_health", "arguments": {}},
                }
            ),
        ]
        out = io.StringIO()
        srv.serve_stdio(stdin=io.StringIO("\n".join(lines) + "\n"), stdout=out)
        resps = [json.loads(x) for x in out.getvalue().splitlines()]
        assert len(resps) == 3  # blank + notification produce nothing
        assert resps[0]["id"] == 1 and "result" in resps[0]
        assert resps[1]["error"]["code"] == PARSE_ERROR and resps[1]["id"] is None
        assert resps[2]["id"] == 2 and resps[2]["result"]["isError"] is False


class TestGenerationsAndJobs:
    def test_jobs_tools_end_to_end_over_empty_root(self, ray_session, tmp_path):
        src = str(tmp_path / "c.parquet")
        _corpus(src, n=120, seed=3)
        root = str(tmp_path / "root")
        srv = MCPServer(root, enable_jobs=True)
        try:
            tools = {t["name"] for t in srv.tools()}
            assert {"sync_repository", "get_job_status"} <= tools
            # no generation yet → search_code fails as tool content
            res = _call(srv, "search_code", {"query": "spark"})
            assert res["isError"] is True
            job_id = _payload(
                _call(srv, "sync_repository", {"input": src})
            )["job_id"]
            rec = srv.jobs.wait(job_id, timeout=120.0)
            assert rec["state"] == "completed"
            assert rec["result"]["sync"]["executed"] == "bootstrap_full"
            got = _payload(_call(srv, "get_job_status", {"job_id": job_id}))
            assert got["state"] == "completed"
            lst = _payload(_call(srv, "get_job_status", {}))["jobs"]
            assert any(j["job_id"] == job_id for j in lst)
            # the follower picks up the published generation without restart
            hits = _payload(_call(srv, "search_code", {"query": "spark", "limit": 3}))
            assert hits["total"] == 3
            st = _payload(_call(srv, "get_statistics"))
            assert st["num_docs"] == 120
        finally:
            srv.close()


class TestScipTools:
    """Code-intelligence tools gated on a configured symbol store."""

    @pytest.fixture(scope="class")
    def scip_srv(self, ray_session, tmp_path_factory, mcp_idx):
        import ray.data as rd

        from code_indexer_ray.scip import build_symbol_store

        _, _, idx = mcp_idx
        tmp = tmp_path_factory.mktemp("mcp_scip")
        t0 = "def a():\n    x b()\ndef b():\n    x c()\ndef c():\n    x x\n"
        t1 = "def d():\n    x a()\ndef e():\n    x d()\n    x e()\n"
        src = str(tmp / "docs.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [t0, t1]}), src
        )
        store = str(tmp / "symstore")
        build_symbol_store(rd.read_parquet(src), store, num_parts=4)
        return MCPServer(idx, scip_store=store)

    def test_tools_listed_only_with_store(self, scip_srv, mcp_idx):
        plain, _, _ = mcp_idx
        names = lambda s: {t["name"] for t in s.tools()}  # noqa: E731
        scip_names = {"get_definition", "get_references", "analyze_impact", "trace_call_chain"}
        assert scip_names <= names(scip_srv)
        assert not (scip_names & names(plain))
        # undeclared → unknown tool (protocol error) on the plain server
        resp = plain.process(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {"name": "analyze_impact", "arguments": {"symbol": "c"}},
            }
        )
        assert resp["error"]["code"] == INVALID_PARAMS

    def test_tool_results(self, scip_srv):
        d = _payload(_call(scip_srv, "get_definition", {"symbol": "a"}))
        assert d["definitions"] == [{"doc_id": 0, "line": 1}]
        r = _payload(_call(scip_srv, "get_references", {"symbol": "a"}))
        assert r["references"] == [{"doc_id": 1, "line": 2, "caller": "d"}]
        i = _payload(_call(scip_srv, "analyze_impact", {"symbol": "c", "depth": 3}))
        assert i["impact"] == [
            {"sym": "b", "depth": 1}, {"sym": "a", "depth": 2}, {"sym": "d", "depth": 3}
        ]
        c = _payload(_call(scip_srv, "trace_call_chain",
                           {"from_symbol": "e", "to_symbol": "c", "depth": 4}))
        assert c["chains"] == [{"chain": "e -> d -> a -> b -> c", "depth": 4}]

    def test_search_still_works_alongside(self, scip_srv):
        out = _payload(_call(scip_srv, "search_code", {"query": "spark", "limit": 3}))
        assert out["total"] == 3


class TestRestParamsOnMcp:
    """search_code shares the REST parameter surface (rest_search): filters,
    fuzzy, min_score, accuracy enum + conflict validation as isError."""

    def test_language_filter_matches_engine(self, mcp_idx):
        srv, s, _out = mcp_idx
        got = _payload(_call(srv, "search_code", {"query": "spark", "limit": 5, "language": "en"}))
        want = s.search("spark", languages=["en"], limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in got["hits"]] == [h["doc_id"] for h in want]

    def test_fuzzy_flag(self, mcp_idx):
        srv, s, _out = mcp_idx
        got = _payload(_call(srv, "search_code", {"query": "mege", "limit": 5, "fuzzy": True}))
        want = s.search("mege", edit_distance=1, limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in got["hits"]] == [h["doc_id"] for h in want]

    def test_conflict_and_enum_are_tool_errors(self, mcp_idx):
        srv, _s, _out = mcp_idx
        r = _call(srv, "search_code", {"query": "spark", "fuzzy": True, "regex": True})
        assert r["isError"] is True and "mutually exclusive" in r["content"][0]["text"]
        r2 = _call(srv, "search_code", {"query": "spark", "accuracy": "turbo"})
        assert r2["isError"] is True and "accuracy" in r2["content"][0]["text"]
        ok = _payload(_call(srv, "search_code", {"query": "spark", "limit": 3, "accuracy": "fast"}))
        assert len(ok["hits"]) == 3


class TestTemporalTools:
    """temporal_search / get_file_at MCP tools (gated on --temporal-index),
    each vs the direct TemporalSearcher."""

    @pytest.fixture(scope="class")
    def mcp_temporal(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.temporal.history import change_rows
        from code_indexer_ray.temporal.index import build_temporal_index
        from code_indexer_ray.temporal.search import TemporalSearcher

        tmp = tmp_path_factory.mktemp("mcpt")
        docs = pa.Table.from_pylist(
            [
                {"doc_id": i, "source": f"s{i % 2}", "text": "spark merge window", "lang": "en"}
                for i in range(40)
            ]
        )
        chg = str(tmp / "chg.parquet")
        pq.write_table(change_rows(docs), chg)
        troot = str(tmp / "tidx")
        build_temporal_index(chg, troot, bucket_days=4, num_shards=1, num_buckets=1)
        src = str(tmp / "c.parquet")
        _corpus(src, n=20)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, num_buckets=1, resume=False)
        srv = MCPServer(idx, temporal_index=troot)
        yield srv, TemporalSearcher(troot)
        srv.close()

    def test_tools_listed_only_when_configured(self, mcp_temporal, mcp_idx):
        srv, _ts = mcp_temporal
        names = {t["name"] for t in srv.tools()}
        assert {"temporal_search", "get_file_at"} <= names
        plain, _s, _o = mcp_idx
        plain_names = {t["name"] for t in plain.tools()}
        assert not {"temporal_search", "get_file_at"} & plain_names
        # calling on an unconfigured server is an unknown tool (-32602)
        resp = plain.process(
            {"jsonrpc": "2.0", "id": 9, "method": "tools/call",
             "params": {"name": "temporal_search", "arguments": {"query": "x", "time_range": "a..b"}}}
        )
        assert resp["error"]["code"] == INVALID_PARAMS

    def test_search_and_file_at_match_engine(self, mcp_temporal):
        srv, ts = mcp_temporal
        got = _payload(_call(srv, "temporal_search", {
            "query": "spark merge", "time_range": "2025-03-01..2025-03-12",
            "diff_type": ["modified"], "limit": 5,
        }))
        want = ts.query("spark merge", start_day="2025-03-01", end_day="2025-03-12",
                        diff_types=["modified"], limit=5)
        assert [h["change_id"] for h in got["hits"]] == [h["change_id"] for h in want]
        p = "s0/0.txt"
        f = _payload(_call(srv, "get_file_at", {"path": p, "day": "2025-03-12"}))
        assert f["file"] == ts.file_at(p, "2025-03-12")
        f2 = _payload(_call(srv, "get_file_at", {"path": p, "at_commit": 1}))
        assert f2["file"] == ts.file_at_commit(p, 1)
        r = _call(srv, "get_file_at", {"path": p})
        assert r["isError"] is True and "day or at_commit" in r["content"][0]["text"]


def test_run_doctor_tool(mcp_idx):
    srv, _, _ = mcp_idx
    resp = srv.process({
        "jsonrpc": "2.0", "id": 9, "method": "tools/call",
        "params": {"name": "run_doctor", "arguments": {}},
    })
    body = json.loads(resp["result"]["content"][0]["text"])
    assert body["healthy"] is True and body["actions"] == []
