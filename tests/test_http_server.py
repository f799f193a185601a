"""HTTP JSON API (reference ``server/app.py`` analog, stdlib-only): routes,
parity with direct engine calls, auth, batch, and error mapping — against a
real server thread on an ephemeral port."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _get(url: str, headers: dict | None = None):
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url: str, payload: dict, headers: dict | None = None):
    data = json.dumps(payload).encode()
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": "application/json", **(headers or {})}
    )
    with urllib.request.urlopen(req, timeout=30) as r:
        return r.status, json.loads(r.read())


def _err(fn, *a, **kw) -> tuple[int, dict]:
    try:
        fn(*a, **kw)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


@pytest.fixture(scope="module")
def http_idx(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher
    from code_indexer_ray.server.http import IndexHTTPServer

    rng = np.random.default_rng(7)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(4, 40)))),
            "lang": ["en", "de", "fr"][i % 3],
            "url": f"src{i % 4}/f{i}.py",
        }
        for i in range(200)
    ]
    tmp = tmp_path_factory.mktemp("http")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2, resume=False)
    srv = IndexHTTPServer(out, port=0)
    srv.start()
    base = f"http://{srv.host}:{srv.port}"
    yield base, IndexSearcher(out), srv
    srv.shutdown()


class TestRoutes:
    def test_health_and_stats(self, http_idx):
        base, s, _srv = http_idx
        code, h = _get(base + "/health")
        assert code == 200 and h["status"] == "ok" and h["num_docs"] == 200
        code, st = _get(base + "/stats")
        assert st["num_docs"] == 200
        assert st["total_tokens"] == s.manifest.total_tokens

    def test_search_matches_engine(self, http_idx):
        base, s, _srv = http_idx
        _, got = _get(base + "/search?q=spark+merge&limit=5")
        want = s.search("spark merge", match_any=True, limit=5, snippet_lines=0)
        assert [(h["doc_id"], h["score"]) for h in got["hits"]] == [
            (h["doc_id"], h["score"]) for h in want
        ]

    def test_search_post_grammar(self, http_idx):
        """POST body, boolean grammar with facet filter."""
        base, s, _srv = http_idx
        _, got = _post(base + "/search", {"q": "+spark -merge lang:en", "limit": 10})
        want = s.search(
            "spark", exclude_terms=["merge"], languages=["en"], limit=10, snippet_lines=0
        )
        assert [(h["doc_id"], h["score"]) for h in got["hits"]] == [
            (h["doc_id"], h["score"]) for h in want
        ]

    def test_batch(self, http_idx):
        base, s, _srv = http_idx
        _, got = _post(
            base + "/batch",
            {"queries": [
                {"id": 1, "q": "spark AND merge", "limit": 3},
                {"id": 2, "q": "window", "limit": 2},
            ]},
        )
        assert [r["id"] for r in got["results"]] == [1, 2]
        want = s.search("spark merge", limit=3, snippet_lines=0)
        assert [h["doc_id"] for h in got["results"][0]["hits"]] == [h["doc_id"] for h in want]

    def test_mget(self, http_idx):
        base, s, _srv = http_idx
        _, got = _get(base + "/mget?ids=0,5,7")
        assert [d["doc_id"] for d in got["docs"]] == [0, 5, 7]
        assert got["docs"][0]["text"] == s.mget([0])[0]["text"]

    def test_suggest_and_complete(self, http_idx):
        base, s, _srv = http_idx
        _, got = _get(base + "/suggest?word=spakr")
        assert got["suggestion"] == s.suggest("spakr")
        _, got = _get(base + "/complete?prefix=s&limit=5")
        assert got["completions"] == s.complete("s", limit=5)

    def test_error_mapping(self, http_idx):
        base, _s, _srv = http_idx
        code, body = _err(_get, base + "/search")  # missing q
        assert code == 400 and "q" in body["error"]
        code, body = _err(_get, base + "/search?q=size%3A10")  # unknown field
        assert code == 400 and "unknown field" in body["error"]
        code, body = _err(_get, base + "/nope")
        assert code == 404
        code, body = _err(
            _post, base + "/batch", {"queries": "notalist"}
        )
        assert code == 400


class TestAuth:
    def test_api_key(self, ray_session, http_idx, tmp_path_factory):
        from code_indexer_ray.server.http import IndexHTTPServer

        _base, s, _srv = http_idx
        srv = IndexHTTPServer(s.index_dir, port=0, api_key="sekrit", warm=False)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            code, _h = _get(base + "/health")  # health stays open
            assert code == 200
            code, body = _err(_get, base + "/stats")
            assert code == 401
            code, _st = _get(base + "/stats", headers={"X-API-Key": "sekrit"})
            assert code == 200
        finally:
            srv.shutdown()


class TestFollowGenerations:
    """The watch-daemon behavior: the server follows index updates without a
    restart — both an in-place re-publish (manifest mtime) and a WatchDriver
    ``current`` pointer flip."""

    def test_inplace_republish(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("reload")
        rows = [{"doc_id": i, "text": "spark merge", "lang": "en", "url": "u"} for i in range(20)]
        src = str(tmp / "a.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)
        srv = IndexHTTPServer(idx, port=0, warm=False)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            _, h = _get(base + "/health")
            assert h["num_docs"] == 20
            # re-publish IN PLACE with a bigger corpus
            rows2 = rows + [
                {"doc_id": i, "text": "window sort", "lang": "de", "url": "u"}
                for i in range(20, 50)
            ]
            src2 = str(tmp / "b.parquet")
            pq.write_table(pa.Table.from_pylist(rows2), src2)
            build_index(src2, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)
            _, h2 = _get(base + "/health")
            assert h2["num_docs"] == 50
            _, got = _get(base + "/search?q=window&limit=5")
            assert len(got["hits"]) == 5
        finally:
            srv.shutdown()

    def test_current_pointer_flip(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("gens")
        root = str(tmp)
        for gen, n in (("g1", 10), ("g2", 30)):
            rows = [{"doc_id": i, "text": "spark", "lang": "en", "url": "u"} for i in range(n)]
            src = str(tmp / f"{gen}.parquet")
            pq.write_table(pa.Table.from_pylist(rows), src)
            build_index(src, str(tmp / gen), store_cols=("lang", "url"),
                        num_shards=1, num_buckets=2, resume=False)
        with open(str(tmp / "current"), "w") as f:
            f.write("g1")
        srv = IndexHTTPServer(root, port=0, warm=False)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            _, h = _get(base + "/health")
            assert h["num_docs"] == 10 and h["index_dir"].endswith("g1")
            # atomic repoint (the WatchDriver swap)
            import os as _os
            tmpf = str(tmp / "current.tmp")
            with open(tmpf, "w") as f:
                f.write("g2")
            _os.replace(tmpf, str(tmp / "current"))
            _, h2 = _get(base + "/health")
            assert h2["num_docs"] == 30 and h2["index_dir"].endswith("g2")
        finally:
            srv.shutdown()

    def test_follow_off(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("nofollow")
        rows = [{"doc_id": i, "text": "spark", "lang": "en", "url": "u"} for i in range(5)]
        src = str(tmp / "a.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, num_buckets=2, resume=False)
        srv = IndexHTTPServer(idx, port=0, warm=False, follow=False)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        try:
            rows2 = rows + [{"doc_id": 5, "text": "spark", "lang": "en", "url": "u"}]
            src2 = str(tmp / "b.parquet")
            pq.write_table(pa.Table.from_pylist(rows2), src2)
            build_index(src2, idx, store_cols=("lang", "url"), num_shards=1, num_buckets=2, resume=False)
            _, h = _get(base + "/health")
            assert h["num_docs"] == 5  # pinned snapshot
        finally:
            srv.shutdown()


class TestScipRoutes:
    """/scip/* code-intelligence routes (reference scip_queries.py)."""

    @pytest.fixture(scope="class")
    def scip_srv(self, ray_session, tmp_path_factory):
        import ray.data as rd

        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.scip import build_symbol_store
        from code_indexer_ray.server.http import IndexHTTPServer

        tmp = tmp_path_factory.mktemp("scip_http")
        t0 = "def a():\n    x b()\ndef b():\n    x c()\ndef c():\n    x x\n"
        t1 = "def d():\n    x a()\ndef e():\n    x d()\n    x e()\n"
        tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [t0, t1],
                        "lang": ["py", "py"], "url": ["a.py", "b.py"]})
        src = str(tmp / "docs.parquet")
        pq.write_table(tbl, src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=2, resume=False)
        store = str(tmp / "symstore")
        build_symbol_store(rd.read_parquet(src, columns=["doc_id", "text"]),
                           store, num_parts=4)
        srv = IndexHTTPServer(idx, port=0, scip_store=store)
        srv.start()
        yield f"http://{srv.host}:{srv.port}"
        srv.shutdown()

    def test_definition_references(self, scip_srv):
        _, d = _get(scip_srv + "/scip/definition?symbol=a")
        assert d["definitions"] == [{"doc_id": 0, "line": 1}]
        _, r = _get(scip_srv + "/scip/references?symbol=a")
        assert r["references"] == [{"doc_id": 1, "line": 2, "caller": "d"}]

    def test_graph_routes(self, scip_srv):
        _, d = _get(scip_srv + "/scip/dependencies?symbol=a")
        assert d["dependencies"] == [{"callee": "b", "n_calls": 1}]
        _, d = _get(scip_srv + "/scip/dependents?symbol=a")
        assert d["dependents"] == [{"caller": "d", "n_calls": 1}]
        _, i = _get(scip_srv + "/scip/impact?symbol=c&depth=3")
        assert i["impact"] == [
            {"sym": "b", "depth": 1}, {"sym": "a", "depth": 2}, {"sym": "d", "depth": 3}
        ]
        _, c = _get(scip_srv + "/scip/callchain?from=e&to=c&depth=4")
        assert c["chains"] == [{"chain": "e -> d -> a -> b -> c", "depth": 4}]

    def test_errors(self, scip_srv):
        code, e = _err(_get, scip_srv + "/scip/impact")
        assert code == 400 and "symbol" in e["error"]
        code, e = _err(_get, scip_srv + "/scip/nosuch?symbol=a")
        assert code == 404

    def test_unconfigured_store_503(self, http_idx):
        base, _s, _srv = http_idx
        code, e = _err(_get, base + "/scip/definition?symbol=a")
        assert code == 503 and "symbol store" in e["error"]


def test_search_branch_param(http_idx):
    from code_indexer_ray.index.visibility import hide_docs

    base, s, srv = http_idx
    _, all_hits = _get(base + "/search?q=spark&limit=0")
    top = all_hits["hits"][0]["doc_id"]
    hide_docs(srv.index_dir, "httpfeat", [top])
    _, got = _get(base + "/search?q=spark&limit=0&branch=httpfeat")
    assert top not in {h["doc_id"] for h in got["hits"]}
    assert len(got["hits"]) == len(all_hits["hits"]) - 1


class TestRestParams:
    """Reference REST parameter surface (QUERY_PARAMETERS.md): structured
    filters, fuzzy/regex flags + conflict rule, min_score, accuracy enum,
    constraint validation — each vs the direct engine call."""

    def test_structured_filters_match_engine(self, http_idx):
        base, s, _srv = http_idx
        _, got = _post(base + "/search", {"q": "spark", "limit": 5, "language": "en"})
        want = s.search("spark", languages=["en"], limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in got["hits"]] == [h["doc_id"] for h in want]
        _, got2 = _post(
            base + "/search",
            {"q": "spark", "limit": 5, "exclude_language": "en", "path_filter": "src1/*"},
        )
        want2 = s.search(
            "spark", exclude_languages=["en"], path_filters=["src1/*"],
            limit=5, snippet_lines=0,
        )
        assert [h["doc_id"] for h in got2["hits"]] == [h["doc_id"] for h in want2]
        _, got3 = _post(base + "/search", {"q": "spark", "limit": 5, "exclude_path": "src1/*"})
        want3 = s.search("spark", exclude_paths=["src1/*"], limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in got3["hits"]] == [h["doc_id"] for h in want3]

    def test_file_extensions(self, http_idx):
        base, _s, _srv = http_idx
        _, plain = _post(base + "/search", {"q": "merge", "limit": 5})
        _, py = _post(base + "/search", {"q": "merge", "limit": 5, "file_extensions": ".py"})
        assert [h["doc_id"] for h in py["hits"]] == [h["doc_id"] for h in plain["hits"]]
        _, js = _post(
            base + "/search", {"q": "merge", "limit": 5, "file_extensions": [".js", ".go"]}
        )
        assert js["hits"] == []

    def test_fuzzy_regex_and_conflict(self, http_idx):
        base, s, _srv = http_idx
        _, fz = _post(base + "/search", {"q": "mege", "limit": 5, "fuzzy": True})
        want = s.search("mege", edit_distance=1, limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in fz["hits"]] == [h["doc_id"] for h in want]
        _, rx = _post(base + "/search", {"q": "s.*k", "limit": 5, "regex": True})
        wantr = s.search("s.*k", use_regex=True, limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in rx["hits"]] == [h["doc_id"] for h in wantr]
        code, err = _err(
            _post, base + "/search", {"q": "spark", "fuzzy": True, "regex": True}
        )
        assert code == 400 and "mutually exclusive" in err["error"]

    def test_min_score_overfetch(self, http_idx):
        base, s, _srv = http_idx
        full = s.search("spark", limit=15, snippet_lines=0)
        ms = full[4]["score"]  # threshold between hit 5 and 6
        _, got = _post(base + "/search", {"q": "spark", "limit": 5, "min_score": ms})
        assert [h["doc_id"] for h in got["hits"]] == [
            h["doc_id"] for h in full if h["score"] >= ms
        ][:5]
        assert all(h["score"] >= ms for h in got["hits"])

    def test_validation_rules(self, http_idx):
        base, _s, _srv = http_idx
        code, err = _err(_post, base + "/search", {"q": "spark", "limit": 101})
        assert code == 400 and "limit" in err["error"]
        code, err = _err(_post, base + "/search", {"q": "spark", "snippet_lines": 99})
        assert code == 400 and "snippet_lines" in err["error"]
        code, err = _err(_post, base + "/search", {"q": "spark", "accuracy": "turbo"})
        assert code == 400 and "accuracy" in err["error"]
        # valid profile is accepted (and ignored on the FTS route)
        code, ok = _post(base + "/search", {"q": "spark", "limit": 3, "accuracy": "high"})
        assert code == 200 and len(ok["hits"]) == 3
        # limit=0 stays the engine-wide unlimited convention
        code, all_ = _post(base + "/search", {"q": "spark", "limit": 0})
        assert code == 200 and len(all_["hits"]) >= len(ok["hits"])


class TestTemporalRoutes:
    """Reference REST temporal parameter surface over /temporal/*:
    time_range, diff_type, author, at_commit, include_removed,
    show_evolution/evolution_limit — each vs the direct TemporalSearcher."""

    @pytest.fixture(scope="class")
    def temporal_http(self, ray_session, tmp_path_factory):
        from code_indexer_ray.server.http import IndexHTTPServer
        from code_indexer_ray.temporal.history import change_rows
        from code_indexer_ray.temporal.index import build_temporal_index
        from code_indexer_ray.temporal.pathstore import build_path_store
        from code_indexer_ray.temporal.search import TemporalSearcher

        tmp = tmp_path_factory.mktemp("thttp")
        rng = np.random.default_rng(3)
        vocab = ["spark", "merge", "window", "batch"]
        docs = pa.Table.from_pylist(
            [
                {
                    "doc_id": i,
                    "source": f"s{i % 3}",
                    "text": " ".join(
                        vocab[j] for j in rng.integers(0, 4, int(rng.integers(5, 25)))
                    ),
                    "lang": "en",
                }
                for i in range(60)
            ]
        )
        chg = str(tmp / "chg.parquet")
        pq.write_table(change_rows(docs), chg)
        troot = str(tmp / "tidx")
        build_temporal_index(chg, troot, bucket_days=4, num_shards=1, num_buckets=1)
        build_path_store(troot, num_parts=4)
        # the FTS index the server fronts (any small one)
        src = str(tmp / "c.parquet")
        pq.write_table(
            pa.Table.from_pylist(
                [{"doc_id": i, "text": "spark merge", "lang": "en", "url": f"u/{i}"} for i in range(20)]
            ),
            src,
        )
        from code_indexer_ray.index.build import build_index

        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=1, num_buckets=1, resume=False)
        srv = IndexHTTPServer(idx, port=0, temporal_index=troot)
        srv.start()
        base = f"http://{srv.host}:{srv.port}"
        yield base, TemporalSearcher(troot), docs
        srv.shutdown()

    def test_search_time_range_and_filters(self, temporal_http):
        base, ts, _docs = temporal_http
        _, got = _post(
            base + "/temporal/search",
            {
                "q": "spark merge",
                "time_range": "2025-03-05..2025-03-12",
                "diff_type": "modified",
                "limit": 5,
            },
        )
        want = ts.query(
            "spark merge", start_day="2025-03-05", end_day="2025-03-12",
            diff_types=["modified"], limit=5,
        )
        assert [h["change_id"] for h in got["hits"]] == [h["change_id"] for h in want]
        # author filter
        _, got2 = _post(
            base + "/temporal/search",
            {"q": "spark", "time_range": "2025-03-01..2025-03-12", "author": "alice", "limit": 3},
        )
        want2 = ts.query(
            "spark", start_day="2025-03-01", end_day="2025-03-12",
            authors=["alice"], limit=3,
        )
        assert [h["change_id"] for h in got2["hits"]] == [h["change_id"] for h in want2]

    def test_show_evolution(self, temporal_http):
        base, ts, _docs = temporal_http
        _, got = _post(
            base + "/temporal/search",
            {
                "q": "spark",
                "time_range": "2025-03-01..2025-03-12",
                "limit": 3,
                "show_evolution": True,
                "evolution_limit": 2,
            },
        )
        assert got["hits"] and all(len(h["evolution"]) <= 2 for h in got["hits"])

    def test_file_at_and_at_commit(self, temporal_http):
        base, ts, docs = temporal_http
        p = f"{docs['source'][0].as_py()}/0.txt"
        _, got = _post(base + "/temporal/file-at", {"path": p, "day": "2025-03-12"})
        want = ts.file_at(p, "2025-03-12")
        assert got["file"] == want
        _, got2 = _post(base + "/temporal/file-at", {"path": p, "at_commit": 1})
        want2 = ts.file_at_commit(p, 1)
        assert got2["file"] == want2
        code, err = _err(_post, base + "/temporal/file-at", {"path": p, "at_commit": 10**9})
        assert code == 400  # unknown commit → clean 400, not a 500
        _, hist = _post(base + "/temporal/history", {"path": p})
        assert [r["change_id"] for r in hist["history"]] == [
            r["change_id"] for r in ts.history(p)
        ]

    def test_validation_and_unconfigured(self, temporal_http, http_idx):
        base, _ts, _docs = temporal_http
        code, err = _err(
            _post, base + "/temporal/search", {"q": "x", "time_range": "2025-03-01"}
        )
        assert code == 400 and "time_range" in err["error"]
        # a server without --temporal-index replies 503
        plain_base, _s, _srv = http_idx
        code, err = _err(
            _post, plain_base + "/temporal/search",
            {"q": "x", "time_range": "2025-03-01..2025-03-02"},
        )
        assert code == 503


class TestSearcherPool:
    """pool_size > 1 (VERDICT r3 #7): searcher routes overlap across replica
    slots instead of serializing behind one process-wide lock."""

    @pytest.fixture(scope="class")
    def pooled(self, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.server.http import IndexHTTPServer

        rows = [
            {"doc_id": i, "text": "alpha beta gamma delta", "lang": "en",
             "url": f"f{i}.py"}
            for i in range(50)
        ]
        tmp = tmp_path_factory.mktemp("pool")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / "idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=2,
                    num_buckets=2, resume=False)
        srv = IndexHTTPServer(idx, port=0, pool_size=2)
        srv.start()
        yield srv
        srv.shutdown()

    def test_replicas_are_distinct(self, pooled):
        reps = pooled._follower.searchers
        assert len(reps) == 2 and reps[0] is not reps[1]

    def test_two_searches_overlap(self, pooled):
        """Instrument both replicas: request B enters while request A is
        still inside its search call — impossible with the old global lock."""
        import threading
        import time as _time

        barrier = threading.Barrier(2, timeout=10)
        overlapped = []

        for rep in pooled._follower.searchers:
            orig = rep.search

            def slow(*a, _orig=orig, **kw):
                try:
                    barrier.wait()  # both threads inside search() at once
                    overlapped.append(True)
                except threading.BrokenBarrierError:
                    overlapped.append(False)
                return _orig(*a, **kw)

            rep.search = slow

        base = f"http://{pooled.host}:{pooled.port}"
        results = []

        def hit():
            results.append(_get(base + "/search?q=alpha&limit=3")[0])

        t1 = threading.Thread(target=hit)
        t2 = threading.Thread(target=hit)
        t1.start(); t2.start()
        t1.join(timeout=15); t2.join(timeout=15)
        assert results == [200, 200]
        assert overlapped == [True, True]

    def test_pool_survives_generation_refresh(self, pooled):
        # refresh keeps serving (stamp unchanged → same replicas)
        before = pooled._follower.searchers
        base = f"http://{pooled.host}:{pooled.port}"
        assert _get(base + "/search?q=beta&limit=2")[0] == 200
        assert pooled._follower.searchers is before
