"""search_mode=semantic|fts|hybrid on the serving surface (reference
QUERY_PARAMETERS.md "Search Mode Selection", default semantic): the HTTP
/search route and the MCP search_code tool backed by a persisted IVF vector
store, verified against in-test brute-force cosine / RRF compositions, plus
the reference's validation rules (FTS-only params rejected in semantic
mode, regex FTS-only, accuracy/nprobe conflict)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DIM = 16
N_CENT = 4  # default nprobe (4) == all cells -> the store IS brute force
QUERY = "spark merge"


def _get(url: str):
    with urllib.request.urlopen(urllib.request.Request(url), timeout=30) as r:
        return r.status, json.loads(r.read())


def _err_get(url: str) -> tuple[int, dict]:
    try:
        _get(url)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


@pytest.fixture(scope="module")
def sem_srv(ray_session, tmp_path_factory):
    from code_indexer_ray.ann.store import build_vector_store
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher
    from code_indexer_ray.server.http import IndexHTTPServer
    from code_indexer_ray.text.embed import TextEmbedStage

    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(4, 40)))),
            "lang": ["en", "de", "fr"][i % 3],
            "url": f"src{i % 4}/f{i}.py",
        }
        for i in range(150)
    ]
    tmp = tmp_path_factory.mktemp("semsrv")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)

    emb_stage = TextEmbedStage(dim=DIM, output="list")
    emb = emb_stage(pa.Table.from_pylist(rows).select(["doc_id", "text"]))
    emb = emb.filter(pa.compute.greater(emb["norm"], 0)).drop_columns(["norm"])
    emb_path = str(tmp / "emb.parquet")
    pq.write_table(emb, emb_path)
    store = str(tmp / "vstore")
    build_vector_store(emb_path, store, id_col="doc_id", vec_col="embedding",
                       n_centroids=N_CENT, resume=False)

    srv = IndexHTTPServer(idx, port=0, vector_store=store)
    srv.start()
    base = f"http://{srv.host}:{srv.port}"

    ids = emb["doc_id"].to_numpy(zero_copy_only=False)
    mat = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    qv = emb_stage(pa.table({"doc_id": pa.array([-1], pa.int64()), "text": [QUERY]}))
    q = np.asarray(qv["embedding"][0].as_py(), dtype=np.float64)
    cos = (mat / np.linalg.norm(mat, axis=1, keepdims=True)) @ (q / np.linalg.norm(q))
    meta = {r["doc_id"]: r for r in rows}
    yield base, IndexSearcher(idx), srv, ids, cos, meta, store
    srv.shutdown()


def _brute_rank(ids: np.ndarray, cos: np.ndarray, k: int) -> list[tuple[int, float]]:
    order = np.lexsort((ids, -cos))[:k]
    return [(int(ids[i]), float(cos[i])) for i in order]


class TestTopkLocalParity:
    def test_matches_ray_topk(self, sem_srv):
        from code_indexer_ray.ann.store import VectorStoreSearcher

        _, _, _, ids, _, _, store = sem_srv
        s = VectorStoreSearcher(store)
        rng = np.random.default_rng(3)
        qs = rng.normal(size=(4, DIM))
        qids = np.array([-1, -2, 5, 10])
        for nprobe in (1, 2, N_CENT):
            a = s.topk(qs, qids, 12, nprobe=nprobe).to_pylist()
            b = s.topk_local(qs, qids, 12, nprobe=nprobe).to_pylist()
            # (query_id, rank, vec_id) must match exactly; cos only to
            # 1e-12 — multithreaded BLAS dot products are summation-order
            # nondeterministic under load, so the two paths can differ in
            # the last ULP (observed once in ~3 full-suite runs)
            assert [(r["query_id"], r["rank"], r["vec_id"]) for r in a] == [
                (r["query_id"], r["rank"], r["vec_id"]) for r in b
            ]
            assert all(
                abs(x["cos"] - y["cos"]) < 1e-12 for x, y in zip(a, b)
            )

    def test_accuracy_conflict(self, sem_srv):
        from code_indexer_ray.ann.store import VectorStoreSearcher

        *_, store = sem_srv
        s = VectorStoreSearcher(store)
        with pytest.raises(ValueError, match="not both"):
            s.topk_local(np.zeros((1, DIM)), np.array([-1]), 3, nprobe=2, accuracy="high")


class TestSemanticMode:
    def test_semantic_topk_is_brute_force(self, sem_srv):
        base, _, _, ids, cos, _, _ = sem_srv
        _, got = _get(base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=10")
        want = _brute_rank(ids, cos, 10)
        assert [(h["doc_id"], round(h["score"], 9)) for h in got["hits"]] == [
            (d, round(c, 9)) for d, c in want
        ]
        # hydrated stored fields ride along
        assert all(h["path"] and h["language"] for h in got["hits"])

    def test_default_mode_is_semantic_when_store_configured(self, sem_srv):
        base, *_ = sem_srv
        _, a = _get(base + f"/search?q={QUERY.replace(' ', '+')}&limit=5")
        _, b = _get(base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=5")
        assert a == b

    def test_explicit_fts_mode_still_lexical(self, sem_srv):
        base, s, *_ = sem_srv
        _, got = _get(base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=fts&limit=5")
        want = s.search(QUERY, match_any=True, limit=5, snippet_lines=0)
        assert [h["doc_id"] for h in got["hits"]] == [h["doc_id"] for h in want]

    def test_language_filter_with_overfetch(self, sem_srv):
        base, _, _, ids, cos, meta, _ = sem_srv
        _, got = _get(
            base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=5&language=en"
        )
        cand = _brute_rank(ids, cos, 15)  # x3 over-fetch, then filter
        want = [d for d, _ in cand if meta[d]["lang"] == "en"][:5]
        assert [h["doc_id"] for h in got["hits"]] == want
        assert all(h["language"] == "en" for h in got["hits"])

    def test_min_score_filters_cosine(self, sem_srv):
        base, _, _, ids, cos, _, _ = sem_srv
        _, got = _get(
            base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=10&min_score=0.5"
        )
        cand = _brute_rank(ids, cos, 30)
        want = [d for d, c in cand if c >= 0.5][:10]
        assert [h["doc_id"] for h in got["hits"]] == want

    def test_snippet_is_doc_head(self, sem_srv):
        base, _, _, _, _, meta, _ = sem_srv
        _, got = _get(
            base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=1&snippet_lines=2"
        )
        h = got["hits"][0]
        head = "\n".join(meta[h["doc_id"]]["text"].split("\n")[:2])
        assert h["snippet"] == head


class TestHybridMode:
    def test_hybrid_is_rrf_of_both_legs(self, sem_srv):
        from code_indexer_ray.query.parser import search_query_string

        base, s, _, ids, cos, _, _ = sem_srv
        limit = 10
        depth = max(20, 2 * limit)
        _, got = _get(base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=hybrid&limit={limit}")
        lex = search_query_string(s, QUERY, limit=depth, snippet_lines=0)
        lex_rank = {h["doc_id"]: i for i, h in enumerate(lex, 1)}
        vec_rank = {d: i for i, (d, _) in enumerate(_brute_rank(ids, cos, depth), 1)}
        fused = {}
        for d in set(lex_rank) | set(vec_rank):
            rl, rv = lex_rank.get(d), vec_rank.get(d)
            fused[d] = (1 / (60 + rl) if rl else 0.0) + (1 / (60 + rv) if rv else 0.0)
        want = sorted(fused.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:limit]
        assert [(h["doc_id"], round(h["score"], 9)) for h in got["hits"]] == [
            (d, round(sc, 9)) for d, sc in want
        ]


class TestValidation:
    @pytest.mark.parametrize(
        "qs,msg",
        [
            ("search_mode=bogus", "search_mode"),
            ("search_mode=semantic&fuzzy=true", "fts or hybrid"),
            ("search_mode=semantic&case_sensitive=1", "fts or hybrid"),
            ("search_mode=semantic&edit_distance=2", "fts or hybrid"),
            ("search_mode=hybrid&regex=true", "fts"),
            ("search_mode=semantic&limit=0", "finite k"),
            ("search_mode=semantic&branch=main", "fts"),
            ("search_mode=semantic&accuracy=high&nprobe=2", "not both"),
        ],
    )
    def test_400s(self, sem_srv, qs, msg):
        base, *_ = sem_srv
        code, err = _err_get(base + f"/search?q=spark&{qs}")
        assert code == 400 and msg in err["error"]

    def test_zero_token_query_400(self, sem_srv):
        base, *_ = sem_srv
        code, err = _err_get(base + "/search?q=%21%21%21&search_mode=semantic")
        assert code == 400 and "embeddable" in err["error"]

    def test_semantic_without_store_400(self, sem_srv, tmp_path):
        # a plain-FTS server (no --vector-store) rejects the vector modes
        # and defaults to fts
        from code_indexer_ray.server.http import rest_search

        _, s, *_ = sem_srv
        with pytest.raises(ValueError, match="vector store"):
            rest_search(s, "spark", {"search_mode": "semantic"})
        hits = rest_search(s, "spark", {"limit": 3})
        assert hits == rest_search(s, "spark", {"limit": 3, "search_mode": "fts"})

    def test_accuracy_profile_runs(self, sem_srv):
        base, _, _, ids, cos, _, _ = sem_srv
        # high -> nprobe max(4, 4//2)=4 of 4 cells -> still exact here
        _, got = _get(
            base + f"/search?q={QUERY.replace(' ', '+')}&search_mode=semantic&limit=5&accuracy=high"
        )
        assert [h["doc_id"] for h in got["hits"]] == [d for d, _ in _brute_rank(ids, cos, 5)]


class TestMCPSearchMode:
    def test_mcp_search_code_semantic(self, sem_srv, tmp_path):
        from code_indexer_ray.server.mcp import MCPServer

        base, s, srv, ids, cos, _, store = sem_srv
        m = MCPServer(srv.index_dir, vector_store=store)
        res = m.process(
            {
                "jsonrpc": "2.0",
                "id": 1,
                "method": "tools/call",
                "params": {
                    "name": "search_code",
                    "arguments": {"query": QUERY, "search_mode": "semantic", "limit": 5},
                },
            }
        )
        payload = json.loads(res["result"]["content"][0]["text"])
        assert [h["doc_id"] for h in payload["hits"]] == [
            d for d, _ in _brute_rank(ids, cos, 5)
        ]
