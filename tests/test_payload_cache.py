"""Payload cache (reference ``server/cache/payload_cache.py``, Story #679
truncation + #720 explicit keys): storage/pagination/TTL semantics and the
live ``/mget?truncate=true`` + ``/payload`` HTTP wiring."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.server.payload import (
    CacheNotFoundError,
    PayloadCache,
    PayloadCacheConfig,
)


class Clock:
    def __init__(self, t=1_000.0):
        self.t = float(t)

    def __call__(self):
        return self.t

    def advance(self, s):
        self.t += s


@pytest.fixture()
def cache(tmp_path):
    clk = Clock()
    c = PayloadCache(
        str(tmp_path / "p.sqlite"),
        PayloadCacheConfig(
            preview_size_chars=10, max_fetch_size_chars=8, cache_ttl_seconds=900
        ),
        now_fn=clk,
    )
    return c, clk


class TestPayloadCache:
    def test_store_retrieve_pages(self, cache):
        c, _ = cache
        content = "abcdefgh" * 3  # 24 chars, page size 8 → 3 pages
        h = c.store(content)
        p0 = c.retrieve(h, 0)
        assert p0.content == "abcdefgh" and p0.total_pages == 3 and p0.has_more
        p2 = c.retrieve(h, 2)
        assert p2.content == "abcdefgh" and not p2.has_more
        with pytest.raises(CacheNotFoundError, match="out of range"):
            c.retrieve(h, 3)
        with pytest.raises(CacheNotFoundError, match="Invalid page"):
            c.retrieve(h, -1)
        with pytest.raises(CacheNotFoundError, match="not found"):
            c.retrieve("bogus")

    def test_empty_content_single_page(self, cache):
        c, _ = cache
        h = c.store("")
        r = c.retrieve(h, 0)
        assert r.content == "" and r.total_pages == 1 and not r.has_more

    def test_truncate_result(self, cache):
        c, _ = cache
        small = c.truncate_result("short")
        assert small == {
            "preview": "short",
            "cache_handle": None,
            "has_more": False,
            "total_size": 5,
        }
        big = c.truncate_result("x" * 25)
        assert big["preview"] == "x" * 10 and big["has_more"]
        assert big["total_size"] == 25
        # the handle pages the FULL content back out
        assert c.retrieve(big["cache_handle"], 0).content == "x" * 8

    def test_explicit_keys(self, cache):
        c, _ = cache
        assert not c.has_key("delegation:job-1")
        c.store_with_key("delegation:job-1", "v1")
        assert c.has_key("delegation:job-1")
        c.store_with_key("delegation:job-1", "v2")
        assert c.retrieve("delegation:job-1").content == "v2"

    def test_ttl_cleanup(self, cache):
        c, clk = cache
        h1 = c.store("old")
        clk.advance(901)
        h2 = c.store("new")
        assert c.cleanup_expired() == 1
        with pytest.raises(CacheNotFoundError):
            c.retrieve(h1)
        assert c.retrieve(h2).content == "new"
        assert c.get_stats()["entries"] == 1

    def test_from_env(self, monkeypatch):
        monkeypatch.setenv("CIDX_PREVIEW_SIZE_CHARS", "123")
        monkeypatch.setenv("CIDX_CACHE_TTL_SECONDS", "bogus")  # ignored
        cfg = PayloadCacheConfig.from_env()
        assert cfg.preview_size_chars == 123
        assert cfg.cache_ttl_seconds == 900.0

    def test_persistence_across_instances(self, tmp_path):
        db = str(tmp_path / "p.sqlite")
        h = PayloadCache(db).store("persisted")
        assert PayloadCache(db).retrieve(h).content == "persisted"


# ---------------------------------------------------------------------------


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def payload_srv(ray_session, tmp_path_factory, monkeypatch_module=None):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.server.http import IndexHTTPServer

    tmp = tmp_path_factory.mktemp("paysrv")
    rows = [
        {
            "doc_id": 0,
            "text": "tiny doc",
            "lang": "en",
            "url": "a.py",
        },
        {
            "doc_id": 1,
            "text": "spark " * 1000,  # 6000 chars > default 2000 preview
            "lang": "en",
            "url": "b.py",
        },
    ] + [
        {"doc_id": i, "text": f"filler {i}", "lang": "en", "url": f"f{i}.py"}
        for i in range(2, 40)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=1, resume=False)
    srv = IndexHTTPServer(idx, port=0, warm=False, payload_cache=str(tmp / "pc"))
    srv.start()
    yield f"http://{srv.host}:{srv.port}"
    srv.shutdown()


@pytest.mark.usefixtures("ray_session")
class TestHTTPPayload:
    def test_mget_truncate_and_paged_fetch(self, payload_srv):
        base = payload_srv
        code, body = _get(base + "/mget?ids=0,1&truncate=true")
        assert code == 200
        docs = {d["doc_id"]: d for d in body["docs"]}
        assert docs[0]["preview"] == "tiny doc"
        assert docs[0]["cache_handle"] is None and not docs[0]["has_more"]
        big = docs[1]
        assert big["has_more"] and big["total_size"] == 6000
        assert len(big["preview"]) == 2000
        # page the full payload back out (default 5000 chars/page → 2 pages)
        parts, page = [], 0
        while True:
            code, pr = _get(f"{base}/payload?handle={big['cache_handle']}&page={page}")
            assert code == 200
            parts.append(pr["content"])
            if not pr["has_more"]:
                break
            page += 1
        assert pr["total_pages"] == 2
        assert "".join(parts) == "spark " * 1000

    def test_mget_without_truncate_unchanged(self, payload_srv):
        code, body = _get(payload_srv + "/mget?ids=1")
        assert code == 200
        assert body["docs"][0]["text"] == "spark " * 1000

    def test_payload_errors(self, payload_srv):
        try:
            _get(payload_srv + "/payload?handle=bogus")
            raise AssertionError("expected error")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "not found" in json.loads(e.read())["error"]


class TestReadTimeTTL:
    def test_expired_handle_not_retrievable_without_cleanup(self, cache):
        """TTL enforced at read time — an expired handle must not
        resurrect between cleanup sweeps."""
        c, clk = cache
        h = c.store("x" * 20)
        clk.advance(901)
        with pytest.raises(CacheNotFoundError):
            c.retrieve(h)
