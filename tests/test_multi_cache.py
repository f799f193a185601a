"""Multi-index search aggregation, identical-query result cache, binary sniffer."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.query.engine import IndexSearcher
from code_indexer_ray.query.multi import MultiIndexSearcher
from code_indexer_ray.text.extract import is_text_payload


@pytest.fixture(scope="module")
def two_indexes(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multi")
    paths = {}
    for rid, base in [("repoA", 0), ("repoB", 100)]:
        rows = [
            {"doc_id": base + i, "text": f"common term{i % 4} filler words here", "lang": "en", "url": f"{rid}/{i}"}
            for i in range(30)
        ]
        src = str(tmp / f"{rid}.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        idx = str(tmp / f"{rid}_idx")
        build_index(src, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2)
        paths[rid] = idx
    return paths


class TestMultiIndex:
    def test_per_repo_aggregation_and_tagging(self, two_indexes):
        m = MultiIndexSearcher(two_indexes)
        results, errors = m.search("common", limit=5, snippet_lines=0)
        assert errors == {}
        assert set(results) == {"repoA", "repoB"}
        for rid, hits in results.items():
            assert 0 < len(hits) <= 5
            assert all(h["repository"] == rid for h in hits)

    def test_min_score_before_limit(self, two_indexes):
        m = MultiIndexSearcher(two_indexes)
        all_res, _ = m.search("term1", limit=50, snippet_lines=0)
        scores = sorted((h["score"] for h in all_res["repoA"]), reverse=True)
        cutoff = scores[len(scores) // 2]
        filt, _ = m.search("term1", limit=50, min_score=cutoff, snippet_lines=0)
        assert all(h["score"] >= cutoff for h in filt["repoA"])
        assert len(filt["repoA"]) == sum(1 for s in scores if s >= cutoff)


class TestResultCache:
    def test_identical_query_served_from_cache(self, two_indexes):
        s = IndexSearcher(list(two_indexes.values())[0])
        r1 = s.search("common term2", limit=5)
        t0 = time.perf_counter()
        r2 = s.search("common term2", limit=5)
        dt_ms = (time.perf_counter() - t0) * 1000
        assert r1 == r2
        assert dt_ms < 10  # the reference's identical-query cache target
        # cache returns copies — mutating a result must not poison the cache
        r2[0]["score"] = -1
        assert s.search("common term2", limit=5)[0]["score"] != -1


class TestBinarySniffer:
    def test_nul_byte_detection(self):
        payloads = pa.array(
            [b"plain text here", b"\x89PNG\r\n\x1a\n\x00\x00binary", b"", ("x" * 2000).encode() + b"\x00"],
            type=pa.binary(),
        )
        mask = is_text_payload(payloads)
        # NUL beyond the 1KiB sniff window is NOT detected (reference sniffs 1KB)
        assert mask.tolist() == [True, False, True, True]
