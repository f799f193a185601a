"""Searcher caches under concurrent queries (Ray actor pools run the UDF on
an internal thread pool — the bench's parallel-qps stage hit a KeyError in
the row-group LRU's check-then-pop recency refresh)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def tiny_cache_searcher(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    rng = np.random.default_rng(3)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 8, int(rng.integers(6, 30)))),
            "lang": "en",
            "url": f"u/{i}",
        }
        for i in range(400)
    ]
    tmp = tmp_path_factory.mktemp("thr")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=4, num_buckets=2, resume=False)
    s = IndexSearcher(idx)
    s._kv = False  # force the parquet row-group path (the racy one)
    s._rg_cache_max = 2  # constant eviction pressure
    s._result_cache_max = 4
    return s


def test_concurrent_queries_hammer_rg_cache(tiny_cache_searcher):
    s = tiny_cache_searcher
    terms = ["spark", "merge", "window", "batch", "row", "scan", "sort", "join"]

    def one(i: int):
        # unique-ish queries so the result cache doesn't absorb the load
        return s.search(terms[i % 8], limit=8, snippet_lines=1)

    with ThreadPoolExecutor(max_workers=8) as ex:
        results = list(ex.map(one, range(400)))
    assert all(isinstance(r, list) for r in results)
    # serial replay agrees (caches never corrupt results)
    for i in (0, 3, 5):
        want = s.search(terms[i % 8], limit=8, snippet_lines=1)
        assert [(h["doc_id"], h["score"]) for h in results[i]] == [
            (h["doc_id"], h["score"]) for h in want
        ]
