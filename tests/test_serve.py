"""Query-serving actor pool (ST5 analog): map_batches over a queries dataset
must reproduce the driver-side searcher's results exactly."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.query.engine import IndexSearcher
from code_indexer_ray.query.serve import evaluate_queries


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    rows = [
        {
            "doc_id": i,
            "text": " ".join(["alpha", "beta", "gamma", "delta"][j % 4] for j in range(i % 9 + 2)),
            "lang": "en",
            "url": f"s/{i}",
        }
        for i in range(60)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2)
    return out


def test_actor_pool_matches_driver(small_index, ray_session):
    import ray.data as rd

    queries = [
        {"query_id": 0, "query_text": "alpha beta", "mode": "exact", "edit_distance": 0, "limit": 5},
        {"query_id": 1, "query_text": "gamm", "mode": "fuzzy", "edit_distance": 1, "limit": 5},
        {"query_id": 2, "query_text": "d.*a", "mode": "regex", "edit_distance": 0, "limit": 5},
        {"query_id": 3, "query_text": "nosuch", "mode": "exact", "edit_distance": 0, "limit": 5},
    ]
    out = (
        evaluate_queries(rd.from_items(queries), small_index, concurrency=2, batch_size=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    s = IndexSearcher(small_index)
    for q in queries:
        res = s.search(
            q["query_text"],
            edit_distance=q["edit_distance"] if q["mode"] == "fuzzy" else 0,
            use_regex=q["mode"] == "regex",
            limit=q["limit"],
            snippet_lines=0,
        )
        sub = out[out["query_id"] == q["query_id"]]
        assert sub["doc_id"].tolist() == [r["doc_id"] for r in res]
        assert sub["score"].tolist() == pytest.approx([r["score"] for r in res])
