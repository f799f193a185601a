"""Driver contract for the Ray-Data-native code-indexer engine.

``entry()`` runs the flagship pipeline (index build + BM25 search) on
sf0.001; ``queries()``/``oracle_sql()`` expose the operator catalog from
SURVEY.md §2 with DuckDB oracle twins (see
``code_indexer_ray/pipelines/driver_api.py``).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the sharded inverted index over sf0.001 documents and
    run a battery of BM25 searches; returns the hit table."""
    import pandas as pd

    from code_indexer_ray.pipelines.driver_api import searcher_for

    s = searcher_for("/root/testdata/sf0.001")
    rows = []
    for query, kwargs in [
        ("spark merge", {}),
        ("window", {"limit": 5}),
        ("sparc", {"edit_distance": 1}),
        ("s.*k", {"use_regex": True}),
        ("spark", {"languages": ["en"]}),
    ]:
        for r in s.search(query, snippet_lines=0, **kwargs):
            rows.append(
                {
                    "query": query,
                    "doc_id": r["doc_id"],
                    "path": r["path"],
                    "language": r["language"],
                    "score": r["score"],
                    "line": r["line"],
                    "column": r["column"],
                }
            )
    return pd.DataFrame(rows)


def queries() -> dict[str, Callable[[str], Any]]:
    from code_indexer_ray.pipelines.driver_api import query_catalog

    return query_catalog()


def oracle_sql() -> dict[str, str]:
    from code_indexer_ray.pipelines.driver_api import oracle_catalog

    return oracle_catalog()
