"""Query serving as a Ray Data actor-pool stage (the reference's daemon
index-cache, ST5 in SURVEY.md §2.3, rebuilt Ray-native).

Each actor constructs an :class:`IndexSearcher` ONCE (segments + term
dictionary + doc metadata mmap'd/loaded in ``__init__``) and then serves
batches of queries — ``queries_ds.map_batches(QueryEvalStage, concurrency=N)``
gives N-way parallel query throughput with per-actor warm caches, the
distributed analog of "daemon fast path: cached index, many queries".
"""

from __future__ import annotations

import pyarrow as pa

from .engine import IndexSearcher


class QueryEvalStage:
    """Actor: __init__ loads the index once; __call__ evaluates a query batch.

    Input rows: query_id:int64, query_text:string, optional mode:string
    ('exact'|'fuzzy'|'regex'), edit_distance:int, limit:int.
    Output rows: query_id, rank, doc_id, score, path.
    """

    def __init__(self, index_dir: str, lang_col: str | None = "lang", url_col: str | None = "url"):
        self.searcher = IndexSearcher(index_dir, lang_col=lang_col, url_col=url_col)
        # touch every shard once so per-actor caches are warm
        self.searcher.warm()

    def __call__(self, batch: pa.Table) -> pa.Table:
        names = batch.schema.names
        out = {"query_id": [], "rank": [], "doc_id": [], "score": [], "path": []}
        for i in range(batch.num_rows):
            qid = batch["query_id"][i].as_py()
            text = batch["query_text"][i].as_py()
            mode = batch["mode"][i].as_py() if "mode" in names else "exact"
            dist = batch["edit_distance"][i].as_py() if "edit_distance" in names else 0
            limit = batch["limit"][i].as_py() if "limit" in names else 10
            res = self.searcher.search(
                text,
                edit_distance=dist if mode == "fuzzy" else 0,
                use_regex=(mode == "regex"),
                limit=limit,
                snippet_lines=0,
            )
            for rank, r in enumerate(res, 1):
                out["query_id"].append(qid)
                out["rank"].append(rank)
                out["doc_id"].append(r["doc_id"])
                out["score"].append(r["score"])
                out["path"].append(r["path"])
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], type=pa.int64()),
                "rank": pa.array(out["rank"], type=pa.int64()),
                "doc_id": pa.array(out["doc_id"], type=pa.int64()),
                "score": pa.array(out["score"], type=pa.float64()),
                "path": pa.array(out["path"], type=pa.string()),
            }
        )


def evaluate_queries(queries_ds, index_dir: str, *, concurrency: int = 4, batch_size: int = 64):
    return queries_ds.map_batches(
        QueryEvalStage,
        fn_constructor_kwargs={"index_dir": index_dir},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
