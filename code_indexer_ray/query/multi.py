"""Multi-index (multi-repo) search — behavioral port of the reference's
server-side fan-out (``server/multi/multi_search_service.py:115-180`` +
``multi_result_aggregator.py:34-67``):

- all indexes are searched in parallel (here: Ray tasks / shard actors,
  replacing the ThreadPoolExecutor),
- per-index failures are captured as errors, not raised,
- aggregation is PER-REPOSITORY: ``min_score`` filter BEFORE the per-repo
  limit, each hit tagged with its ``repository``, results stay grouped by
  repository (the reference never merges ranks across repos).
"""

from __future__ import annotations

from .engine import IndexSearcher


class MultiIndexSearcher:
    def __init__(self, indexes: dict[str, str], **searcher_kwargs):
        """``indexes``: repo_id → index_dir."""
        self._searchers = {
            rid: IndexSearcher(path, **searcher_kwargs) for rid, path in indexes.items()
        }

    def search(
        self,
        query_text: str,
        *,
        limit: int = 10,
        min_score: float | None = None,
        **kwargs,
    ) -> tuple[dict[str, list[dict]], dict[str, str]]:
        """Returns (results_by_repo, errors_by_repo)."""
        repo_results: dict[str, list[dict]] = {}
        errors: dict[str, str] = {}
        for rid, s in self._searchers.items():
            try:
                repo_results[rid] = s.search(query_text, limit=limit, **kwargs)
            except ValueError:
                raise  # invalid query params are caller errors, like the reference's re-raise
            except Exception as e:  # pragma: no cover - parity with reference's catch-all
                errors[rid] = f"Search failed: {e}"

        aggregated: dict[str, list[dict]] = {}
        for rid, results in repo_results.items():
            if min_score is not None:
                results = [r for r in results if r.get("score", 0.0) >= min_score]
            limited = results[:limit]
            for r in limited:
                r["repository"] = rid
            aggregated[rid] = limited
        return aggregated, errors
