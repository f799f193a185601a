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

import numpy as np

from ..text.analysis import tokenize_query
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

    def search_global(self, query_text: str, *, limit: int = 10) -> list[dict]:
        """Federated AND search with MERGED corpus statistics (Elasticsearch
        cross-cluster search with global term statistics / Lucene distributed
        IDF): N = ΣNᵢ, avgdl = Σtokensᵢ/ΣNᵢ, df(t) = Σdfᵢ(t) — one tiny df
        fan-out first, then each index's shards score with the merged stats
        and the driver rank-merges ACROSS repositories.  Over an exhaustive
        partition of one corpus this is score-identical to searching a
        monolithic index of the union (the statistical dual of
        :meth:`search`'s repo-local mode, which never merges stats)."""
        searchers = list(self._searchers.values())
        terms = sorted(dict.fromkeys(tokenize_query(query_text)))
        if not terms:
            return []
        n_docs = sum(s.manifest.num_docs for s in searchers)
        total_tokens = sum(s.manifest.total_tokens for s in searchers)
        avgdl = total_tokens / n_docs if n_docs else 0.0
        global_df = {t: 0 for t in terms}
        for s in searchers:
            for t, df in s._global_df(terms).items():
                global_df[t] += df
        if any(global_df[t] == 0 for t in terms):
            return []  # AND semantics over the union corpus
        from .engine import UNLIMITED_LIMIT

        groups = [[t] for t in terms]
        m = limit if limit > 0 else UNLIMITED_LIMIT  # limit=0 → unlimited, engine-wide
        hits: list[tuple[int, float]] = []
        for s in searchers:
            per_shard = s._fanout(
                "search_groups", groups, n_docs, avgdl, global_df, m,
                None, None, None,  # no stored fields shipped
            )
            hits.extend((h[0], h[1]) for sh in per_shard for h in sh)
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        sel = np.lexsort((ids, -scores))[:m]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]
