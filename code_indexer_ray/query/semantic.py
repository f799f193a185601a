"""Semantic + hybrid SERVING tier — the reference's ``search_mode``
selector (QUERY_PARAMETERS.md "Search Mode Selection": ``semantic`` is the
default mode, ``fts`` the lexical engine, ``hybrid`` blends both;
``services/generic_query_service.py`` routes a query to the semantic
manager, the FTS manager, or both).

This engine's semantic leg is the persisted IVF vector store
(:mod:`..ann.store`) over deterministic feature-hash embeddings
(:mod:`..text.embed`): a query is embedded driver-side (one row through the
same embedder the corpus used), the store probes ``nprobe`` cells with
in-process pruned reads (:meth:`~..ann.store.VectorStoreSearcher.topk_local`
— the daemon shape, no per-query Ray pipeline), and stored fields hydrate
via the FTS searcher's metadata fan-out + docstore point reads
(:meth:`~.engine.IndexSearcher.mget`).

Hybrid is reciprocal rank fusion — the same convention as the cataloged
``fts_hybrid_rrf`` pipeline (Cormack et al. 2009, k=60): each leg ranks to
a fixed depth, fused score = Σ 1/(60 + rank), ties broken by doc_id.

Scale shape: the embedding is one tiny matmul; the store read is
``nprobe / n_centroids`` of the corpus and file-cached; metadata hydration
is a per-shard fan-out over only the hit ids.  Nothing corpus-sized touches
the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .globmatch import matches_pattern

RRF_K = 60  # shared fusion constant (driver_api.RRF_K)
HYBRID_DEPTH = 20  # per-leg rank depth floor (driver_api.RRF_DEPTH)


class SemanticTier:
    """Holds the vector store + the query embedder for a serving daemon.

    ``store_dir`` is a :func:`..ann.store.build_vector_store` output whose
    ``id_col`` values are the FTS index's doc addresses (the build contract
    for a semantic-enabled server: embed the same docs you indexed).
    """

    def __init__(self, store_dir: str):
        from ..ann.store import VectorStoreSearcher
        from ..text.embed import TextEmbedStage

        self.store = VectorStoreSearcher(store_dir)
        self.dim = int(self.store.manifest["dim"])
        self._embedder = TextEmbedStage(dim=self.dim, output="list")

    def embed_query(self, q: str) -> np.ndarray:
        t = self._embedder(
            pa.table({"doc_id": pa.array([-1], pa.int64()), "text": [q]})
        )
        if float(t["norm"][0].as_py()) <= 0:
            raise ValueError("query has no embeddable tokens for semantic search")
        return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)

    def topk(
        self,
        q: str,
        k: int,
        *,
        nprobe: int | None = None,
        accuracy: str | None = None,
    ) -> list[tuple[int, float]]:
        """[(doc_id, cosine)] best-first.  query_id −1 keeps the store's
        self-exclusion rule inert (doc addresses are non-negative)."""
        v = self.embed_query(q)
        out = self.store.topk_local(
            np.stack([v]), np.array([-1]), k, nprobe=nprobe, accuracy=accuracy
        )
        return list(
            zip(
                out["vec_id"].to_numpy(zero_copy_only=False).tolist(),
                out["cos"].to_numpy(zero_copy_only=False).tolist(),
            )
        )


def metadata_keep(
    lang: str | None,
    url: str | None,
    *,
    language: str | None = None,
    exclude_language: str | None = None,
    path_filter: str | None = None,
    exclude_path: str | None = None,
    file_extensions: list[str] | None = None,
) -> bool:
    """The REST filter surface applied to a (lang, url) metadata pair —
    the semantic leg's post-filter (the FTS leg filters inside the engine).
    Exactly the engine's post-filter precedence loop semantics
    (engine.py ``_search_uncached``: case-sensitive language equality,
    :mod:`.globmatch` patterns, raw ``endswith`` extensions) — the hybrid
    legs must agree on what a filter matches."""
    if exclude_language is not None and lang == exclude_language:
        return False
    if language is not None and lang != language:
        return False
    if exclude_path is not None and url is not None and matches_pattern(url, exclude_path):
        return False
    if path_filter is not None and url is not None and not matches_pattern(url, path_filter):
        return False
    if file_extensions and (
        url is None or not any(url.endswith(e) for e in file_extensions)
    ):
        return False
    return True


def head_snippet(text: str, snippet_lines: int) -> str:
    """Semantic hits have no lexical match position; the reference returns
    the chunk's content — here the doc head, bounded by snippet_lines."""
    if snippet_lines <= 0 or not text:
        return ""
    return "\n".join(text.split("\n")[:snippet_lines])


def semantic_hits(
    searcher,
    tier: SemanticTier,
    q: str,
    *,
    limit: int,
    snippet_lines: int = 0,
    nprobe: int | None = None,
    accuracy: str | None = None,
    min_score: float | None = None,
    **filters,
) -> list[dict]:
    """search_mode=semantic: store top-k → metadata hydration → REST
    filters with the engine's ×3 over-fetch convention → min_score."""
    fetch = limit
    if min_score is not None or any(v for v in filters.values()):
        fetch = limit * 3
    ranked = tier.topk(q, fetch, nprobe=nprobe, accuracy=accuracy)
    if not ranked:
        return []
    docs = {d["doc_id"]: d for d in searcher.mget([i for i, _ in ranked])}
    hits = []
    for doc_id, cos in ranked:
        d = docs.get(doc_id)
        if d is None:
            continue
        if not metadata_keep(d.get("lang"), d.get("url"), **filters):
            continue
        if min_score is not None and cos < min_score:
            continue
        hits.append(
            {
                "path": d.get("url"),
                "doc_id": doc_id,
                "line": 1,
                "column": 1,
                "match_text": "",
                "snippet": head_snippet(d.get("text", ""), snippet_lines),
                "snippet_start_line": 1,
                "language": d.get("lang") or "unknown",
                "score": cos,
            }
        )
        if len(hits) >= limit:
            break
    return hits


def hybrid_hits(
    searcher,
    tier: SemanticTier,
    q: str,
    *,
    limit: int,
    snippet_lines: int = 0,
    nprobe: int | None = None,
    accuracy: str | None = None,
    min_score: float | None = None,
    lexical_kw: dict | None = None,
    **filters,
) -> list[dict]:
    """search_mode=hybrid: RRF of the lexical grammar leg and the vector
    leg, both to depth max(HYBRID_DEPTH, 2·limit).  The lexical leg filters
    inside the engine (``lexical_kw`` carries the engine-native filter
    kwargs); the vector leg applies the identical REST filters on its
    hydrated metadata BEFORE ranks are assigned, so an excluded doc never
    consumes a rank.  Fused score = Σ 1/(60+rank); min_score post-filters
    the FUSED score (documented: RRF scores live in (0, 2/61])."""
    from .parser import search_query_string

    depth = max(HYBRID_DEPTH, 2 * limit)
    lex = search_query_string(
        searcher, q, limit=depth, snippet_lines=snippet_lines, **(lexical_kw or {})
    )
    lex_rank = {h["doc_id"]: i for i, h in enumerate(lex, 1)}
    lex_by_id = {h["doc_id"]: h for h in lex}

    ranked = tier.topk(q, depth * 2, nprobe=nprobe, accuracy=accuracy)
    vec_meta = {d["doc_id"]: d for d in searcher.mget([i for i, _ in ranked])} if ranked else {}
    vec_rank: dict[int, int] = {}
    for doc_id, _cos in ranked:
        d = vec_meta.get(doc_id)
        if d is None or not metadata_keep(d.get("lang"), d.get("url"), **filters):
            continue
        vec_rank[doc_id] = len(vec_rank) + 1
        if len(vec_rank) >= depth:
            break

    fused = {}
    for doc in set(lex_rank) | set(vec_rank):
        rl, rv = lex_rank.get(doc), vec_rank.get(doc)
        fused[doc] = (1.0 / (RRF_K + rl) if rl else 0.0) + (
            1.0 / (RRF_K + rv) if rv else 0.0
        )
    order = sorted(fused.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    hits = []
    for doc_id, score in order:
        if min_score is not None and score < min_score:
            continue
        base = lex_by_id.get(doc_id)
        if base is not None:
            h = dict(base)
        else:
            d = vec_meta[doc_id]
            h = {
                "path": d.get("url"),
                "doc_id": doc_id,
                "line": 1,
                "column": 1,
                "match_text": "",
                "snippet": head_snippet(d.get("text", ""), snippet_lines),
                "snippet_start_line": 1,
                "language": d.get("lang") or "unknown",
            }
        h["score"] = score
        hits.append(h)
        if len(hits) >= limit:
            break
    return hits
