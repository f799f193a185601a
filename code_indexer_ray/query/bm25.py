"""BM25 scoring math — Tantivy-compatible constants and formula.

Tantivy 0.25 (the reference's pinned scorer, ``tantivy_index_manager.py:66``)
scores with Lucene-style BM25:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score    = Σ_t idf(t) * tfn(t, d)

with k1 = 1.2, b = 0.75, ``dl`` the 1-byte-quantized field length
(:mod:`code_indexer_ray.index.fieldnorm`) and ``avgdl`` the *exact*
total token count / N.  The formula below is written with the exact same
operation order as the oracle SQL so double results agree bitwise except for
last-ulp ln() differences (handled by rounding in cross-checks).
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | int, n_docs: int) -> np.ndarray | float:
    """ln(1 + (N - df + 0.5)/(df + 0.5))"""
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)) — vectorized."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def term_score(tf: np.ndarray, dl: np.ndarray, df: int, n_docs: int, avgdl: float) -> np.ndarray:
    return idf(df, n_docs) * tf_norm(tf, dl, avgdl)


def term_upper_bound(max_tf: float, min_dl: float, df: int, n_docs: int, avgdl: float) -> float:
    """Upper bound on a term's contribution (MaxScore / block-max pruning).

    ``tfn`` is increasing in tf and decreasing in dl, so (max_tf, min_dl) of a
    block (or whole list) bounds every posting in it.
    """
    return float(idf(df, n_docs) * tf_norm(np.array([max_tf]), np.array([min_dl]), avgdl)[0])


def sql_score_expr(tf: str, dl: str, df: str, n: str, avgdl: str) -> str:
    """DuckDB expression computing the identical formula (oracle twin)."""
    return (
        f"ln(1 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
        f"({tf} * (1.2 + 1.0) / ({tf} + 1.2 * (1.0 - 0.75 + 0.75 * {dl} / {avgdl})))"
    )


# ---------------------------------------------------------------------------
# Dirichlet-smoothed query likelihood (second Similarity, Zhai & Lafferty
# 2001; Lucene ships the same model as LMDirichletSimilarity).  We rank by
# the plain QL form  Σ_t ln((tf + μ·p(t|C)) / (dl + μ))  — Lucene's variant
# differs only by a document-independent additive constant per query term,
# so the ranking is identical.  ``dl`` is the same 1-byte-quantized field
# length BM25 uses; ``p(t|C) = cf_t / |C|`` comes from the per-term collection
# frequency stored in every segment.
# ---------------------------------------------------------------------------

MU = 2000.0


def lm_dirichlet_score(
    tf: np.ndarray, dl: np.ndarray, cf: int, total_tokens: int, mu: float = MU
) -> np.ndarray:
    """ln((tf + μ·(cf/|C|)) / (dl + μ)) — written in the exact op order of
    :func:`sql_lm_score_expr` so doubles agree bitwise up to last-ulp ln()."""
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return np.log((tf + mu * (float(cf) / float(total_tokens))) / (dl + mu))


def sql_lm_score_expr(tf: str, dl: str, cf: str, total_tokens: str, mu: str = "2000.0") -> str:
    """DuckDB expression computing the identical Dirichlet QL term score."""
    return f"ln(({tf} + {mu} * ({cf}::DOUBLE / {total_tokens}::DOUBLE)) / ({dl} + {mu}))"
