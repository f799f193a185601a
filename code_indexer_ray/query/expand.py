"""Term-dictionary expansion for fuzzy and regex queries.

The reference delegates these to Tantivy automata (Levenshtein DFA with
transposition cost 1, ``tantivy_index_manager.py:347-374``; regex DFA
``:488-505``).  Our analog scans each shard's term dictionary (SSTable-style
sorted terms are already in memory in the searcher) and expands the pattern
to an OR-set of concrete index terms before scoring — the same "expand then
union postings" plan a DFA walk produces.  At web scale this is a per-shard
vocabulary scan done once per query inside the searcher actor; the sorted
dictionary allows prefix pruning for anchored patterns.

Distance = optimal-string-alignment (OSA) Damerau-Levenshtein: substitutions,
insertions, deletions cost 1, adjacent transposition cost 1 — matching
``transposition_cost_one=True`` and DuckDB's ``damerau_levenshtein`` used by
the oracle SQL.
"""

from __future__ import annotations

import re

import numpy as np


def osa_distance(a: str, b: str, cutoff: int = 3) -> int:
    """OSA Damerau-Levenshtein distance with early-exit band cutoff."""
    la, lb = len(a), len(b)
    if abs(la - lb) > cutoff:
        return cutoff + 1
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev2 = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        row_min = i
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
            row_min = min(row_min, d)
        if row_min > cutoff:
            return cutoff + 1
        prev2, prev = prev, cur
    return prev[lb]


def expand_fuzzy(vocab: np.ndarray, word: str, distance: int) -> list[str]:
    """Terms within OSA distance ``distance`` of ``word`` (lowercased)."""
    w = word.lower()
    lw = len(w)
    out = []
    for t in vocab:
        if abs(len(t) - lw) > distance:
            continue
        if osa_distance(w, t, cutoff=distance) <= distance:
            out.append(t)
    return out


def expand_regex(vocab: np.ndarray, pattern: str) -> list[str]:
    """Terms fully matching ``pattern`` (anchored, like Tantivy's regex query)."""
    rx = re.compile(pattern)
    return [t for t in vocab if rx.fullmatch(t)]
