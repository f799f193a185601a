"""Brute-force single-threaded BM25 oracle (FIXTURES.md §3).

Independent scorer: Python Counter over the query-side tokenizer, explicit
loops, no codec/engine code — the distributed engine must match it rank- and
score-identically.  Shares only the *specs*: tokenizer definition,
fieldnorm quantization table, BM25 constants.
"""

from __future__ import annotations

import math
from collections import Counter

from code_indexer_ray.index.fieldnorm import quantize_length
from code_indexer_ray.query.expand import osa_distance
from code_indexer_ray.text.analysis import tokenize_query

K1, B = 1.2, 0.75


class BruteForceIndex:
    def __init__(self, docs: dict[int, str], langs: dict[int, str] | None = None):
        self.tokens = {d: tokenize_query(t) for d, t in docs.items()}
        self.tfs = {d: Counter(tks) for d, tks in self.tokens.items()}
        self.dl = {d: int(quantize_length([len(tks)])[0]) for d, tks in self.tokens.items()}
        self.n_docs = len(docs)
        self.total_tokens = sum(len(t) for t in self.tokens.values())
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 0.0
        self.df = Counter()
        for tks in self.tfs.values():
            for t in tks:
                self.df[t] += 1
        self.langs = langs or {}
        self.vocab = sorted(self.df)

    def idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def term_score(self, term: str, doc: int) -> float:
        tf = self.tfs[doc].get(term, 0)
        if tf == 0:
            return 0.0
        dl = self.dl[doc]
        return self.idf(term) * (tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl)))

    def search_groups(self, groups: list[list[str]], limit: int, langs_in: list[str] | None = None,
                      exclude: list[str] | None = None):
        """AND of OR-groups, score = Σ over groups Σ matched member terms;
        ``exclude`` = MustNot terms (drop the doc, contribute no score)."""
        hits = []
        for d in self.tokens:
            if langs_in is not None and self.langs.get(d) not in langs_in:
                continue
            if exclude and any(self.tfs[d].get(t, 0) > 0 for t in exclude):
                continue
            ok = all(any(self.tfs[d].get(t, 0) > 0 for t in g) for g in groups)
            if not ok or not groups:
                continue
            score = sum(self.term_score(t, d) for g in groups for t in g)
            hits.append((d, score))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:limit]

    def search_exact(self, query: str, limit: int = 10, langs_in=None):
        toks = tokenize_query(query)
        if not toks:
            return []
        return self.search_groups([[t] for t in toks], limit, langs_in)

    def search_fuzzy(self, query: str, distance: int, limit: int = 10):
        groups = []
        for w in query.split():
            g = [t for t in self.vocab if osa_distance(w.lower(), t, distance) <= distance]
            if not g:
                return []
            groups.append(g)
        return self.search_groups(groups, limit)

    def search_regex(self, pattern: str, limit: int = 10):
        import re

        rx = re.compile(pattern)
        g = [t for t in self.vocab if rx.fullmatch(t)]
        if not g:
            return []
        return self.search_groups([g], limit)
