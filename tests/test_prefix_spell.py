"""Prefix expansion + plain-Levenshtein spell suggestion: kernel tests vs
brute-force Python references, plus engine-level AND/OR prefix searches on a
small built index."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.query.expand import VocabMatcher, osa_distance

VOCAB = sorted(
    [
        "merge", "merged", "merges", "merging", "mergers", "mere", "met",
        "window", "windows", "wind", "windy", "win", "table", "tables",
        "spark", "sparks", "span", "alpha", "omega", "zulu", "s",
    ]
)


def _plain_lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[lb]


class TestPrefixExpansion:
    def test_sorted_bisect_equals_startswith(self):
        m = VocabMatcher(VOCAB)
        assert m._sorted
        for p in ["m", "me", "merg", "merge", "win", "windo", "s", "z", "q", ""]:
            want = sorted(t for t in VOCAB if t.startswith(p)) if p else []
            assert sorted(m.prefix(p)) == want, p

    def test_unsorted_fallback(self):
        shuffled = list(VOCAB)[::-1]
        m = VocabMatcher(shuffled)
        assert not m._sorted
        assert sorted(m.prefix("wind")) == sorted(t for t in VOCAB if t.startswith("wind"))

    def test_case_folded(self):
        m = VocabMatcher(VOCAB)
        assert m.prefix("MERG") == m.prefix("merg")

    def test_exact_term_is_its_own_prefix(self):
        m = VocabMatcher(VOCAB)
        assert "spark" in m.prefix("spark")


class TestPlainLevenshtein:
    def test_matches_python_reference(self):
        m = VocabMatcher(VOCAB)
        for w in ["mege", "windw", "tabel", "sprk", "alpha", "zzzz", "w"]:
            got = dict(m.within_distance_plain(w, 2))
            want = {t: _plain_lev(t, w) for t in VOCAB if _plain_lev(t, w) <= 2}
            assert got == want, w

    def test_no_transposition(self):
        # OSA gives 'tabel'→'table' distance 1; plain Levenshtein gives 2
        m = VocabMatcher(["table"])
        assert osa_distance("tabel", "table") == 1
        assert dict(m.within_distance_plain("tabel", 2)) == {"table": 2}
        assert dict(m.within_distance_plain("tabel", 1)) == {}


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    docs = [
        "spark merge stream",
        "spark spark window",
        "merge table scan",
        "window stream stream sort",
        "solo unrelated words here",
    ]
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "url": f"u/{i}"}
        for i, t in enumerate(docs)
    ]
    tmp = tmp_path_factory.mktemp("pidx")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=2, num_buckets=2)
    return docs, IndexSearcher(out, lang_col="lang", url_col="url")


class TestEnginePrefix:
    def test_prefix_and_semantics(self, small_index):
        docs, s = small_index
        # 's*' AND 'm*': docs containing (spark|stream|scan|sort|solo) AND (merge)
        res = s.search("s m", prefix=True, limit=10, snippet_lines=0)
        got = sorted(r["doc_id"] for r in res)
        want = [
            i for i, t in enumerate(docs)
            if any(w.startswith("s") for w in t.split()) and any(w.startswith("m") for w in t.split())
        ]
        assert got == want

    def test_prefix_or_semantics(self, small_index):
        docs, s = small_index
        res = s.search("win mer", prefix=True, match_any=True, limit=10, snippet_lines=0)
        got = sorted(r["doc_id"] for r in res)
        want = [
            i for i, t in enumerate(docs)
            if any(w.startswith(("win", "mer")) for w in t.split())
        ]
        assert got == want

    def test_unmatched_prefix_zeroes_and(self, small_index):
        _, s = small_index
        assert s.search("s qqq", prefix=True, limit=10, snippet_lines=0) == []

    def test_prefix_combination_raises(self, small_index):
        _, s = small_index
        with pytest.raises(ValueError):
            s.search("s", prefix=True, use_regex=True)
        with pytest.raises(ValueError):
            s.search("s", prefix=True, edit_distance=1)

    def test_suggest_tiebreaks(self, small_index):
        docs, s = small_index
        # 'streem' → 'stream' (distance 1)
        r = s.suggest("streem", max_distance=2)
        assert r["term"] == "stream" and r["distance"] == 1
        # df tiebreak: both 'spark' (df 2) and 'scan' … craft a word equidistant?
        assert s.suggest("zzzzzz") is None

    def test_suggest_df_is_corpus_df(self, small_index):
        docs, s = small_index
        r = s.suggest("sprk", max_distance=2)
        assert r["term"] == "spark"
        assert r["df"] == sum("spark" in t.split() for t in docs)


class TestActorModeIdentity:
    def test_remote_prefix_and_suggest_match_local(self, small_index, tmp_path_factory):
        from code_indexer_ray.query.engine import IndexSearcher

        _, s = small_index
        remote = IndexSearcher(s.index_dir, lang_col="lang", url_col="url", remote=True)
        assert remote.expand_terms("prefix", "s") == s.expand_terms("prefix", "s")
        assert remote.suggest("streem", max_distance=2) == s.suggest("streem", max_distance=2)
        a = remote.search("s m", prefix=True, limit=10, snippet_lines=0)
        b = s.search("s m", prefix=True, limit=10, snippet_lines=0)
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b
        ]


class TestWildcardTranslation:
    def test_translation(self):
        from code_indexer_ray.query.globmatch import wildcard_to_regex

        assert wildcard_to_regex("w?ndow*") == "w.ndow.*"
        assert wildcard_to_regex("a*b") == "a.*b"
        assert wildcard_to_regex("plain") == "plain"
        # regex metacharacters in the literal part are escaped
        assert wildcard_to_regex("a.b?") == r"a\.b."

    def test_expansion_matches_fnmatch(self):
        import fnmatch

        from code_indexer_ray.query.expand import VocabMatcher
        from code_indexer_ray.query.globmatch import wildcard_to_regex

        vocab = sorted(["window", "windows", "widow", "wind", "won", "w.ndow"])
        m = VocabMatcher(vocab)
        for pat in ["w?ndow*", "w*", "*dow", "w.ndow", "?on"]:
            got = sorted(m.regex(wildcard_to_regex(pat)))
            want = sorted(t for t in vocab if fnmatch.fnmatchcase(t, pat))
            assert got == want, pat
