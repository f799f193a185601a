"""End-to-end: build the sharded index with Ray Data, query it, and match the
brute-force oracle rank- and score-identically (FIXTURES.md §3, SURVEY.md §5)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.query.engine import IndexSearcher

from .oracle import BruteForceIndex

SF = "/root/testdata/sf0.001"


def _corpus_rows():
    t = pq.read_table(f"{SF}/documents.parquet")
    rows = []
    for i in range(120):
        rows.append(
            {
                "doc_id": int(t["doc_id"][i].as_py()),
                "text": t["text"][i].as_py(),
                "lang": t["lang"][i].as_py(),
                "url": f"{t['source'][i].as_py()}/{t['doc_id'][i].as_py()}",
            }
        )
    # deterministic synthetic edge cases, ids continuing after the slice
    base = 120
    extra = [
        ("multi\nline doc\nwith spark merge\nand a needleunique token\nend", "en", "syn/nl"),
        ("Grüße unicode αβγ spark", "de", "syn/uni"),
        ("x" * 45 + " longtoken dropped spark spark spark", "en", "syn/long"),
        ("", "en", "syn/empty"),
        ("   \n\t  ", "fr", "syn/ws"),
        ("needlepair alpha " * 30, "en", "syn/tfhigh"),
        ("needlepair beta", "es", "syn/tflow"),
        ("CaSeD Spark MERGE", "en", "syn/case"),
    ]
    for j, (text, lang, url) in enumerate(extra):
        rows.append({"doc_id": base + j, "text": text, "lang": lang, "url": url})
    return rows


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    rows = _corpus_rows()
    tmp = tmp_path_factory.mktemp("idx")
    src = str(tmp / "corpus.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "index")
    manifest = build_index(
        src, out, store_cols=("lang", "url"), num_shards=4, num_buckets=4, target_docs_per_shard=32
    )
    oracle = BruteForceIndex(
        {r["doc_id"]: r["text"] for r in rows},
        {r["doc_id"]: r["lang"] for r in rows},
    )
    return rows, src, out, manifest, oracle


def test_manifest_stats(built):
    rows, _, _, manifest, oracle = built
    assert manifest.num_docs == len(rows)
    assert manifest.total_tokens == oracle.total_tokens
    assert manifest.avgdl == pytest.approx(oracle.avgdl)
    assert manifest.num_shards == 4 and manifest.num_buckets == 4
    assert len(manifest.partitions) >= 4


def test_segment_term_stats_match_oracle(built):
    _, _, out, manifest, oracle = built
    seg = pa.concat_tables(
        pq.read_table(os.path.join(out, p["path"]), columns=["term", "df", "cf"])
        for p in manifest.partitions
    )
    # df/cf are per-shard; global stats are the sum across shards (doc-partitioned index)
    df: dict[str, int] = {}
    cf: dict[str, int] = {}
    for t, d, c in zip(seg["term"].to_pylist(), seg["df"].to_pylist(), seg["cf"].to_pylist()):
        df[t] = df.get(t, 0) + d
        cf[t] = cf.get(t, 0) + c
    assert df == dict(oracle.df)
    want_cf = {}
    for tfs in oracle.tfs.values():
        for t, c in tfs.items():
            want_cf[t] = want_cf.get(t, 0) + c
    assert cf == want_cf


def _check(results, expected, scores=True):
    got = [(r["doc_id"], r["score"]) for r in results]
    assert [g[0] for g in got] == [e[0] for e in expected], (got, expected)
    if scores:
        for (gd, gs), (ed, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9), (gd, gs, es)


class TestExactQueries:
    QUERIES = ["spark", "merge", "spark merge", "the fast key", "needleunique",
               "needlepair", "nosuchtermanywhere", "spark nosuchtermanywhere", "SPARK"]

    def test_topk_rank_and_score_identical(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for q in self.QUERIES:
            for limit in (3, 10, 50):
                _check(s.search(q, limit=limit, snippet_lines=0), oracle.search_exact(q, limit))

    def test_limit_zero_unlimited(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        res = s.search("merge", limit=0)
        exp = oracle.search_exact("merge", 100_000)
        _check(res, exp)
        assert all(r["snippet"] == "" for r in res)  # limit=0 disables snippets

    def test_tf_saturation_ranking(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        res = s.search("needlepair", limit=2, snippet_lines=0)
        assert [r["doc_id"] for r in res] == [e[0] for e in oracle.search_exact("needlepair", 2)]


class TestMatchAny:
    """OR semantics (Tantivy should-clauses): union of the terms' docs,
    score = BM25 sum over the terms a doc contains."""

    def test_or_matches_brute_union(self, built):
        from code_indexer_ray.text.analysis import tokenize_query

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for q in ["spark merge", "needlepair merge", "the fast key"]:
            for limit in (3, 10, 50):
                got = s.search(q, match_any=True, limit=limit, snippet_lines=0)
                exp = oracle.search_groups([tokenize_query(q)], limit)
                _check(got, exp)

    def test_or_unmatched_word_drops(self, built):
        """A no-vocab word must not zero the query in OR mode (it does in AND)."""
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        assert s.search("spark nosuchtermanywhere", limit=10, snippet_lines=0) == []
        got = s.search("spark nosuchtermanywhere", match_any=True, limit=10, snippet_lines=0)
        exp = oracle.search_groups([["spark"]], 10)
        _check(got, exp)

    def test_or_superset_of_and(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        and_ids = {r["doc_id"] for r in s.search("spark merge", limit=0, snippet_lines=0)}
        or_ids = {r["doc_id"] for r in s.search("spark merge", match_any=True, limit=0, snippet_lines=0)}
        assert and_ids <= or_ids and len(or_ids) > len(and_ids)

    def test_or_fuzzy_union(self, built):
        """match_any + fuzzy: union of every word's expansion, one group."""
        from code_indexer_ray.query.expand import osa_distance

        rows, _, out, _, oracle = built
        s = IndexSearcher(out)
        g = sorted({t for w in ("mege", "nosuchtermxyz") for t in oracle.vocab
                    if osa_distance(w, t, 1) <= 1})
        got = s.search("mege nosuchtermxyz", match_any=True, edit_distance=1,
                       limit=10, snippet_lines=0)
        _check(got, oracle.search_groups([g], 10))

    def test_phrase_match_any_raises(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        with pytest.raises(ValueError):
            s.search("spark merge", phrase=True, match_any=True)


class TestMustNot:
    """exclude_terms (Lucene/Tantivy MustNot): hard pre-ranking filter, no
    score contribution from the excluded terms."""

    def test_matches_brute(self, built):
        from code_indexer_ray.text.analysis import tokenize_query

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for q, ex in [("spark", ["merge"]), ("the", ["spark", "merge"]),
                      ("spark merge", ["key"])]:
            for limit in (3, 10, 50):
                got = s.search(q, exclude_terms=ex, limit=limit, snippet_lines=0)
                exp = oracle.search_groups(
                    [[t] for t in tokenize_query(q)], limit, exclude=ex
                )
                _check(got, exp)

    def test_excluded_docs_absent_scores_unchanged(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        base = {r["doc_id"]: r["score"] for r in s.search("spark", limit=0, snippet_lines=0)}
        merge_ids = {r["doc_id"] for r in s.search("merge", limit=0, snippet_lines=0)}
        got = s.search("spark", exclude_terms=["merge"], limit=0, snippet_lines=0)
        assert {r["doc_id"] for r in got} == set(base) - merge_ids
        for r in got:  # scores identical to the unexcluded query's
            assert r["score"] == pytest.approx(base[r["doc_id"]], abs=1e-12)

    def test_unknown_exclude_term_is_noop(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        a = s.search("spark", limit=10, snippet_lines=0)
        b = s.search("spark", exclude_terms=["nosuchtermanywhere"], limit=10, snippet_lines=0)
        assert a == b

    def test_match_any_with_exclusion(self, built):
        from code_indexer_ray.text.analysis import tokenize_query

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        got = s.search("spark merge", match_any=True, exclude_terms=["key"],
                       limit=20, snippet_lines=0)
        exp = oracle.search_groups(
            [sorted(dict.fromkeys(tokenize_query("spark merge")))], 20, exclude=["key"]
        )
        _check(got, exp)

    def test_wide_union_with_exclusion_skips_maxscore(self, built):
        """Regex expansion (≥8 member group) + MustNot: the MaxScore fast
        path is bypassed and results still match brute force."""
        import re as _re

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        pat = ".*e.*"
        rx = _re.compile(pat)
        g = sorted({t for t in oracle.vocab if rx.fullmatch(t)})
        assert len(g) >= 8  # sanity: wide union
        got = s.search(pat, use_regex=True, exclude_terms=["spark"],
                       limit=10, snippet_lines=0)
        _check(got, oracle.search_groups([g], 10, exclude=["spark"]))

    def test_phrase_exclude_raises(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        with pytest.raises(ValueError):
            s.search("spark merge", phrase=True, exclude_terms=["key"])


class TestMoreLikeThis:
    """Lucene MLT analog: tf·idf term selection + OR search minus source."""

    def _brute_mlt(self, oracle, doc_id, max_terms=10, limit=10):
        import math

        tf = oracle.tfs[doc_id]
        scored = sorted(
            ((t, round(c * math.log(1 + (oracle.n_docs - oracle.df[t] + 0.5)
                                    / (oracle.df[t] + 0.5)), 9))
             for t, c in tf.items() if oracle.df.get(t, 0) > 0),
            key=lambda x: (-x[1], x[0]),
        )
        terms = sorted(dict.fromkeys(t for t, _ in scored[:max_terms]))
        hits = [h for h in oracle.search_groups([terms], 10**6) if h[0] != doc_id]
        return hits[:limit]

    def test_matches_brute(self, built):
        rows, _, out, _, oracle = built
        s = IndexSearcher(out)
        for doc_id in list(oracle.tokens)[:5]:
            got = s.more_like_this(doc_id, max_terms=10, limit=10)
            _check(got, self._brute_mlt(oracle, doc_id))

    def test_source_never_in_results(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for doc_id in list(oracle.tokens)[:5]:
            assert doc_id not in {r["doc_id"] for r in s.more_like_this(doc_id, limit=0)}

    def test_max_terms_one(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        doc_id = next(iter(oracle.tokens))
        got = s.more_like_this(doc_id, max_terms=1, limit=10)
        _check(got, self._brute_mlt(oracle, doc_id, max_terms=1))

    def test_unknown_doc_empty(self, built):
        _, _, out, _, _ = built
        assert IndexSearcher(out).more_like_this(10**9) == []


class TestPagination:
    """offset: per-shard fetch depth offset+limit, global skip at the driver."""

    def test_pages_tile_the_full_ranking(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        full = oracle.search_exact("the", 100)
        for page, size in [(0, 3), (1, 3), (2, 3), (1, 7)]:
            got = s.search("the", offset=page * size, limit=size, snippet_lines=0)
            _check(got, full[page * size:(page + 1) * size])

    def test_offset_past_end_empty(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        n = len(oracle.search_exact("spark", 10**6))
        assert s.search("spark", offset=n, limit=10, snippet_lines=0) == []

    def test_offset_with_postfilter_overfetch(self, built):
        """Pagination under a post-filter must still tile the filtered ranking."""
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        full = [
            (d, sc) for d, sc in oracle.search_exact("the", 10**6)
            if oracle.langs.get(d) != "en"
        ]
        a = s.search("the", exclude_languages=["en"], offset=0, limit=4, snippet_lines=0)
        b = s.search("the", exclude_languages=["en"], offset=4, limit=4, snippet_lines=0)
        _check(a + b, full[:8])

    def test_offset_limit0_unlimited_tail(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        full = oracle.search_exact("the", 10**6)
        got = s.search("the", offset=2, limit=0, snippet_lines=0)
        _check(got, full[2:])

    def test_negative_offset_raises(self, built):
        _, _, out, _, _ = built
        with pytest.raises(ValueError):
            IndexSearcher(out).search("spark", offset=-1)


class TestFacets:
    """Exact language facet counts over all matches (FacetCollector analog)."""

    def _brute(self, oracle, groups, exclude=None):
        from collections import Counter

        hits = oracle.search_groups(groups, 10**9, exclude=exclude)
        return dict(Counter(oracle.langs.get(d, "") for d, _ in hits))

    def test_counts_match_brute(self, built):
        from code_indexer_ray.text.analysis import tokenize_query

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for q in ["spark", "spark merge", "the"]:
            got = s.facets(q)
            assert got == self._brute(oracle, [[t] for t in tokenize_query(q)])

    def test_facets_with_exclusion_and_or(self, built):
        from code_indexer_ray.text.analysis import tokenize_query

        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        got = s.facets("spark merge", match_any=True, exclude_terms=["key"])
        toks = sorted(dict.fromkeys(tokenize_query("spark merge")))
        assert got == self._brute(oracle, [toks], exclude=["key"])

    def test_no_match_empty(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        assert s.facets("nosuchtermanywhere") == {}

    def test_actor_mode_matches_local(self, built):
        _, _, out, _, _ = built
        local = IndexSearcher(out).facets("spark")
        remote = IndexSearcher(out, remote=True).facets("spark")
        assert local == remote


class TestFuzzyRegex:
    def test_fuzzy_expansion(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for q, d in (("sparc", 1), ("mege", 1), ("sprk", 2), ("spark mege", 1), ("zzzz", 1)):
            _check(s.search(q, edit_distance=d, snippet_lines=0), oracle.search_fuzzy(q, d))

    def test_fuzzy_transposition_cost_one(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        _check(s.search("sapkr", edit_distance=2, snippet_lines=0), oracle.search_fuzzy("sapkr", 2))

    def test_regex(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for pat in ("s.*k", "needle.*", "m[ae]rge", "zz+"):
            _check(s.search(pat, use_regex=True, snippet_lines=0), oracle.search_regex(pat))

    def test_wide_union_maxscore_path(self, built):
        """Expansions ≥ 8 terms route through MaxScore pruning — results must
        stay identical to the brute-force union."""
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        for pat in (".*e.*", "[a-z]+", "[a-z]*a[a-z]*"):
            for limit in (3, 10, 100):
                assert len(s.matcher().regex(pat)) >= 8  # sanity: wide union
                _check(
                    s.search(pat, use_regex=True, limit=limit, snippet_lines=0),
                    oracle.search_regex(pat, limit),
                )

    def test_regex_fuzzy_incompatible(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        with pytest.raises(ValueError):
            s.search("x", use_regex=True, edit_distance=1)
        with pytest.raises(ValueError):
            s.search("x", edit_distance=7)


class TestFilters:
    def test_include_language_prelimit(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        res = s.search("spark", languages=["en"], limit=5, snippet_lines=0)
        exp = oracle.search_exact("spark", 5, langs_in=["en"])
        _check(res, exp)
        assert all(r["language"] == "en" for r in res)

    def test_exclude_language_overfetch_semantics(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out)
        limit = 5
        res = s.search("spark", exclude_languages=["en"], limit=limit, snippet_lines=0)
        # reference semantics: over-fetch 3*limit of the UNfiltered ranking,
        # then drop excluded, then truncate
        over = oracle.search_exact("spark", limit * 3)
        exp = [(d, sc) for d, sc in over if oracle.langs.get(d) != "en"][:limit]
        _check(res, exp)

    def test_path_filters(self, built):
        rows, _, out, _, oracle = built
        s = IndexSearcher(out)
        limit = 4
        urls = {r["doc_id"]: r["url"] for r in rows}
        res = s.search("merge", path_filters=["src1/*"], limit=limit, snippet_lines=0)
        over = oracle.search_exact("merge", limit * 3)
        import fnmatch

        exp = [(d, sc) for d, sc in over if fnmatch.fnmatch(urls[d], "src1/*")][:limit]
        _check(res, exp)

    def test_exclude_paths_precede_includes(self, built):
        rows, _, out, _, oracle = built
        s = IndexSearcher(out)
        res = s.search(
            "merge", path_filters=["src*/*"], exclude_paths=["src1/*"], limit=6, snippet_lines=0
        )
        urls = {r["doc_id"]: r["url"] for r in rows}
        over = oracle.search_exact("merge", 18)
        exp = []
        for d, sc in over:
            u = urls[d]
            if u.startswith("src1/"):
                continue
            if not (u.startswith("src") and "/" in u):
                continue
            exp.append((d, sc))
        _check(res, exp[:6])


class TestSnippets:
    def test_line_column_and_context(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        res = [r for r in s.search("needleunique", limit=5, snippet_lines=1)]
        assert len(res) == 1
        r = res[0]
        assert r["path"] == "syn/nl"
        assert r["line"] == 4 and r["column"] == 7  # "and a needleunique token"
        assert r["snippet"] == "with spark merge\nand a needleunique token\nend"
        assert r["snippet_start_line"] == 3

    def test_case_sensitive_affects_location_only(self, built):
        _, _, out, _, _ = built
        s = IndexSearcher(out)
        ci = s.search("cased", limit=5, snippet_lines=0)
        cs = s.search("cased", case_sensitive=True, limit=5, snippet_lines=0)
        assert [r["doc_id"] for r in ci] == [r["doc_id"] for r in cs]  # same candidates
        assert ci[0]["column"] == 1
        # case-sensitive literal not found → fallback line 1 col 1 with empty snippet
        assert cs[0]["line"] == 1


class TestRemoteActors:
    def test_actor_mode_matches_local(self, built):
        _, _, out, _, oracle = built
        s = IndexSearcher(out, remote=True)
        _check(s.search("spark merge", limit=10, snippet_lines=0), oracle.search_exact("spark merge", 10))

    def test_actor_mode_shard_local_expansion_matches_local(self, built):
        """Fuzzy/regex in actor mode (shard-local dictionary walks, union of
        matches) must return the same results as the local union matcher."""
        _, _, out, _, _ = built
        local = IndexSearcher(out)
        remote = IndexSearcher(out, remote=True)
        for kwargs in (
            {"edit_distance": 1},
            {"use_regex": True},
        ):
            q = "spark" if "edit_distance" in kwargs else "sp.rk"
            a = [(r["doc_id"], round(r["score"], 9)) for r in local.search(q, snippet_lines=0, **kwargs)]
            b = [(r["doc_id"], round(r["score"], 9)) for r in remote.search(q, snippet_lines=0, **kwargs)]
            assert a == b, (q, kwargs)


class TestResume:
    def test_kill_resume_identical(self, built, tmp_path):
        rows, src, out, manifest, _ = built
        import json
        import shutil

        out2 = str(tmp_path / "index2")
        # simulate a killed run: copy a partial build (drop some partitions + manifest)
        shutil.copytree(out, out2)
        os.remove(os.path.join(out2, "manifest.json"))
        dropped = manifest.partitions[::3]
        for p in dropped:
            os.remove(os.path.join(out2, p["path"]))
            sb = f"s{p['shard']:05d}_b{p['bucket']:03d}.json"
            os.remove(os.path.join(out2, "_manifests", sb))
        m2 = build_index(
            src, out2, store_cols=("lang", "url"), num_shards=4, num_buckets=4,
            target_docs_per_shard=32,
        )
        assert {(p["shard"], p["bucket"]) for p in m2.partitions} == {
            (p["shard"], p["bucket"]) for p in manifest.partitions
        }
        for p in manifest.partitions:
            a = pq.read_table(os.path.join(out, p["path"]))
            b = pq.read_table(os.path.join(out2, p["path"]))
            assert a.equals(b), f"segment {p['path']} differs after resume"

    def test_fast_path_noop_when_complete(self, built):
        _, src, out, manifest, _ = built
        m2 = build_index(
            src, out, store_cols=("lang", "url"), num_shards=4, num_buckets=4,
            target_docs_per_shard=32,
        )
        assert m2.metrics["fingerprint"] == manifest.metrics["fingerprint"]


class TestHeadTermSkew:
    def test_hot_term_spreads_across_every_partitions_shard(self, ray_session, tmp_path):
        """A term occurring in EVERY document (worst-case Zipf head) must not
        concentrate in one reduce group: doc-range sharding is the salt, so
        the hot term's postings split across all shards, and each partition's
        posting count stays near the uniform bound."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        n = 2000
        rows = {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"hotterm filler{i % 97} mid{i % 13} tail{i}" for i in range(n)],
            "lang": ["en"] * n,
            "url": [f"u{i}" for i in range(n)],
        }
        src = str(tmp_path / "docs.parquet")
        pq.write_table(pa.table(rows), src)
        out = str(tmp_path / "idx")
        m = build_index(src, out, store_cols=("lang", "url"), num_shards=8,
                        num_buckets=4, resume=False)
        # hot term present in every shard (salted by doc range)
        shards_with_hot = set()
        s = IndexSearcher(out)
        for shard in range(8):
            se = s._searcher(shard)
            if se.posting("hotterm") is not None:
                shards_with_hot.add(shard)
        assert shards_with_hot == set(range(8))
        # no partition holds a disproportionate share of all postings
        counts = np.array([p["n_postings"] for p in m.partitions])
        assert counts.max() <= 3 * counts.mean()
        # and the hot term still scores/intersects correctly end-to-end
        hits = s.search("hotterm", limit=0, snippet_lines=0)
        assert len(hits) == n
        hits2 = s.search("hotterm tail42", snippet_lines=0)
        assert [h["doc_id"] for h in hits2] == [42]
