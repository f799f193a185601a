"""Fifth-session query-surface features: search_after cursor pagination,
order-by-fast-field ranking, DisMax scoring, explain breakdowns, and the
domain terms aggregation — each vs first-principles recomputation, plus
local/actor fan-out parity."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import BruteForceIndex


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    rng = np.random.default_rng(7)
    vocab = ["spark", "merge", "window", "batch", "row", "scan", "agg", "key"]
    docs = []
    for i in range(120):
        n = int(rng.integers(3, 30))
        docs.append(" ".join(vocab[j] for j in rng.integers(0, len(vocab), n)))
    rows = [
        {"doc_id": i, "text": t, "lang": "en" if i % 3 else "de", "url": f"site{i % 5}/p/{i}"}
        for i, t in enumerate(docs)
    ]
    tmp = tmp_path_factory.mktemp("qf2")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2)
    oracle = BruteForceIndex(
        {r["doc_id"]: r["text"] for r in rows}, {r["doc_id"]: r["lang"] for r in rows}
    )
    return rows, IndexSearcher(out, lang_col="lang", url_col="url"), oracle


def _key(r):
    return (-round(r["score"], 9), r["doc_id"])


class TestSearchAfter:
    def test_cursor_chain_equals_limit0_ranking(self, built):
        """Walking pages by cursor reproduces the full pinned ranking."""
        _, s, _ = built
        full = s.search("spark", limit=0, snippet_lines=0)
        full.sort(key=_key)
        pages, cursor = [], None
        while True:
            page = s.search("spark", limit=7, snippet_lines=0, after=cursor)
            if not page:
                break
            pages.extend(page)
            cursor = (page[-1]["score"], page[-1]["doc_id"])
        assert [r["doc_id"] for r in pages] == [r["doc_id"] for r in full]

    def test_matches_offset_paging(self, built):
        _, s, _ = built
        page1 = s.search("spark merge", limit=5, snippet_lines=0)
        cur = (page1[-1]["score"], page1[-1]["doc_id"])
        by_cursor = s.search("spark merge", limit=5, snippet_lines=0, after=cur)
        by_offset = s.search("spark merge", limit=5, offset=5, snippet_lines=0)
        assert [r["doc_id"] for r in by_cursor] == [r["doc_id"] for r in by_offset]

    def test_rejects_offset_and_phrase_combos(self, built):
        _, s, _ = built
        with pytest.raises(ValueError):
            s.search("spark", after=(1.0, 3), offset=2, limit=5)

    def test_tie_handling_is_strict(self, built):
        """A cursor on a tied score returns only larger doc_ids at that score."""
        _, s, _ = built
        full = s.search("spark", limit=0, snippet_lines=0)
        full.sort(key=_key)
        mid = len(full) // 2
        cur = (full[mid]["score"], full[mid]["doc_id"])
        rest = s.search("spark", limit=0, snippet_lines=0, after=cur)
        rest.sort(key=_key)
        assert [r["doc_id"] for r in rest] == [r["doc_id"] for r in full[mid + 1 :]]


class TestSearchAfterTieHeavy:
    def test_all_tied_scores_page_by_doc_id(self, ray_session, tmp_path_factory):
        """30 identical docs → 30 identical scores: the cursor must page
        purely on the doc_id tiebreak without skipping or repeating."""
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rows = [
            {"doc_id": i, "text": "spark merge window", "lang": "en", "url": f"u/{i}"}
            for i in range(30)
        ]
        tmp = tmp_path_factory.mktemp("ties")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp / "idx")
        build_index(src, out, store_cols=("lang", "url"), num_shards=3, num_buckets=2)
        s = IndexSearcher(out, lang_col="lang", url_col="url")
        seen, cursor = [], None
        while True:
            page = s.search("spark", limit=4, snippet_lines=0, after=cursor)
            if not page:
                break
            seen.extend(r["doc_id"] for r in page)
            cursor = (page[-1]["score"], page[-1]["doc_id"])
        assert seen == list(range(30))


class TestOrderByField:
    def test_matches_brute_dl_order(self, built):
        rows, s, _ = built
        from code_indexer_ray.index.fieldnorm import quantize_length
        from code_indexer_ray.text.analysis import tokenize_query

        got = s.search_by_field("spark", limit=10)
        want = []
        for r in rows:
            toks = tokenize_query(r["text"])
            if "spark" in toks:
                want.append((r["doc_id"], int(quantize_length([len(toks)])[0])))
        want.sort(key=lambda x: (-x[1], x[0]))
        assert [(g["doc_id"], g["dl"]) for g in got] == want[:10]

    def test_and_query_norms_covered(self, built):
        """Multi-term AND: every hit still gets a dl (norms come from group 0)."""
        _, s, _ = built
        got = s.search_by_field("spark merge window", limit=0)
        and_ids = {r["doc_id"] for r in s.search("spark merge window", limit=0, snippet_lines=0)}
        assert {g["doc_id"] for g in got} == and_ids
        assert all(g["dl"] > 0 for g in got)


class TestDisMax:
    def test_tie_zero_is_pure_max(self, built):
        _, s, o = built
        res = s.search_dismax("spark merge", tie=0.0, limit=0)
        for r in res:
            want = max(o.term_score("spark", r["doc_id"]), o.term_score("merge", r["doc_id"]))
            assert abs(r["score"] - want) < 1e-9

    def test_tie_one_equals_or_sum(self, built):
        _, s, _ = built
        dm = s.search_dismax("spark merge", tie=1.0, limit=0)
        orq = s.search("spark merge", match_any=True, limit=0, snippet_lines=0)
        a = {r["doc_id"]: round(r["score"], 9) for r in dm}
        b = {r["doc_id"]: round(r["score"], 9) for r in orq}
        assert a == b

    def test_candidates_are_the_union(self, built):
        _, s, _ = built
        dm = {r["doc_id"] for r in s.search_dismax("spark merge", tie=0.3, limit=0)}
        orq = {r["doc_id"] for r in s.search("spark merge", match_any=True, limit=0, snippet_lines=0)}
        assert dm == orq

    def test_tie_validation(self, built):
        _, s, _ = built
        with pytest.raises(ValueError):
            s.search_dismax("spark", tie=1.5)


class TestExplain:
    def test_contributions_sum_to_score(self, built):
        _, s, _ = built
        hits = s.search("spark merge", limit=5, snippet_lines=0)
        rows = s.explain("spark merge", limit=5)
        by_doc: dict[int, float] = {}
        for r in rows:
            by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0.0) + r["contrib"]
        for h in hits:
            assert abs(by_doc[h["doc_id"]] - h["score"]) < 1e-9

    def test_ranks_and_terms(self, built):
        _, s, _ = built
        hits = s.search("spark merge", limit=5, snippet_lines=0)
        rows = s.explain("spark merge", limit=5)
        assert {r["term"] for r in rows} == {"spark", "merge"}
        rank_of = {h["doc_id"]: i + 1 for i, h in enumerate(hits)}
        assert all(r["rank"] == rank_of[r["doc_id"]] for r in rows)


class TestFacetDomain:
    def test_counts_match_brute(self, built):
        rows, s, _ = built
        from code_indexer_ray.text.analysis import tokenize_query

        got = s.facets_domain("spark")
        want: dict[str, int] = {}
        for r in rows:
            if "spark" in tokenize_query(r["text"]):
                d = r["url"].split("/", 1)[0]
                want[d] = want.get(d, 0) + 1
        assert got == want


class TestStatsAgg:
    def test_matches_brute(self, built):
        rows, s, _ = built
        from code_indexer_ray.index.fieldnorm import quantize_length
        from code_indexer_ray.text.analysis import tokenize_query

        got = s.stats_agg("spark merge")
        dls = []
        for r in rows:
            toks = tokenize_query(r["text"])
            if "spark" in toks and "merge" in toks:
                dls.append(int(quantize_length([len(toks)])[0]))
        assert got["n_docs"] == len(dls)
        assert got["dl_min"] == min(dls) and got["dl_max"] == max(dls)
        assert abs(got["dl_avg"] - sum(dls) / len(dls)) < 1e-12

    def test_empty_match(self, built):
        _, s, _ = built
        assert s.stats_agg("nosuchterm")["n_docs"] == 0


class TestCollapseDomain:
    def test_one_hit_per_domain_and_it_is_the_best(self, built):
        _, s, _ = built
        full = s.search("spark", limit=0, snippet_lines=0)
        best: dict[str, tuple] = {}
        for r in full:
            d = r["path"].split("/", 1)[0] if r.get("path") else ""
            key = (-round(r["score"], 9), r["doc_id"])
            if d not in best or key < best[d][0]:
                best[d] = (key, r["doc_id"], r["score"])
        want = sorted(best.items(), key=lambda kv: kv[1][0])
        got = s.search_collapse_domain("spark", limit=10)
        assert len(got) == min(10, len(want))
        for g, (dom, (_k, doc, score)) in zip(got, want):
            assert (g["domain"], g["doc_id"], round(g["score"], 9)) == (
                dom, doc, round(score, 9)
            )


class TestDNF:
    def test_union_of_and_clauses_with_summed_scores(self, built):
        rows, s, o = built
        from code_indexer_ray.text.analysis import tokenize_query

        res = s.search_dnf(["spark merge", "window batch"], limit=0)
        got = {r["doc_id"]: r["score"] for r in res}
        want: dict[int, float] = {}
        for r in rows:
            toks = set(tokenize_query(r["text"]))
            sc = 0.0
            if {"spark", "merge"} <= toks:
                sc += o.term_score("spark", r["doc_id"]) + o.term_score("merge", r["doc_id"])
            if {"window", "batch"} <= toks:
                sc += o.term_score("window", r["doc_id"]) + o.term_score("batch", r["doc_id"])
            if sc:
                want[r["doc_id"]] = sc
        assert set(got) == set(want)
        for d in got:
            assert abs(got[d] - want[d]) < 1e-9

    def test_dead_clause_drops_out(self, built):
        _, s, _ = built
        a = s.search_dnf(["spark merge"], limit=0)
        b = s.search_dnf(["spark merge", "nosuchterm batch"], limit=0)
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b
        ]


class TestSynonyms:
    def test_and_of_or_semantics_and_scores(self, built):
        rows, s, o = built
        from code_indexer_ray.text.analysis import tokenize_query

        res = s.search_synonyms("spark merge", {"merge": ["window"]}, limit=0)
        got = {r["doc_id"]: r["score"] for r in res}
        want = {}
        for r in rows:
            toks = set(tokenize_query(r["text"]))
            if "spark" in toks and ({"merge", "window"} & toks):
                want[r["doc_id"]] = sum(
                    o.term_score(t, r["doc_id"]) for t in ("spark", "merge", "window")
                )
        assert set(got) == set(want)
        for d, sc in got.items():
            assert abs(sc - want[d]) < 1e-9

    def test_disjointness_validated(self, built):
        _, s, _ = built
        with pytest.raises(ValueError):
            s.search_synonyms("spark merge", {"spark": ["merge"]})


class TestVocabRange:
    def test_matches_brute_dictionary(self, built):
        rows, s, _ = built
        from code_indexer_ray.text.analysis import tokenize_query

        df: dict[str, int] = {}
        for r in rows:
            for t in set(tokenize_query(r["text"])):
                df[t] = df.get(t, 0) + 1
        want = [(t, df[t]) for t in sorted(df) if "m" <= t < "x"][:5]
        got = s.vocab_range("m", "x", limit=5)
        assert [(g["term"], g["df"]) for g in got] == want

    def test_small_per_shard_head_is_still_exact(self, built):
        """limit=1: the head term's df must still be the exact GLOBAL sum."""
        rows, s, _ = built
        from code_indexer_ray.text.analysis import tokenize_query

        got = s.vocab_range("a", "z", limit=1)
        t = got[0]["term"]
        want = sum(1 for r in rows if t in set(tokenize_query(r["text"])))
        assert got[0]["df"] == want


class TestComplete:
    def test_df_ranked_prefix(self, built):
        rows, s, _ = built
        from code_indexer_ray.text.analysis import tokenize_query

        df: dict[str, int] = {}
        for r in rows:
            for t in set(tokenize_query(r["text"])):
                df[t] = df.get(t, 0) + 1
        want = sorted(
            ((t, n) for t, n in df.items() if t.startswith("s")),
            key=lambda kv: (-kv[1], kv[0]),
        )[:3]
        got = s.complete("s", limit=3)
        assert [(g["term"], g["df"]) for g in got] == want


class TestMget:
    def test_rows_match_source(self, built):
        rows, s, _ = built
        got = s.mget([3, 17, 55, 10_000])
        by_id = {r["doc_id"]: r for r in rows}
        assert [g["doc_id"] for g in got] == [3, 17, 55]
        for g in got:
            src = by_id[g["doc_id"]]
            assert (g["lang"], g["url"], g["text"]) == (
                src["lang"], src["url"], src["text"]
            )

    def test_all_missing(self, built):
        _, s, _ = built
        assert s.mget([10_000, 20_000]) == []


class TestFederatedGlobal:
    def test_parity_split_equals_monolith_and_limit0(self, built, ray_session, tmp_path_factory):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.multi import MultiIndexSearcher

        rows, s, _ = built
        tmp = tmp_path_factory.mktemp("fed")
        idxs = {}
        for par in (0, 1):
            part = [r for r in rows if r["doc_id"] % 2 == par]
            src = str(tmp / f"c{par}.parquet")
            pq.write_table(pa.Table.from_pylist(part), src)
            out = str(tmp / f"idx{par}")
            build_index(
                src, out, store_cols=("lang", "url"), num_shards=2, num_buckets=2,
                doc_id_upper=max(r["doc_id"] for r in rows),
            )
            idxs[f"r{par}"] = out
        ms = MultiIndexSearcher(idxs, lang_col="lang", url_col="url")
        mono = s.search("spark merge", limit=0, snippet_lines=0)
        mono.sort(key=_key)
        fed = ms.search_global("spark merge", limit=0)
        assert [(r["doc_id"], round(r["score"], 9)) for r in fed] == [
            (r["doc_id"], round(r["score"], 9)) for r in mono
        ]
        top5 = ms.search_global("spark merge", limit=5)
        assert top5 == fed[:5]


class TestActorModeParity:
    def test_remote_fanout_identical(self, built, tmp_path_factory):
        from code_indexer_ray.query.engine import IndexSearcher

        _, s, _ = built
        rs = IndexSearcher(s.index_dir, lang_col="lang", url_col="url", remote=True)
        p1 = s.search("spark", limit=5, snippet_lines=0)
        cur = (p1[-1]["score"], p1[-1]["doc_id"])
        for a, b in (
            (s.search("spark", limit=5, snippet_lines=0, after=cur),
             rs.search("spark", limit=5, snippet_lines=0, after=cur)),
            (s.search_by_field("spark merge", limit=10),
             rs.search_by_field("spark merge", limit=10)),
            (s.search_dismax("spark merge", tie=0.1, limit=10),
             rs.search_dismax("spark merge", tie=0.1, limit=10)),
            (s.explain("spark merge", limit=5), rs.explain("spark merge", limit=5)),
            (s.facets_domain("spark"), rs.facets_domain("spark")),
            (s.stats_agg("spark"), rs.stats_agg("spark")),
            (s.search_collapse_domain("spark", limit=10),
             rs.search_collapse_domain("spark", limit=10)),
            (s.vocab_range("m", "x", limit=5), rs.vocab_range("m", "x", limit=5)),
            (s.mget([3, 17, 55]), rs.mget([3, 17, 55])),
        ):
            assert a == b


class TestCompleteThreshold:
    """Round-3 bounded-payload complete(): per-shard df-ranked slices + a
    Fagin-TA threshold proof replace the old full-prefix-slice fan-out."""

    def _df(self, rows):
        from code_indexer_ray.text.analysis import tokenize_query

        df: dict[str, int] = {}
        for r in rows:
            for t in set(tokenize_query(r["text"])):
                df[t] = df.get(t, 0) + 1
        return df

    def test_truncated_slices_still_exact(self, ray_session, tmp_path_factory):
        """60 prefix terms with skewed dfs across 3 shards; limit=3 with the
        default c=16 slice truncates every shard — result must equal the
        exhaustive df ranking."""
        import pyarrow.parquet as pq
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rng = np.random.default_rng(11)
        terms = [f"s{i:03d}" for i in range(60)]
        rows = []
        for i in range(150):
            # skewed membership: term j appears with prob ~ 1/(1+j/5)
            text = " ".join(t for j, t in enumerate(terms) if rng.random() < 1.0 / (1 + j / 5))
            rows.append({"doc_id": i, "text": text or "s000"})
        tmp = tmp_path_factory.mktemp("cth")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp / "idx")
        build_index(src, out, num_shards=3, num_buckets=2)
        s = IndexSearcher(out)

        df = self._df(rows)
        want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got = s.complete("s", limit=3, oversample=1)
        assert [(g["term"], g["df"]) for g in got] == want

    def test_all_ties_escalates_and_terminates(self, ray_session, tmp_path_factory):
        """Every prefix term has df=1 (worst case: the threshold can never be
        strictly beaten at small c) — the loop must widen until nothing is
        withheld and return the exact (df desc, term asc) head."""
        import pyarrow.parquet as pq
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rows = [{"doc_id": i, "text": f"t{i:03d}"} for i in range(60)]
        tmp = tmp_path_factory.mktemp("cties")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp / "idx")
        build_index(src, out, num_shards=3, num_buckets=2)
        s = IndexSearcher(out)

        got = s.complete("t", limit=5, oversample=1)
        assert [(g["term"], g["df"]) for g in got] == [
            (f"t{i:03d}", 1) for i in range(5)
        ]

    def test_limit0_exhaustive(self, built):
        rows, s, _ = built
        df = self._df(rows)
        want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))
        got = s.complete("", limit=0)
        assert [(g["term"], g["df"]) for g in got] == want
