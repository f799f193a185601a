"""Native multi-field index (round 3): per-field postings/norms/df/avgdl in
ONE build — terms indexed under field-prefixed keys, weighted per-field BM25
scored in the shards — vs a first-principles brute-force recomputation, plus
actor/local parity, apply_delta inheritance and the plain-search guard.

Reference field schema: ``tantivy_index_manager.py:96-115`` (path / content /
identifiers fields in one Tantivy index)."""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.fieldnorm import fieldnorm_to_id, id_to_fieldnorm
from code_indexer_ray.text.analysis import tokenize_query

K1, B = 1.2, 0.75


def _bm25(tf, dl, df, n, avgdl):
    return math.log(1 + (n - df + 0.5) / (df + 0.5)) * (
        tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / avgdl))
    )


def _brute_multifield(rows, weights, terms, limit=10):
    """First-principles per-field BM25 weighted sum (quantized per-field dl,
    N = all corpus rows, avgdl_f = field tokens / N)."""
    n = len(rows)
    stats = {}
    for f in weights:
        toks = {r["doc_id"]: tokenize_query(r[f]) for r in rows}
        dl = {
            d: int(id_to_fieldnorm(fieldnorm_to_id(np.array([len(t)])))[0])
            for d, t in toks.items()
        }
        avg = sum(len(t) for t in toks.values()) / n
        df = {t: sum(1 for d in toks if t in set(toks[d])) for t in terms}
        stats[f] = (toks, dl, avg, df)
    per_term = []
    for t in terms:
        acc = {}
        for f, w in weights.items():
            toks, dl, avg, df = stats[f]
            for d in range(n):
                tf = toks[d].count(t)
                if tf:
                    acc[d] = acc.get(d, 0.0) + w * _bm25(tf, dl[d], df[t], n, avg)
        per_term.append(acc)
    cand = set(per_term[0])
    for acc in per_term[1:]:
        cand &= set(acc)
    rows_out = sorted(
        ((d, sum(acc[d] for acc in per_term)) for d in cand),
        key=lambda x: (-round(x[1], 9), x[0]),
    )[:limit]
    return rows_out


@pytest.fixture(scope="module")
def mf_built(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    rng = np.random.default_rng(13)
    vocab = ["spark", "merge", "window", "batch", "row", "scan"]
    rows = []
    for i in range(150):
        body = " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(3, 30))))
        title = " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(0, 4))))
        rows.append({"doc_id": i, "title": title, "body": body, "lang": "en"})
    tmp = tmp_path_factory.mktemp("mf")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    m = build_index(
        src, out, fields={"title": "title", "body": "body"},
        store_cols=("lang",), num_shards=3, num_buckets=2, resume=False,
    )
    return rows, out, m, IndexSearcher(out, lang_col="lang", url_col=None)


class TestMultifieldSearch:
    def test_weighted_sum_matches_brute(self, mf_built):
        rows, _out, _m, s = mf_built
        got = s.search_multifield("spark merge", {"title": 2.0, "body": 1.0}, limit=10)
        want = _brute_multifield(rows, {"title": 2.0, "body": 1.0}, ["spark", "merge"])
        assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
            (d, round(v, 6)) for d, v in want
        ]

    def test_single_field_exercises_field_norms(self, mf_built):
        """Title-only search: scores must use TITLE dls/avgdl, which differ
        wildly from body stats — a body-stats bug would misrank."""
        rows, _out, _m, s = mf_built
        got = s.search_multifield("spark", {"title": 1.0}, limit=10)
        want = _brute_multifield(rows, {"title": 1.0}, ["spark"])
        assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
            (d, round(v, 6)) for d, v in want
        ]

    def test_actor_local_parity(self, mf_built):
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, _m, s = mf_built
        sr = IndexSearcher(out, remote=True, lang_col="lang", url_col=None)
        w = {"title": 2.0, "body": 1.0}
        a = s.search_multifield("spark merge", w, limit=10)
        b = sr.search_multifield("spark merge", w, limit=10)
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_manifest_field_totals_exact(self, mf_built):
        rows, _out, m, _s = mf_built
        want_title = sum(len(tokenize_query(r["title"])) for r in rows)
        want_body = sum(len(tokenize_query(r["body"])) for r in rows)
        assert m.fields["title"]["total_tokens"] == want_title
        assert m.fields["body"]["total_tokens"] == want_body

    def test_plain_search_raises(self, mf_built):
        _rows, _out, _m, s = mf_built
        with pytest.raises(ValueError, match="fields"):
            s.search("spark")

    def test_unknown_field_raises(self, mf_built):
        _rows, _out, _m, s = mf_built
        with pytest.raises(ValueError, match="unknown"):
            s.search_multifield("spark", {"headline": 1.0})

    def test_limit0_unlimited(self, mf_built):
        rows, _out, _m, s = mf_built
        got = s.search_multifield("spark", {"title": 1.0, "body": 1.0}, limit=0)
        want = _brute_multifield(rows, {"title": 1.0, "body": 1.0}, ["spark"], limit=10**9)
        assert len(got) == len(want)


class TestMultifieldDelta:
    def test_apply_delta_inherits_fields(self, ray_session, tmp_path_factory, mf_built):
        """apply_delta on a multi-field base must index the delta under the
        same field schema and the merged manifest must keep exact per-field
        token totals — merged search equals a full rebuild."""
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.pipelines.incremental import apply_delta
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, m, _s = mf_built
        tmp = tmp_path_factory.mktemp("mfd")
        # delta: replace docs 0-9 with new text
        delta_rows = [
            {"doc_id": i, "title": "spark spark", "body": "merge window", "lang": "en"}
            for i in range(10)
        ]
        dsrc = str(tmp / "delta.parquet")
        pq.write_table(pa.Table.from_pylist(delta_rows), dsrc)
        merged = str(tmp / "merged")
        mm = apply_delta(out, dsrc, merged, store_cols=("lang",))
        assert set(mm.fields) == {"title", "body"}

        # full rebuild over the post-delta corpus
        full_rows = delta_rows + [r for r in rows if r["doc_id"] >= 10]
        fsrc = str(tmp / "full.parquet")
        pq.write_table(pa.Table.from_pylist(sorted(full_rows, key=lambda r: r["doc_id"])), fsrc)
        fidx = str(tmp / "fidx")
        fm = build_index(
            fsrc, fidx, fields={"title": "title", "body": "body"},
            store_cols=("lang",), num_shards=3, num_buckets=2, resume=False,
            doc_id_upper=m.doc_id_upper,
        )
        assert {f: d["total_tokens"] for f, d in mm.fields.items()} == {
            f: d["total_tokens"] for f, d in fm.fields.items()
        }
        w = {"title": 2.0, "body": 1.0}
        a = IndexSearcher(merged, lang_col="lang", url_col=None).search_multifield(
            "spark merge", w, limit=10
        )
        b = IndexSearcher(fidx, lang_col="lang", url_col=None).search_multifield(
            "spark merge", w, limit=10
        )
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b
        ]

    def test_mismatched_field_schema_merge_raises(self, ray_session, tmp_path_factory, mf_built):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.index.merge import merge_indexes

        rows, out, m, _s = mf_built
        tmp = tmp_path_factory.mktemp("mfm")
        src = str(tmp / "d.parquet")
        pq.write_table(
            pa.Table.from_pylist([{"doc_id": 0, "title": "x", "body": "y", "lang": "en"}]), src
        )
        didx = str(tmp / "didx")
        build_index(
            src, didx, fields={"title": "title"}, store_cols=("lang",),
            num_shards=m.num_shards, num_buckets=m.num_buckets,
            doc_id_upper=m.doc_id_upper, resume=False,
        )
        with pytest.raises(ValueError, match="field schemas"):
            merge_indexes(out, didx, str(tmp / "out"))


class TestBM25F:
    def _brute_bm25f(self, rows, weights, terms, limit=10):
        n = len(rows)
        stats = {}
        for f in weights:
            toks = {r["doc_id"]: tokenize_query(r[f]) for r in rows}
            dl = {
                d: int(id_to_fieldnorm(fieldnorm_to_id(np.array([len(t)])))[0])
                for d, t in toks.items()
            }
            avg = sum(len(t) for t in toks.values()) / n
            stats[f] = (toks, dl, avg)
        scores = {}
        for t in terms:
            df_any = sum(
                1 for d in range(n) if any(t in stats[f][0][d] for f in weights)
            )
            idf = math.log(1 + (n - df_any + 0.5) / (df_any + 0.5))
            acc = {}
            for d in range(n):
                tft = 0.0
                for f, w in weights.items():
                    toks, dl, avg = stats[f]
                    tf = toks[d].count(t)
                    if tf:
                        tft += w * tf / (1 - B + B * dl[d] / avg)
                if tft:
                    acc[d] = idf * (tft / (K1 + tft))
            scores[t] = acc
        cand = set(scores[terms[0]])
        for t in terms[1:]:
            cand &= set(scores[t])
        return sorted(
            ((d, sum(scores[t][d] for t in terms)) for d in cand),
            key=lambda x: (-round(x[1], 9), x[0]),
        )[:limit]

    def test_bm25f_matches_brute(self, mf_built):
        rows, _out, _m, s = mf_built
        w = {"title": 2.0, "body": 1.0}
        got = s.search_multifield("spark merge", w, limit=10, combine="bm25f")
        want = self._brute_bm25f(rows, w, ["spark", "merge"])
        assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
            (d, round(v, 6)) for d, v in want
        ]

    def test_bm25f_actor_parity(self, mf_built):
        from code_indexer_ray.query.engine import IndexSearcher

        _rows, out, _m, s = mf_built
        sr = IndexSearcher(out, remote=True, lang_col="lang", url_col=None)
        w = {"title": 2.0, "body": 1.0}
        a = s.search_multifield("spark merge", w, limit=10, combine="bm25f")
        b = sr.search_multifield("spark merge", w, limit=10, combine="bm25f")
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_saturation_differs_from_sum(self, mf_built):
        """BM25F ≠ per-field sum on this corpus (the saturation fold is
        doing something): at least the score VALUES must differ."""
        rows, _out, _m, s = mf_built
        w = {"title": 2.0, "body": 1.0}
        a = s.search_multifield("spark merge", w, limit=10, combine="sum")
        b = s.search_multifield("spark merge", w, limit=10, combine="bm25f")
        assert [r["score"] for r in a] != [r["score"] for r in b]

    def test_bad_combine_raises(self, mf_built):
        _rows, _out, _m, s = mf_built
        with pytest.raises(ValueError, match="combine"):
            s.search_multifield("spark", {"title": 1.0}, combine="max")


class TestShardGroupServing:
    def test_group_actor_parity(self, ray_session, mf_built, tmp_path_factory):
        """shard_group_size serving returns results identical to per-shard
        actors and to local mode — the merge algebra is associative."""
        import numpy as np
        import pyarrow.parquet as pq
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rng = np.random.default_rng(3)
        vocab = ["spark", "merge", "window", "batch", "row", "scan"]
        rows = [
            {
                "doc_id": i,
                "text": " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(3, 25)))),
                "lang": "en" if i % 3 else "de",
            }
            for i in range(200)
        ]
        tmp = tmp_path_factory.mktemp("grp")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp / "idx")
        build_index(src, out, store_cols=("lang",), num_shards=5, num_buckets=2, resume=False)
        local = IndexSearcher(out, lang_col="lang", url_col=None)
        grouped = IndexSearcher(
            out, remote=True, shard_group_size=2, lang_col="lang", url_col=None
        )
        grouped.warm()
        for q, kw in [
            ("spark merge", {}),
            ("spark", {"languages": ["de"]}),
            ("window", {"limit": 0}),
            ("sprk", {"edit_distance": 1}),
        ]:
            a = local.search(q, snippet_lines=0, **kw)
            b = grouped.search(q, snippet_lines=0, **kw)
            assert [(r["doc_id"], r["score"]) for r in a] == [
                (r["doc_id"], r["score"]) for r in b
            ], (q, kw)
        # df/stats fan-outs ride the same grouped path
        assert local.stats_agg("spark") == grouped.stats_agg("spark")
        assert local.complete("s", limit=5) == grouped.complete("s", limit=5)


class TestTermRoutedFanout:
    def test_tail_term_routing_exact(self, ray_session, tmp_path_factory):
        """A term that exists in ONE shard must return identical results
        through the routed fan-out (local, per-shard actors, group actors) —
        and a shard with zero df for every query term is provably skippable."""
        import numpy as np
        import pyarrow.parquet as pq
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        rows = []
        for i in range(200):
            text = "common words here"
            if i == 190:  # lives in the last of 3 doc-range shards only
                text = "uniqueterm common words"
            rows.append({"doc_id": i, "text": text, "lang": "en"})
        tmp = tmp_path_factory.mktemp("route")
        src = str(tmp / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp / "idx")
        build_index(src, out, store_cols=("lang",), num_shards=3, num_buckets=2, resume=False)
        expected = [190]
        for kw in ({}, {"remote": True}, {"remote": True, "shard_group_size": 2}):
            s = IndexSearcher(out, lang_col="lang", url_col=None, **kw)
            got = [r["doc_id"] for r in s.search("uniqueterm", snippet_lines=0)]
            assert got == expected, kw
            # routing metadata: only one shard is active for this term
            _df, active = s._global_df_routed(["uniqueterm"])
            assert len(active) == 1
        # unknown term: zero active shards, empty result (no fan-out at all)
        s = IndexSearcher(out, lang_col="lang", url_col=None)
        assert s.search("nosuchterm", snippet_lines=0) == []


class TestPlainIndexGuards:
    def test_tokenizing_entry_points_refuse_fields_index(self, mf_built):
        _rows, _out, _m, s = mf_built
        import pytest as _pt

        for call in (
            lambda: s.search("spark"),
            lambda: s.search_dismax("spark"),
            lambda: s.search_dnf(["spark"]),
            lambda: s.search_near("spark merge"),
            lambda: s.search_synonyms("spark", {}),
            lambda: s.complete("sp"),
            lambda: s.stats_agg("spark"),
            lambda: s.search_collapse_domain("spark"),
            lambda: s.search_by_field("spark"),
            lambda: s.more_like_this(0),
        ):
            with _pt.raises(ValueError, match="fields"):
                call()


class TestMultifieldStoredFields:
    def test_mget_and_kvstore_on_fields_index(self, mf_built):
        """Review fix: manifest.text_col on a fields= build names the first
        declared field's column — mget and the KV store must work, not crash
        on a nonexistent 'text' column."""
        from code_indexer_ray.index.kvstore import build_kv_docstore
        from code_indexer_ray.query.engine import IndexSearcher

        rows, out, m, s = mf_built
        assert m.text_col == "title"  # first declared field
        got = s.mget([0, 5])
        by_id = {r["doc_id"]: r["title"] for r in rows}
        assert [g["text"] for g in got] == [by_id[0], by_id[5]]

        meta = build_kv_docstore(out, block_docs=8)
        assert meta["n_blocks"] > 0
        s2 = IndexSearcher(out, lang_col="lang", url_col=None)
        assert s2._fetch_texts([0, 5]) == {0: by_id[0], 5: by_id[5]}
        assert s2._kv is not False


def _brute_fields(rows, must, should=(), limit=10):
    """First-principles per-CLAUSE field-scoped BM25 (the search_fields
    contract): clause score = w · BM25_field(term); must clauses intersect
    candidates, should clauses only add score; no must → candidates = union
    of should matches."""
    n = len(rows)
    fields = {f for f, _, _ in list(must) + list(should)}
    stats = {}
    for f in fields:
        toks = {r["doc_id"]: tokenize_query(r[f]) for r in rows}
        dl = {
            d: int(id_to_fieldnorm(fieldnorm_to_id(np.array([len(t)])))[0])
            for d, t in toks.items()
        }
        avg = sum(len(t) for t in toks.values()) / n
        stats[f] = (toks, dl, avg)

    def acc_of(clause):
        f, t, w = clause
        toks, dl, avg = stats[f]
        df = sum(1 for d in toks if t in set(toks[d]))
        out = {}
        for d in range(n):
            tf = toks[d].count(t)
            if tf:
                out[d] = w * _bm25(tf, dl[d], df, n, avg)
        return out

    must_accs = [acc_of(c) for c in must]
    should_accs = [acc_of(c) for c in should]
    if must_accs:
        cand = set(must_accs[0])
        for a in must_accs[1:]:
            cand &= set(a)
    else:
        cand = set()
        for a in should_accs:
            cand |= set(a)
    total = sorted(
        (
            (d, sum(a.get(d, 0.0) for a in must_accs + should_accs))
            for d in cand
        ),
        key=lambda x: (-round(x[1], 9), x[0]),
    )[:limit]
    return total


class TestSearchFields:
    """Per-clause field-scoped search (Lucene ``field:term`` shape) vs a
    first-principles recomputation, plus the query-string front-end."""

    W = {"title": 2.0, "body": 1.0}

    def _eq(self, got, want):
        assert [(r["doc_id"], round(r["score"], 6)) for r in got] == [
            (d, round(v, 6)) for d, v in want
        ]

    def test_or_mode_matches_brute(self, mf_built):
        rows, _out, _m, s = mf_built
        got = s.search_fields([], [("title", "spark", 2.0), ("body", "merge", 1.0)])
        self._eq(got, _brute_fields(rows, [], [("title", "spark", 2.0), ("body", "merge", 1.0)]))

    def test_and_mode_matches_brute(self, mf_built):
        rows, _out, _m, s = mf_built
        must = [("title", "spark", 2.0), ("body", "merge", 1.0)]
        self._eq(s.search_fields(must), _brute_fields(rows, must))

    def test_must_plus_should_matches_brute(self, mf_built):
        rows, _out, _m, s = mf_built
        must = [("title", "spark", 1.0)]
        should = [("body", "merge", 3.0)]
        self._eq(s.search_fields(must, should), _brute_fields(rows, must, should))

    def test_duplicate_clauses_sum_weights(self, mf_built):
        _rows, _out, _m, s = mf_built
        a = s.search_fields([("body", "merge", 1.0), ("body", "merge", 1.0)])
        b = s.search_fields([("body", "merge", 2.0)])
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_multi_token_clause_expands(self, mf_built):
        _rows, _out, _m, s = mf_built
        a = s.search_fields([("body", "spark-merge", 1.0)])
        b = s.search_fields([("body", "spark", 1.0), ("body", "merge", 1.0)])
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_symmetric_or_equals_multifield_single_term(self, mf_built):
        """One term scoped to every field with the multifield weights is the
        exact search_multifield single-term query (same single OR group)."""
        _rows, _out, _m, s = mf_built
        a = s.search_fields([], [("title", "spark", 2.0), ("body", "spark", 1.0)])
        b = s.search_multifield("spark", self.W, limit=10)
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_query_string_front_end(self, mf_built):
        from code_indexer_ray.query.parser import search_query_string

        rows, _out, _m, s = mf_built
        got = search_query_string(
            s, "title:spark^2 body:merge", limit=10, snippet_lines=0
        )
        self._eq(got, _brute_fields(rows, [], [("title", "spark", 2.0), ("body", "merge", 1.0)]))
        got_and = search_query_string(
            s, "title:spark^2 AND body:merge", limit=10, snippet_lines=0
        )
        self._eq(got_and, _brute_fields(rows, [("title", "spark", 2.0), ("body", "merge", 1.0)]))
        got_mix = search_query_string(
            s, "+title:spark body:merge^3", limit=10, snippet_lines=0
        )
        self._eq(
            got_mix,
            _brute_fields(rows, [("title", "spark", 1.0)], [("body", "merge", 3.0)]),
        )

    def test_query_string_actor_parity(self, mf_built):
        from code_indexer_ray.query.engine import IndexSearcher
        from code_indexer_ray.query.parser import search_query_string

        _rows, out, _m, s = mf_built
        sr = IndexSearcher(out, remote=True, lang_col="lang", url_col=None)
        q = "title:spark^2 body:merge"
        a = search_query_string(s, q, limit=10, snippet_lines=0)
        b = search_query_string(sr, q, limit=10, snippet_lines=0)
        assert [(r["doc_id"], r["score"]) for r in a] == [
            (r["doc_id"], r["score"]) for r in b
        ]

    def test_validation(self, mf_built):
        _rows, _out, _m, s = mf_built
        with pytest.raises(ValueError, match="unknown field"):
            s.search_fields([("headline", "spark", 1.0)])
        with pytest.raises(ValueError, match="> 0"):
            s.search_fields([("title", "spark", 0.0)])
        with pytest.raises(ValueError, match="snippets"):
            from code_indexer_ray.query.parser import search_query_string

            search_query_string(s, "title:spark", limit=10, snippet_lines=3)

    def test_dead_clause(self, mf_built):
        """A must clause whose term is absent everywhere → no hits; as a
        should clause it simply contributes nothing."""
        rows, _out, _m, s = mf_built
        assert s.search_fields([("title", "zzzzunseen", 1.0)]) == []
        a = s.search_fields([], [("body", "merge", 1.0), ("title", "zzzzunseen", 1.0)])
        self._eq(a, _brute_fields(rows, [], [("body", "merge", 1.0)]))
