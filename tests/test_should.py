"""BooleanQuery SHOULD-clause semantics vs the brute-force oracle: optional
terms never gate matching, only add score to candidates containing them."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import BruteForceIndex


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    docs = [
        "spark merge window",          # must + should → boosted
        "spark merge",                 # must only
        "spark merge window window",   # boosted more (tf)
        "window window window",        # should only → NOT a candidate
        "spark window",                # missing 'merge' → not a candidate
        "spark merge other stuff here window",
    ]
    rows = [
        {"doc_id": i, "text": t, "lang": "en", "url": f"u/{i}"}
        for i, t in enumerate(docs)
    ]
    tmp = tmp_path_factory.mktemp("shidx")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=2, num_buckets=2)
    oracle = BruteForceIndex(
        {r["doc_id"]: r["text"] for r in rows}, {r["doc_id"]: r["lang"] for r in rows}
    )
    return docs, IndexSearcher(out, lang_col="lang", url_col="url"), oracle


def _ids_scores(res):
    return [(r["doc_id"], round(r["score"], 9)) for r in res]


class TestShould:
    def test_candidates_equal_must_only(self, built):
        _, s, _ = built
        a = {r["doc_id"] for r in s.search("spark merge", limit=10, snippet_lines=0)}
        b = {
            r["doc_id"]
            for r in s.search("spark merge", should_terms=["window"], limit=10, snippet_lines=0)
        }
        assert a == b  # SHOULD never widens or narrows the match set

    def test_scores_match_brute_oracle(self, built):
        docs, s, o = built
        res = s.search("spark merge", should_terms=["window"], limit=10, snippet_lines=0)
        for r in res:
            d = r["doc_id"]
            want = sum(o.term_score(t, d) for t in ("spark", "merge", "window"))
            assert r["score"] == pytest.approx(want, abs=1e-9), d

    def test_should_term_absent_everywhere_is_noop(self, built):
        _, s, _ = built
        a = _ids_scores(s.search("spark merge", limit=10, snippet_lines=0))
        b = _ids_scores(
            s.search("spark merge", should_terms=["zzzmissing"], limit=10, snippet_lines=0)
        )
        assert a == b

    def test_duplicate_of_must_term_not_double_counted(self, built):
        _, s, _ = built
        a = _ids_scores(s.search("spark merge", limit=10, snippet_lines=0))
        b = _ids_scores(
            s.search("spark merge", should_terms=["spark"], limit=10, snippet_lines=0)
        )
        assert a == b

    def test_composes_with_exclude(self, built):
        docs, s, o = built
        res = s.search(
            "spark", should_terms=["window"], exclude_terms=["merge"], limit=10, snippet_lines=0
        )
        ids = {r["doc_id"] for r in res}
        want = {
            i for i, t in enumerate(docs)
            if "spark" in t.split() and "merge" not in t.split()
        }
        assert ids == want
        for r in res:
            d = r["doc_id"]
            assert r["score"] == pytest.approx(
                o.term_score("spark", d) + o.term_score("window", d), abs=1e-9
            )

    def test_phrase_plus_should_raises(self, built):
        _, s, _ = built
        with pytest.raises(ValueError):
            s.search("spark merge", phrase=True, should_terms=["window"])

    def test_remote_identity(self, built):
        from code_indexer_ray.query.engine import IndexSearcher

        _, s, _ = built
        remote = IndexSearcher(s.index_dir, lang_col="lang", url_col="url", remote=True)
        a = _ids_scores(remote.search("spark merge", should_terms=["window"], limit=10, snippet_lines=0))
        b = _ids_scores(s.search("spark merge", should_terms=["window"], limit=10, snippet_lines=0))
        assert a == b


class TestBoosts:
    def test_scores_match_brute_oracle(self, built):
        _, s, o = built
        res = s.search("spark merge", boosts={"merge": 2.0}, limit=10, snippet_lines=0)
        for r in res:
            d = r["doc_id"]
            want = o.term_score("spark", d) + 2.0 * o.term_score("merge", d)
            assert r["score"] == pytest.approx(want, abs=1e-9), d

    def test_candidate_set_unchanged(self, built):
        _, s, _ = built
        a = {r["doc_id"] for r in s.search("spark merge", limit=10, snippet_lines=0)}
        b = {r["doc_id"] for r in s.search("spark merge", boosts={"spark": 5.0}, limit=10, snippet_lines=0)}
        assert a == b

    def test_boost_one_is_identity(self, built):
        _, s, _ = built
        a = _ids_scores(s.search("spark merge", limit=10, snippet_lines=0))
        b = _ids_scores(s.search("spark merge", boosts={"merge": 1.0}, limit=10, snippet_lines=0))
        assert a == b

    def test_key_analyzed_and_validated(self, built):
        _, s, _ = built
        # mixed case key folds to the index term
        a = _ids_scores(s.search("spark merge", boosts={"MERGE": 2.0}, limit=10, snippet_lines=0))
        b = _ids_scores(s.search("spark merge", boosts={"merge": 2.0}, limit=10, snippet_lines=0))
        assert a == b
        with pytest.raises(ValueError):
            s.search("spark", boosts={"merge": -1.0})
        with pytest.raises(ValueError):
            s.search("spark", boosts={"two words": 2.0})
        with pytest.raises(ValueError):
            s.search("spark merge", phrase=True, boosts={"merge": 2.0})

    def test_composes_with_should(self, built):
        _, s, o = built
        res = s.search(
            "spark merge", should_terms=["window"], boosts={"window": 3.0},
            limit=10, snippet_lines=0,
        )
        for r in res:
            d = r["doc_id"]
            want = (
                o.term_score("spark", d) + o.term_score("merge", d)
                + 3.0 * o.term_score("window", d)
            )
            assert r["score"] == pytest.approx(want, abs=1e-9), d

    def test_remote_identity(self, built):
        from code_indexer_ray.query.engine import IndexSearcher

        _, s, _ = built
        remote = IndexSearcher(s.index_dir, lang_col="lang", url_col="url", remote=True)
        a = _ids_scores(remote.search("spark merge", boosts={"merge": 2.0}, limit=10, snippet_lines=0))
        b = _ids_scores(s.search("spark merge", boosts={"merge": 2.0}, limit=10, snippet_lines=0))
        assert a == b
