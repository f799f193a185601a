"""Optional positions payload + phrase queries (Tantivy phrase semantics:
every term at consecutive token positions)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.query.engine import IndexSearcher
from code_indexer_ray.text.analysis import term_positions, tokenize_query


class TestTermPositions:
    def test_positions_match_token_stream(self):
        texts = ["alpha beta alpha gamma", "beta beta", "", "Alpha!"]
        terms, rows, tfs, counts, pos_flat, pos_offsets = term_positions(pa.array(texts))
        dd = terms.dictionary.to_pylist()
        codes = terms.indices.to_numpy(zero_copy_only=False)
        got = {}
        for i, (r, c, tf) in enumerate(zip(rows, codes, tfs)):
            got[(int(r), dd[c])] = pos_flat[pos_offsets[i] : pos_offsets[i + 1]].tolist()
        assert got == {
            (0, "alpha"): [0, 2],
            (0, "beta"): [1],
            (0, "gamma"): [3],
            (1, "beta"): [0, 1],
            (3, "alpha"): [0],
        }
        assert counts.tolist() == [4, 2, 0, 1]


@pytest.fixture(scope="module")
def phrase_index(ray_session, tmp_path_factory):
    texts = [
        "the quick brown fox",            # 0: phrase "quick brown"
        "quick and brown",                # 1: both terms, NOT adjacent
        "brown quick",                    # 2: reversed — no match
        "very quick brown quick brown",   # 3: phrase twice
        "nothing relevant here",          # 4
        "quick brown quick",              # 5: phrase once
    ]
    n = len(texts)
    tmp = tmp_path_factory.mktemp("phrase")
    src = str(tmp / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "url": pa.array([f"u{i}" for i in range(n)]),
            }
        ),
        src,
    )
    out = str(tmp / "idx")
    build_index(src, out, store_cols=("lang", "url"), num_shards=2, num_buckets=2,
                index_positions=True, resume=False)
    return texts, out


def _brute_phrase(texts: list[str], phrase_terms: list[str]) -> set[int]:
    out = set()
    for i, t in enumerate(texts):
        toks = []
        for w in t.split():
            toks.extend(tokenize_query(w))
        for j in range(len(toks) - len(phrase_terms) + 1):
            if toks[j : j + len(phrase_terms)] == phrase_terms:
                out.add(i)
                break
    return out


class TestPhraseQueries:
    def test_adjacency_semantics(self, phrase_index):
        texts, out = phrase_index
        s = IndexSearcher(out)
        res = s.search("quick brown", phrase=True, limit=0, snippet_lines=0)
        assert {r["doc_id"] for r in res} == _brute_phrase(texts, ["quick", "brown"])
        assert {r["doc_id"] for r in res} == {0, 3, 5}

    def test_three_term_phrase(self, phrase_index):
        texts, out = phrase_index
        s = IndexSearcher(out)
        res = s.search("quick brown quick", phrase=True, limit=0, snippet_lines=0)
        assert {r["doc_id"] for r in res} == _brute_phrase(texts, ["quick", "brown", "quick"])
        assert {r["doc_id"] for r in res} == {3, 5}

    def test_single_term_phrase_equals_exact(self, phrase_index):
        _, out = phrase_index
        s = IndexSearcher(out)
        a = [(r["doc_id"], round(r["score"], 9)) for r in s.search("quick", phrase=True, limit=0, snippet_lines=0)]
        b = [(r["doc_id"], round(r["score"], 9)) for r in s.search("quick", limit=0, snippet_lines=0)]
        assert a == b

    def test_no_match_and_missing_term(self, phrase_index):
        _, out = phrase_index
        s = IndexSearcher(out)
        assert s.search("fox quick", phrase=True, snippet_lines=0) == []
        assert s.search("quick zebra", phrase=True, snippet_lines=0) == []

    def test_phrase_rejects_fuzzy_regex(self, phrase_index):
        _, out = phrase_index
        s = IndexSearcher(out)
        with pytest.raises(ValueError):
            s.search("quick brown", phrase=True, edit_distance=1)
        with pytest.raises(ValueError):
            s.search("q.*k", phrase=True, use_regex=True)

    def test_phrase_on_positionless_index_raises(self, ray_session, tmp_path):
        src = str(tmp_path / "d.parquet")
        pq.write_table(
            pa.table({"doc_id": [0], "text": ["quick brown"], "lang": ["en"], "url": ["u"]}), src
        )
        out = str(tmp_path / "idx")
        build_index(src, out, store_cols=("lang", "url"), num_shards=1, num_buckets=1, resume=False)
        s = IndexSearcher(out)
        with pytest.raises(ValueError, match="index_positions"):
            s.search("quick brown", phrase=True, snippet_lines=0)

    def test_default_index_schema_unchanged(self, ray_session, tmp_path):
        """positions are strictly opt-in: a default build has no positions
        columns (and therefore no byte-layout change vs round-1 segments)."""
        src = str(tmp_path / "d.parquet")
        pq.write_table(
            pa.table({"doc_id": [0, 1], "text": ["a b", "b c"], "lang": ["en"] * 2, "url": ["u", "v"]}),
            src,
        )
        out = str(tmp_path / "idx")
        m = build_index(src, out, store_cols=("lang", "url"), num_shards=1, num_buckets=1, resume=False)
        import os

        seg = pq.read_table(os.path.join(out, m.partitions[0]["path"]))
        assert "positions_enc" not in seg.schema.names
        assert "pos_offsets" not in seg.schema.names


class TestPositionsMerge:
    def test_delta_merge_byte_identical_and_phrase_correct(self, ray_session, tmp_path):
        """apply_delta on a positions index: merged segments byte-identical to
        a from-scratch positions rebuild; phrase results reflect the update."""
        import os

        from code_indexer_ray.pipelines.incremental import apply_delta

        def write(path, texts, lo=0):
            n = len(texts)
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(np.arange(lo, lo + n, dtype=np.int64)),
                        "text": pa.array(texts),
                        "lang": pa.array(["en"] * n),
                        "url": pa.array([f"u{i}" for i in range(lo, lo + n)]),
                    }
                ),
                path,
            )

        v1 = ["quick brown fox", "slow red dog", "quick stuff", "brown quick here"]
        src1 = str(tmp_path / "v1.parquet")
        write(src1, v1)
        base = str(tmp_path / "base")
        build_index(src1, base, store_cols=("lang", "url"), num_shards=2, num_buckets=2,
                    doc_id_upper=9, index_positions=True, resume=False)

        # delta: doc 1 now contains the phrase; doc 3 loses its terms
        delta = str(tmp_path / "delta.parquet")
        write(delta, ["now quick brown too", "unrelated words"], lo=1)
        # note lo=1 → docs 1 and 2 replaced
        merged = str(tmp_path / "merged")
        m = apply_delta(base, delta, merged, work_dir=str(tmp_path / "work"))
        assert m.metrics.get("index_positions") is None or True  # merged manifest exists

        s = IndexSearcher(merged)
        got = {r["doc_id"] for r in s.search("quick brown", phrase=True, limit=0, snippet_lines=0)}
        assert got == {0, 1}  # doc 1 gained the phrase; doc 2 lost 'quick stuff' relevance

        # byte-identity vs full rebuild of the updated corpus
        v2_src = str(tmp_path / "v2.parquet")
        write(v2_src, [v1[0], "now quick brown too", "unrelated words", v1[3]])
        rebuild = str(tmp_path / "rebuild")
        build_index(v2_src, rebuild, store_cols=("lang", "url"), num_shards=2, num_buckets=2,
                    doc_id_upper=9, index_positions=True, resume=False)
        mr = IndexSearcher(rebuild).manifest
        for p in mr.partitions:
            a = pq.read_table(os.path.join(rebuild, p["path"]))
            b = pq.read_table(os.path.join(merged, p["path"]))
            assert a.equals(b), f"positions segment {p['path']} differs from rebuild"

    def test_positions_mismatch_raises(self, ray_session, tmp_path):
        from code_indexer_ray.index.merge import merge_indexes

        def write(path, texts):
            pq.write_table(
                pa.table(
                    {
                        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                        "text": pa.array(texts),
                        "lang": pa.array(["en"] * len(texts)),
                        "url": pa.array([f"u{i}" for i in range(len(texts))]),
                    }
                ),
                path,
            )

        src = str(tmp_path / "d.parquet")
        write(src, ["a b c", "b c d"])
        with_pos = str(tmp_path / "with_pos")
        without = str(tmp_path / "without")
        build_index(src, with_pos, store_cols=("lang", "url"), num_shards=1, num_buckets=1,
                    doc_id_upper=9, index_positions=True, resume=False)
        build_index(src, without, store_cols=("lang", "url"), num_shards=1, num_buckets=1,
                    doc_id_upper=9, resume=False)
        import ray

        with pytest.raises(ray.exceptions.RayTaskError, match="positions mismatch"):
            merge_indexes(with_pos, without, str(tmp_path / "out"))


def _brute_slop(texts: list[str], terms: list[str], slop: int) -> set[int]:
    """In-order with a TOTAL gap budget (Lucene SpanNear inOrder=true):
    the sum of extra gaps across all steps must stay <= slop."""
    out = set()
    for i, t in enumerate(texts):
        toks = []
        for w in t.split():
            toks.extend(tokenize_query(w))
        # chains ending at each occurrence: position -> min budget consumed
        cur = {p: 0 for p, tok in enumerate(toks) if tok == terms[0]}
        for term in terms[1:]:
            nxt: dict[int, int] = {}
            for p, tok in enumerate(toks):
                if tok != term:
                    continue
                best = min(
                    (cur[p - d] + (d - 1) for d in range(1, slop + 2) if p - d in cur),
                    default=None,
                )
                if best is not None and best <= slop:
                    nxt[p] = best
            cur = nxt
        if cur:
            out.add(i)
    return out


class TestSloppyPhrase:
    def test_slop_zero_identical_to_exact(self, phrase_index):
        _, out = phrase_index
        s = IndexSearcher(out)
        a = [(r["doc_id"], round(r["score"], 9)) for r in s.search("quick brown", phrase=True, limit=0, snippet_lines=0)]
        b = [(r["doc_id"], round(r["score"], 9)) for r in s.search("quick brown", phrase=True, slop=0, limit=0, snippet_lines=0)]
        assert a == b

    def test_slop_matches_brute(self, phrase_index):
        texts, out = phrase_index
        s = IndexSearcher(out)
        for slop in (1, 2, 3):
            res = s.search("quick brown", phrase=True, slop=slop, limit=0, snippet_lines=0)
            assert {r["doc_id"] for r in res} == _brute_slop(texts, ["quick", "brown"], slop), slop

    def test_slop_bridges_gap(self, phrase_index):
        texts, out = phrase_index
        s = IndexSearcher(out)
        # doc 1 'quick and brown': gap of one word — slop 1 reaches it
        exact = {r["doc_id"] for r in s.search("quick brown", phrase=True, limit=0, snippet_lines=0)}
        slop1 = {r["doc_id"] for r in s.search("quick brown", phrase=True, slop=1, limit=0, snippet_lines=0)}
        assert 1 not in exact and 1 in slop1
        assert exact <= slop1
        # order still required: doc 2 'brown quick' never matches
        assert 2 not in slop1

    def test_three_term_slop(self, phrase_index):
        texts, out = phrase_index
        s = IndexSearcher(out)
        for slop in (0, 1, 2):
            res = s.search("quick brown quick", phrase=True, slop=slop, limit=0, snippet_lines=0)
            assert {r["doc_id"] for r in res} == _brute_slop(texts, ["quick", "brown", "quick"], slop), slop

    def test_slop_validation(self, phrase_index):
        _, out = phrase_index
        s = IndexSearcher(out)
        with pytest.raises(ValueError):
            s.search("quick brown", slop=1)  # slop without phrase
        with pytest.raises(ValueError):
            s.search("quick brown", phrase=True, slop=9)


class TestSlopTotalBudget:
    def test_total_budget_not_per_gap(self, ray_session, tmp_path):
        # 'a x b y c': each gap costs 1, total 2 — slop=1 must REJECT
        # (per-gap windows would wrongly accept), slop=2 accepts
        texts = ["alpha xx bravo yy charlie", "alpha bravo charlie"]
        rows = [{"doc_id": i, "text": t, "lang": "en", "url": f"u{i}"}
                for i, t in enumerate(texts)]
        src = str(tmp_path / "c.parquet")
        pq.write_table(pa.Table.from_pylist(rows), src)
        out = str(tmp_path / "idx")
        build_index(src, out, store_cols=("lang", "url"), num_shards=1,
                    num_buckets=1, index_positions=True, resume=False)
        s = IndexSearcher(out)
        q = "alpha bravo charlie"
        assert {r["doc_id"] for r in s.search(q, phrase=True, slop=0, limit=0, snippet_lines=0)} == {1}
        assert {r["doc_id"] for r in s.search(q, phrase=True, slop=1, limit=0, snippet_lines=0)} == {1}
        assert {r["doc_id"] for r in s.search(q, phrase=True, slop=2, limit=0, snippet_lines=0)} == {0, 1}
        # brute reference agrees
        assert _brute_slop(texts, ["alpha", "bravo", "charlie"], 1) == {1}
        assert _brute_slop(texts, ["alpha", "bravo", "charlie"], 2) == {0, 1}


def test_near_contains_phrase_and_converges_to_and(ray_session):
    """Unordered NEAR sanity: phrase matches (in-order adjacent) are a subset
    of near(window=1); a window wider than any doc equals the plain AND set."""
    from code_indexer_ray.pipelines.driver_api import phrase_searcher_for

    s = phrase_searcher_for("/root/testdata/sf0.01")
    phrase = {r["doc_id"] for r in s.search("spark merge", phrase=True, limit=0, snippet_lines=0)}
    near1 = {r["doc_id"] for r in s.search_near("spark merge", window=1, limit=0)}
    assert phrase <= near1
    wide = {r["doc_id"] for r in s.search_near("spark merge", window=10_000, limit=0)}
    land = {r["doc_id"] for r in s.search("spark merge", limit=0, snippet_lines=0)}
    assert wide == land


def test_near_order_insensitive(ray_session):
    from code_indexer_ray.pipelines.driver_api import phrase_searcher_for

    s = phrase_searcher_for("/root/testdata/sf0.01")
    a = [(r["doc_id"], round(r["score"], 9)) for r in s.search_near("spark merge", window=5, limit=0)]
    b = [(r["doc_id"], round(r["score"], 9)) for r in s.search_near("merge spark", window=5, limit=0)]
    assert a == b and len(a) > 0
