"""Repetition signals + corpus span-dedup vs brute-force Python references."""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from code_indexer_ray.dedup.minhash import HORNER_BASE, MERSENNE_31, md5_lower64
from code_indexer_ray.text.analysis import tokenize_query
from code_indexer_ray.text.repetition import (
    repetition_stats_batch,
    span_dedup_stats,
    token_ngram_hashes,
)


def _brute_grams2(text: str, n: int) -> list[int]:
    toks = [md5_lower64(t) % MERSENNE_31 for t in tokenize_query(text)]
    out = []
    for i in range(len(toks) - n + 1):
        acc = toks[i]
        for h in toks[i + 1 : i + n]:
            acc = (acc * HORNER_BASE + h) % MERSENNE_31
        out.append(acc)
    return out


class TestNgramHashes:
    TEXTS = ["a b c d e", "x y", "", "a a a a a a", "spark merge spark merge spark"]

    def test_matches_brute(self):
        for n in (2, 3, 5):
            h, rows, ntok = token_ngram_hashes(pa.array(self.TEXTS), n)
            for r, text in enumerate(self.TEXTS):
                got = sorted(h[rows == r].tolist())
                assert got == sorted(_brute_grams2(text, n)), (n, text)
                assert ntok[r] == len(tokenize_query(text))

    def test_no_cross_doc_windows(self):
        h, rows, _ = token_ngram_hashes(pa.array(["a b", "c d"]), 3)
        assert len(h) == 0

    def test_short_docs_emit_nothing(self):
        h, rows, ntok = token_ngram_hashes(pa.array(["one two three"]), 5)
        assert len(h) == 0 and ntok[0] == 3


class TestRepetitionStats:
    def test_counts_match_brute(self):
        texts = [
            "a b a b a b",          # heavy 2-gram repetition
            "p q r s t p q r s t p q r s t",  # repeated 5-gram
            "u v w x y z",          # all unique
            "",                      # empty
            "solo",                  # 1 token
        ]
        tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
        out = repetition_stats_batch(tbl).to_pydict()
        for r, text in enumerate(texts):
            g2 = Counter(_brute_grams2(text, 2))
            g5 = Counter(_brute_grams2(text, 5))
            n2 = sum(g2.values())
            n5 = sum(g5.values())
            assert out["n_2grams"][r] == n2
            assert out["top2_cnt"][r] == (max(g2.values()) if g2 else 0)
            assert out["n_5grams"][r] == n5
            assert out["dup5_cnt"][r] == n5 - len(g5)
            if n2:
                assert out["top2_frac_e4"][r] == (max(g2.values()) * 10_000) // n2
            if n5:
                assert out["dup5_frac_e4"][r] == ((n5 - len(g5)) * 10_000) // n5

    def test_degenerate_single_token_repeat(self):
        tbl = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["w " * 50]})
        out = repetition_stats_batch(tbl).to_pydict()
        assert out["top2_frac_e4"][0] == 10_000  # one 2-gram occupies everything
        assert out["dup5_frac_e4"][0] == ((46 - 1) * 10_000) // 46


class TestSpanDedup:
    def test_shared_spans_counted(self, ray_session):
        import ray.data as rd

        span = " ".join(f"tok{i}" for i in range(10))
        texts = [
            span + " tailone tailtwo",       # shares `span` with doc 1
            "head " + span,                  # shares `span` with doc 0
            " ".join(f"only{i}" for i in range(12)),  # all-private spans
            "short doc",                     # < 10 tokens → no row
        ]
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
        )
        out = {
            r["doc_id"]: r
            for r in span_dedup_stats(ds).to_pandas().to_dict("records")
        }
        # doc 0: 12 tokens → 3 distinct spans, exactly one (the pure `span`) shared
        assert out[0]["n_spans"] == 3 and out[0]["n_shared"] == 1
        assert out[1]["n_spans"] == 2 and out[1]["n_shared"] == 1
        assert out[2]["n_spans"] == 3 and out[2]["n_shared"] == 0
        assert 3 not in out
        assert out[0]["shared_frac_e4"] == 10_000 // 3

    def test_duplicate_doc_all_spans_shared(self, ray_session):
        import ray.data as rd

        text = " ".join(f"w{i}" for i in range(15))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([7, 8], pa.int64()), "text": [text, text]})
        )
        out = span_dedup_stats(ds).to_pandas()
        assert set(out["doc_id"]) == {7, 8}
        assert (out["n_spans"] == 6).all()
        assert (out["n_shared"] == 6).all()
        assert (out["shared_frac_e4"] == 10_000).all()

    def test_within_doc_repeat_is_not_shared(self, ray_session):
        import ray.data as rd

        # the same span occurs twice inside ONE doc — distinct-(span, doc)
        # dedup must keep it private
        span = " ".join(f"z{i}" for i in range(10))
        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([0], pa.int64()), "text": [span + " " + span]})
        )
        out = span_dedup_stats(ds).to_pandas()
        assert out.loc[0, "n_shared"] == 0


class TestSpanRemoval:
    def test_matches_brute(self, ray_session):
        """remove_duplicate_spans vs a per-doc reference over planted
        boilerplate, within-doc-only repeats, short docs, unique docs."""
        import hashlib

        import ray
        import ray.data as rd

        from code_indexer_ray.text.analysis import tokenize_query
        from code_indexer_ray.text.repetition import remove_duplicate_spans

        boiler = " ".join(f"b{i}" for i in range(12))
        rows = [
            {"doc_id": 0, "text": "alpha beta " + boiler + " gamma delta"},
            {"doc_id": 1, "text": "x " + boiler + " y"},
            {"doc_id": 2, "text": "totally unique words only here nothing shared at all beyond"},
            {"doc_id": 3, "text": boiler + " " + boiler},
            {"doc_id": 4, "text": "short doc"},
            {"doc_id": 5, "text": "p q r s t u v w x y z p q r s t u v w x y z"},  # in-doc repeat only
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(3)
        out = pa.concat_tables(
            [t for t in ray.get(remove_duplicate_spans(ds, span_n=10).to_arrow_refs()) if t.num_rows]
        ).to_pylist()
        got = {r["doc_id"]: r for r in out}

        span_n = 10
        toks = {r["doc_id"]: tokenize_query(r["text"]) for r in rows}
        spans: dict = {}
        for d, tk in toks.items():
            for i in range(len(tk) - span_n + 1):
                spans.setdefault(tuple(tk[i : i + span_n]), set()).add(d)
        dup = {sp for sp, ds_ in spans.items() if len(ds_) >= 2}
        assert len(got) == len(rows)
        for d, tk in toks.items():
            cov = [False] * len(tk)
            for i in range(len(tk) - span_n + 1):
                if tuple(tk[i : i + span_n]) in dup:
                    for j in range(i, i + span_n):
                        cov[j] = True
            kept = [t for t, c in zip(tk, cov) if not c]
            assert got[d]["n_tokens"] == len(tk)
            assert got[d]["n_removed"] == sum(cov), d
            assert got[d]["clean_md5"] == hashlib.md5(" ".join(kept).encode()).hexdigest()
        # the within-doc-only repeat is NOT removed (cross-document semantics)
        assert got[5]["n_removed"] == 0
