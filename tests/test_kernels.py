"""Unit tests for the core kernels: tokenizer, fieldnorm, varbyte codec, BM25.

Mirrors the reference's fixture style (small deterministic corpora, exact
assertions — SURVEY.md §5) plus differential checks against DuckDB (the same
RE2 patterns the oracle SQL uses) and brute-force re-implementations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.index.codec import (
    BLOCK_SIZE,
    decode_blocks,
    decode_doc_ids,
    decode_tfs,
    encode_postings,
    varbyte_decode,
    varbyte_encode,
)
from code_indexer_ray.index.fieldnorm import (
    FIELD_NORMS_TABLE,
    fieldnorm_to_id,
    id_to_fieldnorm,
    quantize_length,
)
from code_indexer_ray.query import bm25
from code_indexer_ray.text.analysis import (
    sql_tokens_cte,
    term_frequencies,
    token_counts,
    tokenize_flat,
    tokenize_query,
)


class TestTokenizer:
    def test_basic_split_lower(self):
        toks, rows = tokenize_flat(pa.array(["Hello, World! foo_bar"]))
        assert toks.to_pylist() == ["hello", "world", "foo", "bar"]
        assert rows.tolist() == [0, 0, 0, 0]

    def test_long_token_dropped_before_lowercase(self):
        long_tok = "A" * 40
        ok_tok = "B" * 39
        toks, _ = tokenize_flat(pa.array([f"{long_tok} {ok_tok}"]))
        assert toks.to_pylist() == ["b" * 39]

    def test_unicode_and_digits(self):
        toks, _ = tokenize_flat(pa.array(["Grüße 123 αβγ x9y"]))
        assert toks.to_pylist() == ["grüße", "123", "αβγ", "x9y"]

    def test_empty_rows_skipped(self):
        toks, rows = tokenize_flat(pa.array(["", "  ...  ", "ok"]))
        assert toks.to_pylist() == ["ok"]
        assert rows.tolist() == [2]

    def test_token_counts(self):
        counts = token_counts(pa.array(["a b c", "", "x " + "q" * 50 + " y"]))
        assert counts.tolist() == [3, 0, 2]

    def test_term_frequencies(self):
        terms, rows, tfs, counts = term_frequencies(pa.array(["a b a A", "b"]))
        got = sorted(zip(rows.tolist(), terms.to_pylist(), tfs.tolist()))
        assert got == [(0, "a", 3), (0, "b", 1), (1, "b", 1)]
        assert counts.tolist() == [4, 1]

    def test_query_tokenizer_matches_index_tokenizer(self):
        for text in ["Hello, World!", "foo_bar-baz", "Grüße 123", "x" * 45 + " ok"]:
            toks, _ = tokenize_flat(pa.array([text]))
            assert tokenize_query(text) == toks.to_pylist()

    def test_duckdb_oracle_parity(self):
        """Engine tokenizer == the SQL the oracle runs, on tricky inputs."""
        import duckdb

        texts = [
            "Hello, World! foo_bar",
            "Grüße 123 αβγ",
            "a" * 39 + " " + "b" * 40 + " tail",
            "  .. punct-only ..  ",
            "",
            "MiXeD CaSe AND digits 007",
        ]
        con = duckdb.connect()
        con.register("documents", pa.table({"doc_id": list(range(len(texts))), "text": texts}))
        sql = f"SELECT doc_id, term FROM ({sql_tokens_cte()}) ORDER BY doc_id"
        oracle = con.sql(sql).fetchall()
        toks, rows = tokenize_flat(pa.array(texts))
        engine = list(zip(rows.tolist(), toks.to_pylist()))
        # oracle preserves in-row order too (unnest order); compare exactly
        assert engine == [(r, t) for r, t in oracle]


class TestFieldnorm:
    def test_table_monotone_and_exact_head(self):
        assert list(FIELD_NORMS_TABLE[:41]) == list(range(41))
        assert np.all(np.diff(FIELD_NORMS_TABLE) > 0)
        assert FIELD_NORMS_TABLE[41] == 42

    def test_roundtrip_floor(self):
        lens = np.array([0, 1, 40, 41, 42, 43, 100, 1000, 123456])
        ids = fieldnorm_to_id(lens)
        dec = id_to_fieldnorm(ids)
        assert np.all(dec <= lens)
        # next bucket would exceed the value
        nxt = np.minimum(ids.astype(int) + 1, 255)
        assert np.all((FIELD_NORMS_TABLE[nxt] > lens) | (ids == 255))

    def test_quantize_known_values(self):
        assert quantize_length([41]).tolist() == [40]
        assert quantize_length([43]).tolist() == [42]
        assert quantize_length([40]).tolist() == [40]


class TestVarbyte:
    def test_roundtrip_random(self):
        rng = np.random.default_rng(42)
        vals = rng.integers(0, 1 << 40, size=10000, dtype=np.uint64)
        vals[:10] = [0, 1, 127, 128, 129, 16383, 16384, (1 << 35), 5, 300]
        buf, starts = varbyte_encode(vals)
        assert starts[0] == 0
        out = varbyte_decode(buf, len(vals))
        assert np.array_equal(out, vals)

    def test_empty(self):
        buf, _ = varbyte_encode(np.empty(0, dtype=np.uint64))
        assert buf == b""
        assert len(varbyte_decode(buf)) == 0


class TestPostingsCodec:
    def _mk(self, n, seed=7):
        rng = np.random.default_rng(seed)
        docs = np.sort(rng.choice(n * 10, size=n, replace=False)).astype(np.int64)
        tfs = rng.integers(1, 50, size=n).astype(np.int64)
        norms = rng.integers(0, 255, size=n).astype(np.uint8)
        return docs, tfs, norms

    def test_roundtrip_full(self):
        docs, tfs, norms = self._mk(1000)
        enc = encode_postings(docs, tfs, norms)
        assert enc.df == 1000 and enc.cf == int(tfs.sum())
        assert np.array_equal(decode_doc_ids(enc.docs_enc, enc.df), docs)
        assert np.array_equal(decode_tfs(enc.tfs_enc, enc.df), tfs)
        assert np.frombuffer(enc.norms, dtype=np.uint8).tolist() == norms.tolist()

    def test_block_metadata(self):
        docs, tfs, norms = self._mk(300)
        enc = encode_postings(docs, tfs, norms)
        last = np.frombuffer(enc.last_docs, dtype=np.uint64)
        assert len(last) == 3
        assert last[0] == docs[BLOCK_SIZE - 1] and last[-1] == docs[-1]
        maxtf = np.frombuffer(enc.max_tfs, dtype=np.uint32)
        assert maxtf[0] == tfs[:BLOCK_SIZE].max()
        minn = np.frombuffer(enc.min_norms, dtype=np.uint8)
        assert minn[1] == norms[BLOCK_SIZE : 2 * BLOCK_SIZE].min()

    def test_partial_block_decode(self):
        docs, tfs, norms = self._mk(1000)
        enc = encode_postings(docs, tfs, norms)
        for blocks in ([0], [1], [7], [0, 3, 7], [2, 3]):
            d, t, nn = decode_blocks(enc, np.array(blocks))
            expect = np.concatenate(
                [docs[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE] for b in blocks]
            )
            assert np.array_equal(d, expect)
            expect_tf = np.concatenate(
                [tfs[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE] for b in blocks]
            )
            assert np.array_equal(t, expect_tf)

    def test_single_posting(self):
        enc = encode_postings(np.array([12345]), np.array([3]), np.array([9], dtype=np.uint8))
        assert decode_doc_ids(enc.docs_enc, 1).tolist() == [12345]
        d, t, nn = decode_blocks(enc, np.array([0]))
        assert d.tolist() == [12345] and t.tolist() == [3] and nn.tolist() == [9]


class TestBM25:
    def test_idf_formula(self):
        assert bm25.idf(1, 100) == pytest.approx(np.log(1 + 99.5 / 1.5))

    def test_upper_bound_dominates(self):
        rng = np.random.default_rng(0)
        tfs = rng.integers(1, 20, 50)
        dls = rng.integers(10, 500, 50)
        ub = bm25.term_upper_bound(tfs.max(), dls.min(), df=50, n_docs=1000, avgdl=120.0)
        scores = bm25.term_score(tfs, dls, df=50, n_docs=1000, avgdl=120.0)
        assert np.all(scores <= ub + 1e-12)

    def test_sql_parity(self):
        import duckdb

        expr = bm25.sql_score_expr("5.0", "120", "17", "1000", "250.0")
        got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
        want = float(bm25.term_score(np.array([5.0]), np.array([120.0]), 17, 1000, 250.0)[0])
        assert got == pytest.approx(want, abs=1e-12)


def test_scalar_fnv_matches_vectorized_hash():
    """ShardSearcher._bucket_of's scalar FNV must be bit-identical to the
    build's vectorized _hash64_batch (else bucket-lazy lookups miss terms)."""
    import pyarrow as pa

    from code_indexer_ray.index.build import _hash64_batch
    from code_indexer_ray.query.engine import ShardSearcher

    terms = ["", "a", "spark", "Grüße", "αβγ", "t000042", "x" * 39]
    want = _hash64_batch(pa.array(terms))
    s = ShardSearcher.__new__(ShardSearcher)
    for nb in (1, 7, 16, 1024):
        s._num_buckets = nb
        for t, h in zip(terms, want):
            assert s._bucket_of(t) == int(h) % nb, (t, nb)
