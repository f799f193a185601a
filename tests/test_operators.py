"""Operator tests: chunker, extraction, corpus, generic ops, text stats,
dedup (exact/minhash/simhash), ANN, multimodal stub."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from code_indexer_ray.text.chunker import chunk_batch, chunk_text, num_chunks
from code_indexer_ray.text.extract import (
    decode_bytes,
    decode_html_batch,
    extract_body,
    wrap_body,
)
from code_indexer_ray.text.stats import text_stats_batch
from code_indexer_ray.dedup.exact import add_content_hash
from code_indexer_ray.dedup.minhash import (
    MERSENNE_P,
    band_batch,
    jaccard_ngrams,
    md5_lower64,
    minhash_batch,
    perm_coeffs,
    shingles_of,
)
from code_indexer_ray.dedup.simhash import hamming_distance, simhash_batch
from code_indexer_ray.pipelines.corpus import generate_pages_block, pages_from_documents


class TestChunker:
    CASES = [
        "",
        "   \n  ",
        "short text",
        "x" * 1000,
        "x" * 1001,
        "a" * 850 + "b" * 1000,  # exactly 2 chunks, divisible boundary
        ("line one\n" * 300),
        "y" * 5000,
        "é" * 1500,  # multibyte chars, char-based windows
    ]

    def test_batch_matches_reference_loop(self):
        batch = pa.table({"doc_id": list(range(len(self.CASES))), "text": self.CASES})
        out = chunk_batch(batch)
        got = out.to_pylist()
        expected = []
        for i, text in enumerate(self.CASES):
            for c in chunk_text(text):
                expected.append(
                    {
                        "doc_id": i,
                        "chunk_index": c["chunk_index"],
                        "total_chunks": c["total_chunks"],
                        "chunk_text": c["text"],
                        "size": c["size"],
                        "line_start": c["line_start"],
                        "line_end": c["line_end"],
                    }
                )
        assert got == expected

    def test_num_chunks_closed_form(self):
        for L in [1, 999, 1000, 1001, 1850, 1851, 2700, 10000]:
            assert num_chunks(L, 1000, 850) == len(chunk_text("z" * L))


class TestExtract:
    def test_decode_chain(self):
        assert decode_bytes("héllo".encode("utf-8")) == "héllo"
        # invalid utf-8 → latin-1
        raw = bytes([0xE9, 0x20, 0x41])
        assert decode_bytes(raw) == "é A"
        # BOM'd utf-8 decodes with plain utf-8 first, keeping the BOM char
        assert decode_bytes("﻿hi".encode("utf-8")) == "﻿hi"

    def test_wrap_extract_roundtrip_byte_identical(self):
        texts = pa.array(["hello world", "multi\nline", "", "ünïcode αβ"])
        ids = np.arange(4)
        html = wrap_body(ids, texts)
        batch = pa.table({"doc_id": ids, "html": html})
        decoded = decode_html_batch(batch)
        body = extract_body(decoded["html_text"])
        assert body.to_pylist() == texts.to_pylist()

    def test_extract_text_html_golden(self):
        """Frozen expected outputs of the real-HTML extractor on non-wrapper
        pages (script/style/comment stripping, entity decode order,
        whitespace collapse)."""
        from code_indexer_ray.text.extract import extract_text_html

        html = [
            "<html><head><title>T</title><script>var a='<p>not text</p>';"
            "</script></head><body><h1>Hi</h1><p>Hello &amp; welcome</p>"
            "<!-- note --><div>A&nbsp;B &lt;tag&gt;</div></body></html>",
            "plain text no markup",
            "<style type='text/css'>p { display: none }</style>Visible<br/>line",
            "double &amp;amp; escape",
            "",
        ]
        assert extract_text_html(pa.array(html)).to_pylist() == [
            "T Hi Hello & welcome A B <tag>",
            "plain text no markup",
            "Visible line",
            "double &amp; escape",
            "",
        ]

    def test_extract_text_html_matches_duckdb_twin(self):
        import duckdb

        from code_indexer_ray.text.extract import extract_text_html, sql_extract_text_html

        html = [
            "<p>a</p><p>b</p>",
            "<SCRIPT>x</SCRIPT>kept",
            "nested <div><span>deep &quot;q&quot;</span></div>",
            "<!--c1--><!--c2-->between",
        ]
        got = extract_text_html(pa.array(html)).to_pylist()
        con = duckdb.connect()
        quoted = ",".join("({}, '{}')".format(i, h.replace("'", "''")) for i, h in enumerate(html))
        con.execute(f"CREATE TABLE t AS SELECT * FROM (VALUES {quoted}) v(i, html)")
        rows = con.execute(
            "SELECT i, " + sql_extract_text_html("html") + " FROM t ORDER BY i"
        ).fetchall()
        assert [r[1] for r in rows] == got

    def test_decode_batch_with_non_utf8_rows(self):
        rows = [b"plain", bytes([0xFF, 0xFE, 0x41]), "ok é".encode("utf-8")]
        batch = pa.table({"html": pa.array(rows, type=pa.binary())})
        out = decode_html_batch(batch)
        assert out["html_text"].to_pylist() == [
            "plain",
            bytes([0xFF, 0xFE, 0x41]).decode("latin-1"),
            "ok é",
        ]


class TestCorpus:
    def test_generation_deterministic_and_blockwise(self):
        a = generate_pages_block(0, 50)
        b = generate_pages_block(0, 50)
        assert a.equals(b)
        # generating a sub-range yields identical rows (stateless per-id)
        c = generate_pages_block(10, 5)
        assert a.slice(10, 5).equals(c)

    def test_pages_from_documents_shape(self):
        import pyarrow.parquet as pq

        docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 20)
        pages = pages_from_documents(docs)
        assert pages.schema.names == ["doc_id", "url", "warc_ts", "html", "text", "lang"]
        assert pages["url"][0].as_py().startswith("src0/")
        body = extract_body(decode_html_batch(pages)["html_text"])
        assert body.to_pylist() == pages["text"].to_pylist()  # byte-identical invariant


class TestOps:
    def test_keep_latest(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import keep_latest

        rows = [
            {"k": "a", "ts": 1, "v": 10},
            {"k": "a", "ts": 3, "v": 30},
            {"k": "a", "ts": 2, "v": 20},
            {"k": "b", "ts": 1, "v": 1},
        ]
        out = keep_latest(rd.from_items(rows), ["k"], "ts").to_pandas()
        got = dict(zip(out["k"], out["v"]))
        assert got == {"a": 30, "b": 1}

    def test_broadcast_antijoin(self, ray_session):
        import ray
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import broadcast_antijoin

        ds = rd.range(100)
        ref = ray.put(np.arange(0, 100, 2))
        out = broadcast_antijoin(ds, "id", ref).to_pandas()
        assert sorted(out["id"]) == list(range(1, 100, 2))

    def test_local_then_global_topk(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import local_then_global_topk

        rng = np.random.default_rng(1)
        vals = rng.permutation(1000).astype(np.float64)
        ds = rd.from_pandas(pd.DataFrame({"i": np.arange(1000), "v": vals})).repartition(7)
        top = local_then_global_topk(ds, "v", 5, "i")
        assert top["v"].to_pylist() == sorted(vals, reverse=True)[:5]

    def test_partial_agg_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import partial_agg_sum

        li = "/root/testdata/sf0.001/lineitem.parquet"
        ds = rd.read_parquet(li, columns=["l_returnflag", "l_quantity"])
        out = (
            partial_agg_sum(ds, ["l_returnflag"], ["l_quantity"])
            .to_pandas()
            .sort_values("l_returnflag")
            .reset_index(drop=True)
        )
        want = duckdb.sql(
            f"SELECT l_returnflag, sum(l_quantity) AS l_quantity, count(*) AS n "
            f"FROM read_parquet('{li}') GROUP BY 1 ORDER BY 1"
        ).df()
        assert out["l_returnflag"].tolist() == want["l_returnflag"].tolist()
        assert out["l_quantity"].tolist() == pytest.approx(want["l_quantity"].tolist())
        assert out["n"].tolist() == want["n"].tolist()


class TestStats:
    def test_counts_and_fingerprint(self):
        batch = pa.table({"doc_id": [0, 1], "text": ["the cat and the hat!", ""]})
        out = text_stats_batch(batch).to_pylist()
        r0 = out[0]
        assert r0["n_tokens"] == 5 and r0["n_unique"] == 4
        assert r0["stop_en"] == 3  # the, and, the
        assert r0["punct_chars"] == 1
        assert r0["fingerprint"] == hashlib.md5(b"and cat hat the").hexdigest()
        assert r0["lang_guess"] == "en"
        assert out[1]["n_tokens"] == 0 and out[1]["lang_guess"] == "unknown"


class TestDedup:
    def test_md5_lower64_matches_duckdb(self):
        import duckdb

        for s in ["a", "hello world", "tok1 tok2 tok3"]:
            want = duckdb.sql(f"select md5_number_lower('{s}')").fetchone()[0]
            assert md5_lower64(s) == want

    def test_minhash_against_slow_reimpl(self):
        batch = pa.table(
            {"doc_id": [7, 9], "text": ["a b c d e f", "a b c d e g"]}
        )
        out = minhash_batch(batch, num_perms=4, shingle_n=2).to_pylist()
        a, b = perm_coeffs(4)
        for row in out:
            toks = ["a", "b", "c", "d", "e", "f" if row["doc_id"] == 7 else "g"]
            sh = shingles_of(toks, 2)
            xs = [md5_lower64(s) for s in sh]
            p = row["perm_id"]
            want = min((int(a[p]) * x + int(b[p])) % MERSENNE_P for x in xs)
            assert row["minhash"] == want

    def test_lsh_bands_collide_for_near_dups(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.dedup.minhash import candidate_pairs

        texts = {
            0: "the quick brown fox jumps over the lazy dog again and again",
            1: "the quick brown fox jumps over the lazy dog again and again!",
            2: "completely different content about distributed posting lists",
        }
        batch = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        sig = minhash_batch(batch, num_perms=8)
        bands = band_batch(sig, rows_per_band=2)
        ds = rd.from_arrow(bands)
        pairs = candidate_pairs(ds).to_pandas()
        got = set(zip(pairs["doc_a"], pairs["doc_b"]))
        assert (0, 1) in got
        assert (0, 2) not in got and (1, 2) not in got
        assert jaccard_ngrams(texts[0].split(), texts[1].split()) > 0.8

    def test_simhash_near_vs_far(self):
        batch = pa.table(
            {
                "doc_id": [0, 1, 2],
                "text": [
                    "alpha beta gamma delta epsilon zeta eta theta",
                    "alpha beta gamma delta epsilon zeta eta iota",
                    "one two three four five six seven eight",
                ],
            }
        )
        out = simhash_batch(batch)
        s = out["simhash"].to_numpy()
        near = hamming_distance(s[0:1], s[1:2])[0]
        far = hamming_distance(s[0:1], s[2:3])[0]
        assert near < far
        assert (s >= 0).all()  # 63-bit → fits signed int64

    def test_content_hash_matches_duckdb_md5(self):
        import duckdb

        batch = pa.table({"doc_id": [1], "text": ["dedup me"]})
        out = add_content_hash(batch)
        want = duckdb.sql("select md5('dedup me')").fetchone()[0]
        assert out["content_hash"][0].as_py() == want


class TestANN:
    def test_brute_force_matches_numpy(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.ann.brute import ann_cosine_topk

        rng = np.random.default_rng(3)
        vecs = rng.standard_normal((200, 16))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(200), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
        ds = rd.from_arrow(tbl).repartition(5)
        q_ids = np.array([0, 1])
        out = ann_cosine_topk(ds, vecs[q_ids], q_ids, k=5).to_pandas()
        vn = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        for q in q_ids:
            cos = vn @ vn[q]
            cos[q] = -np.inf
            want = np.argsort(-cos, kind="stable")[:5]
            got = out[out["query_id"] == q].sort_values("rank")["vec_id"].tolist()
            assert got == want.tolist()

    def test_lsh_recall_reasonable(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.ann.brute import ann_cosine_topk
        from code_indexer_ray.ann.lsh import lsh_cosine_topk

        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((300, 16))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(300), type=pa.int64()),
                "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
            }
        )
        q_ids = np.array([0])
        brute = ann_cosine_topk(rd.from_arrow(tbl), vecs[q_ids], q_ids, k=10).to_pandas()
        approx = lsh_cosine_topk(
            rd.from_arrow(tbl), vecs[q_ids], q_ids, k=10, n_planes=4, n_tables=8
        ).to_pandas()
        recall = len(set(approx["vec_id"]) & set(brute["vec_id"])) / 10
        assert recall >= 0.5


class TestMultimodal:
    def test_stub_decode_actor_pool(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.mm.decode import media_decode

        rows = [{"doc_id": i, "payload": f"payload-{i}".encode()} for i in range(10)]
        out = media_decode(rd.from_items(rows), concurrency=2, batch_size=4).to_pandas()
        assert len(out) == 10
        assert set(out.columns) == {
            "doc_id", "n_bytes", "width", "height", "feat_mean", "real_decode"
        }
        assert not out["real_decode"].any()  # non-PNG/WAV payloads → flagged fake
        # deterministic across runs
        d = hashlib.md5(b"payload-0").digest()
        assert out.set_index("doc_id").loc[0, "width"] == 64 + d[0] % 192


class TestNearDupPipeline:
    def test_planted_near_dups_found_and_verified(self, ray_session, tmp_path):
        """Full sig→band→pairs→Jaccard pipeline on planted near-duplicates."""
        import pyarrow.parquet as pq

        from code_indexer_ray.pipelines.driver_api import q_dedup_near_pairs

        base = "the quick brown fox jumps over the lazy dog near the river bank today"
        rows = {
            "doc_id": list(range(8)),
            "text": [
                base,
                base + " extra",                          # near-dup of 0
                base.replace("quick", "rapid"),           # near-dup of 0
                "completely different text about inverted index compression blocks",
                "another unrelated document mentioning vector search and recall",
                base,                                     # exact dup of 0
                "short one",
                "",
            ],
            "lang": ["en"] * 8,
            "source": ["s"] * 8,
        }
        pq.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
        out = q_dedup_near_pairs(str(tmp_path)).to_pandas()
        got = set(zip(out.doc_a, out.doc_b))
        assert (0, 5) in got            # exact dup: jaccard 1.0
        assert (0, 1) in got            # suffix edit
        assert all(a < b for a, b in got)
        assert not any({3, 4} & {a, b} for a, b in got)  # unrelated docs never pair
        assert (out.jaccard_r >= 0.8).all()


class TestLanguageMapper:
    def test_forward_reverse_and_passthrough(self):
        from code_indexer_ray.text.langmap import LanguageMapper

        m = LanguageMapper()
        assert m.get_extensions("python") == {"py", "pyw", "pyi"}
        assert m.get_extensions("PYTHON") == {"py", "pyw", "pyi"}  # case-insensitive
        assert m.get_extensions("cpp") == {"cpp", "cc", "cxx", "c++"}
        assert m.get_extensions("unknownlang") == {"unknownlang"}  # pass-through
        assert m.language_of_ext("py") == "python"
        assert m.language_of_ext("cc") == "cpp"
        assert m.language_of_ext("weird") == "weird"
        assert m.expand_languages(["python", "go"]) == {"python", "py", "pyw", "pyi", "go"}

    def test_overrides_dict_and_yaml(self, tmp_path):
        from code_indexer_ray.text.langmap import LanguageMapper

        m = LanguageMapper(overrides={"mylang": ["ml1", "ml2"], "python": ["py"]})
        assert m.get_extensions("mylang") == {"ml1", "ml2"}
        assert m.get_extensions("python") == {"py"}  # override replaces defaults
        y = tmp_path / "language-mappings.yaml"
        y.write_text("fortran:\n  - f90\n  - f95\n")
        m2 = LanguageMapper(yaml_path=str(y))
        assert m2.get_extensions("fortran") == {"f90", "f95"}
        assert m2.language_of_ext("f95") == "fortran"
        assert m2.get_extensions("python") == {"py", "pyw", "pyi"}  # defaults kept

    def test_detect_batch_vectorized(self):
        from code_indexer_ray.text.langmap import detect_language_batch

        batch = pa.table(
            {
                "doc_id": [1, 2, 3, 4, 5, 6],
                "path": [
                    "src/app.py", "a/b/Widget.TSX", "docs/readme.md",
                    "build/Dockerfile", "Makefile", "data/blob.weird",
                ],
            }
        )
        out = detect_language_batch(batch).to_pandas()
        assert out["language"].tolist() == [
            "python", "typescript", "markdown", "dockerfile", "makefile", "weird",
        ]


class TestMultimodalStages:
    def _payload_ds(self, n=10):
        import ray.data as rd

        rows = [
            {"doc_id": i, "payload": (f"payload-{i}-" * (1 + 200 * i)).encode()}
            for i in range(n)
        ]
        return rd.from_items(rows)

    def test_resize_exact_output_size_and_determinism(self, ray_session):
        from code_indexer_ray.mm.stages import media_resize

        out = media_resize(self._payload_ds(), width=32, height=8, concurrency=2).to_pandas()
        assert len(out) == 10
        assert all(len(p) == 32 * 8 for p in out["payload"])
        out2 = media_resize(self._payload_ds(), width=32, height=8, concurrency=2).to_pandas()
        assert (out.sort_values("doc_id")["payload"].tolist()
                == out2.sort_values("doc_id")["payload"].tolist())

    def test_frame_sample_expansion(self, ray_session):
        from code_indexer_ray.mm.stages import media_frames

        out = media_frames(self._payload_ds(), concurrency=2).to_pandas()
        # small payloads → 1 frame; big payloads → capped at 4
        per_doc = out.groupby("doc_id").size()
        assert per_doc.loc[0] == 1
        assert per_doc.loc[9] == 4
        f = out[(out.doc_id == 9)].sort_values("frame_idx")
        assert f["ts_ms"].tolist() == [0, 40, 80, 120]
        assert f["frame_bytes"].max() <= 256

    def test_audio_features_shape(self, ray_session):
        from code_indexer_ray.mm.stages import media_audio_features

        out = media_audio_features(self._payload_ds(), dim=16, concurrency=2).to_pandas()
        assert all(len(v) == 16 for v in out["features"])
        # deterministic per payload
        out2 = media_audio_features(self._payload_ds(), dim=16, concurrency=2).to_pandas()
        a = out.sort_values("doc_id")["features"].tolist()
        b = out2.sort_values("doc_id")["features"].tolist()
        assert all((np.asarray(x) == np.asarray(y)).all() for x, y in zip(a, b))


class TestMinhashFast:
    def test_fast_path_shape_and_near_dup_behavior(self):
        from code_indexer_ray.dedup.minhash import minhash_batch_fast

        texts = {
            0: "the quick brown fox jumps over the lazy dog again and again",
            1: "the quick brown fox jumps over the lazy dog again and again!",
            2: "completely different content about distributed posting lists",
        }
        batch = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        sig = minhash_batch_fast(batch, num_perms=16).to_pandas()
        assert len(sig) == 48
        s0 = sig[sig.doc_id == 0].sort_values("perm_id")["minhash"].to_numpy()
        s1 = sig[sig.doc_id == 1].sort_values("perm_id")["minhash"].to_numpy()
        s2 = sig[sig.doc_id == 2].sort_values("perm_id")["minhash"].to_numpy()
        assert (s0 == s1).mean() > 0.6      # near-dups collide on most perms
        assert (s0 == s2).mean() < 0.3      # distinct docs mostly differ
        # deterministic
        assert minhash_batch_fast(batch, num_perms=16).to_pandas().equals(sig)

    def test_fast_path_short_docs(self):
        from code_indexer_ray.dedup.minhash import minhash_batch_fast

        batch = pa.table({"doc_id": [5, 6], "text": ["one two", ""]})
        out = minhash_batch_fast(batch).to_pandas()
        assert set(out.doc_id) == {5}  # empty doc omitted, short doc single-shingle

    def test_fast_path_matches_scalar_reference(self):
        """Independent python-int reimplementation of the fast spec (the same
        formula the DuckDB oracle runs) — guards the vectorized kernel."""
        from code_indexer_ray.dedup.minhash import (
            HORNER_BASE,
            MERSENNE_31,
            md5_lower64,
            minhash_batch_fast,
            perm_coeffs_fast,
        )
        from code_indexer_ray.text.analysis import tokenize_query

        texts = {3: "a b c d e f g", 4: "x y", 5: "lone", 6: "a b c d e h g"}
        batch = pa.table({"doc_id": list(texts), "text": list(texts.values())})
        got = minhash_batch_fast(batch, num_perms=4).to_pandas()
        a, b = perm_coeffs_fast(4)
        for doc, text in texts.items():
            toks = tokenize_query(text)
            th = [md5_lower64(t) % MERSENNE_31 for t in toks]
            if len(th) >= 3:
                windows = [th[i : i + 3] for i in range(len(th) - 2)]
            else:
                windows = [th]
            xs = []
            for w in windows:
                acc = w[0]
                for t in w[1:]:
                    acc = (acc * HORNER_BASE + t) % MERSENNE_31
                xs.append(acc)
            for p in range(4):
                want = min((int(a[p]) * x + int(b[p])) % MERSENNE_31 for x in xs)
                row = got[(got.doc_id == doc) & (got.perm_id == p)]
                assert int(row["minhash"].iloc[0]) == want, (doc, p)

    def test_degenerate_bucket_capped(self, ray_session):
        """10k identical docs collide into one LSH bucket: pair emission must
        stay O(n), not O(n²)."""
        import ray.data as rd

        from code_indexer_ray.dedup.minhash import candidate_pairs

        n = 10_000
        bands = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "band_id": pa.array(np.zeros(n, dtype=np.int64)),
                "band_hash": pa.array(np.full(n, 777, dtype=np.int64)),
            }
        )
        pairs = candidate_pairs(rd.from_arrow(bands)).to_pandas()
        assert len(pairs) == n - 1  # connectivity chain, not C(n,2) ≈ 5·10⁷
        # chain connects the whole component
        assert set(pairs["doc_a"]) == set(range(n - 1))
        assert set(pairs["doc_b"]) == set(range(1, n))


class TestFuzzySortedWalk:
    def test_equivalent_to_dense_dp(self):
        """The prefix-pruned sorted-dictionary walk must return EXACTLY the
        dense vectorized DP's matches (incl. transposition cost 1)."""
        import itertools

        from code_indexer_ray.query.expand import expand_fuzzy, expand_fuzzy_sorted

        vocab = sorted(
            set("".join(p) for p in itertools.product("abcde", repeat=4))
            | {"", "a", "ab", "abc", "abcdef", "hello", "help", "hxllo", "ehllo", "hlelo"}
        )
        V = np.array(vocab, dtype=object)
        for word in ["abcd", "hello", "a", "", "zzzz", "hlelo", "abcde"]:
            for d in [0, 1, 2, 3]:
                assert sorted(expand_fuzzy(V, word, d)) == sorted(
                    expand_fuzzy_sorted(V, word, d)
                ), (word, d)

    def test_matcher_routes_large_sorted_vocab(self, monkeypatch):
        import code_indexer_ray.query.expand as ex

        monkeypatch.setattr(ex, "FUZZY_SORTED_WALK_MIN_VOCAB", {1: 4, 2: 4, 3: 4})
        m = ex.VocabMatcher(sorted(["alpha", "alphb", "beta", "bets", "gamma"]))
        assert sorted(m.fuzzy("alpha", 1)) == ["alpha", "alphb"]
        assert m._mat_built is False  # walk path — no char matrix materialized


class TestRollingHash:
    def test_deterministic_and_orders_sensitive(self):
        from code_indexer_ray.text.stats import rolling_hash_fingerprint

        a = rolling_hash_fingerprint(pa.array(["one two three", "three two one", "one two three", ""]))
        b = rolling_hash_fingerprint(pa.array(["one two three", "three two one", "one two three", ""]))
        assert a.tolist() == b.tolist()
        assert a[0] == a[2]          # same token stream → same fingerprint
        assert a[0] != a[1]          # order-sensitive (unlike the set fingerprint)
        assert a[3] == 0


class TestSessionize:
    def _ds(self, rows):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows], pa.int64()),
                    "ts": pa.array(
                        [np.datetime64(r[1], "us") for r in rows], pa.timestamp("us")
                    ),
                    "value": pa.array([float(r[2]) for r in rows]),
                    "event_id": pa.array(list(range(len(rows))), pa.int64()),
                }
            )
        )

    def test_gap_boundary_and_numbering(self, ray_session):
        from code_indexer_ray.pipelines.ops import sessionize

        rows = [
            # user 1: 0s, +1800s (== gap, SAME session), +1800+1 (new session)
            (1, "2024-01-01T00:00:00", 1.0),
            (1, "2024-01-01T00:30:00", 2.0),
            (1, "2024-01-01T01:00:01", 4.0),
            # user 2: single event
            (2, "2024-01-01T12:00:00", 8.0),
        ]
        out = (
            sessionize(self._ds(rows), "ts", "user_id", "value", "event_id", gap_secs=1800)
            .to_pandas()
            .sort_values(["user_id", "session_id"])
            .reset_index(drop=True)
        )
        assert out.user_id.tolist() == [1, 1, 2]
        assert out.session_id.tolist() == [0, 1, 0]
        assert out.n_events.tolist() == [2, 1, 1]
        assert out.sum_value.tolist() == [3.0, 4.0, 8.0]
        assert str(out.session_end[0]) == "2024-01-01 00:30:00"


class TestAsofJoin:
    def test_nulls_ties_and_lastness(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import asof_join_last

        left = rd.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([1, 1, 2, 3], pa.int64()),
                    "ts": pa.array(
                        [
                            np.datetime64("2024-01-05T00:00:00", "us"),
                            np.datetime64("2024-01-01T00:00:00", "us"),
                            np.datetime64("2024-01-05T00:00:00", "us"),
                            np.datetime64("2024-01-05T00:00:00", "us"),
                        ],
                        pa.timestamp("us"),
                    ),
                    "event_id": pa.array([10, 11, 12, 13], pa.int64()),
                }
            )
        )
        right = rd.from_arrow(
            pa.table(
                {
                    "cust": pa.array([1, 1, 1, 2], pa.int64()),
                    "odate": pa.array(
                        [
                            np.datetime64("2024-01-02T00:00:00", "us"),
                            np.datetime64("2024-01-03T00:00:00", "us"),
                            np.datetime64("2024-01-03T00:00:00", "us"),  # tie
                            np.datetime64("2024-01-07T00:00:00", "us"),  # after
                        ],
                        pa.timestamp("us"),
                    ),
                    "okey": pa.array([100, 101, 102, 200], pa.int64()),
                }
            )
        )
        out = (
            asof_join_last(
                left,
                right,
                key="user_id",
                right_key="cust",
                left_ts="ts",
                right_ts="odate",
                left_cols=["event_id"],
                right_cols=["okey", "odate"],
                right_tiebreak="okey",
            )
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert out.event_id.tolist() == [10, 11, 12, 13]
        # event 10: last order ≤ Jan5 is the Jan3 tie → max okey 102
        # event 11: no order ≤ Jan1 → null; event 12: order is after → null
        # event 13: user 3 has no orders at all → null
        assert out.okey.tolist()[0] == 102
        assert out.okey.isna().tolist() == [False, True, True, True]


class TestRangeJoin:
    def test_inclusive_bounds_and_bucket_crossing(self, ray_session):
        import ray.data as rd

        from code_indexer_ray.pipelines.ops import range_join_window

        W = 3_600_000_000  # 1h window span == bucket width
        base = np.datetime64("2024-01-01T00:00:00", "us")

        def ts(sec):
            return base + np.timedelta64(int(sec * 1e6), "us")

        left = rd.from_arrow(pa.table({
            "k": pa.array([1, 1], pa.int64()),
            # second left sits just after a bucket boundary: its matches
            # live mostly in the PREVIOUS bucket
            "lt": pa.array([ts(0), ts(3601)], pa.timestamp("us")),
            "lid": pa.array([0, 1], pa.int64()),
        }))
        right = rd.from_arrow(pa.table({
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "rt": pa.array([ts(-3600), ts(-3601), ts(3600), ts(100)], pa.timestamp("us")),
            "rid": pa.array([10, 11, 12, 13], pa.int64()),
        }))
        out = range_join_window(
            left, right, key="k", left_ts="lt", right_ts="rt",
            before_us=W, left_cols=["lid"], right_cols=["rid"],
        ).to_pandas().sort_values(["lid", "rid"]).reset_index(drop=True)
        pairs = set(zip(out.lid, out.rid))
        # left 0 at t=0, window [-3600s, 0]: rid 10 (boundary INCLUSIVE),
        # rid 13 is at +100 → out; rid 11 at -3601 → out
        # left 1 at t=3601, window [1s, 3601s]: rid 12 (3600, prev bucket
        # via replication), rid 13 (100)
        assert pairs == {(0, 10), (1, 12), (1, 13)}


class TestANNEmptyCorpus:
    """ADVICE r2: an all-empty corpus (e.g. a label filter matching nothing)
    must yield the FINAL output schema, not the map-stage schema."""

    def _empty_ds(self):
        import ray.data as rd

        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(50), type=pa.int64()),
                "embedding": pa.array(
                    list(np.random.default_rng(0).standard_normal((50, 8))),
                    type=pa.list_(pa.float64()),
                ),
                "label": pa.array(["a"] * 50),
            }
        )
        ds = rd.from_arrow(tbl).repartition(4)
        return ds.filter(lambda r: r["label"] == "nope")

    def test_topk_empty_schema(self, ray_session):
        from code_indexer_ray.ann.brute import ann_cosine_topk

        q = np.zeros((1, 8)) + 1.0
        out = ann_cosine_topk(self._empty_ds(), q, np.array([0]), k=3)
        assert out.num_rows == 0
        assert out.column_names == ["query_id", "rank", "vec_id", "cos"]

    def test_range_empty_schema(self, ray_session):
        from code_indexer_ray.ann.brute import cosine_range

        q = np.zeros((1, 8)) + 1.0
        out = cosine_range(self._empty_ds(), q, np.array([0]), tau=0.5)
        assert out.num_rows == 0
        assert out.column_names == ["query_id", "vec_id", "cos"]
