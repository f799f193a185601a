"""Char-n-gram dedup kernel: hash/boundary correctness vs a brute-force
reference, signature layout compatibility with the band/pair machinery, and
edit-sensitivity (the property the word-shingle path lacks)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from code_indexer_ray.dedup.chargram import (
    DEFAULT_CHARGRAM,
    chargram_hashes,
    chargram_jaccard_sets,
    chargram_minhash_batch,
)
from code_indexer_ray.dedup.minhash import HORNER_BASE, MERSENNE_31


def _brute_hash(gram: str) -> int:
    acc = 0
    for ch in gram:
        acc = (acc * HORNER_BASE + ord(ch)) % MERSENNE_31
    return acc


def _brute_sets(texts, n=DEFAULT_CHARGRAM):
    return [
        {_brute_hash(t[i : i + n]) for i in range(len(t) - n + 1)} if len(t) >= n else set()
        for t in texts
    ]


class TestChargramHashes:
    def test_matches_brute_force(self):
        texts = ["abcdef", "αβγδεζη", "abc", "", "x" * 4, "漢字テスト五"]
        sets = chargram_jaccard_sets(texts)
        assert sets == _brute_sets(texts)

    def test_no_cross_text_windows(self):
        # each text is 3 chars — no 4-grams anywhere, even though the
        # concatenation is 9 chars long
        h, r = chargram_hashes(["abc", "def", "ghi"])
        assert len(h) == 0

    def test_unique_per_row(self):
        h, r = chargram_hashes(["abababab"])  # repeated grams collapse
        assert len(h) == len(set(h.tolist()))
        assert set(h.tolist()) == _brute_sets(["abababab"])[0]

    def test_rows_sorted_and_aligned(self):
        texts = ["hello world", "goodbye world"]
        h, r = chargram_hashes(texts)
        assert (np.diff(r) >= 0).all()
        got0 = set(h[r == 0].tolist())
        assert got0 == _brute_sets(texts)[0]


class TestChargramMinhash:
    def test_signature_layout(self):
        batch = pa.table({"doc_id": pa.array([5, 9], pa.int64()),
                          "text": pa.array(["abcdefgh", "zz"])})
        sig = chargram_minhash_batch(batch)
        # doc 9 has no 4-grams → omitted; doc 5 has 8 perm rows
        assert sig["doc_id"].to_pylist() == [5] * 8
        assert sig["perm_id"].to_pylist() == list(range(8))
        assert all(0 <= m < MERSENNE_31 for m in sig["minhash"].to_pylist())

    def test_layout_independence(self):
        rows = [("doc one with some shared text here", 1),
                ("doc two with some shared text here", 2),
                ("totally different content string!!", 3)]
        full = pa.table({"doc_id": pa.array([r[1] for r in rows], pa.int64()),
                         "text": pa.array([r[0] for r in rows])})
        one = chargram_minhash_batch(full).to_pandas().sort_values(["doc_id", "perm_id"])
        parts = [
            chargram_minhash_batch(full.slice(i, 1)).to_pandas() for i in range(3)
        ]
        import pandas as pd

        two = pd.concat(parts).sort_values(["doc_id", "perm_id"])
        assert one.reset_index(drop=True).equals(two.reset_index(drop=True))

    def test_edit_sensitivity_vs_identity(self):
        a = "the quick brown fox jumps over the lazy dog " * 5
        b = a.replace("quick", "quack")  # one in-word edit
        c = "completely unrelated content about databases and rays " * 5
        sa, sb, sc = chargram_jaccard_sets([a, b, c])
        jab = len(sa & sb) / len(sa | sb)
        jac = len(sa & sc) / len(sa | sc)
        assert 0.7 < jab < 1.0  # near-dup: high but not identical
        assert jac < 0.2  # unrelated: low
        sa2 = chargram_jaccard_sets([a])[0]
        assert sa == sa2  # identical text → identical set
