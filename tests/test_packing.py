"""Sequence packing (`text/packing.py`): placement arithmetic vs a brute
serial reference, bucket-boundary correctness, degenerate inputs."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from code_indexer_ray.text.packing import pack_sequences
from code_indexer_ray.text.tokencount import BPE_PATTERN


def _count(s: str) -> int:
    import pyarrow.compute as pc

    # same RE2 engine as the stage (stdlib re lacks \p{L})
    return pc.count_substring_regex(pa.array([s]), pattern=BPE_PATTERN)[0].as_py()


def _brute(texts: dict[int, str], seq_len: int) -> dict[int, tuple]:
    out = {}
    pos = 0
    for did in sorted(texts):
        n = _count(texts[did])
        start = pos
        last = start + max(n - 1, 0)
        out[did] = (n, start, start // seq_len, last // seq_len)
        pos = start + n + 1  # EOS
    return out


@pytest.mark.usefixtures("ray_session")
class TestPacking:
    def _run(self, texts, seq_len, bucket_width=4):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {"doc_id": sorted(texts), "text": [texts[k] for k in sorted(texts)]}
            )
        )
        got = pack_sequences(
            ds, seq_len=seq_len, bucket_width=bucket_width
        ).to_pandas().sort_values("doc_id")
        return {
            int(r.doc_id): (int(r.n_tokens), int(r.start_tok),
                            int(r.bin_first), int(r.bin_last))
            for r in got.itertuples()
        }

    def test_matches_brute_serial(self):
        rng = np.random.default_rng(3)
        texts = {
            i: " ".join(f"w{j}" for j in range(int(rng.integers(0, 40))))
            for i in range(57)
        }
        assert self._run(texts, seq_len=16) == _brute(texts, 16)

    def test_bucket_boundaries_carry_offsets(self):
        # bucket_width=4 → docs 0-3 / 4-7 in different prefix buckets; the
        # cross-bucket offsets must chain exactly
        texts = {i: "a b c" for i in range(8)}
        got = self._run(texts, seq_len=5, bucket_width=4)
        assert got == _brute(texts, 5)
        # starts are 0,4,8,... (3 tokens + 1 EOS each)
        assert [got[i][1] for i in range(8)] == [4 * i for i in range(8)]

    def test_sparse_ids_and_empty_docs(self):
        texts = {0: "", 7: "one two", 100: "", 101: "x " * 30}
        assert self._run(texts, seq_len=8) == _brute(texts, 8)

    def test_long_doc_spans_bins(self):
        texts = {0: "t " * 100, 1: "a"}
        got = self._run(texts, seq_len=16)
        assert got == _brute(texts, 16)
        assert got[0][2] == 0 and got[0][3] == (100 - 1) // 16

    def test_seq_len_validation(self):
        import ray.data as rd

        with pytest.raises(ValueError, match="seq_len"):
            pack_sequences(rd.from_items([{"doc_id": 0, "text": "x"}]), seq_len=0)
