"""CCNet-style perplexity scoring (`text/perplexity.py`): formula vs a brute
serial bigram model, slice/vocab semantics, degenerate inputs."""

from __future__ import annotations

import math

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from code_indexer_ray.text.perplexity import SEP, ccnet_perplexity
from code_indexer_ray.text.analysis import tokenize_flat


def _toks(s: str) -> list[str]:
    t, _ = tokenize_flat(pa.array([s]))
    return t.to_pylist()


def _brute(texts: dict[int, str], slice_mod=10, slice_rem=0) -> dict[int, tuple]:
    c2: dict = {}
    c1: dict = {}
    for did, txt in texts.items():
        if did % slice_mod != slice_rem:
            continue
        tk = _toks(txt)
        for a, b in zip(tk, tk[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(c1)
    out = {}
    for did, txt in texts.items():
        tk = _toks(txt)
        pairs = list(zip(tk, tk[1:]))
        if not pairs:
            continue
        s = sum(
            math.log(c1.get(a, 0) + V) - math.log(c2.get((a, b), 0) + 1)
            for a, b in pairs
        )
        out[did] = (len(pairs), round(s / len(pairs), 4))
    return out


@pytest.mark.usefixtures("ray_session")
class TestPerplexity:
    def _run(self, texts, **kw):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table({"doc_id": sorted(texts), "text": [texts[k] for k in sorted(texts)]})
        )
        got = ccnet_perplexity(ds, num_partitions=8, **kw).to_pandas()
        return {
            int(r.doc_id): (int(r.n_bigrams), round(float(r.nll_r), 4))
            for r in got.itertuples()
        }

    def test_matches_brute(self):
        texts = {
            0: "the cat sat on the mat",
            1: "the dog sat on the log",
            2: "a completely different sentence here",
            10: "the cat ran over the mat",
            3: "the cat sat on the mat",   # in-distribution → low nll
            7: "zz yy xx ww vv uu",        # out-of-distribution → high nll
        }
        got = self._run(texts)
        assert got == _brute(texts)
        # the in-distribution doc scores LOWER than the gibberish one
        assert got[3][1] < got[7][1]

    def test_empty_and_single_token_docs_excluded(self):
        texts = {0: "alpha beta gamma", 1: "", 2: "single", 10: "alpha beta"}
        got = self._run(texts)
        assert set(got) == {0, 10}

    def test_slice_params(self):
        texts = {i: f"tok{i % 3} tok{(i + 1) % 3} tok{(i + 2) % 3}" for i in range(12)}
        got = self._run(texts, slice_mod=4, slice_rem=1)
        assert got == _brute(texts, slice_mod=4, slice_rem=1)

    def test_power_of_two_guard(self):
        import ray.data as rd

        with pytest.raises(ValueError, match="power of two"):
            ccnet_perplexity(
                rd.from_items([{"doc_id": 0, "text": "a b"}]), num_partitions=100
            )

    def test_md5_kernel_identical_output(self):
        # the bigram key is engine-internal: the legacy per-bigram-md5
        # kernel and the fast unique-token+mix kernel must return the SAME
        # table (equality classes are what the counts see)
        texts = {
            0: "the cat sat on the mat",
            1: "the dog sat on the log",
            10: "the cat ran over the mat",
            7: "zz yy xx ww vv uu",
        }
        assert self._run(texts, kernel="md5") == self._run(texts)

    def test_bad_kernel_rejected(self):
        import ray.data as rd

        with pytest.raises(ValueError, match="kernel"):
            ccnet_perplexity(
                rd.from_items([{"doc_id": 0, "text": "a b"}]), kernel="crc"
            )

    def test_sep_never_in_tokens(self):
        # tokens are alnum runs: the bigram-key separator cannot collide
        assert SEP not in "".join(_toks("ab c1 d_e f-g"))
