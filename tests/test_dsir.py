"""DSIR importance weights (`text/dsir.py`, Xie et al. 2023): brute parity,
target-likeness ordering, slice semantics."""

from __future__ import annotations

import math

import pyarrow as pa
import pytest

from code_indexer_ray.dedup.minhash import HORNER_BASE, MERSENNE_31, md5_lower64
from code_indexer_ray.text.analysis import tokenize_flat
from code_indexer_ray.text.dsir import SEP, dsir_weights


def _toks(s):
    t, _ = tokenize_flat(pa.array([s]))
    return t.to_pylist()


def _bucket(a, b, B, kernel):
    if kernel == "md5":
        return md5_lower64(a + SEP + b) % B
    # the fast Horner pair hash over 2^31-1 (pure-python reference)
    t1 = md5_lower64(a) % MERSENNE_31
    t2 = md5_lower64(b) % MERSENNE_31
    return ((t1 * HORNER_BASE + t2) % MERSENNE_31) % B


def _brute(texts, slice_mod=10, slice_rem=0, B=64, kernel="fast"):
    ct = [0] * B
    cr = [0] * B
    feats = {}
    for did, txt in texts.items():
        tk = _toks(txt)
        bs = [_bucket(a, b, B, kernel) for a, b in zip(tk, tk[1:])]
        feats[did] = bs
        tgt = did % slice_mod == slice_rem
        for b in bs:
            (ct if tgt else cr)[b] += 1
    nt, nr = sum(ct), sum(cr)
    out = {}
    for did, bs in feats.items():
        if not bs:
            continue
        w = sum(
            (math.log(ct[b] + 1.0) - math.log(nt + B))
            - (math.log(cr[b] + 1.0) - math.log(nr + B))
            for b in bs
        )
        out[did] = (len(bs), round(w, 4))
    return out


@pytest.mark.usefixtures("ray_session")
class TestDSIR:
    def _run(self, texts, **kw):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table({"doc_id": sorted(texts), "text": [texts[k] for k in sorted(texts)]})
        )
        got = dsir_weights(ds, n_buckets=64, **kw).to_pandas()
        return {
            int(r.doc_id): (int(r.n_features), round(float(r.w_r), 4))
            for r in got.itertuples()
        }

    def test_matches_brute_and_orders_target_likeness(self):
        texts = {
            0: "alpha beta gamma alpha beta",       # target slice
            10: "alpha beta gamma delta",           # target slice
            1: "alpha beta gamma alpha",            # target-like raw
            2: "zz yy xx ww vv zz yy",              # raw-only gibberish
            3: "zz yy xx ww",                       # raw-only
        }
        got = self._run(texts)
        assert got == _brute(texts, B=64)
        assert got[1][1] > got[2][1]  # target-like raw outranks raw-only

    def test_no_bigram_docs_excluded(self):
        texts = {0: "alpha beta", 1: "", 2: "one"}
        assert set(self._run(texts)) == {0}

    def test_slice_params(self):
        texts = {i: f"w{i % 4} w{(i + 1) % 4} w{(i + 2) % 4}" for i in range(9)}
        assert self._run(texts, slice_mod=3, slice_rem=2) == _brute(
            texts, slice_mod=3, slice_rem=2, B=64
        )

    def test_md5_legacy_kernel_matches_its_brute(self):
        texts = {
            0: "alpha beta gamma alpha beta",
            10: "alpha beta gamma delta",
            1: "alpha beta gamma alpha",
            2: "zz yy xx ww vv zz yy",
        }
        assert self._run(texts, kernel="md5") == _brute(texts, B=64, kernel="md5")

    def test_bad_kernel_rejected(self):
        import pytest as _pt

        with _pt.raises(ValueError, match="kernel"):
            self._run({0: "a b"}, kernel="sha")
