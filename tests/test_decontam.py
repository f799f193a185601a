"""Decontamination kernel vs a brute-force token-set reference."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from code_indexer_ray.text.analysis import tokenize_query
from code_indexer_ray.text.decontam import benchmark_gram_set, decontam_flags


def _brute(docs: dict[int, str], n: int, bench_mod: int):
    grams = {
        d: {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        for d, toks in ((d, tokenize_query(t)) for d, t in docs.items())
    }
    bench = set()
    for d, g in grams.items():
        if d % bench_mod == 0:
            bench |= g
    out = {}
    for d, g in grams.items():
        if d % bench_mod == 0:
            continue
        hit = len(g & bench)
        out[d] = (len(g), hit, int(hit > 0))
    return out


def _run(docs: dict[int, str], n: int, bench_mod: int):
    import ray
    import ray.data as rd

    tbl = pa.table(
        {"doc_id": pa.array(list(docs), pa.int64()), "text": pa.array(list(docs.values()))}
    )
    ds = rd.from_arrow(tbl)
    bench = benchmark_gram_set(ds, n=n, bench_mod=bench_mod)
    res = decontam_flags(ds, ray.put(bench), n=n, bench_mod=bench_mod)
    got = pa.concat_tables(
        [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    )
    return {
        int(d): (int(g), int(h), int(c))
        for d, g, h, c in zip(
            got["doc_id"].to_pylist(), got["n_grams"].to_pylist(),
            got["n_hit"].to_pylist(), got["is_contaminated"].to_pylist(),
        )
    }


def test_matches_brute_force(ray_session):
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    docs = {}
    for d in range(40):
        docs[d] = " ".join(rng.choice(vocab, size=rng.randint(2, 25)))
    # plant an exact overlap: doc 0 is benchmark (0 % 5 == 0); doc 7 copies
    # a 6-token window of it
    docs[0] = "alpha beta gamma delta epsilon zeta eta theta"
    docs[7] = "xx yy alpha beta gamma delta epsilon zeta zz"
    expect = _brute(docs, n=4, bench_mod=5)
    got = _run(docs, n=4, bench_mod=5)
    assert got == expect
    assert got[7][2] == 1  # the planted overlap is caught


def test_short_docs_emit_zero_grams(ray_session):
    docs = {0: "a b c d e f g h i j k l m n", 1: "too short", 2: "a b"}
    got = _run(docs, n=13, bench_mod=7)
    assert got[1] == (0, 0, 0)
    assert got[2] == (0, 0, 0)


def test_no_benchmark_docs(ray_session):
    docs = {1: "a b c d e", 2: "a b c d e"}
    got = _run(docs, n=3, bench_mod=97)  # no doc_id % 97 == 0
    assert all(v[1] == 0 and v[2] == 0 for v in got.values())
