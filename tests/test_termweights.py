"""TF-IDF keywords / unigram-LM bits vs brute-force references."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa

from code_indexer_ray.text.analysis import tokenize_query
from code_indexer_ray.text.termweights import (
    corpus_term_counts,
    tfidf_top_terms,
    unigram_bits,
)


def _ds(docs: dict[int, str], parts: int = 4):
    import ray.data as rd

    tbl = pa.table(
        {"doc_id": pa.array(list(docs), pa.int64()), "text": pa.array(list(docs.values()))}
    )
    return rd.from_arrow(tbl).repartition(parts)


def _collect(res) -> pa.Table:
    import ray

    tbls = [t for t in ray.get(res.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls) if tbls else None


def _mkdocs(n: int = 60, seed: int = 5) -> dict[int, str]:
    rng = np.random.RandomState(seed)
    vocab = [f"tok{i}" for i in range(25)]
    p = rng.dirichlet(np.ones(25) * 0.3)
    return {
        d: " ".join(rng.choice(vocab, size=rng.randint(1, 30), p=p)) for d in range(n)
    }


def test_corpus_term_counts(ray_session):
    docs = _mkdocs()
    stats = corpus_term_counts(_ds(docs))
    cf = Counter()
    df = Counter()
    for t in docs.values():
        toks = tokenize_query(t)
        cf.update(toks)
        df.update(set(toks))
    got_cf = dict(zip(stats["term"].to_pylist(), stats["cf"].to_pylist()))
    got_df = dict(zip(stats["term"].to_pylist(), stats["df"].to_pylist()))
    assert got_cf == dict(cf)
    assert got_df == dict(df)


def test_tfidf_matches_brute(ray_session):
    docs = _mkdocs()
    ds = _ds(docs)
    stats = corpus_term_counts(ds)
    got = _collect(tfidf_top_terms(ds, stats, len(docs), k=3))
    rows = {
        (d, r): (t, s)
        for d, r, t, s in zip(
            got["doc_id"].to_pylist(), got["rank"].to_pylist(),
            got["term"].to_pylist(), got["score_r"].to_pylist(),
        )
    }
    n = len(docs)
    df = Counter()
    for t in docs.values():
        df.update(set(tokenize_query(t)))
    for d, text in docs.items():
        tf = Counter(tokenize_query(text))
        scored = sorted(
            ((term, c * math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))) for term, c in tf.items()),
            key=lambda x: (-round(x[1], 9), x[0]),
        )[:3]
        for r, (term, s) in enumerate(scored, 1):
            gt, gs = rows[(d, r)]
            assert gt == term and abs(gs - s) < 1e-3, (d, r, term, gt)


def test_unigram_bits_with_oov_floor(ray_session):
    docs = _mkdocs(40, seed=9)
    ds = _ds(docs)
    stats = corpus_term_counts(ds)
    total = sum(stats["cf"].to_pylist())
    # vocab_k=5 forces most tokens through the OOV count-1 floor
    got = _collect(unigram_bits(ds, stats, total, vocab_k=5))
    gm = {
        d: (nt, b)
        for d, nt, b in zip(
            got["doc_id"].to_pylist(), got["n_tokens"].to_pylist(), got["bits_r"].to_pylist()
        )
    }
    cf = Counter()
    for t in docs.values():
        cf.update(tokenize_query(t))
    vocab = dict(sorted(cf.items(), key=lambda x: (-x[1], x[0]))[:5])
    for d, text in docs.items():
        toks = tokenize_query(text)
        bits = [-math.log2(vocab.get(t, 1) / total) for t in toks]
        exp = sum(bits) / len(bits) if bits else 0.0
        nt, b = gm[d]
        assert nt == len(toks)
        assert abs(b - exp) < 1e-3


def test_empty_doc(ray_session):
    docs = {0: "", 1: "a a a b"}
    ds = _ds(docs, parts=1)
    stats = corpus_term_counts(ds)
    got = _collect(unigram_bits(ds, stats, sum(stats["cf"].to_pylist())))
    gm = dict(zip(got["doc_id"].to_pylist(), got["bits_r"].to_pylist()))
    assert gm[0] == 0.0 and gm[1] > 0.0


def test_lmdirichlet_same_matches_different_ranking(ray_session):
    """search_lm is a second Similarity over the same index: the AND match
    set equals BM25's limit=0 match set; scores are the Dirichlet QL form
    (negative, higher = better) and strictly order the same candidates."""
    from code_indexer_ray.pipelines.driver_api import searcher_for

    s = searcher_for("/root/testdata/sf0.01")
    lm = s.search_lm("spark merge", limit=0)
    bm = s.search("spark merge", limit=0, snippet_lines=0)
    assert {r["doc_id"] for r in lm} == {r["doc_id"] for r in bm}
    assert all(r["score"] < 0 for r in lm)  # ln of a probability-like ratio
    scores = [round(r["score"], 9) for r in lm]
    assert scores == sorted(scores, reverse=True)


def test_lmdirichlet_remote_matches_local(ray_session):
    """Actor-mode fanout (stats_of + search_lm on the shard actor) returns
    the same ranking as the in-process path."""
    from code_indexer_ray.pipelines.driver_api import _corpus_dir, searcher_for
    import os

    from code_indexer_ray.query.engine import IndexSearcher

    searcher_for("/root/testdata/sf0.01")  # ensure the index exists
    idx = os.path.join(_corpus_dir("/root/testdata/sf0.01"), "index")
    local = IndexSearcher(idx, lang_col="lang", url_col="url")
    remote = IndexSearcher(idx, lang_col="lang", url_col="url", remote=True)
    a = [(r["doc_id"], round(r["score"], 9)) for r in local.search_lm("spark merge", limit=10)]
    b = [(r["doc_id"], round(r["score"], 9)) for r in remote.search_lm("spark merge", limit=10)]
    assert a == b and len(a) == 10
