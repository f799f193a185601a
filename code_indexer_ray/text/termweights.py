"""Corpus-weighted per-document term operators: TF-IDF keywords and a
unigram-LM quality score.

Two classic pipeline stages built on the same two-pass shape — ONE small
global term-statistics aggregate, broadcast once, then a shuffle-free
per-document scoring pass:

- :func:`tfidf_top_terms` — per-doc top-k keywords by tf·idf (Lucene
  MoreLikeThis term-selection math, same idf as the BM25 engine so scores
  line up with the query side).  Keyword extraction / doc fingerprinting.
- :func:`unigram_bits` — per-doc bits-per-token under a corpus unigram LM
  (the CCNet / Wenzek et al. 2020 LM-quality-filter pattern with the KenLM
  model replaced by an exact unigram model): documents whose token stream is
  "surprising" under the corpus distribution score high.  The LM vocabulary
  is pruned to the top ``vocab_k`` terms by collection frequency
  (count desc, term asc — deterministic), OOV tokens get the count-1 floor;
  that bounds the broadcast at vocab_k entries no matter the corpus size,
  exactly how a real shipped LM is bounded.

Scale notes: pass 1 is the engine's existing partial-aggregate term-stats
shape (map-side combine → one small groupby).  The broadcast is
``ray.put`` once / read per task.  Scoring is vectorized: dictionary-encode
the batch's tokens, hash-join the UNIQUE terms against the broadcast table,
then gather — no per-token Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..query.bm25 import idf as bm25_idf
from .analysis import tokenize_flat

TFIDF_K = 5
VOCAB_K = 50_000


def corpus_term_counts(ds):
    """(term, cf, df) global term statistics + (n_docs, total_tokens):
    map-side partial counts, one small groupby."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks, rows = tokenize_flat(batch["text"])
        if len(rows) == 0:
            e = pa.array([], pa.large_string())
            z = pa.array([], pa.int64())
            return pa.table({"term": e, "cf": z, "df": z})
        import pandas as pd

        dic = pc.dictionary_encode(toks)
        codes = dic.indices.to_numpy(zero_copy_only=False)
        # cf: occurrences; df: distinct docs containing the term (this batch)
        df_ = pd.DataFrame({"c": codes, "r": rows})
        cf = np.bincount(codes, minlength=len(dic.dictionary))
        dfc = df_.drop_duplicates().groupby("c").size()
        dfv = np.zeros(len(dic.dictionary), np.int64)
        dfv[dfc.index.to_numpy()] = dfc.to_numpy()
        return pa.table(
            {
                "term": dic.dictionary,
                "cf": pa.array(cf.astype(np.int64)),
                "df": pa.array(dfv),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("cf", alias_name="cf"), Sum("df", alias_name="df"))
    )
    tbls = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pa.table(
            {"term": pa.array([], pa.string()), "cf": pa.array([], pa.int64()),
             "df": pa.array([], pa.int64())}
        )
    return pa.concat_tables(tbls).combine_chunks()


def _doc_count_error() -> None:  # pragma: no cover
    raise ValueError("stats pass saw no documents")


def tfidf_top_terms(ds, stats: pa.Table, n_docs: int, *, k: int = TFIDF_K):
    """Per-doc top-k terms by tf·idf (BM25 idf), ties → term asc.

    ``stats`` is the (term, cf, df) table from :func:`corpus_term_counts`;
    only (term → df) is broadcast.  Output: (doc_id, rank, term, score_r).
    """
    import ray

    order = pc.sort_indices(stats, sort_keys=[("term", "ascending")])
    sorted_stats = stats.take(order)
    terms_ref = ray.put(
        (
            np.asarray(sorted_stats["term"].to_pylist(), dtype=object),
            sorted_stats["df"].to_numpy(zero_copy_only=False).astype(np.int64),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        terms, dfv = ray.get(terms_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, rows = tokenize_flat(batch["text"])
        out_doc, out_rank, out_term, out_score = [], [], [], []
        if len(rows):
            dic = pc.dictionary_encode(toks)
            codes = dic.indices.to_numpy(zero_copy_only=False)
            uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            pos = np.searchsorted(terms, uniq)
            pos[pos == len(terms)] = 0
            assert (terms[pos] == uniq).all(), "batch term missing from stats"
            u_idf = bm25_idf(dfv[pos], n_docs)
            # tf per (row, code): sort + run-length
            o = np.lexsort((codes, rows))
            r, c = rows[o], codes[o]
            first = np.r_[True, (r[1:] != r[:-1]) | (c[1:] != c[:-1])]
            starts = np.flatnonzero(first)
            tf = np.diff(np.r_[starts, len(r)])
            rr, cc = r[first], c[first]
            sc = tf * u_idf[cc]
            # per row: top-k by (-score, term asc)
            names = uniq[cc]
            ord2 = np.lexsort((names, -np.round(sc, 9), rr))
            rr2 = rr[ord2]
            rank = np.arange(len(rr2)) - np.searchsorted(rr2, rr2, side="left") + 1
            keep = rank <= k
            out_doc = ids[rr2[keep]]
            out_rank = rank[keep]
            out_term = names[ord2][keep]
            out_score = np.round(sc[ord2][keep], 4)
        return pa.table(
            {
                "doc_id": pa.array(np.asarray(out_doc, np.int64)),
                "rank": pa.array(np.asarray(out_rank, np.int64)),
                "term": pa.array(list(out_term), pa.string()),
                "score_r": pa.array(np.asarray(out_score, np.float64)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def unigram_bits(ds, stats: pa.Table, total_tokens: int, *, vocab_k: int = VOCAB_K):
    """Per-doc ``(doc_id, n_tokens, bits_r)``: mean −log2 p(token) under the
    corpus unigram LM with top-``vocab_k`` vocabulary (count desc, term asc)
    and count-1 OOV floor.  ``bits_r`` rounds to 4 dp; empty docs → 0.0."""
    import ray

    order = pc.sort_indices(
        stats.append_column("neg_cf", pc.multiply(stats["cf"], pa.scalar(-1))),
        sort_keys=[("neg_cf", "ascending"), ("term", "ascending")],
    )
    kept = stats.take(order[: min(vocab_k, stats.num_rows)])
    ts = pc.sort_indices(kept, sort_keys=[("term", "ascending")])
    kept = kept.take(ts)
    lm_ref = ray.put(
        (
            np.asarray(kept["term"].to_pylist(), dtype=object),
            kept["cf"].to_numpy(zero_copy_only=False).astype(np.int64),
            int(total_tokens),
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        terms, cfv, total = ray.get(lm_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks, rows = tokenize_flat(batch["text"])
        n = batch.num_rows
        n_tok = np.zeros(n, np.int64)
        bits_sum = np.zeros(n, np.float64)
        if len(rows):
            np.add.at(n_tok, rows, 1)
            dic = pc.dictionary_encode(toks)
            codes = dic.indices.to_numpy(zero_copy_only=False)
            uniq = np.asarray(dic.dictionary.to_pylist(), dtype=object)
            cnt = np.ones(len(uniq), np.float64)
            if len(terms):
                pos = np.searchsorted(terms, uniq)
                pos[pos == len(terms)] = 0
                hit = terms[pos] == uniq
                cnt[hit] = cfv[pos[hit]]
            u_bits = -np.log2(cnt / total)
            np.add.at(bits_sum, rows, u_bits[codes])
        bits = np.where(n_tok > 0, bits_sum / np.maximum(n_tok, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "n_tokens": pa.array(n_tok),
                "bits_r": pa.array(np.round(bits, 4)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def sql_tfidf_top_terms(k: int = TFIDF_K) -> str:
    from .analysis import sql_tokens_cte

    return (
        f"WITH toks AS ({sql_tokens_cte()}),\n"
        "stats AS (SELECT (SELECT count(*) FROM documents)::DOUBLE AS n),\n"
        "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc_id, term),\n"
        "df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),\n"
        "sc AS (SELECT tf.doc_id, tf.term,\n"
        "  tf.tf * ln(1.0 + (s.n - df.df + 0.5) / (df.df + 0.5)) AS score\n"
        "  FROM tf JOIN df USING (term), stats s),\n"
        "rk AS (SELECT doc_id, term, score, row_number() OVER (\n"
        "  PARTITION BY doc_id ORDER BY round(score, 9) DESC, term) AS rank FROM sc)\n"
        f"SELECT doc_id, rank::BIGINT AS rank, term, round(score, 4) AS score_r\n"
        f"FROM rk WHERE rank <= {k}"
    )


def sql_unigram_bits(vocab_k: int = VOCAB_K) -> str:
    from .analysis import sql_tokens_cte

    return (
        f"WITH toks AS ({sql_tokens_cte()}),\n"
        "cf AS (SELECT term, count(*)::BIGINT AS cf FROM toks GROUP BY term),\n"
        "total AS (SELECT sum(cf)::DOUBLE AS t FROM cf),\n"
        "vocab AS (SELECT term, cf FROM (SELECT term, cf, row_number() OVER (\n"
        f"  ORDER BY cf DESC, term) AS rk FROM cf) WHERE rk <= {vocab_k}),\n"
        "tb AS (SELECT tk.doc_id, -log2(coalesce(v.cf, 1) / t.t) AS bits\n"
        "  FROM toks tk LEFT JOIN vocab v USING (term), total t),\n"
        "agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, avg(bits) AS b\n"
        "  FROM tb GROUP BY doc_id)\n"
        "SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,\n"
        "  round(coalesce(a.b, 0.0), 4) AS bits_r\n"
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )
