"""Bigram collocation extraction by pointwise mutual information.

The classic collocation pipeline (Church & Hanks 1990 association-ratio
shape): count adjacent token pairs over the corpus, compare each pair's
joint probability against independence, keep the top-k most associated
pairs above a count floor.

    pmi(a,b) = ln( (c_ab / T_big) / ((c_a / T_uni) * (c_b / T_uni)) )

Scale shape (no corpus-sized state anywhere):
- ONE fused tokenize pass emits per-batch PARTIAL counts of unigrams and
  bigrams (tagged rows, combined inside the batch) — the shuffle moves
  O(batches × batch-vocab), not tokens;
- one ``groupby(a, b)`` finalizes counts;
- unigram counts attach to the (count-floor-filtered) bigrams via TWO
  hash-bucketed shuffle equi-joins on an FNV-64 key (string equality
  re-checked inside the bucket, so 64-bit collisions cannot corrupt the
  result) — the dictionary is never broadcast or driver-resident;
- final ranking is a per-block top-k + tiny driver merge.

Determinism: ties rank by (round(pmi, 9) desc, a asc, b asc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..index.build import _hash64_batch
from .analysis import tokenize_flat


def _partial_counts(batch: pa.Table, text_col: str) -> pa.Table:
    toks, parents = tokenize_flat(batch[text_col])
    n = len(toks)
    if n == 0:
        return pa.table(
            {"a": pa.array([], type=pa.string()),
             "b": pa.array([], type=pa.string()),
             "n": pa.array([], type=pa.int64())}
        )
    uni = pa.table(
        {"a": toks, "b": pa.nulls(n, type=pa.string()).fill_null(""),
         "n": pa.array(np.ones(n, dtype=np.int64))}
    )
    adj = parents[1:] == parents[:-1]
    big = pa.table(
        {
            "a": toks.slice(0, n - 1).filter(pa.array(adj)),
            "b": toks.slice(1, n - 1).filter(pa.array(adj)),
            "n": pa.array(np.ones(int(adj.sum()), dtype=np.int64)),
        }
    )
    t = pa.concat_tables([uni, big])
    agg = t.group_by(["a", "b"]).aggregate([("n", "sum")])
    return agg.rename_columns(["a", "b", "n"])


def _with_hash(col: str, alias: str):
    def fn(batch: pa.Table) -> pa.Table:
        h = _hash64_batch(batch[col].combine_chunks() if isinstance(batch[col], pa.ChunkedArray) else batch[col])
        return batch.append_column(alias, pa.array(h.view(np.int64)))

    return fn


def bigram_pmi_topk(ds, text_col: str = "text", min_count: int = 5, k: int = 20) -> pa.Table:
    """Top-k adjacent-bigram collocations by PMI (count floor ``min_count``).

    Returns (a, b, n_ab, rank, pmi_r) with rank pinned by
    (round(pmi, 9) desc, a, b).
    """
    from ray.data.aggregate import Sum

    from ..pipelines.ops import shuffle_equi_join

    counts = (
        ds.map_batches(lambda b: _partial_counts(b, text_col), batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("n", alias_name="n"))
    )
    counts = counts.materialize()  # reused three times below (totals, B, U)

    # totals: two tiny rows — per-batch partial sums, driver folds
    import ray

    tot_parts = counts.map_batches(
        lambda t: pa.table(
            {
                "is_big": pa.array([False, True]),
                "n": pa.array(
                    [
                        int(pc.sum(t.filter(pc.equal(t["b"], "")).column("n")).as_py() or 0),
                        int(pc.sum(t.filter(pc.not_equal(t["b"], "")).column("n")).as_py() or 0),
                    ],
                    type=pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    tot = pa.concat_tables([x for x in ray.get(tot_parts.to_arrow_refs()) if x.num_rows]).to_pandas()
    t_uni = float(tot.loc[~tot["is_big"], "n"].sum())
    t_big = float(tot.loc[tot["is_big"], "n"].sum())
    if t_big == 0:
        return pa.table(
            {"a": pa.array([], type=pa.string()), "b": pa.array([], type=pa.string()),
             "n_ab": pa.array([], type=pa.int64()), "rank": pa.array([], type=pa.int64()),
             "pmi_r": pa.array([], type=pa.float64())}
        )

    def keep_bigrams(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.not_equal(t["b"], ""), pc.greater_equal(t["n"], min_count))
        return t.filter(mask)

    def keep_unigrams(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["b"], ""))
        return pa.table({"term": t["a"], "c": t["n"]})

    bigrams = counts.map_batches(keep_bigrams, batch_format="pyarrow").map_batches(
        _with_hash("a", "_ha"), batch_format="pyarrow"
    )
    unigrams = counts.map_batches(keep_unigrams, batch_format="pyarrow").map_batches(
        _with_hash("term", "_ht"), batch_format="pyarrow"
    )
    unigrams = unigrams.materialize()  # joined twice

    def eq_filter(lcol: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t[lcol], t["term"]))

        return fn

    j1 = shuffle_equi_join(
        bigrams, unigrams, key="_ha", right_key="_ht",
        left_cols=["a", "b", "n"], right_cols=["term", "c"],
    ).map_batches(eq_filter("a"), batch_format="pyarrow").map_batches(
        lambda t: pa.table(
            {"a": t["a"], "b": t["b"], "n": t["n"], "c_a": t["c"]}
        ),
        batch_format="pyarrow",
    ).map_batches(_with_hash("b", "_hb"), batch_format="pyarrow")

    j2 = shuffle_equi_join(
        j1, unigrams, key="_hb", right_key="_ht",
        left_cols=["a", "b", "n", "c_a"], right_cols=["term", "c"],
    ).map_batches(eq_filter("b"), batch_format="pyarrow")

    def score(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        ca = t["c_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        cb = t["c"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((n / t_big) / ((ca / t_uni) * (cb / t_uni)))
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        tb = pa.array([f"{x} {y}" for x, y in zip(a, b)])  # terms contain no spaces
        return pa.table(
            {"a": t["a"], "b": t["b"], "n_ab": t["n"].cast(pa.int64()),
             "pmi9": pa.array(np.round(pmi, 9)), "_tb": tb}
        )

    from ..pipelines.ops import local_then_global_topk

    top = local_then_global_topk(
        j2.map_batches(score, batch_format="pyarrow"), by="pmi9", k=k, tiebreak="_tb"
    )
    df = top.to_pandas()
    df = df.sort_values(["pmi9", "_tb"], ascending=[False, True], kind="mergesort").head(k)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    df["pmi_r"] = df["pmi9"].round(4)
    out = df[["a", "b", "n_ab", "rank", "pmi_r"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
