"""Benchmark decontamination: flag training docs overlapping an eval set.

The standard LLM-corpus hygiene step (GPT-3 appendix C / Llama: remove any
training document sharing a long token n-gram with a benchmark/eval
document).  Two passes, no shuffle:

1. **Benchmark gram set** — the benchmark split (here: the deterministic
   ``doc_id % bench_mod == 0`` slice of the corpus, standing in for an
   external eval set) is streamed once; its DISTINCT n-gram hashes are
   unioned on the driver.  An eval set is small by definition (MBs), so the
   set is broadcast-sized: ``ray.put`` once, read per task — never re-shipped
   per batch.
2. **Corpus scan** — one ``map_batches`` pass over the full corpus counts,
   per document, its distinct grams and how many fall in the broadcast set
   (sorted-array ``searchsorted`` membership — no Python loop).

Gram hashing reuses the exact-twin md5-Horner kernel
(:func:`..text.repetition.token_ngram_hashes`), so the DuckDB oracle is
bit-identical including the ≈2⁻³¹ collision case.

Scale notes: pass 1 is a filtered streaming aggregate (per-batch uniques →
one driver union); pass 2 is embarrassingly parallel.  If the eval set ever
outgrew a broadcast (it should not — it is an eval set), the fallback is a
coarse hash-partition semi-join like ``span_dedup_stats``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .repetition import token_ngram_hashes

DECONTAM_N = 13          # GPT-3-style 13-token overlap window
BENCH_MOD = 83           # synthetic benchmark split: doc_id % 83 == 0


def benchmark_gram_set(ds, *, n: int = DECONTAM_N, bench_mod: int = BENCH_MOD) -> np.ndarray:
    """Sorted uint64 array of the benchmark split's distinct gram hashes."""
    import ray

    def grams(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        keep = (ids % bench_mod) == 0
        sub = batch.filter(pa.array(keep))
        h, _, _ = token_ngram_hashes(sub["text"], n)
        return pa.table({"x": pa.array(np.unique(h).astype(np.int64))})

    parts = ray.get(ds.map_batches(grams, batch_format="pyarrow").to_arrow_refs())
    arrs = [t["x"].to_numpy(zero_copy_only=False) for t in parts if t.num_rows]
    if not arrs:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(arrs)).astype(np.uint64)


def decontam_flags(
    ds,
    bench_ref,
    *,
    n: int = DECONTAM_N,
    bench_mod: int = BENCH_MOD,
):
    """Per non-benchmark document: ``(doc_id, n_grams, n_hit,
    is_contaminated)`` where ``n_hit`` counts the doc's DISTINCT n-grams that
    appear anywhere in the broadcast benchmark gram set.

    ``bench_ref`` is a ``ray.put`` object ref of the sorted hash array from
    :func:`benchmark_gram_set`.
    """
    import ray

    def scan(batch: pa.Table) -> pa.Table:
        bench = ray.get(bench_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids % bench_mod) != 0
        sub = batch.filter(pa.array(keep))
        sids = ids[keep]
        h, rows, _ = token_ngram_hashes(sub["text"], n)
        n_rows = len(sids)
        n_grams = np.zeros(n_rows, np.int64)
        n_hit = np.zeros(n_rows, np.int64)
        if len(h):
            # distinct (row, gram) before counting
            order = np.lexsort((h, rows))
            hs, rs = h[order], rows[order]
            first = np.r_[True, (rs[1:] != rs[:-1]) | (hs[1:] != hs[:-1])]
            hs, rs = hs[first], rs[first]
            np.add.at(n_grams, rs, 1)
            if len(bench):
                pos = np.searchsorted(bench, hs)
                pos[pos == len(bench)] = 0
                hit = bench[pos] == hs
                np.add.at(n_hit, rs[hit], 1)
        return pa.table(
            {
                "doc_id": pa.array(sids),
                "n_grams": pa.array(n_grams),
                "n_hit": pa.array(n_hit),
                "is_contaminated": pa.array((n_hit > 0).astype(np.int64)),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow")


def sql_decontam(n: int = DECONTAM_N, bench_mod: int = BENCH_MOD) -> str:
    """Exact DuckDB twin over the ``documents`` view."""
    from .repetition import sql_ngram_hash_cte, sql_token_hash_cte

    return (
        f"WITH {sql_token_hash_cte()},\n"
        f"{sql_ngram_hash_cte(n, 'gN')},\n"
        "gd AS (SELECT DISTINCT doc_id, x FROM gN),\n"
        f"bench AS (SELECT DISTINCT x FROM gd WHERE doc_id % {bench_mod} = 0),\n"
        f"cnt AS (SELECT doc_id, count(*) AS n_grams,\n"
        "  sum(CASE WHEN x IN (SELECT x FROM bench) THEN 1 ELSE 0 END) AS n_hit\n"
        f"  FROM gd WHERE doc_id % {bench_mod} <> 0 GROUP BY doc_id)\n"
        "SELECT d.doc_id, coalesce(c.n_grams, 0)::BIGINT AS n_grams,\n"
        "  coalesce(c.n_hit, 0)::BIGINT AS n_hit,\n"
        "  (coalesce(c.n_hit, 0) > 0)::BIGINT AS is_contaminated\n"
        f"FROM documents d LEFT JOIN cnt c USING (doc_id) WHERE d.doc_id % {bench_mod} <> 0"
    )
