"""Domain-level webtext curation operators.

C4-style URL/domain hygiene (Raffel et al. 2020 §2.2 filter by source;
Dodge et al. 2021 "Documenting C4" domain statistics), re-expressed over the
corpus's ``source`` column (the domain analog of this table shape):

- :func:`domain_stats` — per-domain corpus statistics (doc count, chars,
  exact token count, distinct languages).  Map-side partial aggregation: each
  batch contributes ONE row per (source) and one row per distinct
  (source, lang) pair, so the wide groupby moves O(domains × batches) rows,
  never O(docs).
- :func:`blocked_sources` / blocklist filtering — a broadcast anti-join
  (``ops.broadcast_antijoin``): the blocklist ships to the object store once
  and every task filters locally; no shuffle, no per-batch re-serialization.

At 100 TB the domain cardinality (~10⁸) still shuffles fine: partial rows are
fixed-width scalars, and the final groupby groups are single-digit rows per
domain (one per upstream batch that saw it).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..dedup.minhash import MERSENNE_31, md5_lower64
from ..text.analysis import tokenize_flat

BLOCK_MOD = 7  # deterministic synthetic blocklist: md5(source) % 7 == 0


def domain_stats(ds):
    """Per-source ``(source, n_docs, total_chars, total_tokens, n_langs)``.

    One pass: per-batch partials for the sums plus DISTINCT (source, lang)
    pairs for the exact language count; two tiny groupbys on ``source``; the
    per-source results join driver-side (output is domain-cardinality small
    relative to the corpus — it IS the reduction).
    """
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _toks, rows = tokenize_flat(batch["text"])
        nt = (
            np.bincount(rows, minlength=batch.num_rows).astype(np.int64)
            if len(rows)
            else np.zeros(batch.num_rows, np.int64)
        )
        t = pa.table(
            {
                "source": batch["source"],
                "nch": batch["n_chars"].cast(pa.int64()),
                "nt": pa.array(nt),
            }
        )
        agg = t.group_by("source", use_threads=False).aggregate(
            [("nch", "count"), ("nch", "sum"), ("nt", "sum")]
        )
        return pa.table(
            {
                "source": agg["source"],
                "n_docs": agg["nch_count"].cast(pa.int64()),
                "total_chars": agg["nch_sum"],
                "total_tokens": agg["nt_sum"],
            }
        )

    def lang_pairs(batch: pa.Table) -> pa.Table:
        # Arrow group-by with no aggregates = DISTINCT over the key columns
        return batch.select(["source", "lang"]).group_by(
            ["source", "lang"], use_threads=False
        ).aggregate([])

    sums = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("total_chars", alias_name="total_chars"),
            Sum("total_tokens", alias_name="total_tokens"),
        )
    )

    def count_langs(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = pc.count_distinct(g["lang"]).as_py()
        return pa.table({"source": g["source"][:1], "n_langs": pa.array([n], pa.int64())})

    langs = (
        ds.map_batches(lang_pairs, batch_format="pyarrow")
        .groupby("source")
        .map_groups(count_langs, batch_format="pyarrow")
    )

    s_tbl = pa.concat_tables(
        [t for t in ray.get(sums.to_arrow_refs()) if t.num_rows]
    ).sort_by("source")
    l_tbl = pa.concat_tables(
        [t for t in ray.get(langs.to_arrow_refs()) if t.num_rows]
    ).sort_by("source")
    assert s_tbl["source"].to_pylist() == l_tbl["source"].to_pylist()
    return pa.table(
        {
            "source": s_tbl["source"],
            "n_docs": pa.array(s_tbl["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)),
            "total_chars": pa.array(
                s_tbl["total_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "total_tokens": pa.array(
                s_tbl["total_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
            ),
            "n_langs": l_tbl["n_langs"],
        }
    )


def blocked_sources(sources: list[str], block_mod: int = BLOCK_MOD) -> list[str]:
    """Deterministic synthetic blocklist: ``md5(source) % block_mod == 0``
    (stands in for an externally-supplied domain blocklist)."""
    return [s for s in sources if md5_lower64(s) % MERSENNE_31 % block_mod == 0]


def sql_domain_stats() -> str:
    from ..text.analysis import sql_tokens_cte

    return (
        f"WITH toks AS ({sql_tokens_cte()}),\n"
        "tc AS (SELECT doc_id, count(*) AS nt FROM toks GROUP BY doc_id)\n"
        "SELECT d.source, count(*)::BIGINT AS n_docs,\n"
        "  sum(d.n_chars)::BIGINT AS total_chars,\n"
        "  sum(coalesce(tc.nt, 0))::BIGINT AS total_tokens,\n"
        "  count(DISTINCT d.lang)::BIGINT AS n_langs\n"
        "FROM documents d LEFT JOIN tc USING (doc_id) GROUP BY d.source"
    )


def sql_domain_filter(block_mod: int = BLOCK_MOD) -> str:
    M = MERSENNE_31
    return (
        f"SELECT doc_id, source FROM documents\n"
        f"WHERE (md5_number_lower(source) % {M}) % {block_mod} <> 0"
    )
