"""Driver-style correctness gate, run locally: every queries() entry vs its
oracle_sql() twin through DuckDB on sf0.01 — row count, schema, and
order-insensitive value equality (the same comparison the driver makes)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_table(result) -> pa.Table:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return pa.concat_tables(
            [t for t in ray.get(result.to_arrow_refs()) if t.num_rows] or
            ray.get(result.to_arrow_refs())
        )
    if isinstance(result, pd.DataFrame):
        return pa.Table.from_pandas(result, preserve_index=False)
    return result


import ray  # noqa: E402


def _normalize(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def catalogs(ray_session):
    import __ray_entry__ as e

    return e.queries(), e.oracle_sql()


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    df = e.entry()
    assert len(df) > 0
    assert {"query", "doc_id", "score"} <= set(df.columns)


def test_every_query_has_oracle_or_is_flagged(catalogs):
    qs, oracles = catalogs
    missing = set(qs) - set(oracles)
    # approximate by design → rows-only checks (each has a measured recall
    # gate vs the exact ann_cosine result below)
    assert missing == {
        "ann_lsh", "ann_ivf", "ann_store", "ann_pq", "ann_hnsw", "distinct_users_hll",
        "approx_quantiles",
    }


@pytest.mark.parametrize(
    "name",
    [
        "fts_term_stats", "fts_doc_stats", "fts_bm25_single", "fts_bm25_and",
        "fts_bm25_or", "fts_bm25_dnf", "fts_bm25_not", "fts_bm25_should", "fts_bm25_boost",
        "fts_bm25_multifield", "fts_facet_lang", "fts_facet_domain",
        "fts_bm25_page", "fts_search_after", "fts_order_by_field",
        "fts_dismax", "fts_explain", "fts_stats_agg", "fts_collapse_domain",
        "significant_terms", "fts_vocab_range", "fts_mget", "percolate",
        "c4_line_filter", "line_dedup", "fts_complete", "domain_cap",
        "fts_synonyms", "index_stats",
        "fts_more_like_this", "fts_hybrid_rrf", "gopher_repetition", "span_dedup", "fts_phrase", "fts_phrase_slop",
        "fts_bm25_lang", "fts_bm25_exclude_lang", "fts_bm25_source_filter",
        "fts_bm25_limit0", "fts_fuzzy_terms", "fts_bm25_fuzzy",
        "fts_regex_terms", "fts_bm25_regex", "fts_prefix_terms",
        "fts_bm25_prefix", "spell_suggest", "fts_autocorrect", "fts_batch_queries", "fts_multi_repo", "fts_federated_global", "fts_incremental",
        "fts_query_dsl", "fts_lmdirichlet", "fts_near",
        "collocations", "fts_match_positions",
        "fts_chunks", "fts_extract_roundtrip", "fts_extract_html", "lang_map",
        "lang_id", "lang_confusion", "text_readability",
        "dedup_exact",
        "dedup_minhash_sig", "dedup_minhash_bands",
        "dedup_minhash_md5_sig", "dedup_minhash_md5_bands", "dedup_simhash",
        "dedup_near_pairs", "dedup_components", "fts_collapse_neardup", "fts_mmr_rerank", "decontam_flags",
        "domain_stats", "domain_filter", "tfidf_keywords", "unigram_bits",
        "join_orders_customer", "join_lineitem_agg", "revenue_by_nation",
        "q3_shipping", "q10_returns", "q9_profit", "events_interarrival", "events_histogram", "events_dau_mau", "orders_monthly",
        "heavy_hitters",
        "dedup_ngram_jaccard",
        "dedup_embed_cosine",
        "text_quality", "quality_filter", "sample_token_budget", "token_count",
        "embed_text", "semantic_search", "curate_corpus", "training_shards", "curated_search",
        "sample_docs",
        "sample_stratified", "pii_redact", "url_canonical", "url_dedup",
        "ann_cosine", "ann_cosine_filtered", "ann_range", "fts_bm25_wildcard",
        "kmeans_embed",
        "events_funnel", "events_pivot", "events_retention", "top_terms_per_lang",
        "events_keep_latest", "events_window",
        "events_session", "events_hopping", "asof_orders", "range_events",
        "agg_lineitem", "topk_orders", "topk_orders_per_cust", "distinct_users",
        "median_value", "events_cumsum", "percentiles_by_lang", "part_size_percentiles",
        "events_json_agg", "mode_event_type", "events_rolling",
        "docs_rollup", "events_rank", "events_corr",
        "content_grep", "events_zscore", "pagerank", "export_partitioned",
        "antijoin_customers", "mm_decode",
        "mm_frames",
    ],
)
def test_query_matches_oracle(name, catalogs, duck):
    qs, oracles = catalogs
    got = _normalize(_to_table(qs[name](SF)))
    want = _normalize(duck.sql(oracles[name]).arrow())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(float), w.astype(float), atol=1e-9, equal_nan=True), (
                f"{name}.{col} float mismatch"
            )
        else:
            if not g.equals(w):
                diff = (g != w)
                raise AssertionError(
                    f"{name}.{col} mismatch at rows {np.flatnonzero(diff)[:5]}: "
                    f"got {g[diff].head(3).tolist()} want {w[diff].head(3).tolist()}"
                )


def test_ann_lsh_rows_only(catalogs):
    qs, _ = catalogs
    out = _to_table(qs["ann_lsh"](SF))
    assert out.num_rows >= 0
    assert set(out.schema.names) == {"query_id", "rank", "vec_id", "cos"}


@pytest.mark.parametrize(
    "approx_name", ["ann_lsh", "ann_ivf", "ann_store", "ann_pq", "ann_hnsw"]
)
def test_ann_recall_vs_brute(approx_name, catalogs):
    """Measured recall@10 of each approximate ANN config against the exact
    brute-force result on the driver's own embeddings table — converts the
    'no_oracle' rows into quantified approximation guarantees."""
    qs, _ = catalogs
    brute = _to_table(qs["ann_cosine"](SF)).to_pandas()
    approx = _to_table(qs[approx_name](SF)).to_pandas()
    recalls = []
    for qid in brute["query_id"].unique():
        want = set(brute.loc[brute.query_id == qid, "vec_id"])
        got = set(approx.loc[approx.query_id == qid, "vec_id"])
        recalls.append(len(want & got) / max(len(want), 1))
    assert np.mean(recalls) >= 0.8, (
        f"{approx_name} recall@10 {np.mean(recalls):.2f} < 0.8 ({recalls})"
    )
