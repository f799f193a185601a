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
    assert missing == _NO_ORACLE


_NO_ORACLE = {
    "ann_lsh", "ann_ivf", "ann_store", "ann_pq", "ann_hnsw", "ann_hnsw_store", "ann_quantpath",
    "distinct_users_hll", "approx_quantiles",
}

def _oracle_gated_names():
    # derive from the catalog so a new queries() entry is AUTO-gated here —
    # forgetting to list it can no longer silently skip its oracle replay
    from code_indexer_ray.pipelines.driver_api import query_catalog

    return sorted(set(query_catalog()) - _NO_ORACLE)


@pytest.mark.parametrize("name", _oracle_gated_names())
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
    "approx_name",
    ["ann_lsh", "ann_ivf", "ann_store", "ann_pq", "ann_hnsw", "ann_hnsw_store", "ann_quantpath"],
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
