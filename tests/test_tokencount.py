"""BPE-ish token counter (ST2 analog): exact DuckDB/RE2 parity on edge
strings, and the actor-pool stage shape over a Dataset."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from code_indexer_ray.text.tokencount import (
    BPE_PATTERN,
    TokenCountStage,
    sql_token_count,
)

EDGE_ROWS = [
    (0, "hello world"),
    (1, ""),
    (2, "it's  a test... don't stop'll"),
    (3, "Grüße αβγ 123 42x"),
    (4, "   \n\t  "),
    (5, "a" * 100 + " " + "b c"),
    (6, "foo.bar(baz) != qux[3]; 'quoted'"),
    (7, "tab\tsep\nand\r\nnewlines"),
]


def _table():
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in EDGE_ROWS], pa.int64()),
            "text": pa.array([r[1] for r in EDGE_ROWS]),
        }
    )


def test_kernel_matches_duckdb_on_edges():
    t = _table()
    got = TokenCountStage()(t).to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(sql_token_count() + " ORDER BY doc_id").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_counts_sanity():
    out = TokenCountStage()(_table())
    by_id = dict(zip(out["doc_id"].to_pylist(), out["n_bpe"].to_pylist()))
    assert by_id[1] == 0  # empty
    assert by_id[0] == 2  # "hello", " world"
    ws = dict(zip(out["doc_id"].to_pylist(), out["n_ws"].to_pylist()))
    assert ws[4] == 0  # whitespace-only
    # contractions split: BPE-ish count strictly above whitespace count
    assert by_id[2] > ws[2]


def test_pattern_is_re2_safe():
    # pyarrow's RE2 must accept the pattern (no lookahead survived the port)
    import pyarrow.compute as pc

    pc.count_substring_regex(pa.array(["x"]), pattern=BPE_PATTERN)


def test_actor_pool_stage_over_dataset(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_table()).map_batches(
        TokenCountStage, concurrency=2, batch_format="pyarrow"
    )
    out = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = TokenCountStage()(_table()).to_pandas()
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
