"""Feature-hashing embedder stage (ST1 analog): DuckDB md5 parity, unit
norms, determinism across the actor-state hash cache."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from code_indexer_ray.text.embed import TextEmbedStage, sql_embed_text

ROWS = [
    (0, "the quick brown fox"),
    (1, ""),
    (2, "   \n  "),
    (3, "the the the the"),
    (4, "Grüße αβγ 123"),
]


def _table():
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS]),
        }
    )


def test_matches_duckdb_md5_twin():
    got = TextEmbedStage(dim=8)(_table()).to_pandas().sort_values(["doc_id", "i"]).reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", _table())
    want = con.execute(sql_embed_text(dim=8) + " ORDER BY doc_id, i").df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_norms_and_empty_docs():
    out = TextEmbedStage(dim=8)(_table()).to_pandas()
    for doc, grp in out.groupby("doc_id"):
        nrm = np.sqrt((grp.v_r**2).sum())
        if doc in (1, 2):
            assert nrm == 0.0  # token-less docs embed to the zero vector
        else:
            assert nrm == pytest.approx(1.0, abs=2e-3)  # 4dp rounding slack


def test_cache_does_not_change_results():
    stage = TextEmbedStage(dim=8)
    first = stage(_table())
    second = stage(_table())  # same actor, warm hash cache
    assert first.equals(second)
    assert stage._hash_cache  # the cache actually engaged


import pytest  # noqa: E402
