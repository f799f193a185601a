"""Equi-join operators vs pandas merge."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from code_indexer_ray.pipelines.ops import broadcast_hash_join, shuffle_equi_join


def _collect(ds) -> pd.DataFrame:
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return pd.DataFrame()
    df = pa.concat_tables(tbls).to_pandas()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_broadcast_join_inner_and_left(ray_session):
    import ray
    import ray.data as rd

    fact = pd.DataFrame({"k": [1, 2, 3, 2, 9], "v": [10, 20, 30, 21, 90]})
    dim = pa.table({"dk": pa.array([3, 1, 2], pa.int64()), "name": ["c", "a", "b"]})
    ds = rd.from_arrow(pa.Table.from_pandas(fact)).repartition(3)
    inner = _collect(
        broadcast_hash_join(ds, "k", ray.put(dim), dim_key="dk", dim_cols=["name"])
    )
    exp = _norm(
        fact.merge(dim.to_pandas(), left_on="k", right_on="dk")[["k", "v", "name"]]
    )
    pd.testing.assert_frame_equal(inner[["k", "v", "name"]].pipe(_norm), exp)

    left = _collect(
        broadcast_hash_join(ds, "k", ray.put(dim), dim_key="dk", dim_cols=["name"], how="left")
    )
    assert len(left) == 5
    assert left.loc[left.k == 9, "name"].isna().all()


def test_shuffle_join_many_to_many(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(2)
    l = pd.DataFrame({"k": rng.randint(0, 30, 300), "lv": np.arange(300)})
    r = pd.DataFrame({"k": rng.randint(0, 30, 120), "rv": np.arange(120) * 7})
    lds = rd.from_arrow(pa.Table.from_pandas(l)).repartition(5)
    rds = rd.from_arrow(pa.Table.from_pandas(r)).repartition(4)
    got = _collect(
        shuffle_equi_join(lds, rds, key="k", left_cols=["lv"], right_cols=["rv"],
                          num_buckets=8)
    )
    exp = _norm(l.merge(r, on="k")[["k", "lv", "rv"]])
    got = got[["k", "lv", "rv"]].astype(np.int64).pipe(_norm)
    pd.testing.assert_frame_equal(got, exp.astype(np.int64))


def test_shuffle_join_disjoint_keys(ray_session):
    import ray.data as rd

    l = pd.DataFrame({"k": [1, 2], "lv": [1, 2]})
    r = pd.DataFrame({"k": [3, 4], "rv": [3, 4]})
    got = _collect(
        shuffle_equi_join(
            rd.from_arrow(pa.Table.from_pandas(l)),
            rd.from_arrow(pa.Table.from_pandas(r)),
            key="k", left_cols=["lv"], right_cols=["rv"],
        )
    )
    assert got.empty
