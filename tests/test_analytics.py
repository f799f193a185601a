"""Brute-force references for the analytics window/quantile/JSON operators
(grouped_running_sum, grouped_quantiles) on randomized multi-batch inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds_from_pandas(df: pd.DataFrame, n_blocks: int = 4):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        n_blocks
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


def _collect(ds) -> pd.DataFrame:
    import ray

    parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(parts).to_pandas()


class TestGroupedRunningSum:
    def test_matches_pandas_cumsum(self, ray_session, rng):
        from code_indexer_ray.pipelines.ops import grouped_running_sum

        n = 5000
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, n),
                "ts": rng.integers(0, 10_000, n).astype("datetime64[us]"),
                "value": rng.normal(size=n).round(3),
                "event_id": np.arange(n, dtype=np.int64),
            }
        )
        got = (
            _collect(grouped_running_sum(_ds_from_pandas(df), "user_id", "ts", "value", "event_id"))
            .sort_values(["user_id", "ts", "event_id"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        want["run_sum"] = want.groupby("user_id")["value"].cumsum()
        assert len(got) == n
        np.testing.assert_allclose(got["run_sum"], want["run_sum"], atol=1e-9)
        # order inside the output rows carries the original columns unchanged
        assert got["event_id"].tolist() == want["event_id"].tolist()

    def test_tie_order_pinned_by_tiebreak(self, ray_session):
        from code_indexer_ray.pipelines.ops import grouped_running_sum

        # all rows share one timestamp: accumulation order must follow event_id
        df = pd.DataFrame(
            {
                "user_id": [1] * 5,
                "ts": np.zeros(5, dtype="datetime64[us]"),
                "value": [1.0, 2.0, 4.0, 8.0, 16.0],
                "event_id": [4, 2, 0, 3, 1],
            }
        )
        got = _collect(
            grouped_running_sum(_ds_from_pandas(df, 2), "user_id", "ts", "value", "event_id")
        ).sort_values("event_id")
        # event_id order: 0(4.0) 1(16.0) 2(2.0) 3(8.0) 4(1.0)
        np.testing.assert_allclose(
            got["run_sum"].tolist(), [4.0, 20.0, 22.0, 30.0, 31.0]
        )


class TestGroupedQuantiles:
    def test_matches_numpy_linear(self, ray_session, rng):
        from code_indexer_ray.pipelines.ops import grouped_quantiles

        n = 8000
        df = pd.DataFrame(
            {
                "lang": rng.choice(["en", "de", "fr"], n),
                "v": rng.integers(0, 500, n),
            }
        )
        qs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
        aliases = [f"q{int(q * 100)}" for q in qs]
        got = (
            _collect(grouped_quantiles(_ds_from_pandas(df), "lang", "v", qs, aliases))
            .sort_values("lang")
            .reset_index(drop=True)
        )
        for _, row in got.iterrows():
            v = df.loc[df["lang"] == row["lang"], "v"].to_numpy()
            for q, al in zip(qs, aliases):
                assert abs(row[al] - np.quantile(v, q, method="linear")) < 1e-9, (
                    row["lang"],
                    q,
                )

    def test_single_value_group(self, ray_session):
        from code_indexer_ray.pipelines.ops import grouped_quantiles

        df = pd.DataFrame({"k": ["a"], "v": [42]})
        got = _collect(grouped_quantiles(_ds_from_pandas(df, 1), "k", "v", [0.5], ["p50"]))
        assert got["p50"].tolist() == [42.0]

    def test_histogram_fold_is_layout_independent(self, ray_session, rng):
        from code_indexer_ray.pipelines.ops import grouped_quantiles

        df = pd.DataFrame({"k": ["x"] * 1000, "v": rng.integers(0, 10, 1000)})
        a = _collect(grouped_quantiles(_ds_from_pandas(df, 1), "k", "v", [0.5], ["p50"]))
        b = _collect(grouped_quantiles(_ds_from_pandas(df, 7), "k", "v", [0.5], ["p50"]))
        assert a["p50"].tolist() == b["p50"].tolist()


class TestGroupedMode:
    def test_matches_pandas(self, ray_session, rng):
        from code_indexer_ray.pipelines.ops import grouped_mode

        n = 6000
        df = pd.DataFrame(
            {
                "k": rng.integers(0, 30, n),
                "v": rng.choice(["a", "b", "c", "d"], n),
            }
        )
        got = _collect(grouped_mode(_ds_from_pandas(df), "k", "v")).sort_values("k").reset_index(drop=True)
        for _, row in got.iterrows():
            counts = df.loc[df["k"] == row["k"], "v"].value_counts()
            top = counts.max()
            # tie policy: smallest value among max-count values
            want = sorted(counts[counts == top].index)[0]
            assert row["mode_value"] == want and row["n"] == top

    def test_tie_goes_to_smallest(self, ray_session):
        from code_indexer_ray.pipelines.ops import grouped_mode

        df = pd.DataFrame({"k": [1] * 4, "v": ["z", "z", "a", "a"]})
        got = _collect(grouped_mode(_ds_from_pandas(df, 2), "k", "v"))
        assert got["mode_value"].tolist() == ["a"] and got["n"].tolist() == [2]


class TestRollingMean:
    def test_matches_pandas_rolling(self, ray_session, rng):
        from code_indexer_ray.pipelines.ops import grouped_rolling_mean

        n = 4000
        df = pd.DataFrame(
            {
                "u": rng.integers(0, 25, n),
                "ts": rng.integers(0, 10_000, n).astype("datetime64[us]"),
                "value": rng.normal(size=n),
                "eid": np.arange(n, dtype=np.int64),
            }
        )
        W = 5
        got = (
            _collect(grouped_rolling_mean(_ds_from_pandas(df), "u", "ts", "value", "eid", W))
            .sort_values(["u", "ts", "eid"]).reset_index(drop=True)
        )
        want = df.sort_values(["u", "ts", "eid"]).reset_index(drop=True)
        want["roll"] = (
            want.groupby("u")["value"].rolling(W, min_periods=1).mean().reset_index(level=0, drop=True)
        )
        np.testing.assert_allclose(got["roll_mean"], want["roll"], atol=1e-9)

    def test_window_one_is_identity(self, ray_session):
        from code_indexer_ray.pipelines.ops import grouped_rolling_mean

        df = pd.DataFrame(
            {
                "u": [1, 1, 1],
                "ts": np.arange(3).astype("datetime64[us]"),
                "value": [3.0, 5.0, 7.0],
                "eid": [0, 1, 2],
            }
        )
        got = _collect(grouped_rolling_mean(_ds_from_pandas(df, 1), "u", "ts", "value", "eid", 1))
        assert got.sort_values("eid")["roll_mean"].tolist() == [3.0, 5.0, 7.0]
