"""Property tests: the distributed join/window operators vs brute-force
reference implementations on randomized small inputs (hypothesis drives the
shapes; Ray runs once per example via the session fixture)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from code_indexer_ray.pipelines.ops import (
    asof_join_last,
    grouped_median,
    range_join_window,
    sessionize,
)

BASE = np.datetime64("2024-01-01T00:00:00", "us")


def _ts(secs):
    return pa.array([BASE + np.timedelta64(int(s) * 1_000_000, "us") for s in secs],
                    pa.timestamp("us"))


events_strategy = st.lists(
    st.tuples(st.integers(0, 3),          # key
              st.integers(0, 7200),       # seconds offset
              st.floats(-10, 10, allow_nan=False)),
    min_size=1, max_size=40,
)

# Ray datasets per example are tiny; silence hypothesis's slow-example check
RAY_SETTINGS = settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@given(rows=events_strategy)
@RAY_SETTINGS
def test_sessionize_matches_brute(ray_session, rows):
    import ray.data as rd

    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "ts": _ts([r[1] for r in rows]),
        "v": pa.array([r[2] for r in rows], pa.float64()),
        "eid": pa.array(list(range(len(rows))), pa.int64()),
    })
    gap = 600
    out = (
        sessionize(rd.from_arrow(tbl), "ts", "k", "v", "eid", gap_secs=gap)
        .to_pandas().sort_values(["k", "session_id"]).reset_index(drop=True)
    )
    # brute: per key, sort by (ts, eid), split on gap, aggregate
    df = tbl.to_pandas().sort_values(["k", "ts", "eid"])
    want = []
    for k, g in df.groupby("k"):
        sess, start = 0, None
        bucket = []
        prev = None
        for _, r in g.iterrows():
            if prev is not None and (r.ts - prev).total_seconds() > gap:
                want.append((k, sess, bucket))
                sess += 1
                bucket = []
            bucket.append(r)
            prev = r.ts
        want.append((k, sess, bucket))
    assert len(out) == len(want)
    for (_, row), (k, sid, bucket) in zip(out.iterrows(), want):
        assert row.k == k and row.session_id == sid
        assert row.n_events == len(bucket)
        assert row.session_start == bucket[0].ts and row.session_end == bucket[-1].ts
        assert row.sum_value == pytest.approx(sum(b.v for b in bucket))


@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=1, max_size=25),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=0, max_size=25),
    before=st.integers(1, 3000),
    after=st.integers(0, 1500),
)
@RAY_SETTINGS
def test_range_join_matches_nested_loop(ray_session, lrows, rrows, before, after):
    import ray.data as rd

    left = pa.table({
        "k": pa.array([r[0] for r in lrows], pa.int64()),
        "lt": _ts([r[1] for r in lrows]),
        "lid": pa.array(list(range(len(lrows))), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in rrows], pa.int64()),
        "rt": _ts([r[1] for r in rrows]),
        "rid": pa.array(list(range(len(rrows))), pa.int64()),
    })
    out = range_join_window(
        rd.from_arrow(left), rd.from_arrow(right), key="k",
        left_ts="lt", right_ts="rt",
        before_us=before * 1_000_000, after_us=after * 1_000_000,
        left_cols=["lid"], right_cols=["rid"],
    ).to_pandas()
    got = set() if out.empty else set(zip(out.lid, out.rid))
    want = {
        (li, ri)
        for li, (lk, lt) in enumerate(lrows)
        for ri, (rk, rt) in enumerate(rrows)
        if lk == rk and lt - before <= rt <= lt + after
    }
    assert got == want


@given(
    lrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=1, max_size=20),
    rrows=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 5000)), min_size=0, max_size=20),
)
@RAY_SETTINGS
def test_asof_join_matches_brute(ray_session, lrows, rrows):
    import ray.data as rd

    left = pa.table({
        "k": pa.array([r[0] for r in lrows], pa.int64()),
        "lt": _ts([r[1] for r in lrows]),
        "lid": pa.array(list(range(len(lrows))), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([r[0] for r in rrows], pa.int64()),
        "rt": _ts([r[1] for r in rrows]),
        "rid": pa.array(list(range(len(rrows))), pa.int64()),
    })
    out = asof_join_last(
        rd.from_arrow(left), rd.from_arrow(right), key="k",
        left_ts="lt", right_ts="rt",
        left_cols=["lid"], right_cols=["rid"], right_tiebreak="rid",
    ).to_pandas().set_index("lid")
    assert len(out) == len(lrows)
    for li, (lk, lt) in enumerate(lrows):
        cand = [(rt, ri) for ri, (rk, rt) in enumerate(rrows) if rk == lk and rt <= lt]
        got = out.loc[li, "rid"]
        if not cand:
            assert pd.isna(got)
        else:
            assert got == max(cand)[1]


@given(rows=events_strategy)
@RAY_SETTINGS
def test_grouped_median_matches_numpy(ray_session, rows):
    import ray.data as rd

    tbl = pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "v": pa.array([r[2] for r in rows], pa.float64()),
    })
    out = grouped_median(rd.from_arrow(tbl), "k", "v").to_pandas().set_index("k")
    df = tbl.to_pandas()
    for k, g in df.groupby("k"):
        assert out.loc[k, "median_value"] == pytest.approx(float(np.median(g.v)))
