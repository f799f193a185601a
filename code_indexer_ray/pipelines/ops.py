"""Generic distributed operators used by the index lifecycle.

Ray-native equivalents of the reference's maintenance joins/dedups/top-k
(SURVEY.md §2.5/§2.7/§2.8):

- keep-latest dedup (J1/D1: delete-then-add per path → keep newest warc_ts),
- broadcast anti-join (S3/A5: deleted-file detection / resume set-difference),
- distributed top-k (J5/O1: per-shard heap → global merge, never a full sort),
- tumbling-window aggregate (streaming §2.10 analog over an event log),
- partial + final aggregation (A2: per-batch combine before the shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def keep_latest(ds, keys: list[str], ts_col: str, tiebreak_col: str | None = None):
    """One row per key group: max ``ts_col`` (ties → max ``tiebreak_col``).

    `groupby(keys).map_groups` — the hash-partition-by-url keep-latest dedup.
    """
    sort_keys = [ts_col] + ([tiebreak_col] if tiebreak_col else [])

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(sort_keys, ascending=False, kind="mergesort").head(1)

    return ds.groupby(keys).map_groups(latest, batch_format="pandas")


def broadcast_antijoin(ds, key_col: str, keys_ref):
    """Rows of ``ds`` whose key is NOT in the broadcast key set.

    ``keys_ref`` is a ``ray.put`` object ref of a numpy array / set — shipped
    once to the object store, read per task (never per batch re-serialized
    from the driver).
    """
    import ray

    def _filter(batch: pa.Table) -> pa.Table:
        keys = ray.get(keys_ref)
        mask = pc.invert(pc.is_in(batch[key_col], value_set=pa.array(keys)))
        return batch.filter(mask)

    return ds.map_batches(_filter, batch_format="pyarrow")


def local_then_global_topk(ds, by: str, k: int, tiebreak: str, descending: bool = True) -> pa.Table:
    """Global top-k with a per-block pre-reduction: each batch keeps its own
    top-k (argpartition), then the driver merges the tiny survivors — the
    multi-repo "per-repo top-k → merge" pattern, no full sort."""

    def local_topk(batch: pa.Table) -> pa.Table:
        v = batch[by].to_numpy(zero_copy_only=False)
        t = batch[tiebreak].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -v if descending else v))[:k]
        return batch.take(pa.array(np.sort(order)))

    import ray

    refs = ds.map_batches(local_topk, batch_format="pyarrow").to_arrow_refs()
    tbl = pa.concat_tables(ray.get(refs))
    v = tbl[by].to_numpy(zero_copy_only=False)
    t = tbl[tiebreak].to_numpy(zero_copy_only=False)
    order = np.lexsort((t, -v if descending else v))[:k]
    return tbl.take(pa.array(order))


def tumbling_window(ds, ts_col: str, key_col: str, value_col: str, window: str = "hour"):
    """Tumbling event-time window aggregate: count + sum(value) per
    (key, window_start).  Partial per-batch combine, then a small groupby —
    the wide shuffle moves one row per (key, window) per batch, not per event.
    """

    def partial(batch: pa.Table) -> pa.Table:
        win = pc.floor_temporal(batch[ts_col], unit=window)
        t = pa.table(
            {
                key_col: batch[key_col],
                "window_start": win,
                "n_events": pa.array(np.ones(len(batch), dtype=np.int64)),
                "sum_value": batch[value_col],
            }
        )
        agg = t.group_by([key_col, "window_start"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return pa.table(
            {
                key_col: agg[key_col],
                "window_start": agg["window_start"],
                "n_events": agg["n_events_sum"],
                "sum_value": agg["sum_value_sum"],
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "window_start"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
    )


def partial_agg_sum(ds, keys: list[str], sums: list[str], count_alias: str = "n"):
    """Pre-aggregated groupby-sum: combine inside map_batches (one row per key
    per batch crosses the shuffle), then final small groupby."""

    def partial(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for c in sums:
            cols[c] = batch[c]
        cols[count_alias] = pa.array(np.ones(len(batch), dtype=np.int64))
        t = pa.table(cols)
        agg = t.group_by(keys).aggregate([(c, "sum") for c in sums + [count_alias]])
        out = {k: agg[k] for k in keys}
        for c in sums + [count_alias]:
            out[c] = agg[f"{c}_sum"]
        return pa.table(out)

    from ray.data.aggregate import Sum

    aggs = [Sum(c, alias_name=c) for c in sums] + [Sum(count_alias, alias_name=count_alias)]
    return ds.map_batches(partial, batch_format="pyarrow").groupby(keys).aggregate(*aggs)
