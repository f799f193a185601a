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


_KL_GOLD1 = np.uint64(0x9E3779B97F4A7C15)
_KL_GOLD2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _column_hash64(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized per-row uint64 hash of one column (partition bucketing
    only — engine-internal, collisions just co-locate extra rows)."""
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        h = (v + _KL_GOLD2) * _KL_GOLD1
        return h ^ (h >> np.uint64(31))
    # strings / timestamps / anything else: pandas' C-level siphash
    return pd.util.hash_array(col.to_numpy(zero_copy_only=False)).astype(np.uint64)


def keep_latest(
    ds,
    keys: list[str],
    ts_col: str,
    tiebreak_col: str | None = None,
    num_partitions: int = 64,
):
    """One row per key group: max ``ts_col`` (ties → max ``tiebreak_col``).

    J1/D1 keep-latest dedup, partition-vectorized (the ``candidate_pairs``
    pattern): ONE coarse hash-partition shuffle on the key columns — groups
    are PARTITIONS, not key groups — then a single Arrow ``sort_indices``
    (keys ↑, ts ↓, tiebreak ↓) + run-boundary mask per partition.  At
    billions of urls this never pays a per-key-group python call, unlike
    ``groupby(keys).map_groups`` (VERDICT r4 finding #2).
    """
    if num_partitions & (num_partitions - 1):
        raise ValueError("num_partitions must be a power of two")
    mask = np.uint64(num_partitions - 1)
    sort_keys = [(k, "ascending") for k in keys] + [(ts_col, "descending")]
    if tiebreak_col:
        sort_keys.append((tiebreak_col, "descending"))

    def add_bucket(b: pa.Table) -> pa.Table:
        h = np.zeros(b.num_rows, dtype=np.uint64)
        for k in keys:
            h = (h * _KL_GOLD1) ^ _column_hash64(b[k])
        return b.append_column("_pb", pa.array((h & mask).astype(np.int64)))

    def dedup(g: pa.Table) -> pa.Table:
        g = g.drop_columns(["_pb"])
        n = g.num_rows
        if n == 0:
            return g
        s = g.take(pc.sort_indices(g, sort_keys=sort_keys))
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for k in keys:
            a = s[k].combine_chunks() if isinstance(s[k], pa.ChunkedArray) else s[k]
            cur, prev = a.slice(1), a.slice(0, n - 1)
            ne = pc.fill_null(pc.not_equal(cur, prev), False)
            nulldiff = pc.xor(pc.is_null(cur), pc.is_null(prev))
            first[1:] |= pc.or_(ne, nulldiff).to_numpy(zero_copy_only=False)
        return s.filter(pa.array(first))

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_pb")
        .map_groups(dedup, batch_format="pyarrow")
    )


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
    parts = ray.get(refs)
    # drop zero-row blocks: upstream group/join stages can emit blocks with
    # an EMPTY schema, which poisons concat_tables.  All-empty input → empty
    # result (prefer a block that still carries the schema).
    nonempty = [p for p in parts if p.num_rows]
    if not nonempty:
        schemaful = [p for p in parts if p.num_columns]
        return schemaful[0] if schemaful else pa.table({})
    tbl = pa.concat_tables(nonempty)
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


def sessionize(ds, ts_col: str, key_col: str, value_col: str, tiebreak_col: str,
               gap_secs: int = 1800):
    """Session windows: consecutive events of one key belong to one session
    while the gap between neighbours is ≤ ``gap_secs``; a larger gap starts a
    new session.  Sessions are numbered 0.. per key in event-time order
    (ties broken by ``tiebreak_col`` so numbering is deterministic).

    Shape: ONE hash shuffle on ``key_col`` (``groupby.map_groups``); each
    group is one key's events — the standard sessionization partitioning
    assumption (per-key event counts fit a worker; a key with unbounded
    events needs a time-bucketed pre-split, which tumbling_window covers).
    Output: (key, session_id, session_start, session_end, n_events,
    sum_value) — one row per session.
    """

    def per_key(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], type=g[key_col].type),
                    "session_id": pa.array([], type=pa.int64()),
                    "session_start": pa.array([], type=pa.timestamp("us")),
                    "session_end": pa.array([], type=pa.timestamp("us")),
                    "n_events": pa.array([], type=pa.int64()),
                    "sum_value": pa.array([], type=pa.float64()),
                }
            )
        order = pc.sort_indices(
            g, sort_keys=[(ts_col, "ascending"), (tiebreak_col, "ascending")]
        )
        g = g.take(order)
        ts = g[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        ts_us = ts.astype("datetime64[us]").astype(np.int64)
        brk = np.empty(len(ts_us), dtype=np.int64)
        brk[0] = 0
        brk[1:] = (np.diff(ts_us) > gap_secs * 1_000_000).astype(np.int64)
        sess = np.cumsum(brk)
        vals = g[value_col].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                key_col: g[key_col],
                "session_id": pa.array(sess),
                "ts": pa.array(ts_us),
                "value": pa.array(vals),
                "one": pa.array(np.ones(len(ts_us), dtype=np.int64)),
            }
        )
        agg = t.group_by([key_col, "session_id"]).aggregate(
            [("ts", "min"), ("ts", "max"), ("one", "sum"), ("value", "sum")]
        )
        return pa.table(
            {
                key_col: agg[key_col],
                "session_id": agg["session_id"],
                "session_start": agg["ts_min"].cast(pa.timestamp("us")),
                "session_end": agg["ts_max"].cast(pa.timestamp("us")),
                "n_events": agg["one_sum"],
                "sum_value": agg["value_sum"],
            }
        )

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def asof_join_last(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str,
    right_ts: str,
    left_cols: list[str],
    right_cols: list[str],
    right_tiebreak: str,
):
    """As-of join: for every left row, the LAST right row of the same ``key``
    with ``right_ts <= left_ts`` (ties on right_ts → max ``right_tiebreak``);
    left rows with no prior right row keep nulls (left-outer asof).

    Ray Data has no join primitive, and a broadcast only works when one side
    is small — so this co-partitions BOTH sides in one shuffle: tag each side,
    harmonize schemas (other side's columns null), union, ``groupby(key)``,
    and merge within each group with one searchsorted.  Both inputs stream;
    the group holds one key's rows from both sides.

    Output columns: ``key``, ``left_cols``, ``right_cols`` (nullable).
    """
    right_key = right_key or key
    l_schema = left.schema()
    r_schema = right.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}
    ts_t = pa.timestamp("us")

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            key: b[key].cast(pa.int64()),
            "_ts": b[left_ts].cast(ts_t),
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = b[c]
        for c in right_cols:
            cols[c] = pa.nulls(n, type=ts_t if c == right_ts else r_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {
            key: b[right_key].cast(pa.int64()),
            "_ts": b[right_ts].cast(ts_t),
            "_side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = pa.nulls(n, type=l_types[c])
        for c in right_cols:
            cols[c] = b[c].cast(ts_t) if c == right_ts else b[c]
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def per_key(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        out_cols = [key] + left_cols + right_cols
        if lt.num_rows == 0:
            return pa.table({c: pa.chunked_array([], type=g[c].type) for c in out_cols})
        rt = rt.take(pc.sort_indices(
            rt, sort_keys=[("_ts", "ascending"), (right_tiebreak, "ascending")]
        ))
        l_ts = lt["_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        r_ts = rt["_ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        has = idx >= 0
        cols = {key: lt[key]}
        for c in left_cols:
            cols[c] = lt[c]
        take_idx = pa.array(np.where(has, idx, 0), type=pa.int64())
        mask = pa.array(~has)
        for c in right_cols:
            if rt.num_rows:
                taken = rt[c].take(take_idx)
                cols[c] = pc.if_else(mask, pa.nulls(lt.num_rows, type=taken.type), taken)
            else:
                cols[c] = pa.nulls(lt.num_rows, type=g[c].type)
        return pa.table(cols)

    return both.groupby(key).map_groups(per_key, batch_format="pyarrow")


def hopping_window(
    ds, ts_col: str, key_col: str, value_col: str,
    *, size_us: int = 3_600_000_000, hop_us: int = 900_000_000,
):
    """Hopping (sliding) event-time windows: each event lands in
    ``size/hop`` overlapping windows; count + sum per (key, window_start).

    ``hop_us`` must divide ``size_us``.  Same shuffle discipline as
    :func:`tumbling_window`: the fan-out (×size/hop) and the partial combine
    both happen inside ``map_batches``, so the wide groupby moves one row per
    (key, window) per batch.
    """
    if size_us % hop_us:
        raise ValueError("hop must divide size")
    nwin = size_us // hop_us

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        tus = ts.astype("datetime64[us]").astype(np.int64)
        w0 = (tus // hop_us) * hop_us
        n = len(tus)
        # every event is inside all nwin windows ending at or after it
        starts = (np.repeat(w0, nwin) - np.tile(np.arange(nwin, dtype=np.int64) * hop_us, n))
        t = pa.table(
            {
                key_col: batch[key_col].take(pa.array(np.repeat(np.arange(n), nwin))),
                "window_start": pa.array(starts).cast(pa.timestamp("us")),
                "n_events": pa.array(np.ones(n * nwin, dtype=np.int64)),
                "sum_value": batch[value_col].take(pa.array(np.repeat(np.arange(n), nwin))),
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


def grouped_topk(ds, group_cols: list[str], by: str, k: int, tiebreak: str,
                 descending: bool = True):
    """Top-k rows PER GROUP (the reference's per-repo / per-facet top-k,
    SURVEY A4): one hash shuffle on the group key, then a vectorized
    sort+head inside each group — never a global sort."""

    asc_by = not descending

    def head(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g,
            sort_keys=[(by, "ascending" if asc_by else "descending"),
                       (tiebreak, "ascending")],
        )
        return g.take(order.slice(0, k))

    return ds.groupby(group_cols).map_groups(head, batch_format="pyarrow")


def distinct_count(ds, key_col: str, of_col: str):
    """Exact count-distinct per key with map-side pre-dedup: each batch emits
    its unique (key, of) pairs, the groupby dedups globally, and a tiny final
    aggregate counts — the shuffle carries unique pairs, not raw rows."""

    def uniq_pairs(batch: pa.Table) -> pa.Table:
        return batch.select([key_col, of_col]).group_by([key_col, of_col]).aggregate([])

    def count_uniq(g: pa.Table) -> pa.Table:
        vals = g[of_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "n_distinct": pa.array([int(np.unique(vals).size)], pa.int64()),
            }
        )

    return (
        ds.map_batches(uniq_pairs, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(count_uniq, batch_format="pyarrow")
    )


def grouped_median(ds, key_col: str, value_col: str):
    """Exact per-group median (linear interpolation on even counts — numpy's
    and DuckDB's shared convention): one hash shuffle, vectorized per group."""

    def med(g: pa.Table) -> pa.Table:
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "median_value": pa.array([float(np.median(v))]),
            }
        )

    return ds.groupby(key_col).map_groups(med, batch_format="pyarrow")


def range_join_window(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_ts: str,
    right_ts: str,
    before_us: int,
    after_us: int = 0,
    left_cols: list[str],
    right_cols: list[str],
):
    """Range (interval) join: every (left, right) pair of the same ``key``
    with ``right_ts ∈ [left_ts − before, left_ts + after]`` (inclusive).

    Scale shape: co-partition both sides by (key, coarse time bucket) with
    bucket width = the window span, so a right row replicates to at most TWO
    buckets and each left row is evaluated exactly once (in its own bucket) —
    one shuffle, no cross product, replication factor ≤ 2.  Within a group:
    sort the right side once, then one ``searchsorted`` pair per left row
    gives its contiguous match range.
    """
    right_key = right_key or key
    span = before_us + after_us
    if span <= 0:
        raise ValueError("window span must be positive")
    ts_t = pa.timestamp("us")
    l_schema, r_schema = left.schema(), right.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}

    def _us(col) -> np.ndarray:
        return (
            col.cast(ts_t).to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )

    def tag_left(b: pa.Table) -> pa.Table:
        n = b.num_rows
        tus = _us(b[left_ts])
        cols = {
            key: b[key].cast(pa.int64()),
            "_bkt": pa.array(tus // span),
            "_ts": pa.array(tus),
            "_side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = b[c]
        for c in right_cols:
            cols[c] = pa.nulls(n, type=ts_t if c == right_ts else r_types[c])
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        tus = _us(b[right_ts])
        # a right row at t matches lefts in [t − after, t + before] → its
        # influence interval covers at most two span-wide buckets
        b0 = (tus - after_us) // span
        b1 = (tus + before_us) // span
        reps = (b1 - b0 + 1).astype(np.int64)  # 1 or 2
        idx = np.repeat(np.arange(len(tus)), reps)
        bkts = np.concatenate(
            [np.arange(lo, hi + 1) for lo, hi in zip(b0, b1)]
        ) if len(tus) else np.empty(0, np.int64)
        sel = b.take(pa.array(idx))
        cols = {
            key: sel[right_key].cast(pa.int64()),
            "_bkt": pa.array(bkts),
            "_ts": pa.array(np.repeat(tus, reps)),
            "_side": pa.array(np.ones(len(idx), dtype=np.int8)),
        }
        for c in left_cols:
            cols[c] = pa.nulls(len(idx), type=l_types[c])
        for c in right_cols:
            cols[c] = sel[c].cast(ts_t) if c == right_ts else sel[c]
        return pa.table(cols)

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def per_group(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        out_cols = [key] + left_cols + right_cols
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table({c: pa.chunked_array([], type=g[c].type) for c in out_cols})
        rt = rt.take(pc.sort_indices(rt, sort_keys=[("_ts", "ascending")]))
        l_ts = lt["_ts"].to_numpy(zero_copy_only=False)
        r_ts = rt["_ts"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(r_ts, l_ts - before_us, side="left")
        hi = np.searchsorted(r_ts, l_ts + after_us, side="right")
        counts = hi - lo
        l_idx = np.repeat(np.arange(lt.num_rows), counts)
        r_idx = (
            np.concatenate([np.arange(a, b) for a, b in zip(lo, hi) if b > a])
            if counts.sum() else np.empty(0, np.int64)
        )
        cols = {key: lt[key].take(pa.array(l_idx))}
        for c in left_cols:
            cols[c] = lt[c].take(pa.array(l_idx))
        for c in right_cols:
            cols[c] = rt[c].take(pa.array(r_idx))
        return pa.table(cols)

    return both.groupby([key, "_bkt"]).map_groups(per_group, batch_format="pyarrow")


def broadcast_hash_join(
    ds,
    key_col: str,
    dim_ref,
    *,
    dim_key: str,
    dim_cols: list[str],
    how: str = "inner",
):
    """Equi-join against a broadcast dimension table (the TPC-H
    fact ⋈ dimension shape).  ``dim_ref`` is a ``ray.put`` ref of a pyarrow
    Table — shipped to the object store ONCE, read zero-copy in every task;
    lookup is a sorted-key ``searchsorted`` gather, no shuffle at all.

    ``how``: 'inner' drops misses, 'left' keeps them with nulls.
    Assumes the dimension key is unique (it is a dimension).
    """
    import ray

    def join(batch: pa.Table) -> pa.Table:
        dim = ray.get(dim_ref)
        order = pc.sort_indices(dim, sort_keys=[(dim_key, "ascending")])
        dim_s = dim.take(order)
        dkeys = dim_s[dim_key].to_numpy(zero_copy_only=False)
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(dkeys, keys)
        pos_c = np.minimum(pos, len(dkeys) - 1) if len(dkeys) else pos
        hit = (dkeys[pos_c] == keys) if len(dkeys) else np.zeros(len(keys), bool)
        if how == "inner":
            batch = batch.filter(pa.array(hit))
            take = pa.array(pos_c[hit], type=pa.int64())
            cols = {c: batch[c] for c in batch.column_names}
            for c in dim_cols:
                cols[c] = dim_s[c].take(take)
        else:
            take = pa.array(np.where(hit, pos_c, 0), type=pa.int64())
            miss = pa.array(~hit)
            cols = {c: batch[c] for c in batch.column_names}
            for c in dim_cols:
                taken = dim_s[c].take(take)
                cols[c] = pc.if_else(miss, pa.nulls(batch.num_rows, type=taken.type), taken)
        return pa.table(cols)

    return ds.map_batches(join, batch_format="pyarrow")


def shuffle_equi_join(
    left,
    right,
    *,
    key: str,
    right_key: str | None = None,
    left_cols: list[str],
    right_cols: list[str],
    num_buckets: int = 64,
):
    """Large × large inner equi-join: ONE co-partitioning shuffle on
    ``hash-bucket(key)`` (both sides tagged, schemas harmonized, unioned),
    then a vectorized sort-merge inside each bucket group — match ranges via
    two ``searchsorted`` calls, rows materialized with ``np.repeat``/gather.

    Bucketing (instead of grouping by the raw key) keeps the number of groups
    fixed at ``num_buckets`` regardless of key cardinality — no
    tiny-group-per-key overhead; a bucket holds both sides' rows for its key
    range.  One-to-many and many-to-many keys both work (the match range is
    a cross product per key).  Skew note: a single pathological hot key lands
    in one bucket; salt upstream if a key exceeds a worker's memory.
    """
    right_key = right_key or key
    l_schema = left.schema()
    r_schema = right.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}

    def tag(side: int, key_name: str, own: list[str], other: list[str], other_t):
        def fn(b: pa.Table) -> pa.Table:
            n = b.num_rows
            k = b[key_name].cast(pa.int64())
            cols = {
                "_k": k,
                "_bkt": pc.cast(
                    pc.bit_wise_and(k, pa.scalar(num_buckets - 1, pa.int64())), pa.int64()
                ),
                "_side": pa.array(np.full(n, side, np.int8)),
            }
            for c in own:
                cols[c] = b[c]
            for c in other:
                cols[c] = pa.nulls(n, type=other_t[c])
            return pa.table(cols)

        return fn

    both = left.map_batches(
        tag(0, key, left_cols, right_cols, r_types), batch_format="pyarrow"
    ).union(
        right.map_batches(tag(1, right_key, right_cols, left_cols, l_types), batch_format="pyarrow")
    )

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        out_cols = [key] + left_cols + right_cols
        if lt.num_rows == 0 or rt.num_rows == 0:
            types = {key: pa.int64(), **{c: l_types[c] for c in left_cols},
                     **{c: r_types[c] for c in right_cols}}
            return pa.table({c: pa.chunked_array([], type=types[c]) for c in out_cols})
        lt = lt.take(pc.sort_indices(lt, sort_keys=[("_k", "ascending")]))
        rt = rt.take(pc.sort_indices(rt, sort_keys=[("_k", "ascending")]))
        lk = lt["_k"].to_numpy(zero_copy_only=False)
        rk = rt["_k"].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(rk, lk, side="left")
        hi = np.searchsorted(rk, lk, side="right")
        counts = hi - lo
        total = int(counts.sum())
        l_idx = np.repeat(np.arange(lt.num_rows), counts)
        # ragged ranges [lo_i, hi_i) without a Python loop
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]]) if len(counts) else counts
        r_idx = (
            np.repeat(lo, counts) + np.arange(total) - np.repeat(offs, counts)
            if total else np.empty(0, np.int64)
        )
        cols = {key: lt["_k"].take(pa.array(l_idx))}
        for c in left_cols:
            cols[c] = lt[c].take(pa.array(l_idx))
        for c in right_cols:
            cols[c] = rt[c].take(pa.array(r_idx))
        return pa.table(cols)

    return both.groupby("_bkt").map_groups(per_bucket, batch_format="pyarrow")


def grouped_running_sum(ds, key_col: str, ts_col: str, value_col: str, tiebreak_col: str):
    """Per-key running (cumulative) sum in event-time order — the distributed
    window function ``SUM(value) OVER (PARTITION BY key ORDER BY ts, tiebreak
    ROWS UNBOUNDED PRECEDING)``.

    Shape: ONE hash shuffle on ``key_col`` (``groupby.map_groups``); inside a
    group one lexsort + ``np.cumsum`` — no driver-side pass, no per-row loop.
    Partitioning assumption: one key's events fit a worker (same as
    ``sessionize``); the accumulation order is pinned by the (ts, tiebreak)
    sort so the result is deterministic across layouts and reruns.
    """

    def per_key(g: pa.Table) -> pa.Table:
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        tb = g[tiebreak_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts))
        g = g.take(pa.array(order))
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        return g.append_column("run_sum", pa.array(np.cumsum(v)))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def grouped_quantiles(ds, key_col: str, value_col: str, qs: list[float],
                      aliases: list[str]):
    """Exact per-group quantiles (numpy/DuckDB shared linear-interpolation
    convention) of an INTEGER-ish value column, computed from map-side value
    histograms — the scale-safe form of a grouped percentile.

    A plain ``groupby(key).map_groups(np.quantile)`` puts every row of a key
    in one group (a "lang" key at 100 TB = billions of rows on one worker).
    Instead each batch pre-folds to ``(key, value, count)`` rows, the shuffle
    moves O(keys x distinct-values x batches), and the final per-key group is
    a tiny sorted histogram: order statistic i = first value whose cumulative
    count exceeds i, interpolated at position (n-1)*q exactly as
    ``np.quantile(..., method='linear')`` / DuckDB ``quantile_cont``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch[key_col],
            value_col: batch[value_col],
            "_n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        agg = t.group_by([key_col, value_col]).aggregate([("_n", "sum")])
        return agg.rename_columns([key_col, value_col, "_n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .aggregate(Sum("_n", alias_name="_n"))
    )

    def quant(g: pa.Table) -> pa.Table:
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        n = g["_n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        c = np.cumsum(n)
        total = int(c[-1])
        cols = {key_col: g[key_col].slice(0, 1)}
        for q, alias in zip(qs, aliases):
            pos = (total - 1) * float(q)
            i0, i1 = int(np.floor(pos)), int(np.ceil(pos))
            lo = v[int(np.searchsorted(c, i0 + 1, side="left"))]
            hi = v[int(np.searchsorted(c, i1 + 1, side="left"))]
            val = lo + (hi - lo) * (pos - i0)
            cols[alias] = pa.array([float(val)])
        return pa.table(cols)

    return hist.groupby(key_col).map_groups(quant, batch_format="pyarrow")


def stratified_sample(ds, id_col: str, stratum_col: str,
                      rates_permille: dict[str, int], default_permille: int = 0):
    """Deterministic per-stratum hash-threshold sampling: keep a row iff
    ``md5(id) mod 1000 < rate[stratum]`` — the stratified form of consistent
    sampling (per-language corpus budgets in a curation pipeline).

    The rate map is a tiny constant captured in the task closure (shipped
    once per task, never per batch); the filter itself is embarrassingly
    parallel — no shuffle, no RNG state, stable across reruns, cluster
    sizes and joins on the same key.
    """
    from ..dedup.minhash import md5_lower64

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        strata = batch[stratum_col].to_pylist()
        mask = np.fromiter(
            (
                (md5_lower64(str(int(i))) % 1000)
                < rates_permille.get(s, default_permille)
                for i, s in zip(ids, strata)
            ),
            dtype=bool,
            count=len(ids),
        )
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow")


def mixture_sample(ds, id_col: str, domain_col: str, weights: dict[str, float]):
    """Target-mixture sampling (the DoReMi/Pile-style mixture-rebalancing
    step): given target domain weights, emit the LARGEST corpus slice whose
    domain composition matches the weights exactly, limited by the
    bottleneck domain.

    Solver (driver-side over the tiny per-domain count table):
    ``T = min_d(n_d / w_d)`` is the largest feasible output size;
    ``k_d = floor(w_d * T)`` is each domain's quota.  Selection is the
    ``k_d`` rows with the SMALLEST ``md5(id)`` per domain (ties by id) —
    deterministic, stable across reruns and cluster sizes, and exactly
    reproducible in SQL (``row_number() OVER (PARTITION BY domain ORDER BY
    md5_number_lower(id), id) <= k_d``).

    One small count aggregate + one domain-keyed shuffle; the quota map is
    a task-closure constant.  At 100-TB scale a single domain's group can
    exceed worker memory — there, switch selection to the hash-threshold
    form (``md5(id)/2^64 < k_d/n_d``, ±binomial noise) or a two-pass
    threshold refinement; the quota solver is unchanged.  Domains absent
    from ``weights`` are excluded (weight 0).
    """
    from ..dedup.minhash import md5_lower64

    counts = {
        r[domain_col]: r["count()"]
        for r in ds.groupby(domain_col).count().take_all()
    }
    feasible = {d: w for d, w in weights.items() if w > 0 and counts.get(d, 0) > 0}
    if not feasible:
        return ds.filter(lambda row: False)
    T = min(counts[d] / w for d, w in feasible.items())
    quotas = {d: min(counts[d], int(np.floor(w * T))) for d, w in feasible.items()}

    def hash_stage(batch: pa.Table) -> pa.Table:
        doms = batch[domain_col].to_pylist()
        keep = np.fromiter((d in quotas for d in doms), dtype=bool, count=len(doms))
        batch = batch.filter(pa.array(keep))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = np.fromiter(
            (md5_lower64(str(int(i))) for i in ids), dtype=np.uint64, count=len(ids)
        )
        return batch.append_column("_mh", pa.array(h.astype(np.int64)))

    def take_quota(g: pa.Table) -> pa.Table:
        if g.num_columns == 0 or g.num_rows == 0:
            return g
        k = quotas.get(g[domain_col][0].as_py(), 0)
        h = g["_mh"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = g[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))[:k]
        return g.take(pa.array(np.sort(order))).drop_columns(["_mh"])

    return (
        ds.map_batches(hash_stage, batch_format="pyarrow")
        .groupby(domain_col)
        .map_groups(take_quota, batch_format="pyarrow")
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a deterministic uniform hash of the
    row id used as the sampling coin (no RNG state, layout-independent)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def approx_grouped_quantiles(ds, key_col: str, value_col: str, id_col: str,
                             qs: list[float], aliases: list[str], k: int = 1024):
    """Approximate per-group quantiles from a BOTTOM-K-BY-HASH value sample
    (the KMV idea applied to quantiles): every row flips a deterministic coin
    ``splitmix64(id)``; each group keeps the k rows with the smallest coins —
    a uniform k-sample without replacement that is EXACTLY mergeable
    (bottom-k of a union == bottom-k of merged bottom-k's), layout- and
    rerun-independent, and constant-size per (batch, key) across the shuffle.

    Works for any value type numpy can sort (floats included — unlike the
    integer-histogram exact path of :func:`grouped_quantiles`).  Rank error
    of the q-quantile estimate is ~ n·sqrt(q(1-q)/k) (sampling theory), so
    k=1024 gives ~1.5 % rank error — gated in tests against the exact
    operator.  No SQL oracle (approximate by design).
    """

    def _bottomk(keys: np.ndarray, h: np.ndarray, take_cols: dict) -> pa.Table:
        order = np.lexsort((h, keys))
        ks, hs = keys[order], h[order]
        starts = np.r_[True, ks[1:] != ks[:-1]]
        group_start = np.maximum.accumulate(np.where(starts, np.arange(len(ks)), 0))
        occ = np.arange(len(ks)) - group_start
        keep = order[occ < k]
        keep.sort()
        return pa.table({c: a.take(pa.array(keep)) for c, a in take_cols.items()})

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _splitmix64(ids)
        keys = batch[key_col].dictionary_encode().combine_chunks().indices.to_numpy(
            zero_copy_only=False
        )
        t = batch.append_column("_h", pa.array(h.view(np.int64)))
        return _bottomk(
            keys, h,
            {key_col: t[key_col], value_col: t[value_col], "_h": t["_h"]},
        )

    sampled = ds.map_batches(partial, batch_format="pyarrow")

    def quant(g: pa.Table) -> pa.Table:
        h = g["_h"].to_numpy(zero_copy_only=False).view(np.uint64)
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        order = np.lexsort((v, h))[:k]
        sample = v[order]
        cols = {key_col: g[key_col].slice(0, 1)}
        for q, alias in zip(qs, aliases):
            cols[alias] = pa.array([float(np.quantile(sample, q, method="linear"))])
        return pa.table(cols)

    return sampled.groupby(key_col).map_groups(quant, batch_format="pyarrow")


def grouped_mode(ds, key_col: str, value_col: str):
    """Exact per-group mode (most frequent value; ties → smallest value —
    pinned for determinism): map-side (key, value, count) partials so the
    shuffle moves O(keys × distinct-values × batches), then a tiny per-key
    argmax — same scale shape as :func:`grouped_quantiles`."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            key_col: batch[key_col],
            value_col: batch[value_col],
            "_n": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })
        agg = t.group_by([key_col, value_col]).aggregate([("_n", "sum")])
        return agg.rename_columns([key_col, value_col, "_n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .aggregate(Sum("_n", alias_name="_n"))
    )

    def pick(g: pa.Table) -> pa.Table:
        n = g["_n"].to_numpy(zero_copy_only=False)
        v = g[value_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -n))
        i = int(order[0])
        return pa.table(
            {
                key_col: g[key_col].slice(0, 1),
                "mode_value": g[value_col].slice(i, 1),
                "n": pa.array([int(n[i])], type=pa.int64()),
            }
        )

    return hist.groupby(key_col).map_groups(pick, batch_format="pyarrow")


def grouped_rolling_mean(ds, key_col: str, ts_col: str, value_col: str,
                         tiebreak_col: str, window: int):
    """Per-key rolling mean over the previous ``window`` rows (inclusive) in
    event-time order — ``AVG(v) OVER (PARTITION BY key ORDER BY ts, tb ROWS
    BETWEEN window-1 PRECEDING AND CURRENT ROW)``.  One hash shuffle; inside
    a group the rolling sum is two cumsum reads (prefix[i] − prefix[i−w]),
    no per-row loop."""

    def per_key(g: pa.Table) -> pa.Table:
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        tb = g[tiebreak_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((tb, ts))
        g = g.take(pa.array(order))
        v = g[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        c = np.concatenate(([0.0], np.cumsum(v)))
        n = len(v)
        lo = np.maximum(np.arange(n) - window + 1, 0)
        sums = c[np.arange(n) + 1] - c[lo]
        counts = np.arange(n) + 1 - lo
        return g.append_column("roll_mean", pa.array(sums / counts))

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


def funnel_depths(ds, user_col: str, ts_col: str, type_col: str, stages: list[str],
                  within_secs: int | None = None):
    """Per-user ordered-funnel depth (view → click → purchase …): a user
    reaches stage i+1 iff an event of that type occurs at a timestamp
    STRICTLY after the earliest stage-i time — and, when ``within_secs`` is
    set, no later than that many seconds after it — the classic min-time
    funnel cascade with a conversion window (each stage pins the earliest
    qualifying event, so the result is deterministic and layout-independent;
    same-timestamp events do NOT chain).

    Shape: ONE hash shuffle on the user key (``groupby.map_groups``); inside
    a group the cascade is ``len(stages)`` vectorized min-over-mask passes,
    no per-event Python.  Output is one (user, depth) row per user — the
    stage fold downstream is O(users), and the final result O(len(stages))."""

    def per_user(g: pa.Table) -> pa.Table:
        ts = g[ts_col].to_numpy(zero_copy_only=False)
        et = g[type_col].to_numpy(zero_copy_only=False)
        w = None if within_secs is None else np.timedelta64(within_secs, "s")
        t = None
        depth = 0
        for s in stages:
            if t is None:
                mask = et == s
            else:
                mask = (et == s) & (ts > t)
                if w is not None:
                    mask &= ts <= t + w
            if not mask.any():
                break
            t = ts[mask].min()
            depth += 1
        return pa.table(
            {
                "user_id": g[user_col].slice(0, 1).cast(pa.int64()),
                "depth": pa.array([depth], type=pa.int64()),
            }
        )

    return ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")


def cohort_retention(ds, user_col: str, ts_col: str, type_col: str,
                     signup_type: str, max_offset: int = 3):
    """Cohort-retention rows: each user's cohort is the ISO week (Monday
    truncation, = DuckDB ``date_trunc('week', ts)``) of their FIRST
    ``signup_type`` event; for week offsets 0..max_offset the user counts as
    retained in offset w iff they have ANY event in cohort_week + w weeks.

    Shape: ONE hash shuffle on the user key; per group two vectorized
    truncations (no per-event Python); output is one (cohort_week, off_w)
    row per retained (user, offset) — O(users × offsets) before the final
    tiny count groupby."""

    def _monday(days: np.ndarray) -> np.ndarray:
        # epoch day 0 = Thursday; ISO Monday truncation
        return days - ((days + 3) % 7)

    def per_user(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "cohort_week": pa.array([], type=pa.timestamp("us")),
                "off_w": pa.array([], type=pa.int64()),
            }
        )
        ts = g[ts_col].cast(pa.timestamp("us")).to_numpy(zero_copy_only=False)
        et = g[type_col].to_numpy(zero_copy_only=False)
        signup = ts[et == signup_type]
        if len(signup) == 0:
            return empty
        days = ts.astype("datetime64[D]").astype(np.int64)
        cohort_day = int(_monday(signup.min().astype("datetime64[D]").astype(np.int64)))
        offs = np.unique((_monday(days) - cohort_day) // 7)
        offs = offs[(offs >= 0) & (offs <= max_offset)]
        cw = np.datetime64(cohort_day, "D").astype("datetime64[us]")
        return pa.table(
            {
                "cohort_week": pa.array(np.full(len(offs), cw)),
                "off_w": pa.array(offs.astype(np.int64)),
            }
        )

    rows = ds.groupby(user_col).map_groups(per_user, batch_format="pyarrow")
    return partial_agg_sum(rows, keys=["cohort_week", "off_w"], sums=[], count_alias="n_users")
