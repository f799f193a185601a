"""Time-bucketed temporal index build.

One sub-index per ``bucket_days`` window of commit time (the
Elasticsearch / Loki time-based-indices pattern): a date-range query opens
only the buckets its range touches, old windows are immutable once their
time has passed (append-only corpus ⇒ new commits land only in the newest
bucket, which rebuilds/merges incrementally like any other index), and the
driver-side state is one manifest row per window — never corpus-sized.

Each bucket is a full :func:`~code_indexer_ray.index.build.build_index`
run (its own distributed shuffle, shards, doc store), with the composite
``tkey = diff_type || '@' || commit_day`` stored column wired as the
engine's language-filter column so (diff-type, day) filtering is exact and
pre-limit with zero new engine machinery (reference filter semantics:
``temporal_search_service.py:248-360``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

TEMPORAL_MANIFEST = "temporal.json"
#: stored fields every bucket keeps for filtering / hit assembly
STORE_COLS = ("tkey", "path", "diff_type", "commit_day", "commit_ts", "author", "message")


def _expand_messages(batch: pa.Table) -> pa.Table:
    """Opt-in commit-message docs (reference ``chunk_type``,
    ``temporal_search_service.py:358-399``: temporal collections hold BOTH
    ``commit_diff`` and ``commit_message`` vectors).  Every change row
    doubles: the diff doc keeps the change text under id ``change_id·2``,
    the message doc indexes the commit message under ``change_id·2+1`` —
    the id PARITY is the chunk type (odd = message), so the filter needs no
    extra stored column and the schema stays identical to diff-only
    builds."""
    n = batch.num_rows
    diff = batch.set_column(
        batch.column_names.index("change_id"),
        "change_id",
        pc.multiply(batch["change_id"], 2),
    )
    msg = batch.set_column(
        batch.column_names.index("change_id"),
        "change_id",
        pc.add(pc.multiply(batch["change_id"], 2), 1),
    )
    msg = msg.set_column(msg.column_names.index("text"), "text", msg["message"])
    out = pa.concat_tables([diff, msg])
    return out if n else out.slice(0, 0)


def _bucketize(batch: pa.Table, bucket_days: int) -> pa.Table:
    """ONE shared kernel for build and append — the tkey/store-column/
    doc_id-rename contract must stay byte-identical between them or
    appended windows get a divergent schema."""
    day = pc.divide(batch["commit_ts"], 86400)
    b = pc.divide(day, bucket_days)
    cols = [c for c in ("change_id", "text", *STORE_COLS) if c in batch.column_names]
    out = batch.select(cols).append_column("tbucket", b.cast(pa.int64()))
    # the engine's stored-field reader keys on ``doc_id`` — present the
    # change id under that name inside each bucket index
    return out.rename_columns(
        ["doc_id" if c == "change_id" else c for c in out.column_names]
    )


def build_temporal_index(
    changes_path: str,
    out_root: str,
    *,
    bucket_days: int = 4,
    num_shards: int | None = None,
    num_buckets: int | None = None,
    target_docs_per_shard: int | None = None,
    resume: bool = True,
    window_concurrency: int = 1,
    index_messages: bool = False,
) -> dict:
    """Build the bucketed index under ``out_root`` from a change-row table
    (schema of :func:`..temporal.history.change_rows`; any real git source
    producing those columns works the same).  Returns the temporal manifest.

    The bucket key derives from ``commit_ts`` (``day_idx = commit_ts //
    86400``), so arbitrary change tables bucket correctly whether or not
    they carry a ``day_idx`` column.  The per-bucket partition write and
    every per-bucket build are Ray Data pipelines; the driver holds only
    the bucket list.
    """
    import ray.data as rd

    from ..index.build import build_index

    mpath = os.path.join(out_root, TEMPORAL_MANIFEST)
    if resume and os.path.isfile(mpath):
        with open(mpath) as f:
            return json.load(f)
    # no manifest → any content under out_root is a partial build (Ray's
    # parquet writer APPENDS uuid-named files, so a retry over leftovers
    # would double every row) — clear and start clean
    import shutil

    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root, exist_ok=True)

    part_dir = os.path.join(out_root, "changes")
    ds = rd.read_parquet(changes_path)
    if index_messages:
        ds = ds.map_batches(_expand_messages, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: _bucketize(b, bucket_days), batch_format="pyarrow")
    ds.write_parquet(part_dir, partition_cols=["tbucket"])

    # bucket inventory: one tiny aggregate row per window — map-side
    # per-batch partials through a bucket-keyed groupby, so the driver sees
    # bucket-count rows, never the change table (a 3-column to_table here
    # was corpus-row-sized driver state)
    def _inv_partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["tbucket", "commit_day"])
            .group_by("tbucket", use_threads=False)
            .aggregate(
                [("commit_day", "min"), ("commit_day", "max"), ("commit_day", "count")]
            )
        )
        return pa.table(
            {
                # hive partition values read back as strings — normalize so
                # bucket ordering is numeric, not lexicographic
                "tbucket": g["tbucket"].cast(pa.string()).cast(pa.int64()),
                "dmin": g["commit_day_min"],
                "dmax": g["commit_day_max"],
                "n": g["commit_day_count"].cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Max, Min, Sum

    stats_rows = (
        # prune to the two inventory columns — the full change rows (text
        # dominating) must not stream through this pass
        rd.read_parquet(part_dir, columns=["tbucket", "commit_day"])
        .map_batches(_inv_partial, batch_format="pyarrow")
        .groupby("tbucket")
        .aggregate(
            Min("dmin", alias_name="commit_day_min"),
            Max("dmax", alias_name="commit_day_max"),
            Sum("n", alias_name="doc_id_count"),
        )
        .take_all()
    )
    stats_rows.sort(key=lambda r: r["tbucket"])

    # per-window builds are independent pipelines over disjoint inputs and
    # output dirs; a single small window can't saturate the cluster, so
    # window_concurrency > 1 overlaps them from driver threads (each thread
    # drives its own Ray Data executor).  Build output is per-window
    # deterministic, so concurrency never changes bytes.
    def _one(row: dict) -> dict:
        b = int(row["tbucket"])
        idx_dir = os.path.join(out_root, f"idx_{b:06d}")
        bkw = {}
        if target_docs_per_shard is not None:
            # window parallelism: the global 250k-doc default leaves a small
            # window as ONE sort + few encode groups — measured 35.4→10.9 s
            # (3.2×) on a 133k-change window at 32 cpus once sharded
            bkw["target_docs_per_shard"] = target_docs_per_shard
        build_index(
            os.path.join(part_dir, f"tbucket={b}"),
            idx_dir,
            id_col="doc_id",
            text_col="text",
            store_cols=STORE_COLS,
            num_shards=num_shards,
            num_buckets=num_buckets,
            resume=resume,
            **bkw,
        )
        return {
            "bucket": b,
            "min_day": row["commit_day_min"],
            "max_day": row["commit_day_max"],
            "num_changes": int(row["doc_id_count"]),
            "dir": f"idx_{b:06d}",
        }

    if window_concurrency > 1 and len(stats_rows) > 1:
        from concurrent.futures import ThreadPoolExecutor

        from ..index.build import ensure_threadsafe_fs_imports

        ensure_threadsafe_fs_imports()
        with ThreadPoolExecutor(max_workers=window_concurrency) as ex:
            buckets = list(ex.map(_one, stats_rows))
    else:
        buckets = [_one(r) for r in stats_rows]
    buckets.sort(key=lambda x: x["bucket"])

    manifest = {
        "bucket_days": bucket_days,
        "num_shards": num_shards,
        "num_buckets": num_buckets,
        "index_messages": index_messages,
        "buckets": buckets,
    }
    _write_manifest(out_root, manifest)
    return manifest


def _write_manifest(out_root: str, manifest: dict) -> None:
    mpath = os.path.join(out_root, TEMPORAL_MANIFEST)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, mpath)  # manifest lands LAST: its presence == publish


def _bucket_stats(part_dir: str, bucket: int) -> dict:
    frag = pads.dataset(os.path.join(part_dir, f"tbucket={bucket}")).to_table(
        columns=["commit_day", "doc_id"]
    )
    return {
        "min_day": pc.min(frag["commit_day"]).as_py(),
        "max_day": pc.max(frag["commit_day"]).as_py(),
        "num_changes": frag.num_rows,
    }


def append_changes(changes_path: str, out_root: str) -> dict:
    """Incremental append — the reference's ``last_indexed_commit``
    incremental path (``temporal_indexer.py:395-404``) under the bucketed
    layout.  Commit time only moves forward, so:

    - changes landing in windows NEWER than the current newest get fresh
      sub-index builds (old windows stay immutable — never rewritten);
    - changes landing in the CURRENT newest window rebuild that one
      window over old + new rows (the hot-index pattern: rebuild cost ∝
      window size, never corpus size); the rebuilt index publishes under a
      fresh generation-suffixed dir, the manifest swap is atomic, and the
      PREVIOUS generation is kept until the next rotation (the same
      current+previous grace the pindex GC gives in-flight readers);
    - changes OLDER than the newest window are rejected (``ValueError``) —
      history is append-only;
    - an EMPTY append (a poller tick with no new commits) is a no-op.
    """
    import shutil

    import ray.data as rd

    from ..index.build import build_index

    mpath = os.path.join(out_root, TEMPORAL_MANIFEST)
    with open(mpath) as f:
        manifest = json.load(f)
    bucket_days = manifest["bucket_days"]
    by_bucket = {b["bucket"]: b for b in manifest["buckets"]}
    hot = max(by_bucket) if by_bucket else -1

    part_dir = os.path.join(out_root, "changes")
    ds = rd.read_parquet(changes_path)
    if manifest.get("index_messages"):
        ds = ds.map_batches(_expand_messages, batch_format="pyarrow")
    ds = ds.map_batches(lambda b: _bucketize(b, bucket_days), batch_format="pyarrow")
    # touched windows from the APPEND alone: a tiny per-window count — the
    # hot window is NOT rebuilt when a tick only adds newer windows
    counts = {
        int(r["tbucket"]): int(r["count()"])
        for r in ds.groupby("tbucket").count().take_all()
    }
    if not counts:
        return manifest  # empty poller tick → no-op
    if min(counts) < hot:
        raise ValueError(
            f"append contains window {min(counts)} older than the newest window "
            f"{hot} — temporal history is append-only"
        )
    # the path-history sidecar is derived from the changes table — drop it
    # BEFORE the table grows (readers fall back to the filtered scan; a
    # crash mid-append can never leave a stale point-read store) and
    # rebuild it after the append if one existed
    from .pathstore import build_path_store, invalidate_path_store

    old_pathstore = invalidate_path_store(out_root)

    # collision-safe: Ray parquet file names carry a per-write UUID
    ds.write_parquet(part_dir, partition_cols=["tbucket"])

    for b in sorted(counts):
        ent = by_bucket.get(b)
        gen = int(ent["dir"].rsplit("_g", 1)[1]) + 1 if ent and "_g" in ent["dir"] else 1
        new_dir = f"idx_{b:06d}_g{gen}" if ent else f"idx_{b:06d}"
        build_index(
            os.path.join(part_dir, f"tbucket={b}"),
            os.path.join(out_root, new_dir),
            id_col="doc_id",
            text_col="text",
            store_cols=STORE_COLS,
            num_shards=manifest.get("num_shards"),
            num_buckets=manifest.get("num_buckets"),
            resume=False,
        )
        entry = {"bucket": int(b), **_bucket_stats(part_dir, b), "dir": new_dir}
        if ent:
            entry["prev_dir"] = ent["dir"]  # grace for in-flight readers
        by_bucket[b] = entry
        manifest["buckets"] = [by_bucket[k] for k in sorted(by_bucket)]
        _write_manifest(out_root, manifest)  # atomic swap first...
        retired = ent.get("prev_dir") if ent else None
        if retired and retired != new_dir:
            # ...then retire the generation BEFORE the previous one — readers
            # holding the pre-swap manifest still resolve prev_dir
            shutil.rmtree(os.path.join(out_root, retired), ignore_errors=True)
    if old_pathstore is not None:
        build_path_store(out_root, num_parts=old_pathstore["num_parts"])
    return manifest


def _bucket_disk_counts(part_dir: str) -> dict[int, int]:
    """Per-window row counts of the partitioned changes table from parquet
    METADATA (footer reads only)."""
    import pyarrow.dataset as pads

    out: dict[int, int] = {}
    for name in os.listdir(part_dir):
        if not name.startswith("tbucket="):
            continue
        b = int(name.split("=", 1)[1])
        d = pads.dataset(os.path.join(part_dir, name))
        out[b] = sum(f.metadata.num_rows for f in d.get_fragments())
    return out


def repair_append(out_root: str) -> dict:
    """Reconcile the temporal index with its changes table after a crashed
    append (the reference's completed-commit reconciliation role,
    ``cli_temporal_watch_handler.py`` progressive metadata): an append
    writes ALL change rows first, then rebuilds touched windows and swaps
    the manifest per bucket — a crash in between leaves windows whose disk
    row count disagrees with the manifest.  This rebuilds exactly those
    windows from the (complete) partitioned rows, publishes
    generation-swapped dirs, refreshes the manifest, and rebuilds a
    pathstore sidecar if one existed.  Idempotent; a consistent index is a
    no-op.  It does NOT deduplicate rows — a crash in the middle of the row
    write itself (detected by the watch driver's in-flight row accounting)
    needs the feed file re-appended or the surplus rows removed by hand,
    and is reported loudly there."""
    import shutil

    from ..index.build import build_index
    from .pathstore import build_path_store, invalidate_path_store

    mpath = os.path.join(out_root, TEMPORAL_MANIFEST)
    with open(mpath) as f:
        manifest = json.load(f)
    by_bucket = {b["bucket"]: b for b in manifest["buckets"]}
    part_dir = os.path.join(out_root, "changes")
    disk = _bucket_disk_counts(part_dir)
    stale = [
        b for b, n in sorted(disk.items())
        if b not in by_bucket or by_bucket[b]["num_changes"] != n
    ]
    if not stale:
        return manifest

    old_pathstore = invalidate_path_store(out_root)
    for b in stale:
        ent = by_bucket.get(b)
        gen = int(ent["dir"].rsplit("_g", 1)[1]) + 1 if ent and "_g" in ent["dir"] else 1
        new_dir = f"idx_{b:06d}_g{gen}" if ent else f"idx_{b:06d}"
        build_index(
            os.path.join(part_dir, f"tbucket={b}"),
            os.path.join(out_root, new_dir),
            id_col="doc_id",
            text_col="text",
            store_cols=STORE_COLS,
            num_shards=manifest.get("num_shards"),
            num_buckets=manifest.get("num_buckets"),
            resume=False,
        )
        entry = {"bucket": int(b), **_bucket_stats(part_dir, b), "dir": new_dir}
        if ent:
            entry["prev_dir"] = ent["dir"]
        by_bucket[b] = entry
        manifest["buckets"] = [by_bucket[k] for k in sorted(by_bucket)]
        _write_manifest(out_root, manifest)
        retired = ent.get("prev_dir") if ent else None
        if retired and retired != new_dir:
            shutil.rmtree(os.path.join(out_root, retired), ignore_errors=True)
    if old_pathstore is not None:
        build_path_store(out_root, num_parts=old_pathstore["num_parts"])
    return manifest
