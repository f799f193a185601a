"""Persisted LSH band store — incremental near-dup detection at corpus
scale: dedupe TODAY'S crawl against the EXISTING corpus without
re-minhashing the corpus.

The batch near-dup pipeline (``dedup/minhash.py`` → ``candidate_pairs``)
re-derives every document's bands per run; at web scale the old corpus'
bands are the invariant, so they become a STORE: (band_id, band_hash,
doc_id) rows hash-partitioned by ``band_hash % num_parts``, each part
SORTED by (band_hash, band_id, doc_id) at small row groups so a probe
reads only the row groups whose band_hash range intersects its keys (the
kvstore / temporal-pathstore point-read precedent).  New documents are
minhashed once, their band rows co-partition with the store by the same
hash, and each part task joins probe×stored in-part — candidate
(new_doc, old_doc) pairs without anything corpus-sized at the driver.

Appends are NEW GENERATION FILES per part (``gen-%06d.parquet``) — no
part rewrite, readers glob the part dir; the manifest is written LAST
(atomic), so a crashed build/append leaves the previous state readable.

No reference analog (the reference dedupes within one index at write
time); this is the scale path for the task brief's dedup family.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..index.manifest import atomic_write_json
from .minhash import (
    DEFAULT_NUM_PERMS,
    DEFAULT_SHINGLE,
    MERSENNE_31,
    band_batch,
    minhash_batch_fast,
)

MANIFEST = "_bandstore.json"
ROW_GROUP = 4096


def _load_manifest(store_dir: str) -> dict:
    import json

    with open(os.path.join(store_dir, MANIFEST)) as f:
        return json.load(f)


def _bands_ds(input_path, *, params: dict, id_col: str, text_col: str):
    import ray.data as rd

    ds = (
        input_path
        if not isinstance(input_path, (str, list))
        else rd.read_parquet(input_path, columns=[id_col, text_col])
    )

    def bands(batch: pa.Table) -> pa.Table:
        sig = minhash_batch_fast(
            batch,
            id_col=id_col,
            text_col=text_col,
            num_perms=params["num_perms"],
            shingle_n=params["shingle_n"],
            seed=params["seed"],
        )
        t = band_batch(sig, rows_per_band=params["rows_per_band"], mod=MERSENNE_31)
        part = t["band_hash"].to_numpy(zero_copy_only=False) % params["num_parts"]
        return t.append_column("part", pa.array(part.astype(np.int64)))

    return ds.map_batches(bands, batch_format="pyarrow")


def _write_parts(bands_ds, store_dir: str, gen: int) -> int:
    """One Ray group task per part: sort by (band_hash, band_id, doc_id),
    write ``part-%05d/gen-%06d.parquet`` atomically.  Returns total rows."""

    def write_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({"part": [], "rows": []}, dtype=np.int64)
        part = int(g["part"].iloc[0])
        d = g.sort_values(["band_hash", "band_id", "doc_id"], kind="mergesort")
        t = pa.table(
            {
                "band_id": pa.array(d["band_id"].to_numpy(), type=pa.int64()),
                "band_hash": pa.array(d["band_hash"].to_numpy(), type=pa.int64()),
                "doc_id": pa.array(d["doc_id"].to_numpy(), type=pa.int64()),
            }
        )
        pdir = os.path.join(store_dir, f"part-{part:05d}")
        os.makedirs(pdir, exist_ok=True)
        final = os.path.join(pdir, f"gen-{gen:06d}.parquet")
        tmp = f"{final}.tmp-{os.getpid()}"
        pq.write_table(t, tmp, row_group_size=ROW_GROUP)
        os.replace(tmp, final)
        return pd.DataFrame({"part": [part], "rows": [len(d)]})

    stats = bands_ds.groupby("part").map_groups(write_part, batch_format="pandas")
    total = 0
    for b in stats.iter_batches(batch_format="pandas"):
        total += int(b["rows"].sum()) if len(b) else 0
    return total


def build_band_store(
    input_path,
    store_dir: str,
    *,
    num_parts: int = 32,
    num_perms: int = DEFAULT_NUM_PERMS,
    rows_per_band: int = 2,
    shingle_n: int = DEFAULT_SHINGLE,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Build generation 0 from scratch.  The store dir is always cleared
    first — stale parts from a crashed or re-parameterized build must not
    pollute probes (symbol-store precedent)."""
    params = {
        "num_parts": num_parts,
        "num_perms": num_perms,
        "rows_per_band": rows_per_band,
        "shingle_n": shingle_n,
        "seed": seed,
        "mod": MERSENNE_31,
    }
    shutil.rmtree(store_dir, ignore_errors=True)
    os.makedirs(store_dir, exist_ok=True)
    total = _write_parts(
        _bands_ds(input_path, params=params, id_col=id_col, text_col=text_col),
        store_dir,
        gen=0,
    )
    man = {**params, "generations": 1, "total_rows": total}
    atomic_write_json(os.path.join(store_dir, MANIFEST), man)
    return man


def append_band_store(
    store_dir: str, input_path, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Add a new corpus slice as the next generation (no part rewrite)."""
    man = _load_manifest(store_dir)
    gen = int(man["generations"])
    total = _write_parts(
        _bands_ds(input_path, params=man, id_col=id_col, text_col=text_col),
        store_dir,
        gen=gen,
    )
    man["generations"] = gen + 1
    man["total_rows"] = int(man["total_rows"]) + total
    atomic_write_json(os.path.join(store_dir, MANIFEST), man)
    return man


def _part_files(store_dir: str, part: int, generations: int) -> list[str]:
    pdir = os.path.join(store_dir, f"part-{part:05d}")
    return [
        f
        for g in range(generations)
        if os.path.exists(f := os.path.join(pdir, f"gen-{g:06d}.parquet"))
    ]


def _read_pruned(path: str, keys: np.ndarray) -> pa.Table | None:
    """Row groups whose [min, max] band_hash range contains a probe key
    (parts are band_hash-sorted, so ranges are tight and disjoint)."""
    pf = pq.ParquetFile(path)
    schema_idx = pf.schema_arrow.get_field_index("band_hash")
    rgs = []
    for i in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(i).column(schema_idx).statistics
        if st is None or st.min is None:
            rgs.append(i)
            continue
        lo = int(np.searchsorted(keys, st.min, side="left"))
        if lo < len(keys) and int(keys[lo]) <= st.max:
            rgs.append(i)
    if not rgs:
        return None
    return pf.read_row_groups(rgs, columns=["band_id", "band_hash", "doc_id"])


def probe_band_store(
    store_dir: str,
    new_input,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Candidate (new_id, old_id) pairs: new docs' bands co-partitioned
    with the store, per-part pruned-row-group join.  Returns a Dataset of
    DISTINCT pairs; band params come from the store manifest so probe and
    store always agree."""
    man = _load_manifest(store_dir)
    generations = int(man["generations"])
    bands = _bands_ds(new_input, params=man, id_col=id_col, text_col=text_col)

    def probe_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"new_id": [], "old_id": []}, dtype=np.int64)
        if not len(g):
            return empty
        part = int(g["part"].iloc[0])
        files = _part_files(store_dir, part, generations)
        if not files:
            return empty
        keys = np.unique(g["band_hash"].to_numpy())
        stored = [t for f in files if (t := _read_pruned(f, keys)) is not None]
        if not stored:
            return empty
        st = pa.concat_tables(stored).to_pandas()
        hit = g[["band_id", "band_hash", "doc_id"]].merge(
            st, on=["band_id", "band_hash"], suffixes=("_new", "_old")
        )
        if not len(hit):
            return empty
        out = hit[["doc_id_new", "doc_id_old"]].drop_duplicates()
        return pd.DataFrame(
            {
                "new_id": out["doc_id_new"].to_numpy(np.int64),
                "old_id": out["doc_id_old"].to_numpy(np.int64),
            }
        )

    pairs = bands.groupby("part").map_groups(probe_part, batch_format="pandas")

    def dedup_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    # a (new, old) pair can surface from several bands in DIFFERENT parts —
    # distinct across the whole result, one tiny pair-keyed shuffle
    return pairs.groupby(["new_id", "old_id"]).map_groups(
        dedup_group, batch_format="pandas"
    )
