"""SSTable-style KV doc store — the mget-heavy serving path (round 3).

The parquet doc store answers point reads through row-group pruning
(``IndexSearcher._fetch_texts``); that path decodes a whole row group's
column chunks per hit.  This module adds a SORTED-KEY store per shard:

  docstore_kv/shard={s}.bin          blocks of ``block_docs`` docs, each an
                                     independently zstd-compressed Arrow IPC
                                     batch (doc_id, text), doc_id-sorted
  docstore_kv/shard={s}.idx.parquet  sparse index: (min_id, max_id, offset,
                                     length, raw_length) per block
  docstore_kv/kv_meta.json           fingerprint + layout, written LAST
                                     (publish-last: readers ignore a
                                     half-built store)

Point read = one bisect over the in-memory sparse index (blocks/shard
entries, loaded lazily per shard) + one block decompress — no parquet
footer/column-chunk machinery on the hot path.  The parquet store remains
the source of truth; the KV layout is derived, fingerprint-checked, and
rebuilt by :func:`build_kv_docstore` (one Ray task per shard).

At cluster scale the per-shard ``.bin`` + sparse index maps 1:1 onto any
external KV/object store (the round-2 SCALE.md plan) — the interface stays
``IndexSearcher._fetch_texts``.
"""

from __future__ import annotations

import io
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .manifest import DOCSTORE_DIR, atomic_write_json, load_manifest

KV_DIR = "docstore_kv"
KV_META = "kv_meta.json"
DEFAULT_BLOCK_DOCS = 16


def _encode_block(tbl: pa.Table, codec: pa.Codec) -> tuple[bytes, int]:
    sink = io.BytesIO()
    with pa.ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    raw = sink.getvalue()
    return codec.compress(raw), len(raw)


def _decode_block(buf: bytes, raw_len: int, codec: pa.Codec) -> pa.Table:
    raw = codec.decompress(buf, decompressed_size=raw_len)
    with pa.ipc.open_stream(raw) as r:
        return r.read_all()


def _build_shard(
    shard_dir: str, out_bin: str, out_idx: str, text_col: str,
    block_docs: int, compression: str,
) -> tuple[int, int]:
    import glob

    files = sorted(glob.glob(os.path.join(shard_dir, "*.parquet")))
    if not files:
        return 0, 0
    tbl = pq.read_table(files, columns=["doc_id", text_col]).sort_by("doc_id")
    codec = pa.Codec(compression)
    mins, maxs, offs, lens, raws = [], [], [], [], []
    tmp_bin = out_bin + f".tmp-{os.getpid()}"
    pos = 0
    with open(tmp_bin, "wb") as f:
        for start in range(0, tbl.num_rows, block_docs):
            blk = tbl.slice(start, block_docs)
            buf, raw_len = _encode_block(blk, codec)
            f.write(buf)
            mins.append(int(blk["doc_id"][0].as_py()))
            maxs.append(int(blk["doc_id"][-1].as_py()))
            offs.append(pos)
            lens.append(len(buf))
            raws.append(raw_len)
            pos += len(buf)
    os.replace(tmp_bin, out_bin)
    idx = pa.table(
        {
            "min_id": pa.array(mins, pa.int64()),
            "max_id": pa.array(maxs, pa.int64()),
            "offset": pa.array(offs, pa.int64()),
            "length": pa.array(lens, pa.int64()),
            "raw_length": pa.array(raws, pa.int64()),
        }
    )
    tmp_idx = out_idx + f".tmp-{os.getpid()}"
    pq.write_table(idx, tmp_idx, compression="zstd")
    os.replace(tmp_idx, out_idx)
    return len(mins), pos


def build_kv_docstore(
    index_dir: str,
    *,
    block_docs: int = DEFAULT_BLOCK_DOCS,
    compression: str = "zstd",
) -> dict:
    """Derive the KV layout from the parquet doc store — one Ray task per
    shard, atomic per-shard files, meta written last.  Returns stats."""
    import ray

    m = load_manifest(index_dir)
    store = os.path.join(index_dir, DOCSTORE_DIR)
    kvdir = os.path.join(index_dir, KV_DIR)
    shutil.rmtree(kvdir, ignore_errors=True)
    os.makedirs(kvdir, exist_ok=True)

    shard_dirs = sorted(
        d for d in os.listdir(store) if d.startswith("shard=")
    ) if os.path.isdir(store) else []

    @ray.remote
    def task(sd: str) -> tuple[str, int, int]:
        s = sd.split("=", 1)[1]
        nblocks, nbytes = _build_shard(
            os.path.join(store, sd),
            os.path.join(kvdir, f"shard={s}.bin"),
            os.path.join(kvdir, f"shard={s}.idx.parquet"),
            m.text_col, block_docs, compression,
        )
        return s, nblocks, nbytes

    results = ray.get([task.remote(sd) for sd in shard_dirs])
    meta = {
        "fingerprint": m.metrics.get("fingerprint"),
        "block_docs": block_docs,
        "compression": compression,
        "text_col": m.text_col,
        "shards": sorted(int(s) for s, _, _ in results),
        "n_blocks": int(sum(n for _, n, _ in results)),
        "n_bytes": int(sum(b for _, _, b in results)),
    }
    atomic_write_json(os.path.join(kvdir, KV_META), meta)
    return meta


class KVDocStore:
    """Reader: lazy per-shard sparse indexes + an LRU of decompressed blocks."""

    def __init__(self, index_dir: str, num_shards: int, doc_id_upper: int):
        self.dir = os.path.join(index_dir, KV_DIR)
        with open(os.path.join(self.dir, KV_META)) as f:
            self.meta = json.load(f)
        self._codec = pa.Codec(self.meta["compression"])
        self._num_shards = num_shards
        self._upper = doc_id_upper
        self._idx: dict[int, tuple] = {}  # shard → (mins, maxs, offs, lens, raws)
        self._blocks: dict[tuple[int, int], pa.Table] = {}
        self._blocks_max = 256
        self._files: dict[int, object] = {}  # shard → open .bin handle

    @staticmethod
    def open_if_valid(index_dir: str, manifest) -> "KVDocStore | None":
        p = os.path.join(index_dir, KV_DIR, KV_META)
        if not os.path.exists(p):
            return None
        try:
            with open(p) as f:
                meta = json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
        fp_kv = meta.get("fingerprint")
        fp_idx = manifest.metrics.get("fingerprint")
        if fp_kv is None or fp_idx is None or fp_kv != fp_idx:
            # stale derivation from a different build — or EITHER side
            # missing its fingerprint (None == None must not pass) — ignore
            return None
        return KVDocStore(index_dir, manifest.num_shards, manifest.doc_id_upper)

    def _shard_index(self, shard: int):
        e = self._idx.get(shard)
        if e is None:
            path = os.path.join(self.dir, f"shard={shard}.idx.parquet")
            if not os.path.exists(path):
                e = (np.empty(0, np.int64),) * 5
            else:
                t = pq.read_table(path)
                e = tuple(
                    t[c].to_numpy(zero_copy_only=False)
                    for c in ("min_id", "max_id", "offset", "length", "raw_length")
                )
            self._idx[shard] = e
        return e

    def _block(self, shard: int, bi: int) -> pa.Table:
        key = (shard, bi)
        blk = self._blocks.get(key)
        if blk is None:
            mins, maxs, offs, lens, raws = self._shard_index(shard)
            f = self._files.get(shard)
            if f is None:
                f = open(os.path.join(self.dir, f"shard={shard}.bin"), "rb")
                self._files[shard] = f
            f.seek(int(offs[bi]))
            buf = f.read(int(lens[bi]))
            blk = _decode_block(buf, int(raws[bi]), self._codec)
            if len(self._blocks) >= self._blocks_max:
                self._blocks.pop(next(iter(self._blocks)))
            self._blocks[key] = blk
        else:
            self._blocks[key] = self._blocks.pop(key)  # LRU refresh
        return blk

    def fetch(self, doc_ids: list[int]) -> dict[int, str]:
        from .build import shard_of

        ids = np.asarray(sorted(set(int(i) for i in doc_ids)), dtype=np.int64)
        if len(ids) == 0:
            return {}
        shards = shard_of(ids, self._num_shards, self._upper)
        out: dict[int, str] = {}
        text_col = self.meta["text_col"]
        for s in np.unique(shards):
            sub = ids[shards == s]
            mins, maxs, offs, lens, raws = self._shard_index(int(s))
            if len(mins) == 0:
                continue
            bi = np.searchsorted(mins, sub, side="right") - 1
            ok = (bi >= 0) & (sub <= maxs[np.maximum(bi, 0)])
            for b in np.unique(bi[ok]):
                blk = self._block(int(s), int(b))
                want = sub[ok & (bi == b)]
                d = blk["doc_id"].to_numpy(zero_copy_only=False)
                pos = np.searchsorted(d, want)
                pos_c = np.minimum(pos, len(d) - 1)
                hit = d[pos_c] == want
                texts = blk[text_col]
                for i, p_ in zip(want[hit].tolist(), pos_c[hit].tolist()):
                    out[int(i)] = texts[int(p_)].as_py()
        return out
