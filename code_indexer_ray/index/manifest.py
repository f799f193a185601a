"""Index manifests: per-partition lineage + global stats, atomic publish, resume.

Ray-native replacement for the reference's ``ProgressiveMetadata`` JSON
checkpoint (``services/progressive_metadata.py:70-139``) and its atomic
temp-dir + rename publish (``tantivy_index_manager.py:1086-1130``):

- every (shard, bucket) encode task writes its segment file atomically
  (tmp + ``os.replace``) and then a tiny partition manifest JSON — idempotent,
  keyed by partition id;
- the driver publishes one global ``manifest.json`` (N, total_tokens, avgdl,
  partition list) with the same tmp+rename pattern;
- resume = anti-join of planned partitions vs existing partition manifests
  (the reference's "remaining = planned − completed",
  ``progressive_metadata.py:239-246``), realized as a doc-range predicate
  pushed into the Parquet read so completed shards are never re-read.
"""

from __future__ import annotations

import json
import os
import tempfile
from collections.abc import Mapping
from dataclasses import asdict, dataclass, field
from typing import Any, Iterator

MANIFEST_NAME = "manifest.json"
PARTITION_DIR = "_manifests"
SEGMENT_DIR = "segments"
DOCSTORE_DIR = "docstore"
#: published-manifest partition index: above this partition count the global
#: manifest stops inlining the partition list (10^6 partitions at 100 TB
#: would make manifest.json itself the bottleneck — SCALE.md limit #1) and
#: per-shard JSON files under _manifests/pindex/ hold it instead, loaded
#: lazily per shard at query time.
PINDEX_DIR = os.path.join(PARTITION_DIR, "pindex")
PINDEX_THRESHOLD = 4096


@dataclass
class PartitionInfo:
    shard: int
    bucket: int
    n_terms: int
    n_postings: int
    total_tokens: int
    n_bytes: int
    path: str
    build_secs: float
    fingerprint: str = ""
    # multi-field builds: per-field token totals of this partition (keys of
    # field ``f`` are one contiguous dictionary slice; summed at publish into
    # manifest.metrics["fields"] for per-field avgdl)
    field_tokens: dict = field(default_factory=dict)


@dataclass
class IndexManifest:
    num_docs: int
    total_tokens: int
    num_shards: int
    num_buckets: int
    doc_id_upper: int
    text_col: str
    id_col: str
    version: int = 1
    partitions: list[dict] = field(default_factory=list)
    metrics: dict[str, Any] = field(default_factory=dict)

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.num_docs if self.num_docs else 0.0

    @property
    def fields(self) -> dict[str, dict] | None:
        """Multi-field schema: {field: {"col": input column, "total_tokens": n}}
        or None for a single-field index."""
        return self.metrics.get("fields")

    def field_avgdl(self, fname: str) -> float:
        """Per-field average document length (field token total / N — every
        corpus row counts, including rows where the field is empty, matching
        the per-field BM25 twin)."""
        f = (self.fields or {}).get(fname)
        if f is None:
            raise KeyError(f"index has no field {fname!r}")
        return f["total_tokens"] / self.num_docs if self.num_docs else 0.0

    def shard_files(self, root: str) -> Mapping:
        """shard → [segment paths].  Inline manifests return a plain dict; a
        sharded partition index returns a LAZY mapping that loads one
        per-shard JSON on first access — the driver never materializes 10^6
        partition entries to open one shard."""
        pidx = self.metrics.get("partition_index")
        if not self.partitions and pidx:
            return _LazyShardFiles(root, pidx["dir"], pidx["shards"])
        out: dict[int, list[str]] = {}
        for p in self.partitions:
            out.setdefault(int(p["shard"]), []).append(os.path.join(root, p["path"]))
        return out

    def iter_partitions(self, root: str) -> Iterator[dict]:
        """Every partition dict — from the inline list or, for a sharded
        partition index, streamed one per-shard file at a time (bounded
        memory regardless of partition count)."""
        if self.partitions or not self.metrics.get("partition_index"):
            yield from self.partitions
            return
        pidx = self.metrics["partition_index"]
        for shard in pidx["shards"]:
            with open(os.path.join(root, pidx["dir"], f"shard={int(shard):07d}.json")) as f:
                yield from json.load(f)

    @property
    def n_partitions(self) -> int:
        pidx = self.metrics.get("partition_index")
        if not self.partitions and pidx:
            return int(pidx["n_partitions"])
        return len(self.partitions)


def atomic_write_json(path: str, obj: Any) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=1, default=str)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def atomic_write_bytes(path: str, data: bytes) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def partition_manifest_path(root: str, shard: int, bucket: int) -> str:
    return os.path.join(root, PARTITION_DIR, f"s{shard:05d}_b{bucket:03d}.json")


def write_partition_manifest(root: str, info: PartitionInfo) -> None:
    atomic_write_json(partition_manifest_path(root, info.shard, info.bucket), asdict(info))


def completed_partitions(root: str, fingerprint: str | None = None) -> set[tuple[int, int]]:
    """Scan partition manifests — the 'completed' side of the resume anti-join.

    When ``fingerprint`` is given, a partition only counts as completed if its
    manifest records the SAME build fingerprint: resuming into an out_dir left
    by a different corpus / shard-count / bucket-count build must re-scan, not
    silently publish stale segments.
    """
    pdir = os.path.join(root, PARTITION_DIR)
    done: set[tuple[int, int]] = set()
    if not os.path.isdir(pdir):
        return done
    for name in os.listdir(pdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(pdir, name)) as f:
                d = json.load(f)
            if fingerprint is not None and d.get("fingerprint") != fingerprint:
                continue
            if os.path.exists(os.path.join(root, d["path"])):
                done.add((int(d["shard"]), int(d["bucket"])))
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # corrupt manifest → partition treated as incomplete
    return done


def incomplete_shards(
    root: str, num_shards: int, num_buckets: int, fingerprint: str | None = None
) -> list[int]:
    """Shards missing any bucket manifest → must be (re)built from input."""
    done = completed_partitions(root, fingerprint)
    return [
        s
        for s in range(num_shards)
        if any((s, b) not in done for b in range(num_buckets))
    ]


class _LazyShardFiles(Mapping):
    """dict-like shard → [abs segment paths] over a sharded partition index;
    per-shard JSONs load on first access and are cached."""

    def __init__(self, root: str, rel_dir: str, shards: list[int]):
        self._root = root
        self._dir = os.path.join(root, rel_dir)
        self._shards = sorted(int(s) for s in shards)
        self._cache: dict[int, list[str]] = {}

    def __getitem__(self, shard: int) -> list[str]:
        shard = int(shard)
        v = self._cache.get(shard)
        if v is None:
            try:
                with open(os.path.join(self._dir, f"shard={shard:07d}.json")) as f:
                    lst = json.load(f)
            except FileNotFoundError:
                # Mapping contract: unknown keys raise KeyError (dict.get
                # would otherwise leak FileNotFoundError past its default)
                raise KeyError(shard) from None
            v = [os.path.join(self._root, p["path"]) for p in lst]
            self._cache[shard] = v
        return v

    def __iter__(self):
        return iter(self._shards)

    def __len__(self) -> int:
        return len(self._shards)


_GEN_RE = None  # compiled lazily (re import kept out of the hot path)


def _pindex_generations(pdir: str) -> list[int]:
    """Sorted generation numbers present under ``pindex/`` (``g%06d`` dirs)."""
    global _GEN_RE
    if _GEN_RE is None:
        import re

        _GEN_RE = re.compile(r"^g(\d{6,})$")
    if not os.path.isdir(pdir):
        return []
    gens = []
    for name in os.listdir(pdir):
        m = _GEN_RE.match(name)
        if m and os.path.isdir(os.path.join(pdir, name)):
            gens.append(int(m.group(1)))
    return sorted(gens)


def gc_pindex(root: str) -> list[str]:
    """Remove partition-index generations no longer reachable from the
    published manifest.  Kept: the generation the manifest points at AND the
    one immediately before it (a reader that loaded the previous manifest
    just before a publish may still be resolving shards from it); everything
    older is dead weight from past publishes/merges.  Returns removed dirs.
    Safe to call anytime — it reads only the CURRENT manifest."""
    import shutil

    pdir = os.path.join(root, PINDEX_DIR)
    gens = _pindex_generations(pdir)
    if not gens:
        return []
    try:
        m = load_manifest(root)
        pidx = m.metrics.get("partition_index") or {}
        cur_dir = pidx.get("dir", "")
    except (OSError, json.JSONDecodeError, KeyError):
        cur_dir = ""
    cur = None
    base = os.path.basename(cur_dir.rstrip("/"))
    if base.startswith("g") and base[1:].isdigit():
        cur = int(base[1:])
    keep: set[int] = set()
    if cur is not None and cur in gens:
        i = gens.index(cur)
        keep = {cur} | set(gens[max(0, i - 1) : i])
    else:
        # manifest is inline (or legacy flat layout): only the newest
        # generation could still be mid-publish — keep it, drop the rest
        keep = {gens[-1]}
    removed = []
    for g in gens:
        if g not in keep:
            path = os.path.join(pdir, f"g{g:06d}")
            shutil.rmtree(path, ignore_errors=True)
            removed.append(path)
    return removed


def publish_manifest(
    root: str, manifest: IndexManifest, *, pindex_threshold: int | None = None
) -> str:
    """Atomically publish the global manifest.  Above ``pindex_threshold``
    partitions (env ``CIDX_PINDEX_THRESHOLD`` overrides the default), the
    on-disk form is SHARDED: per-shard partition lists under a fresh
    GENERATION directory ``_manifests/pindex/g%06d/`` (written first, the
    manifest swap last — a crash between the two leaves the live manifest
    pointing at its own untouched generation, never at half-written files)
    and an empty inline list with a ``partition_index`` pointer in metrics.
    After the swap, generations older than (current, previous) are GC'd.
    The in-memory ``manifest`` object is left untouched."""
    thr = (
        pindex_threshold
        if pindex_threshold is not None
        else int(os.environ.get("CIDX_PINDEX_THRESHOLD", PINDEX_THRESHOLD))
    )
    d = asdict(manifest) if not isinstance(manifest, dict) else dict(manifest)
    parts = d.get("partitions") or []
    sharded = len(parts) > thr
    if sharded:
        pdir = os.path.join(root, PINDEX_DIR)
        gens = _pindex_generations(pdir)
        gen = (gens[-1] + 1) if gens else 1
        gdir_rel = os.path.join(PINDEX_DIR, f"g{gen:06d}")
        gdir = os.path.join(root, gdir_rel)
        by_shard: dict[int, list[dict]] = {}
        for p_ in parts:
            by_shard.setdefault(int(p_["shard"]), []).append(p_)
        for shard, lst in by_shard.items():
            atomic_write_json(os.path.join(gdir, f"shard={shard:07d}.json"), lst)
        d = {**d, "partitions": []}
        d["metrics"] = {
            **d.get("metrics", {}),
            "partition_index": {
                "mode": "sharded",
                "dir": gdir_rel,
                "n_partitions": len(parts),
                "shards": sorted(by_shard),
            },
        }
    path = os.path.join(root, MANIFEST_NAME)
    atomic_write_json(path, d)
    # GC runs on every publish: an inline publish over a previously-sharded
    # index also retires its dead generations (the newest stays — a reader
    # holding the just-replaced sharded manifest may still resolve from it)
    gc_pindex(root)
    return path


def load_manifest(root: str) -> IndexManifest:
    with open(os.path.join(root, MANIFEST_NAME)) as f:
        d = json.load(f)
    return IndexManifest(
        num_docs=d["num_docs"],
        total_tokens=d["total_tokens"],
        num_shards=d["num_shards"],
        num_buckets=d["num_buckets"],
        doc_id_upper=d["doc_id_upper"],
        text_col=d["text_col"],
        id_col=d["id_col"],
        version=d.get("version", 1),
        partitions=d.get("partitions", []),
        metrics=d.get("metrics", {}),
    )
