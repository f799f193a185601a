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
from dataclasses import asdict, dataclass, field
from typing import Any

MANIFEST_NAME = "manifest.json"
PARTITION_DIR = "_manifests"
SEGMENT_DIR = "segments"
DOCSTORE_DIR = "docstore"


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

    def shard_files(self, root: str) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for p in self.partitions:
            out.setdefault(int(p["shard"]), []).append(os.path.join(root, p["path"]))
        return out


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


def publish_manifest(root: str, manifest: IndexManifest) -> str:
    path = os.path.join(root, MANIFEST_NAME)
    atomic_write_json(path, asdict(manifest))
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
