"""Directory-tree ingestion front door — "point it at a checkout".

Behavioral analog of the reference's FileFinder
(``indexing/file_finder.py:227-306``: os.walk with excluded-dir pruning that
spares force-include subtrees; ``:151-184`` ``_is_text_file`` null-byte +
encoding sniff; ``_should_include_file`` absolute max-size gate) plus the
override-rule precedence of ``services/override_filter_service.py``:

    1. force_exclude_patterns   (absolute exclusion)
    2. force_include_patterns   (overrides base exclusion — but never the
                                 max-size gate, which the reference applies
                                 before any override)
    3. extension add/remove overrides
    4. directory add-exclude overrides
    5. base result (allow-listed extension, not excluded, not gitignored)

Ray-Data split of responsibilities:

- :func:`walk_tree` is a DRIVER-side metadata walk (path/size/mtime only —
  no file contents are read except ``.gitignore`` files, mirroring the
  reference's root + one-level-deep gitignore loading).  The walk prunes
  excluded directories before descending, so a ``node_modules`` with 10^6
  entries costs one directory-name match, not 10^6 stats.
- :func:`ingest_tree` turns the walk into a Dataset and does ALL file
  reading in a distributed ``map_batches`` stage (:class:`ReadFilesStage`):
  byte read, null-byte binary sniff, frozen encoding-chain decode, md5,
  extension→language mapping.  Bytes never touch the driver.

At 100 TB-checkout scale the walk itself is the metadata bottleneck; the
``shard_dirs`` escape hatch walks each top-level subtree in its own Ray task
and unions the metadata, keeping the driver's copy to one shard at a time.

Output schema (stable): ``doc_id, url (relative path), text, lang, size,
mtime_ms, sha`` — directly composable with ``build_index`` (store url/lang),
``sync_repository`` (url-keyed diffs) and ``watch``.
"""

from __future__ import annotations

import hashlib
import os
import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from ..query.globmatch import glob_to_regex, normalize_path
from ..text.extract import ENCODING_CHAIN

__all__ = [
    "TreeConfig",
    "walk_tree",
    "ingest_tree",
    "ReadFilesStage",
    "DEFAULT_EXTENSIONS",
    "DEFAULT_EXCLUDE_DIRS",
]

#: reference ``config.py`` file_extensions default (Config.file_extensions)
DEFAULT_EXTENSIONS: tuple[str, ...] = (
    "py", "js", "ts", "tsx", "java", "c", "cpp", "cs", "h", "hpp", "go",
    "rs", "rb", "php", "pl", "pm", "pod", "t", "psgi", "sh", "bash",
    "html", "css", "md", "json", "yaml", "yml", "toml", "sql", "swift",
    "kt", "kts", "scala", "dart", "vue", "jsx", "pas", "pp", "dpr", "dpk",
    "inc", "lua", "xml", "xsd", "xsl", "xslt", "groovy", "gradle", "gvy",
    "gy", "cxx", "cc", "hxx", "rake", "rbw", "gemspec", "htm", "scss",
    "sass",
)

#: reference ``config.py`` exclude_dirs default (truncated to the stable set)
DEFAULT_EXCLUDE_DIRS: tuple[str, ...] = (
    "node_modules", "venv", "__pycache__", ".git", "dist", "build",
    "target", ".idea", ".vscode", ".gradle", "bin", "obj", "coverage",
    ".next", ".nuxt",
)

#: reference FileFinder._create_gitignore_spec common artifact patterns
COMMON_EXCLUDE_PATTERNS: tuple[str, ...] = (
    "*.pyc", "*.pyo", "*.pyd", "__pycache__/", ".mypy_cache/",
    ".pytest_cache/", ".coverage", ".tox/", ".nox/",
    "*.so", "*.dylib", "*.dll",
    ".DS_Store", "Thumbs.db",
    "*.tmp", "*.temp", "*.swp", "*.swo", "*~",
    "node_modules/", "build/", "dist/", "target/", ".git/",
)


@dataclass(frozen=True)
class TreeConfig:
    file_extensions: tuple[str, ...] = DEFAULT_EXTENSIONS
    exclude_dirs: tuple[str, ...] = DEFAULT_EXCLUDE_DIRS
    max_file_size: int = 1_048_576  # reference IndexingConfig.max_file_size
    respect_gitignore: bool = True
    # override tier (reference OverrideConfig)
    force_include_patterns: tuple[str, ...] = ()
    force_exclude_patterns: tuple[str, ...] = ()
    add_extensions: tuple[str, ...] = ()
    remove_extensions: tuple[str, ...] = ()
    add_exclude_dirs: tuple[str, ...] = ()

    @property
    def effective_extensions(self) -> frozenset:
        return frozenset(self.file_extensions) | frozenset(self.add_extensions)


class _PatternSet:
    """Ordered gitignore-style matcher: last matching pattern wins, ``!``
    negates, a trailing ``/`` (or any match of the bare pattern) also claims
    everything under the matched directory (the reference feeds the same
    lines to pathspec's gitwildmatch, which behaves this way)."""

    def __init__(self, patterns: list[str]):
        #: (pattern-regex, under-regex, negated, bare) — bare = no '/' in the
        #: source pattern, which per gitignore matches the basename anywhere
        self.rules: list[tuple[re.Pattern, re.Pattern, bool, bool]] = []
        self.sources: list[str] = []
        for raw in patterns:
            raw = raw.strip()
            if not raw or raw.startswith("#"):
                continue
            neg = raw.startswith("!")
            if neg:
                raw = raw[1:]
            pat = raw.rstrip("/")
            if not pat:
                continue
            self.rules.append(
                (
                    glob_to_regex(pat),
                    glob_to_regex(pat + "/**"),
                    neg,
                    "/" not in pat,
                )
            )
            self.sources.append(pat)

    def match(self, path: str) -> bool:
        """gitignore decision for ``path`` (relative, ``/``-separated)."""
        norm = normalize_path(path)
        base = norm.rsplit("/", 1)[-1]
        decision = False
        for rx, under, neg, bare in self.rules:
            hit = bool(rx.match(norm)) or bool(under.match(norm))
            if not hit and bare:
                hit = bool(rx.match(base))
            if hit:
                decision = not neg
        return decision


def _load_gitignore(root: str) -> list[str]:
    """Root ``.gitignore`` + immediate-subdirectory ``.gitignore`` files
    (reference ``_add_gitignore_patterns``: one level deep only; nested
    non-anchored lines are prefixed with their directory)."""
    patterns: list[str] = []

    def read(path: str, prefix: str) -> None:
        try:
            with open(path, encoding="utf-8", errors="ignore") as f:
                for line in f:
                    line = line.strip()
                    if not line or line.startswith("#"):
                        continue
                    if prefix and not line.startswith("/"):
                        line = f"{prefix}/{line}"
                    patterns.append(line.lstrip("/"))
        except OSError:
            pass

    read(os.path.join(root, ".gitignore"), "")
    try:
        for name in sorted(os.listdir(root)):
            sub = os.path.join(root, name)
            if os.path.isdir(sub) and name not in {
                ".git", "__pycache__", ".mypy_cache", "node_modules",
            }:
                gi = os.path.join(sub, ".gitignore")
                if os.path.exists(gi):
                    read(gi, name)
    except OSError:
        pass
    return patterns


def _exclude_pattern_set(root: str, cfg: TreeConfig) -> _PatternSet:
    patterns: list[str] = []
    for d in (*cfg.exclude_dirs, *cfg.add_exclude_dirs):
        patterns.append(f"{d}/**")
        patterns.append(f"**/{d}/**")
    patterns.extend(COMMON_EXCLUDE_PATTERNS)
    if cfg.respect_gitignore:
        patterns.extend(_load_gitignore(root))
    return _PatternSet(patterns)


def walk_tree(root: str, config: TreeConfig | None = None) -> list[dict]:
    """Metadata-only candidate discovery: relative path, size, mtime of every
    file passing the reference's filter chain.  No file content is read (the
    binary sniff for allow-listed extensions is a no-op in the reference too
    — ``_is_text_file`` returns True on extension match; content-level
    sniffing happens in :class:`ReadFilesStage`)."""
    cfg = config or TreeConfig()
    root = os.path.abspath(root)
    if not os.path.exists(root):
        raise ValueError(f"tree root does not exist: {root}")
    if not os.path.isdir(root):
        raise ValueError(f"tree root is not a directory: {root}")

    excl = _exclude_pattern_set(root, cfg)
    f_inc = _PatternSet(list(cfg.force_include_patterns)) if cfg.force_include_patterns else None
    f_exc = _PatternSet(list(cfg.force_exclude_patterns)) if cfg.force_exclude_patterns else None
    exts = cfg.effective_extensions - frozenset(cfg.remove_extensions)

    out: list[dict] = []
    for dirpath, dirnames, filenames in os.walk(root):
        rel_dir = os.path.relpath(dirpath, root)
        rel_dir = "" if rel_dir == "." else rel_dir.replace(os.sep, "/")

        # prune excluded directories BEFORE descending — but keep any dir a
        # force-include pattern could reach (reference find_files keep rule)
        keep_dirs = []
        for d in sorted(dirnames):
            rd = f"{rel_dir}/{d}" if rel_dir else d
            if excl.match(rd + "/") or excl.match(rd):
                if f_inc is not None and _force_could_match_under(f_inc, rd):
                    keep_dirs.append(d)
                continue
            keep_dirs.append(d)
        dirnames[:] = keep_dirs

        for name in sorted(filenames):
            rel = f"{rel_dir}/{name}" if rel_dir else name
            full = os.path.join(dirpath, name)
            try:
                st = os.stat(full)
            except OSError:
                continue
            # absolute gate: the reference checks size BEFORE any override
            if st.st_size > cfg.max_file_size:
                continue
            if not _should_include(rel, exts, excl, f_inc, f_exc):
                continue
            out.append(
                {
                    "path": rel,
                    "size": int(st.st_size),
                    "mtime_ms": int(st.st_mtime * 1000),
                }
            )
    out.sort(key=lambda m: m["path"])
    return out


def _force_could_match_under(f_inc: _PatternSet, rel_dir: str) -> bool:
    """Reference keep-rule: don't prune an excluded dir when a force-include
    pattern could match files beneath it."""
    if f_inc.match(rel_dir + "/probe.txt"):
        return True
    top = rel_dir.split("/", 1)[0]
    for (rx, under, neg, bare), src in zip(f_inc.rules, f_inc.sources):
        if neg:
            continue
        # prefix heuristic like the reference: pattern rooted at this dir
        if src.startswith(rel_dir) or src.split("/", 1)[0] == top:
            return True
    return False


def _should_include(
    rel: str,
    exts: frozenset,
    excl: _PatternSet,
    f_inc: _PatternSet | None,
    f_exc: _PatternSet | None,
) -> bool:
    # 1. force_exclude: absolute
    if f_exc is not None and f_exc.match(rel):
        return False
    # 2. force_include: overrides base exclusion
    if f_inc is not None and f_inc.match(rel):
        return True
    # base: extension allow-list + exclude patterns
    ext = rel.rsplit(".", 1)[-1] if "." in rel.rsplit("/", 1)[-1] else ""
    if ext not in exts:
        return False
    if excl.match(rel):
        return False
    return True


#: extension → language tag for the corpus lang column (compact projection of
#: the reference's language mapping; langmap.py owns the query-side aliases)
_EXT_LANG: dict[str, str] = {
    "py": "python", "js": "javascript", "jsx": "javascript",
    "ts": "typescript", "tsx": "typescript", "java": "java", "c": "c",
    "h": "c", "cpp": "cpp", "cc": "cpp", "cxx": "cpp", "hpp": "cpp",
    "hxx": "cpp", "cs": "csharp", "go": "go", "rs": "rust", "rb": "ruby",
    "rake": "ruby", "rbw": "ruby", "gemspec": "ruby", "php": "php",
    "pl": "perl", "pm": "perl", "sh": "shell", "bash": "shell",
    "html": "html", "htm": "html", "css": "css", "scss": "css",
    "sass": "css", "md": "markdown", "json": "json", "yaml": "yaml",
    "yml": "yaml", "toml": "toml", "sql": "sql", "swift": "swift",
    "kt": "kotlin", "kts": "kotlin", "scala": "scala", "dart": "dart",
    "vue": "vue", "lua": "lua", "xml": "xml", "groovy": "groovy",
}


def _lang_of(path: str) -> str:
    name = path.rsplit("/", 1)[-1]
    ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
    return _EXT_LANG.get(ext, "text")


class ReadFilesStage:
    """Actor-pool file reader: bytes → (text, sha, lang), distributed.

    Per file: read, null-byte binary sniff on the first 1 KiB (reference
    ``_is_text_file:151-184`` — binary files are dropped even when their
    extension passed the allow-list), frozen encoding-chain decode
    (utf-8 → utf-8-sig → latin-1 → cp1252, total), md5 of the raw bytes.
    The Python loop is per-FILE I/O, not per-row compute — each iteration is
    an open/read syscall pair; batches of paths parallelize across the pool.
    """

    def __init__(self, root: str):
        self.root = os.path.abspath(root)

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch["path"].to_pylist()
        texts: list[str | None] = []
        shas: list[str | None] = []
        langs: list[str] = []
        keep = np.ones(len(paths), dtype=bool)
        for i, rel in enumerate(paths):
            try:
                with open(os.path.join(self.root, rel), "rb") as f:
                    raw = f.read()
            except OSError:
                keep[i] = False
                texts.append(None), shas.append(None), langs.append("")
                continue
            if b"\x00" in raw[:1024]:
                keep[i] = False
                texts.append(None), shas.append(None), langs.append("")
                continue
            text = None
            for enc in ENCODING_CHAIN:
                try:
                    text = raw.decode(enc)
                    break
                except UnicodeDecodeError:
                    continue
            texts.append(text)
            shas.append(hashlib.md5(raw).hexdigest())
            langs.append(_lang_of(rel))
        t = batch.append_column("text", pa.array(texts, pa.string()))
        t = t.append_column("sha", pa.array(shas, pa.string()))
        t = t.append_column("lang", pa.array(langs, pa.string()))
        return t.filter(pa.array(keep))


def ingest_tree(
    root: str,
    out_dir: str | None = None,
    *,
    config: TreeConfig | None = None,
    concurrency: int = 4,
    batch_size: int = 64,
    id_map: str | None = None,
):
    """Walk ``root`` and produce the engine's corpus Dataset
    (``doc_id, url, text, lang, size, mtime_ms, sha``); optionally persist it
    as partitioned parquet at ``out_dir`` for ``build_index`` /
    ``sync_repository`` composition.

    doc ids: without ``id_map``, the rank of the sorted relative path —
    deterministic for one tree state.  With ``id_map`` (a sidecar parquet
    path), ids are STABLE ACROSS RE-INGESTS: known urls keep their allocated
    id, new urls get fresh ids above the historical maximum (in sorted-path
    order), and ids of deleted files are never reused (the map keeps every
    historical allocation — tombstone hygiene for the sync tier).  This is
    what makes ``ingest → mutate tree → re-ingest → sync_repository`` an
    INCREMENTAL merge instead of a corpus-wide id churn.
    """
    import ray.data as rd

    cfg = config or TreeConfig()
    metas = walk_tree(root, cfg)
    if id_map is not None:
        _assign_mapped_ids(metas, id_map)
    else:
        for i, m in enumerate(metas):
            m["doc_id"] = i
    if not metas:
        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "url": pa.array([], pa.string()),
                    "text": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "size": pa.array([], pa.int64()),
                    "mtime_ms": pa.array([], pa.int64()),
                    "sha": pa.array([], pa.string()),
                }
            )
        )
    else:
        ds = (
            rd.from_items(metas)
            .map_batches(
                ReadFilesStage(root),
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
            .map_batches(_finalize_schema, batch_format="pyarrow")
        )
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        ds = ds.materialize()
        ds.write_parquet(out_dir)
    return ds


def _assign_mapped_ids(metas: list[dict], id_map: str) -> None:
    """Stable-id allocation against a sidecar parquet map (url, doc_id):
    known urls keep their id; new urls get max+1.. in sorted-path order; the
    updated map (historical union — deleted urls stay) is atomically
    rewritten.  The map is ingest-time-small (one row per path ever seen);
    at web scale it shards like any dimension table."""
    import pyarrow.parquet as pq_mod

    known: dict[str, int] = {}
    if os.path.exists(id_map):
        t = pq_mod.read_table(id_map, columns=["url", "doc_id"])
        known = dict(
            zip(t["url"].to_pylist(), (int(i) for i in t["doc_id"].to_pylist()))
        )
    nxt = max(known.values(), default=-1) + 1
    for m in metas:  # metas are sorted by path → deterministic allocation
        got = known.get(m["path"])
        if got is None:
            got = nxt
            known[m["path"]] = got
            nxt += 1
        m["doc_id"] = got
    tmp = id_map + ".tmp"
    urls = sorted(known)
    pq_mod.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "doc_id": pa.array([known[u] for u in urls], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, id_map)


def _finalize_schema(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "url": batch["path"].cast(pa.string()),
            "text": batch["text"],
            "lang": batch["lang"],
            "size": batch["size"].cast(pa.int64()),
            "mtime_ms": batch["mtime_ms"].cast(pa.int64()),
            "sha": batch["sha"],
        }
    )
