"""Virtual directory tree over the corpus's stored paths — the engine's
analog of the reference DIRECTORY EXPLORER (``global_repos/
directory_explorer.py``): hierarchical tree with depth limit, per-directory
file caps, include/exclude glob patterns, hidden-entry filtering, and the
dirs-before-files case-insensitive ordering, plus the same box-drawing
renderer.  The reference walks a golden repo's filesystem; here the "repo"
is an indexed corpus, so the tree is DERIVED FROM THE PATH COLUMN in the
data plane:

- one streaming ``map_batches`` pass filters paths (hidden segments,
  exclude globs on every ancestor, include globs on files) and explodes
  each surviving file into its ≤ ``max_depth``+1 visible node rows,
  deduplicated per batch;
- one ``groupby(parent).map_groups`` ranks each directory's children
  (dirs first, then files, case-insensitive) and applies the file cap —
  the only shuffle moves deduped node rows, never documents;
- the driver assembles the VISIBLE tree only (the query's actual result),
  so driver state is bounded by the rendered tree, not the corpus.

Reference semantics reproduced exactly (directory_explorer.py:151-270):
files past ``max_files_per_dir`` are hidden and NOT counted in
``total_files``; a directory at ``max_depth`` is shown ``truncated`` with
no children; hidden entries (``.``-prefixed segments) prune their subtree
unless ``include_hidden``; an exclude glob on any ancestor prunes the
subtree; include globs apply to files, and directories survive only when a
matching file remains beneath them (automatic in a virtual tree).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .globmatch import matches_any, normalize_path

#: reference DEFAULT_EXCLUDE_PATTERNS (directory_explorer.py:44-56), minus
#: the git internals a corpus path table never carries
DEFAULT_EXCLUDES = ("node_modules", "__pycache__", "*.pyc", ".venv", "venv")

_SCHEMA = pa.schema(
    [
        ("parent", pa.string()),
        ("name", pa.string()),
        ("kind", pa.string()),
        ("depth", pa.int64()),
    ]
)

_OUT_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("name", pa.string()),
        ("parent", pa.string()),
        ("depth", pa.int64()),
        ("kind", pa.string()),
        ("n_files", pa.int64()),
        ("n_dirs", pa.int64()),
        ("hidden_files", pa.int64()),
        ("truncated", pa.bool_()),
    ]
)


def _explode_nodes(
    paths: list[str],
    *,
    subdir: str | None,
    max_depth: int,
    include: tuple[str, ...],
    exclude: tuple[str, ...],
    include_hidden: bool,
) -> pa.Table:
    """One batch: path strings → deduped visible node rows.

    The exclusion walk is evaluated once per UNIQUE directory (paths repeat
    their ancestors heavily), cached within the batch.
    """
    prefix = f"{subdir}/" if subdir else ""
    dir_ok: dict[str, bool] = {"": True}

    def _dir_visible(d: str) -> bool:
        ok = dir_ok.get(d)
        if ok is not None:
            return ok
        head, _, name = d.rpartition("/")
        ok = (
            _dir_visible(head)
            and (include_hidden or not name.startswith("."))
            and not matches_any(d, exclude)
        )
        dir_ok[d] = ok
        return ok

    parents: list[str] = []
    names: list[str] = []
    kinds: list[str] = []
    depths: list[int] = []
    seen: set[tuple[str, str, str]] = set()

    for raw in paths:
        if raw is None:
            continue
        p = normalize_path(raw).lstrip("/")
        if prefix:
            if not p.startswith(prefix):
                continue
            p = p[len(prefix):]
        if not p:
            continue
        head, _, fname = p.rpartition("/")
        if not _dir_visible(head):
            continue
        if not include_hidden and fname.startswith("."):
            continue
        if matches_any(p, exclude):
            continue
        if include and not matches_any(p, include):
            continue
        parts = p.split("/")
        depth = len(parts)
        # the file itself (invisible past max_depth, ancestors still shown)
        if depth <= max_depth:
            key = (head, fname, "file")
            if key not in seen:
                seen.add(key)
                parents.append(head)
                names.append(fname)
                kinds.append("file")
                depths.append(depth)
        # ancestor directory chain, clamped to the depth limit
        for i in range(1, min(depth, max_depth + 1)):
            d_parent = "/".join(parts[: i - 1])
            key = (d_parent, parts[i - 1], "dir")
            if key not in seen:
                seen.add(key)
                parents.append(d_parent)
                names.append(parts[i - 1])
                kinds.append("dir")
                depths.append(i)
        if depth > max_depth:
            # the dir at the depth limit has invisible descendants: a
            # marker row creates its (otherwise childless) group so the
            # rank stage emits the truncated-by-depth stats row
            d = "/".join(parts[:max_depth])
            key = (d, "", "deep")
            if key not in seen:
                seen.add(key)
                parents.append(d)
                names.append("")
                kinds.append("deep")
                depths.append(max_depth + 1)
    return pa.table(
        {
            "parent": pa.array(parents, pa.string()),
            "name": pa.array(names, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "depth": pa.array(depths, pa.int64()),
        }
    )


def _rank_group(t: pa.Table, *, max_depth: int, cap: int) -> pa.Table:
    """One directory's deduped children → visible child rows + one stats
    row for the directory itself (row_kind='stats')."""
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_OUT_SCHEMA.append(
            pa.field("row_kind", pa.string())))
    parent = t["parent"][0].as_py()
    parent_depth = 0 if parent == "" else parent.count("/") + 1

    names = np.asarray(t["name"].to_pylist(), dtype=object)
    kinds = np.asarray(t["kind"].to_pylist(), dtype=object)
    # cross-batch dedup (per-batch `seen` sets don't see each other)
    uniq = {}
    for i in range(len(names)):
        uniq[(names[i], kinds[i])] = i
    idx = np.fromiter(uniq.values(), dtype=np.int64)
    names, kinds = names[idx], kinds[idx]

    is_file = kinds == "file"
    n_files = int(is_file.sum())
    n_dirs = int(len(kinds) - n_files)

    rows: list[dict] = []
    if parent_depth >= max_depth:
        # depth-truncated directory: children invisible (reference returns
        # children=[] with truncated=True and never scans deeper)
        rows.append(
            {
                "path": parent, "name": parent.rpartition("/")[2],
                "parent": parent.rpartition("/")[0],
                "depth": parent_depth, "kind": "dir", "n_files": 0,
                "n_dirs": 0, "hidden_files": 0, "truncated": True,
                "row_kind": "stats",
            }
        )
        return pa.Table.from_pylist(
            rows, schema=_OUT_SCHEMA.append(pa.field("row_kind", pa.string()))
        )

    hidden = max(0, n_files - cap)
    rows.append(
        {
            "path": parent, "name": parent.rpartition("/")[2],
            "parent": parent.rpartition("/")[0],
            "depth": parent_depth, "kind": "dir", "n_files": n_files,
            "n_dirs": n_dirs, "hidden_files": hidden,
            "truncated": hidden > 0, "row_kind": "stats",
        }
    )
    order = sorted(
        range(len(names)),
        key=lambda i: (kinds[i] == "file", str(names[i]).lower(), str(names[i])),
    )
    file_rank = 0
    for i in order:
        if kinds[i] == "file":
            if file_rank >= cap:
                break  # dirs sorted first — nothing visible remains
            file_rank += 1
        child = f"{parent}/{names[i]}" if parent else str(names[i])
        rows.append(
            {
                "path": child, "name": str(names[i]), "parent": parent,
                "depth": parent_depth + 1, "kind": str(kinds[i]),
                "n_files": 0, "n_dirs": 0, "hidden_files": 0,
                "truncated": False, "row_kind": "node",
            }
        )
    return pa.Table.from_pylist(
        rows, schema=_OUT_SCHEMA.append(pa.field("row_kind", pa.string()))
    )


def directory_tree(
    ds,
    *,
    path_col: str = "url",
    subdir: str | None = None,
    max_depth: int = 3,
    max_files_per_dir: int = 50,
    include: tuple[str, ...] = (),
    exclude: tuple[str, ...] = (),
    include_hidden: bool = False,
    use_default_excludes: bool = True,
) -> pa.Table:
    """Visible tree over ``ds``'s path column, one row per node.

    Node visibility (``kind``/``depth``/``truncated``/``hidden_files``)
    follows directory_explorer.py:151-270; see module docstring.  ``ds``
    is a ``ray.data.Dataset``; the result is the rendered tree only.

    Raises ValueError when ``subdir`` matches no stored path (the
    reference's "Path does not exist").
    """
    if not 1 <= max_depth <= 10:
        raise ValueError("max_depth must be in 1..10")
    subdir = normalize_path(subdir).strip("/") if subdir else None
    include = tuple(include)
    exclude = tuple(exclude) + (DEFAULT_EXCLUDES if use_default_excludes else ())

    def explode(batch: pa.Table) -> pa.Table:
        return _explode_nodes(
            batch[path_col].to_pylist(),
            subdir=subdir,
            max_depth=max_depth,
            include=include,
            exclude=exclude,
            include_hidden=include_hidden,
        )

    nodes = ds.select_columns([path_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    ranked = nodes.groupby("parent").map_groups(
        lambda t: _rank_group(t, max_depth=max_depth, cap=max_files_per_dir),
        batch_format="pyarrow",
    )
    parts = [ref for ref in ranked.to_arrow_refs()]
    import ray

    tables = [t for t in ray.get(parts) if isinstance(t, pa.Table) and t.num_rows]
    if not tables:
        if subdir:
            raise ValueError(f"Path does not exist: {subdir}")
        return _OUT_SCHEMA.empty_table()
    full = pa.concat_tables([t.select(_OUT_SCHEMA.names + ["row_kind"])
                             for t in tables])

    # node rows carry position; stats rows carry the dir's child counts —
    # fold the stats onto the matching dir node (root included explicitly)
    stats = full.filter(pc.equal(full["row_kind"], "stats"))
    node = full.filter(pc.equal(full["row_kind"], "node"))
    smap = {
        stats["path"][i].as_py(): (
            stats["n_files"][i].as_py(),
            stats["n_dirs"][i].as_py(),
            stats["hidden_files"][i].as_py(),
            stats["truncated"][i].as_py(),
        )
        for i in range(stats.num_rows)
    }
    out_rows = [
        {
            "path": "", "name": subdir.rpartition("/")[2] if subdir else "",
            "parent": "", "depth": 0, "kind": "dir",
            "n_files": smap.get("", (0, 0, 0, False))[0],
            "n_dirs": smap.get("", (0, 0, 0, False))[1],
            "hidden_files": smap.get("", (0, 0, 0, False))[2],
            "truncated": smap.get("", (0, 0, 0, False))[3],
        }
    ]
    for i in range(node.num_rows):
        r = {c: node[c][i].as_py() for c in _OUT_SCHEMA.names}
        if r["kind"] == "dir":
            st = smap.get(r["path"])
            if st is not None:
                r["n_files"], r["n_dirs"], r["hidden_files"], r["truncated"] = st
        out_rows.append(r)
    out = pa.Table.from_pylist(out_rows, schema=_OUT_SCHEMA)
    return out.sort_by([("path", "ascending"), ("kind", "ascending")])


def tree_totals(tree: pa.Table) -> dict:
    """Reference DirectoryTreeResult summary: total_directories excludes
    the root; capped/over-depth files are not counted (they were never
    'visited')."""
    kinds = tree["kind"]
    is_dir = pc.equal(kinds, "dir")
    n_dirs = pc.sum(pc.and_(is_dir, pc.not_equal(tree["path"], ""))).as_py() or 0
    n_files = pc.sum(pc.equal(kinds, "file")).as_py() or 0
    depth_trunc = pc.any(
        pc.and_(tree["truncated"], pc.equal(tree["n_files"], 0))
    ).as_py()
    return {
        "total_directories": int(n_dirs),
        "total_files": int(n_files),
        "max_depth_reached": bool(depth_trunc),
    }


def format_tree(tree: pa.Table, *, show_stats: bool = False) -> str:
    """Reference ``_format_tree_string``: box-drawing, dirs first,
    '... and N more files' markers, optional stats footer."""
    children: dict[str, list[dict]] = {}
    byp: dict[str, dict] = {}
    for i in range(tree.num_rows):
        r = {c: tree[c][i].as_py() for c in tree.column_names}
        byp.setdefault(r["path"], r)
        if r["path"] != "" or r["depth"] != 0:
            children.setdefault(r["parent"], []).append(r)

    lines: list[str] = [(byp.get("", {}).get("name") or ".") + "/"]

    def walk(path: str, indent: str) -> None:
        kids = children.get(path, [])
        kids.sort(key=lambda r: (r["kind"] == "file", r["name"].lower(), r["name"]))
        node = byp.get(path, {})
        extra = int(node.get("hidden_files") or 0)
        for j, k in enumerate(kids):
            last = j == len(kids) - 1 and extra == 0
            branch = "└── " if last else "├── "
            suffix = "/" if k["kind"] == "dir" else ""
            if k["kind"] == "dir" and int(k.get("n_files") or 0) == 0 and k[
                "truncated"
            ]:
                suffix = "/ [...]"  # depth-truncated
            lines.append(f"{indent}{branch}{k['name']}{suffix}")
            if k["kind"] == "dir":
                walk(k["path"], indent + ("    " if last else "│   "))
        if extra:
            lines.append(f"{indent}└── ... and {extra} more files")

    walk("", "")
    if show_stats:
        t = tree_totals(tree)
        lines.append("")
        lines.append(
            f"{t['total_directories']} directories, {t['total_files']} files"
        )
    return "\n".join(lines)
