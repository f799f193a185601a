"""Virtual directory tree (reference global_repos/directory_explorer.py):
depth limit, per-dir file caps + hidden counts, include/exclude globs,
hidden-entry pruning, subdir re-rooting, dirs-before-files ordering,
box-drawing renderer."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from code_indexer_ray.query.explore import (
    directory_tree,
    format_tree,
    tree_totals,
)

PATHS = [
    "a/x.py", "a/y.py", "a/z.py", "a/.secret.py",
    "a/sub/m.py", "a/sub/deep/too/far.py",
    "b/only.txt", "node_modules/junk.js", "B/case.txt",
    "top.md",
]


@pytest.fixture()
def ds(ray_session):
    return rd.from_arrow(pa.table({"url": PATHS}))


def _rows(t):
    return {r["path"]: r for r in t.to_pylist()}


class TestTree:
    def test_caps_depth_hidden_excludes(self, ds):
        t = directory_tree(ds, max_depth=2, max_files_per_dir=2)
        rows = _rows(t)
        # default excludes prune node_modules; hidden file pruned
        assert "node_modules" not in rows and "a/.secret.py" not in rows
        # cap=2: a keeps x.py, y.py; z.py hidden and uncounted in totals
        a = rows["a"]
        assert (a["n_files"], a["hidden_files"], a["truncated"]) == (3, 1, True)
        assert "a/z.py" not in rows
        # a/sub at the depth limit: truncated, children invisible
        sub = rows["a/sub"]
        assert sub["truncated"] and sub["n_files"] == 0
        assert "a/sub/m.py" not in rows
        # case-insensitive ordering keeps both B and b as separate dirs
        assert {"B", "b"} <= set(rows)
        assert tree_totals(t) == {
            "total_directories": 4,
            "total_files": 5,
            "max_depth_reached": True,
        }

    def test_include_patterns_filter_files_and_prune_dirs(self, ds):
        t = directory_tree(ds, max_depth=3, max_files_per_dir=50,
                           include=("*.txt",))
        rows = _rows(t)
        assert set(r for r in rows if rows[r]["kind"] == "file") == {
            "B/case.txt", "b/only.txt"
        }
        # dirs without matching descendants vanish (virtual tree)
        assert "a" not in rows

    def test_exclude_glob_prunes_subtree(self, ds):
        t = directory_tree(ds, max_depth=3, exclude=("a",))
        rows = _rows(t)
        assert not any(p == "a" or p.startswith("a/") for p in rows)

    def test_include_hidden(self, ds):
        t = directory_tree(ds, max_depth=2, include_hidden=True)
        assert "a/.secret.py" in _rows(t)

    def test_subdir_reroot_and_missing(self, ds):
        t = directory_tree(ds, subdir="a", max_depth=1, max_files_per_dir=50)
        rows = _rows(t)
        # re-rooted: files of a/ at depth 1, root carries the subdir name
        assert rows[""]["name"] == "a"
        assert {"sub", "x.py", "y.py", "z.py"} == set(p for p in rows if p)
        assert rows["sub"]["truncated"]  # m.py below the re-rooted depth 1
        with pytest.raises(ValueError, match="does not exist"):
            directory_tree(ds, subdir="ghost")

    def test_max_depth_bounds(self, ds):
        with pytest.raises(ValueError, match="1..10"):
            directory_tree(ds, max_depth=0)

    def test_format_tree(self, ds):
        t = directory_tree(ds, max_depth=2, max_files_per_dir=2)
        s = format_tree(t, show_stats=True)
        assert "├── a/" in s
        assert "└── ... and 1 more files" in s
        assert "sub/ [...]" in s
        assert s.rstrip().endswith("4 directories, 5 files")

    def test_duplicate_paths_collapse(self, ray_session):
        ds = rd.from_arrow(pa.table({"url": ["a/x.py"] * 7 + ["a/y.py"]}))
        t = directory_tree(ds, max_depth=3)
        rows = _rows(t)
        assert rows["a"]["n_files"] == 2
        assert tree_totals(t)["total_files"] == 2
