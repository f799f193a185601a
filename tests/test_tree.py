"""Directory-tree ingestion front door (`pipelines/tree.py` — reference
`indexing/file_finder.py` analog): walk filtering, override precedence,
gitignore, binary sniff, encoding fallback, e2e ingest → build → search."""

from __future__ import annotations

import hashlib
import os

import pytest

from code_indexer_ray.pipelines.tree import (
    ReadFilesStage,
    TreeConfig,
    ingest_tree,
    walk_tree,
)


def _mk(root, rel: str, data: bytes | str = b"x = 1\n") -> str:
    p = os.path.join(root, rel)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(p, mode) as f:
        f.write(data)
    return p


@pytest.fixture()
def tree(tmp_path):
    root = str(tmp_path / "repo")
    _mk(root, "main.py")
    _mk(root, "lib/util.js")
    _mk(root, "lib/deep/mod.rs")
    _mk(root, "README.md")
    _mk(root, "notes.txt")                      # txt not in allow-list
    _mk(root, "noext")                          # no extension
    _mk(root, "node_modules/pkg/index.js")      # excluded dir
    _mk(root, "build/out.py")                   # excluded dir
    _mk(root, "a.pyc", b"\x00\x01")             # artifact pattern
    _mk(root, "big.py", b"#" * 2048)            # oversized vs max=1024
    return root


class TestWalk:
    def test_base_filtering(self, tree):
        got = [m["path"] for m in walk_tree(tree, TreeConfig(max_file_size=1024))]
        assert got == ["README.md", "lib/deep/mod.rs", "lib/util.js", "main.py"]

    def test_size_and_mtime_recorded(self, tree):
        m = {x["path"]: x for x in walk_tree(tree, TreeConfig(max_file_size=1024))}
        assert m["main.py"]["size"] == len(b"x = 1\n")
        assert m["main.py"]["mtime_ms"] > 0

    def test_max_size_is_absolute(self, tree):
        # force_include cannot resurrect an oversized file (reference
        # _should_include_file checks size before overrides)
        cfg = TreeConfig(max_file_size=1024, force_include_patterns=("big.py",))
        assert "big.py" not in [m["path"] for m in walk_tree(tree, cfg)]
        # raising the cap admits it
        cfg2 = TreeConfig(max_file_size=10_000)
        assert "big.py" in [m["path"] for m in walk_tree(tree, cfg2)]

    def test_force_include_overrides_excluded_dir(self, tree):
        cfg = TreeConfig(
            max_file_size=1024, force_include_patterns=("node_modules/pkg/*.js",)
        )
        got = [m["path"] for m in walk_tree(tree, cfg)]
        assert "node_modules/pkg/index.js" in got
        assert "build/out.py" not in got  # other excluded dirs stay pruned

    def test_force_exclude_beats_force_include(self, tree):
        cfg = TreeConfig(
            max_file_size=1024,
            force_include_patterns=("main.py",),
            force_exclude_patterns=("main.py",),
        )
        assert "main.py" not in [m["path"] for m in walk_tree(tree, cfg)]

    def test_extension_overrides(self, tree):
        cfg = TreeConfig(
            max_file_size=1024,
            add_extensions=("txt",),
            remove_extensions=("js",),
        )
        got = [m["path"] for m in walk_tree(tree, cfg)]
        assert "notes.txt" in got
        assert "lib/util.js" not in got

    def test_add_exclude_dirs(self, tree):
        cfg = TreeConfig(max_file_size=1024, add_exclude_dirs=("lib",))
        got = [m["path"] for m in walk_tree(tree, cfg)]
        assert got == ["README.md", "main.py"]

    def test_gitignore_root_and_nested(self, tmp_path):
        root = str(tmp_path / "r")
        _mk(root, ".gitignore", "secret/\n*.gen.py\n")
        _mk(root, "sub/.gitignore", "local.py\n")
        _mk(root, "keep.py")
        _mk(root, "secret/hidden.py")
        _mk(root, "auto.gen.py")
        _mk(root, "sub/local.py")
        _mk(root, "sub/fine.py")
        got = [m["path"] for m in walk_tree(root)]
        assert got == ["keep.py", "sub/fine.py"]

    def test_gitignore_negation(self, tmp_path):
        root = str(tmp_path / "r")
        _mk(root, ".gitignore", "*.gen.py\n!keep.gen.py\n")
        _mk(root, "a.gen.py")
        _mk(root, "keep.gen.py")
        got = [m["path"] for m in walk_tree(root)]
        assert got == ["keep.gen.py"]

    def test_gitignore_off(self, tmp_path):
        root = str(tmp_path / "r")
        _mk(root, ".gitignore", "a.py\n")
        _mk(root, "a.py")
        assert [m["path"] for m in walk_tree(root)] == []
        got = [m["path"] for m in walk_tree(root, TreeConfig(respect_gitignore=False))]
        assert got == ["a.py"]

    def test_errors(self, tmp_path):
        with pytest.raises(ValueError, match="does not exist"):
            walk_tree(str(tmp_path / "nope"))
        f = _mk(str(tmp_path), "afile.py")
        with pytest.raises(ValueError, match="not a directory"):
            walk_tree(f)


class TestReadStage:
    def test_sniff_decode_sha(self, tmp_path):
        import pyarrow as pa

        root = str(tmp_path / "r")
        _mk(root, "ok.py", b"print('hi')\n")
        _mk(root, "binary.py", b"\x7fELF\x00\x00junk")
        _mk(root, "latin.py", "caf\xe9\n".encode("latin-1"))
        stage = ReadFilesStage(root)
        batch = pa.table(
            {
                "path": ["ok.py", "binary.py", "latin.py", "gone.py"],
                "size": [1, 1, 1, 1],
                "mtime_ms": [0, 0, 0, 0],
                "doc_id": [0, 1, 2, 3],
            }
        )
        out = stage(batch)
        rows = {r["path"]: r for r in out.to_pylist()}
        # binary (null byte) and missing files dropped
        assert set(rows) == {"ok.py", "latin.py"}
        assert rows["ok.py"]["text"] == "print('hi')\n"
        assert rows["ok.py"]["sha"] == hashlib.md5(b"print('hi')\n").hexdigest()
        assert rows["ok.py"]["lang"] == "python"
        # latin-1 fallback decodes é
        assert rows["latin.py"]["text"] == "caf\xe9\n"


class TestIngestE2E:
    def test_ingest_build_search(self, ray_session, tmp_path, tree):
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.query.engine import IndexSearcher

        corpus = str(tmp_path / "corpus")
        ds = ingest_tree(tree, corpus, config=TreeConfig(max_file_size=1024))
        rows = {r["url"]: r for r in ds.take_all()}
        assert sorted(rows) == ["README.md", "lib/deep/mod.rs", "lib/util.js", "main.py"]
        # deterministic doc ids = sorted-path rank
        assert [rows[u]["doc_id"] for u in sorted(rows)] == [0, 1, 2, 3]
        idx = str(tmp_path / "idx")
        build_index(corpus, idx, store_cols=("lang", "url"), num_shards=2,
                    num_buckets=2, resume=False)
        s = IndexSearcher(idx, lang_col="lang", url_col="url")
        hits = s.search("x", snippet_lines=0)
        assert {h["path"] for h in hits} <= set(rows)

    def test_reingest_is_deterministic(self, ray_session, tree):
        a = ingest_tree(tree, config=TreeConfig(max_file_size=1024)).take_all()
        b = ingest_tree(tree, config=TreeConfig(max_file_size=1024)).take_all()
        key = lambda r: r["doc_id"]
        assert sorted(
            [(r["doc_id"], r["url"], r["sha"]) for r in a], key=lambda t: t[0]
        ) == sorted([(r["doc_id"], r["url"], r["sha"]) for r in b], key=lambda t: t[0])

    def test_empty_tree(self, ray_session, tmp_path):
        root = str(tmp_path / "empty")
        os.makedirs(root)
        ds = ingest_tree(root)
        assert ds.count() == 0
        assert set(ds.schema().names) == {
            "doc_id", "url", "text", "lang", "size", "mtime_ms", "sha",
        }


class TestStableIds:
    def test_id_map_stability_and_no_reuse(self, ray_session, tmp_path, tree):
        imap = str(tmp_path / "ids.parquet")
        cfg = TreeConfig(max_file_size=1024)
        a = {r["url"]: r["doc_id"]
             for r in ingest_tree(tree, config=cfg, id_map=imap).take_all()}
        # mutate: delete one, add one, modify one
        os.unlink(os.path.join(tree, "lib/util.js"))
        _mk(tree, "zz_new.py", b"fresh = True\n")
        _mk(tree, "main.py", b"x = 2\n")
        b = {r["url"]: r["doc_id"]
             for r in ingest_tree(tree, config=cfg, id_map=imap).take_all()}
        # surviving urls keep their ids
        for u in ("main.py", "README.md", "lib/deep/mod.rs"):
            assert b[u] == a[u]
        # the new file gets a FRESH id — deleted lib/util.js's id is not reused
        assert b["zz_new.py"] not in set(a.values())
        # re-adding the deleted file restores its ORIGINAL id from the map
        _mk(tree, "lib/util.js", b"y = 3\n")
        c = {r["url"]: r["doc_id"]
             for r in ingest_tree(tree, config=cfg, id_map=imap).take_all()}
        assert c["lib/util.js"] == a["lib/util.js"]

    def test_tree_sync_incremental_end_to_end(self, ray_session, tmp_path):
        """The composition the front door exists for: ingest → build →
        mutate the checkout → re-ingest (stable ids) → sync_repository
        chooses INCREMENTAL and the merged index matches a full rebuild."""
        from code_indexer_ray.index.build import build_index
        from code_indexer_ray.pipelines.sync import sync_repository
        from code_indexer_ray.query.engine import IndexSearcher

        root = str(tmp_path / "repo")
        for i in range(30):
            _mk(root, f"pkg{i % 3}/m{i}.py", f"def f{i}():\n    common()\n".encode())
        imap = str(tmp_path / "ids.parquet")
        cfg = TreeConfig(max_file_size=4096)
        corpus0 = str(tmp_path / "c0")
        ingest_tree(root, corpus0, config=cfg, id_map=imap)
        idx0 = str(tmp_path / "idx0")
        build_index(corpus0, idx0, store_cols=("lang", "url", "sha"),
                    num_shards=2, num_buckets=2, doc_id_upper=4096, resume=False)

        # mutate: modify 2, delete 1, add 1  (4/30 ≈ 13% < 30% threshold)
        _mk(root, "pkg0/m0.py", b"def f0():\n    changed_term()\n")
        _mk(root, "pkg1/m1.py", b"def f1():\n    changed_term()\n")
        os.unlink(os.path.join(root, "pkg2/m2.py"))
        _mk(root, "pkg0/m99.py", b"def f99():\n    fresh_term()\n")
        corpus1 = str(tmp_path / "c1")
        ingest_tree(root, corpus1, config=cfg, id_map=imap)

        out = str(tmp_path / "synced")
        report = sync_repository(idx0, corpus1, out)
        assert report["executed"] == "incremental", report
        assert report["changes"]["added"] == 1
        assert report["changes"]["deleted"] == 1
        assert report["changes"]["modified"] == 2

        rebuild = str(tmp_path / "rebuild")
        build_index(corpus1, rebuild, store_cols=("lang", "url", "sha"),
                    num_shards=2, num_buckets=2, doc_id_upper=4096, resume=False)
        a = IndexSearcher(out)
        b = IndexSearcher(rebuild)
        for q in ["common", "changed_term", "fresh_term", "f1", "f99", "f2"]:
            ra = [(h["doc_id"], round(h["score"], 9))
                  for h in a.search(q, limit=0, snippet_lines=0)]
            rb = [(h["doc_id"], round(h["score"], 9))
                  for h in b.search(q, limit=0, snippet_lines=0)]
            assert ra == rb, q
        assert a.search("f2", snippet_lines=0) == []  # deleted file gone
