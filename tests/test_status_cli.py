"""Unified mode-adaptive `status` command (reference `cidx status` +
command_mode_detector): detect index / proxy / remote / uninitialized from
--root and report that mode's health."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.cli import main as cli_main
from code_indexer_ray.query.proxy import detect_mode_root


def _run(capsys, argv):
    rc = cli_main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index

    tmp = tmp_path_factory.mktemp("statuscli")
    rows = [
        {"doc_id": i, "text": f"alpha beta doc{i} gamma", "lang": "en", "url": f"u{i}"}
        for i in range(60)
    ]
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2,
                num_buckets=2, resume=False)
    return idx


def test_uninitialized(tmp_path, capsys):
    rc, out = _run(capsys, ["status", "--root", str(tmp_path)])
    assert rc == 0
    assert out["mode"] == "uninitialized"
    assert "hint" in out


def test_index_mode(small_index, capsys):
    rc, out = _run(capsys, ["status", "--root", small_index])
    assert rc == 0
    assert out["mode"] == "index"
    assert out["index"]["num_docs"] == 60
    assert out["components"]["segments"] is True
    assert out["components"]["docstore"] is True
    assert out["daemon"]["running"] is False


def test_index_mode_from_subdir(small_index, capsys):
    # nearest-config walk-up: a subdirectory of the index resolves to it
    rc, out = _run(capsys, ["status", "--root", small_index + "/segments"])
    assert rc == 0
    assert out["mode"] == "index"
    assert out["root"] == small_index


def test_detect_mode_root_pairs(small_index, tmp_path):
    assert detect_mode_root(small_index) == ("index", small_index)
    mode, root = detect_mode_root(str(tmp_path))
    assert mode == "uninitialized" and root == str(tmp_path)


def test_proxy_mode(small_index, tmp_path, capsys):
    import os
    import shutil

    proot = tmp_path / "proxy_root"
    shutil.copytree(small_index, proot / "repo_a")
    rc = cli_main(["proxy", "init", "--root", str(proot)])
    capsys.readouterr()
    assert rc == 0
    rc, out = _run(capsys, ["status", "--root", str(proot)])
    assert rc == 0
    assert out["mode"] == "proxy"
    assert len(out["repos"]) == 1 and out["repos"][0]["repository"].endswith("repo_a")
    assert out["errors"] == {}
    assert os.path.isdir(proot / "_proxy")


def test_remote_uninstall(tmp_path, capsys):
    import json as _json

    from code_indexer_ray.query.remote import (
        RemoteConfigError,
        init_remote,
        uninstall_remote,
    )

    root = tmp_path / "unlink"
    root.mkdir()
    (root / "keep.py").write_text("print('project file')\n")
    init_remote(str(root), "http://127.0.0.1:9", api_key="k")
    # dry-run previews without removing
    res = uninstall_remote(str(root), dry_run=True)
    assert res["dry_run"] and ".remote-config.json" in res["removed"]
    assert (root / ".remote-config.json").exists()
    # CLI removal: config gone, project files preserved
    rc = cli_main(["remote", "uninstall", "--root", str(root)])
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and ".remote-config.json" in out["removed"]
    assert not (root / ".remote-config.json").exists()
    assert (root / "keep.py").exists()
    with pytest.raises(RemoteConfigError):
        uninstall_remote(str(root))


def test_remote_mode_unreachable_exits_nonzero(tmp_path, capsys):
    from code_indexer_ray.query.remote import init_remote

    root = tmp_path / "rroot"
    root.mkdir()
    init_remote(str(root), "http://127.0.0.1:9", api_key="k")  # port 9: discard
    rc, out = _run(capsys, ["status", "--root", str(root)])
    assert rc == 1
    assert out["mode"] == "remote"
    assert out["remote"]["connection_health"] == "server_unreachable"
