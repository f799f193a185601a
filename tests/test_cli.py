"""CLI surface smoke: build → stats → search → suggest → compact in ONE
subprocess (the CLI owns its own Ray session, so it must not run inside the
test session's Ray; one process keeps the suite cost to a single init)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = str(Path(__file__).resolve().parents[1])


def test_cli_end_to_end(tmp_path):
    src = tmp_path / "c.parquet"
    rows = [
        {"doc_id": i, "text": f"spark merge w{i} stream", "lang": "en", "url": f"s{i % 3}/p/{i}"}
        for i in range(40)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(src))
    idx = str(tmp_path / "idx")

    script = f"""
import json
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "build", "--input", {str(src)!r}, "--out", {idx!r},
             "--num-shards", "2", "--num-buckets", "2"]) == 0
assert main(["stats", "--index", {idx!r}]) == 0
assert main(["search", "--index", {idx!r}, "spark merge", "--limit", "3",
             "--snippet-lines", "0"]) == 0
assert main(["suggest", "--index", {idx!r}, "sprak"]) == 0
assert main(["suggest", "--index", {idx!r}, "s", "--prefix"]) == 0
assert main(["compact", "--index", {idx!r}]) == 0
print("CLI_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CLI_OK" in out.stdout
    # the printed lines are parseable JSON rows
    lines = [
        ln for ln in out.stdout.splitlines() if ln.startswith("{") and ln.endswith("}")
    ]
    assert len(lines) >= 4
    for ln in lines:
        json.loads(ln)


def test_cli_scip(tmp_path):
    src = tmp_path / "docs.parquet"
    t0 = "def a():\n    x b()\ndef b():\n    x c()\ndef c():\n    x x\n"
    t1 = "def d():\n    x a()\ndef e():\n    x d()\n    x e()\n"
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [t0, t1]}), str(src)
    )
    store = str(tmp_path / "symstore")

    script = f"""
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "scip", "generate", "--input", {str(src)!r},
             "--out", {store!r}, "--num-parts", "4"]) == 0
assert main(["scip", "status", "--store", {store!r}]) == 0
assert main(["scip", "definition", "--store", {store!r}, "a"]) == 0
assert main(["scip", "references", "--store", {store!r}, "a"]) == 0
assert main(["scip", "dependencies", "--store", {store!r}, "a"]) == 0
assert main(["scip", "dependents", "--store", {store!r}, "a"]) == 0
assert main(["scip", "impact", "--store", {store!r}, "c", "--depth", "3"]) == 0
assert main(["scip", "callchain", "--store", {store!r}, "e", "c", "--depth", "4"]) == 0
assert main(["scip", "context", "--store", {store!r}, "a"]) == 0
print("SCIP_CLI_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=300, cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SCIP_CLI_OK" in out.stdout
    lines = [json.loads(x) for x in out.stdout.splitlines() if x.startswith("{")]
    assert {"sym": "b", "depth": 1} in lines
    assert {"chain": "e -> d -> a -> b -> c", "depth": 4} in lines


def test_cli_temporal(tmp_path):
    # synthesize a small change table with the library, then drive the CLI
    gen = f"""
import pyarrow as pa, pyarrow.parquet as pq
from code_indexer_ray.temporal.history import change_rows
docs = pa.table({{"doc_id": pa.array(range(30), type=pa.int64()),
                 "source": [f"s{{i%3}}" for i in range(30)],
                 "text": ["alpha beta gamma delta " * 4] * 30}})
pq.write_table(change_rows(docs), {str(tmp_path / "chg.parquet")!r})
print("GEN_OK")
"""
    out = subprocess.run([sys.executable, "-c", gen], capture_output=True, text=True,
                         timeout=120, cwd=REPO_ROOT)
    assert "GEN_OK" in out.stdout, out.stderr[-1500:]

    idx = str(tmp_path / "tidx")
    script = f"""
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "temporal", "build", "--changes",
             {str(tmp_path / "chg.parquet")!r}, "--out", {idx!r},
             "--bucket-days", "4", "--num-buckets", "2"]) == 0
assert main(["temporal", "search", "--index", {idx!r}, "alpha",
             "--start-day", "2025-03-01", "--end-day", "2025-03-12",
             "--diff-types", "modified", "--limit", "3"]) == 0
assert main(["temporal", "file-at", "--index", {idx!r}, "s0/0.txt",
             "2025-03-12"]) == 0
assert main(["temporal", "pathstore", "--index", {idx!r}, "--num-parts", "4"]) == 0
assert main(["temporal", "history", "--index", {idx!r}, "s0/0.txt"]) == 0
assert main(["temporal", "at-commit", "--index", {idx!r}, "s0/0.txt", "1"]) == 0
assert main(["temporal", "search", "--index", {idx!r}, "alpha",
             "--start-day", "2025-03-01", "--end-day", "2025-03-12",
             "--limit", "2", "--show-evolution", "--evolution-limit", "2"]) == 0
msgidx = {idx!r} + "_msg"
assert main(["temporal", "build", "--changes",
             {str(tmp_path / "chg.parquet")!r}, "--out", msgidx,
             "--bucket-days", "4", "--num-buckets", "2", "--index-messages"]) == 0
assert main(["temporal", "search", "--index", msgidx, "added",
             "--start-day", "2025-03-01", "--end-day", "2025-03-12",
             "--chunk-type", "commit_message", "--limit", "3"]) == 0
import os, shutil
feed = {str(tmp_path / "feed")!r}
os.makedirs(feed, exist_ok=True)
shutil.copy({str(tmp_path / "chg.parquet")!r}, os.path.join(feed, "batch-000.parquet"))
widx = {idx!r} + "_watch"
assert main(["temporal", "watch", "--feed", feed, "--index", widx,
             "--bucket-days", "4", "--num-buckets", "2", "--max-ticks", "1"]) == 0
print("TEMPORAL_CLI_OK")
"""
    out = subprocess.run([sys.executable, "-c", script], capture_output=True,
                         text=True, timeout=300, cwd=REPO_ROOT)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TEMPORAL_CLI_OK" in out.stdout
    lines = [json.loads(x) for x in out.stdout.splitlines() if x.startswith("{")]
    assert any("windows" in l for l in lines)
    assert any(l.get("diff_type") == "modified" for l in lines)
    assert any(l.get("chunk_type") == "commit_message" for l in lines)
    assert any("evolution" in l for l in lines)
    assert any("num_parts" in l for l in lines)  # pathstore build echo
    assert any("bootstrapped" in l for l in lines)  # watch bootstrap echo
    assert any(l.get("appended") == [] for l in lines)  # first watch tick


def test_cli_semantic_modes(tmp_path):
    """--semantic / --hybrid (reference CLI mode flags) against a built IVF
    vector store, plus the validation exits (missing store, both flags)."""
    src = tmp_path / "c.parquet"
    rows = [
        {"doc_id": i, "text": f"spark merge w{i} stream", "lang": "en", "url": f"s{i % 3}/p/{i}"}
        for i in range(40)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(src))
    idx = str(tmp_path / "idx")
    store = str(tmp_path / "vstore")

    script = f"""
import json
import pyarrow as pa, pyarrow.parquet as pq
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "build", "--input", {str(src)!r}, "--out", {idx!r},
             "--num-shards", "2", "--num-buckets", "2"]) == 0
from code_indexer_ray.text.embed import TextEmbedStage
from code_indexer_ray.ann.store import build_vector_store
emb = TextEmbedStage(dim=16, output="list")(pq.read_table({str(src)!r}, columns=["doc_id", "text"]))
emb = emb.filter(pa.compute.greater(emb["norm"], 0)).drop_columns(["norm"])
pq.write_table(emb, {str(src)!r} + ".emb")
build_vector_store({str(src)!r} + ".emb", {store!r}, id_col="doc_id",
                   vec_col="embedding", n_centroids=2, resume=False)
assert main(["search", "--index", {idx!r}, "spark merge", "--semantic",
             "--vector-store", {store!r}, "--limit", "3", "--snippet-lines", "0"]) == 0
assert main(["search", "--index", {idx!r}, "spark merge", "--hybrid",
             "--vector-store", {store!r}, "--limit", "3", "--min-score", "0.001"]) == 0
assert main(["search", "--index", {idx!r}, "spark", "--semantic"]) == 2
assert main(["search", "--index", {idx!r}, "spark", "--semantic", "--hybrid",
             "--vector-store", {store!r}]) == 2
print("SEM_CLI_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "SEM_CLI_OK" in out.stdout
    rows_out = [json.loads(ln) for ln in out.stdout.splitlines() if ln.startswith("{")]
    hits = [h for h in rows_out if "score" in h]  # build summary prints too
    assert len(hits) == 6  # 3 semantic + 3 hybrid rows
    assert all("doc_id" in h for h in hits)
    assert "requires --vector-store" in out.stderr


def test_cli_grep(tmp_path):
    src = tmp_path / "g.parquet"
    rows = [
        {"id": i, "body": f"alpha w{i}\nspark line {i}\nomega w{i}"} for i in range(12)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(src))
    script = f"""
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "grep", "spark l\\\\w+e", "--input", {str(src)!r},
             "--id-col", "id", "--text-col", "body", "--max-matches", "5"]) == 0
print("GREP_OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "GREP_OK" in out.stdout
    hits = [
        json.loads(ln)
        for ln in out.stdout.splitlines()
        if ln.startswith("{") and "line_content" in ln
    ]
    assert len(hits) == 5  # truncated at max-matches
    assert hits[0] == {
        "doc_id": 0,
        "line_number": 2,
        "col": 1,
        "line_content": "spark line 0",
        "ctx_before": "alpha w0",
        "ctx_after": "omega w0",
    }
    summary = [
        json.loads(ln) for ln in out.stderr.splitlines() if ln.startswith("{")
    ][-1]
    assert summary["total_matches"] == 12 and summary["truncated"] is True


def test_cli_sync(tmp_path):
    old = tmp_path / "old.parquet"
    new = tmp_path / "new.parquet"
    rows = [
        {"doc_id": i, "text": f"sync doc w{i} body", "lang": "en", "url": f"http://c/d/{i}"}
        for i in range(30)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(old))
    new_rows = [dict(r) for r in rows if r["doc_id"] != 5]
    new_rows[0]["text"] += " CHANGED"
    new_rows.append({"doc_id": 90, "text": "sync doc w90 fresh", "lang": "en",
                     "url": "http://c/d/90"})
    pq.write_table(pa.Table.from_pylist(new_rows), str(new))
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")

    script = f"""
import json
from code_indexer_ray.cli import main
assert main(["--num-cpus", "4", "build", "--input", {str(old)!r}, "--out", {idx!r},
             "--num-shards", "1", "--num-buckets", "2", "--doc-id-upper", "199"]) == 0
assert main(["sync", "--base", {idx!r}, "--snapshot", {str(new)!r}, "--out", {out!r},
             "--dry-run"]) == 0
assert main(["sync", "--base", {idx!r}, "--snapshot", {str(new)!r}, "--out", {out!r}]) == 0
assert main(["search", "--index", {out!r}, "CHANGED", "--limit", "3",
             "--snippet-lines", "0"]) == 0
print("SYNC_OK")
"""
    out_p = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert out_p.returncode == 0, out_p.stderr[-2000:]
    assert "SYNC_OK" in out_p.stdout
    reports = [json.loads(ln) for ln in out_p.stdout.splitlines()
               if ln.startswith("{\"decision\"")]
    assert len(reports) == 2
    assert reports[0]["executed"] is None
    assert reports[1]["executed"] == "incremental"
    assert reports[1]["changes"]["added"] == 1
    assert reports[1]["changes"]["deleted"] == 1
    assert reports[1]["changes"]["modified"] == 1
