"""JSONL/CSV/Parquet ingestion into the canonical doc-range parquet layout:
deterministic id assignment, idempotent resume, end-to-end into build_index."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.build import build_index
from code_indexer_ray.pipelines.ingest import ingest_corpus
from code_indexer_ray.query.engine import IndexSearcher


@pytest.fixture()
def mixed_src(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    with open(d / "a.jsonl", "w") as f:
        for i in range(10):
            f.write(json.dumps({"text": f"alpha doc a{i} ingestcommon", "lang": "en"}) + "\n")
    with open(d / "b.csv", "w") as f:
        f.write("text,lang\n")
        for i in range(5):
            f.write(f"beta doc b{i} ingestcommon,fr\n")
    pq.write_table(
        pa.table({"text": [f"gamma doc c{i} ingestcommon" for i in range(7)],
                  "lang": ["de"] * 7}),
        d / "c.parquet",
    )
    return str(d)


def test_ingest_assigns_sequential_ids(ray_session, mixed_src, tmp_path):
    out = str(tmp_path / "corpus")
    stats = ingest_corpus(mixed_src, out, id_col=None)
    assert stats == {
        "files": 3, "rows": 22,
        "ranges": [[0, 9], [10, 14], [15, 21]],  # sorted-name order: a, b, c
    }
    files = sorted(glob.glob(os.path.join(out, "*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        "part-000000000000-000000000009.parquet",
        "part-000000000010-000000000014.parquet",
        "part-000000000015-000000000021.parquet",
    ]
    t = pa.concat_tables(pq.read_table(f) for f in files)
    assert t["doc_id"].to_pylist() == list(range(22))
    # idempotent: re-ingest is a byte-identical no-op
    mtimes = {f: os.path.getmtime(f) for f in files}
    ingest_corpus(mixed_src, out, id_col=None)
    assert {f: os.path.getmtime(f) for f in files} == mtimes


def test_ingest_keeps_existing_ids(ray_session, tmp_path):
    d = tmp_path / "src2"
    d.mkdir()
    with open(d / "x.jsonl", "w") as f:
        for i in [5, 3, 9]:
            f.write(json.dumps({"doc_id": i, "text": f"doc {i}"}) + "\n")
    out = str(tmp_path / "corpus2")
    stats = ingest_corpus(str(d), out)
    assert stats["ranges"] == [[3, 9]]
    t = pq.read_table(os.path.join(out, "part-000000000003-000000000009.parquet"))
    assert t["doc_id"].to_pylist() == [3, 5, 9]  # sorted by id inside the file


def test_ingested_corpus_builds_and_searches(ray_session, mixed_src, tmp_path):
    out = str(tmp_path / "corpus3")
    ingest_corpus(mixed_src, out, id_col=None)
    idx = str(tmp_path / "idx")
    m = build_index(out, idx, store_cols=("lang",), num_shards=2, num_buckets=2,
                    resume=False)
    assert m.num_docs == 22
    s = IndexSearcher(idx, url_col=None)
    assert len(s.search("ingestcommon", limit=0, snippet_lines=0)) == 22
    assert len(s.search("ingestcommon", languages=["fr"], limit=0, snippet_lines=0)) == 5


def test_bad_format_raises(ray_session, tmp_path):
    p = tmp_path / "weird.xyz"
    p.write_text("x")
    with pytest.raises(ValueError, match="cannot infer"):
        ingest_corpus([str(p)], str(tmp_path / "o"))
