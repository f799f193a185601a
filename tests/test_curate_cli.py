"""`curate` CLI family: the LLM-curation operators as parquet-in /
partitioned-parquet-out commands."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.cli import main as cli_main


@pytest.fixture(scope="module")
def docs_src(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("curate")
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(80)]
    boiler = "subscribe to our newsletter for daily updates and offers today"
    rows = []
    for i in range(60):
        body = " ".join(rng.choice(vocab, size=30))
        if i % 4 == 0:
            body += " " + boiler
        if i % 10 == 0:
            body = "identical duplicate document body"  # exact dups
        rows.append({"doc_id": i, "text": body, "lang": ["en", "fr", "de"][i % 3]})
    src = str(tmp / "docs.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    return src, tmp


def _run(capsys, argv):
    rc = cli_main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_curate_exact(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "exact_out")
    rc, res = _run(capsys, ["curate", "exact", "--input", src, "--out", out])
    assert rc == 0
    got = pq.read_table(out)
    # 6 identical docs collapse to 1: 60 - 5 survivors
    assert res["rows"] == got.num_rows == 55


def test_curate_near_pairs(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "pairs_out")
    rc, res = _run(capsys, ["curate", "near-pairs", "--input", src, "--out", out])
    assert rc == 0
    got = pq.read_table(out)
    assert {"doc_a", "doc_b"} <= set(got.column_names)
    # the 6 identical docs produce at least C(6,2)=15 candidate pairs
    assert res["rows"] >= 15


def test_curate_near_pairs_verified(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "pairs_verified_out")
    rc, res = _run(capsys, [
        "curate", "near-pairs", "--input", src, "--out", out,
        "--verify-tau", "0.99",
    ])
    assert rc == 0
    got = pq.read_table(out)
    assert "jaccard_r" in got.column_names
    # exactly the identical-doc pairs survive tau=0.99: C(6,2)=15
    assert res["rows"] == 15
    assert all(j >= 0.99 for j in got["jaccard_r"].to_pylist())


def test_curate_substring_spans_and_clean(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "spans_out")
    rc, res = _run(capsys, [
        "curate", "substring", "--input", src, "--out", out,
        "--window", "5", "--winnow", "0",
    ])
    assert rc == 0 and res["rows"] > 0
    spans = pq.read_table(out)
    assert set(spans.column_names) == {"doc_id", "span_start", "span_end"}

    out2 = str(tmp / "clean_out")
    rc, res2 = _run(capsys, [
        "curate", "substring", "--input", src, "--out", out2,
        "--window", "5", "--winnow", "0", "--emit", "clean",
    ])
    assert rc == 0 and res2["rows"] == 60  # every doc present, cleaned
    clean = pq.read_table(out2)
    n_removed = clean["n_removed"].to_numpy()
    assert n_removed.sum() > 0  # boilerplate actually left the corpus


def test_curate_refuses_nonempty_out_without_overwrite(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "guard_out")
    rc, res = _run(capsys, ["curate", "exact", "--input", src, "--out", out])
    assert rc == 0
    n_first = res["rows"]
    # re-run into the populated dir: refused (would duplicate rows)
    rc = cli_main(["curate", "exact", "--input", src, "--out", out])
    err = capsys.readouterr().err
    assert rc == 1 and "--overwrite" in err
    # with --overwrite: replaced, not appended
    rc, res2 = _run(capsys, [
        "curate", "exact", "--input", src, "--out", out, "--overwrite",
    ])
    assert rc == 0 and res2["rows"] == n_first


def test_curate_mixture(ray_session, docs_src, capsys):
    src, tmp = docs_src
    out = str(tmp / "mix_out")
    rc, res = _run(capsys, [
        "curate", "mixture", "--input", src, "--out", out,
        "--weights", "en=0.5,fr=0.5",
    ])
    assert rc == 0
    got = pq.read_table(out).to_pydict()
    langs = got["lang"]
    assert set(langs) == {"en", "fr"}  # de (weight 0) excluded
    assert langs.count("en") == langs.count("fr") > 0


def test_curate_semdedup_with_d4(ray_session, tmp_path_factory, capsys):
    tmp = tmp_path_factory.mktemp("curate_sem")
    rng = np.random.default_rng(3)
    rows = []
    for i in range(40):
        v = list(rng.normal(size=8))
        rows.append({"vec_id": i, "embedding": v})
    rows.append({"vec_id": 999, "embedding": rows[0]["embedding"]})  # exact dup
    src = str(tmp / "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
                "embedding": pa.array(
                    [r["embedding"] for r in rows], pa.list_(pa.float64())
                ),
            }
        ),
        src,
    )
    out = str(tmp / "sem_out")
    rc, res = _run(capsys, [
        "curate", "semdedup", "--input", src, "--out", out,
        "--k", "4", "--tau", "0.99",
    ])
    assert rc == 0 and res["rows"] == 40  # the dup twin dropped
    kept = set(pq.read_table(out)["vec_id"].to_pylist())
    assert 0 in kept and 999 not in kept

    out2 = str(tmp / "d4_out")
    rc, res2 = _run(capsys, [
        "curate", "semdedup", "--input", src, "--out", out2,
        "--k", "4", "--tau", "0.99", "--d4-keep", "1/2",
    ])
    assert rc == 0 and 0 < res2["rows"] <= 40 // 2 + 4  # ceil halves per cluster
