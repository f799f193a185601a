"""Branch-visibility op log (index/visibility.py) + engine branch filter."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from code_indexer_ray.index.visibility import (
    hidden_ids,
    hide_docs,
    op_count,
    unhide_docs,
)


def test_fold_last_op_wins(tmp_path):
    idx = str(tmp_path)
    hide_docs(idx, "feature", [1, 2, 3])
    hide_docs(idx, "feature", [3, 4])
    unhide_docs(idx, "feature", [2, 4])
    hide_docs(idx, "other", [9])
    assert hidden_ids(idx, "feature").tolist() == [1, 3]
    assert hidden_ids(idx, "other").tolist() == [9]
    assert hidden_ids(idx, "main").tolist() == []
    assert op_count(idx) == 4
    # re-hide after unhide: last op wins again
    hide_docs(idx, "feature", [2])
    assert hidden_ids(idx, "feature").tolist() == [1, 2, 3]


def test_empty_branch_name_rejected(tmp_path):
    with pytest.raises(ValueError):
        hide_docs(str(tmp_path), "", [1])


def test_tmp_files_ignored(tmp_path):
    idx = str(tmp_path)
    hide_docs(idx, "b", [5])
    # a crashed write leaves only a .tmp — it must not count or fold
    (tmp_path / "_visibility" / "op-000099.json.tmp").write_text("{bad json")
    assert op_count(idx) == 1
    assert hidden_ids(idx, "b").tolist() == [5]


@pytest.fixture(scope="module")
def branch_idx(ray_session, tmp_path_factory):
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.query.engine import IndexSearcher

    rng = np.random.default_rng(11)
    vocab = ["spark", "merge", "window", "batch", "row", "scan"]
    rows = [
        {
            "doc_id": i,
            "text": " ".join(vocab[j] for j in rng.integers(0, 6, int(rng.integers(5, 30)))),
            "lang": ["en", "de"][i % 2],
            "url": f"s{i % 3}/f{i}",
        }
        for i in range(120)
    ]
    tmp = tmp_path_factory.mktemp("vis")
    src = str(tmp / "c.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp / "idx")
    build_index(src, idx, store_cols=("lang", "url"), num_shards=2, num_buckets=2, resume=False)
    return idx, IndexSearcher(idx)


def test_search_branch_excludes_hidden(branch_idx):
    idx, s = branch_idx
    base = s.search("spark", limit=0, snippet_lines=0)
    assert base
    victim = [h["doc_id"] for h in base[:3]]
    hide_docs(idx, "feat", victim)
    got = s.search("spark", limit=0, snippet_lines=0, branch="feat")
    assert set(h["doc_id"] for h in got) == set(h["doc_id"] for h in base) - set(victim)
    # scores of surviving docs unchanged (exclusion never rescores)
    base_scores = {h["doc_id"]: h["score"] for h in base}
    assert all(h["score"] == base_scores[h["doc_id"]] for h in got)
    # other branches and branchless queries unaffected
    assert [h["doc_id"] for h in s.search("spark", limit=0, snippet_lines=0)] == [
        h["doc_id"] for h in base
    ]
    assert [
        h["doc_id"] for h in s.search("spark", limit=0, snippet_lines=0, branch="main")
    ] == [h["doc_id"] for h in base]


def test_search_branch_cache_tracks_ops(branch_idx):
    idx, s = branch_idx
    before = s.search("merge", limit=0, snippet_lines=0, branch="feat2")
    assert before
    doc = before[0]["doc_id"]
    hide_docs(idx, "feat2", [doc])
    after = s.search("merge", limit=0, snippet_lines=0, branch="feat2")
    assert doc not in {h["doc_id"] for h in after}
    unhide_docs(idx, "feat2", [doc])
    again = s.search("merge", limit=0, snippet_lines=0, branch="feat2")
    assert {h["doc_id"] for h in again} == {h["doc_id"] for h in before}


def test_limited_search_overfetch_matches_manual(branch_idx):
    idx, s = branch_idx
    base = s.search("window", limit=0, snippet_lines=0)
    hide_docs(idx, "feat3", [h["doc_id"] for h in base[1:4]])
    got = s.search("window", limit=5, snippet_lines=0, branch="feat3")
    # reference over-fetch semantics: rank, cut at 3*limit, filter, cut
    pool = base[: 5 * 3]
    hidden = set(h["doc_id"] for h in base[1:4])
    want = [h for h in pool if h["doc_id"] not in hidden][:5]
    assert [(h["doc_id"], h["score"]) for h in got] == [
        (h["doc_id"], h["score"]) for h in want
    ]


def test_branch_on_dnf_and_fielded_queries(branch_idx):
    from code_indexer_ray.query.parser import search_query_string

    idx, s = branch_idx
    base = search_query_string(s, "spark OR (merge AND window)", limit=0, snippet_lines=0)
    assert base
    victim = base[0]["doc_id"]
    hide_docs(idx, "dnfb", [victim])
    got = search_query_string(
        s, "spark OR (merge AND window)", limit=0, snippet_lines=0, branch="dnfb"
    )
    assert victim not in {h["doc_id"] for h in got}
    assert len(got) == len(base) - 1
    # unknown branch: results unchanged (no hidden set → no over-fetch)
    same = search_query_string(
        s, "spark OR (merge AND window)", limit=0, snippet_lines=0, branch="nope"
    )
    assert [h["doc_id"] for h in same] == [h["doc_id"] for h in base]
    # limited query: over-fetch semantics (rank, 3x cut, filter, cut)
    lim = search_query_string(
        s, "spark OR (merge AND window)", limit=5, snippet_lines=0, branch="dnfb"
    )
    want = [h for h in base[: 5 * 3] if h["doc_id"] != victim][:5]
    assert [(h["doc_id"], h["score"]) for h in lim] == [
        (h["doc_id"], h["score"]) for h in want
    ]


def test_compact_log(tmp_path):
    from code_indexer_ray.index.visibility import compact_log

    idx = str(tmp_path)
    hide_docs(idx, "a", [1, 2, 3])
    unhide_docs(idx, "a", [2])
    hide_docs(idx, "b", [9])
    before_a = hidden_ids(idx, "a").tolist()
    before_b = hidden_ids(idx, "b").tolist()
    removed = compact_log(idx)
    assert removed == 3
    assert op_count(idx) == 2  # one 'set' snapshot per branch
    assert hidden_ids(idx, "a").tolist() == before_a == [1, 3]
    assert hidden_ids(idx, "b").tolist() == before_b == [9]
    # ops after compaction keep folding correctly
    unhide_docs(idx, "a", [1])
    assert hidden_ids(idx, "a").tolist() == [3]


def test_record_seq_robust_past_padding(tmp_path):
    import json as _json

    from code_indexer_ray.index.visibility import _op_files

    idx = str(tmp_path)
    d = tmp_path / "_visibility"
    d.mkdir()
    # simulate a log that outgrew the 6-digit padding
    (d / "op-999999.json").write_text(_json.dumps({"branch": "x", "op": "hide", "ids": [1]}))
    (d / "op-1000000.json").write_text(_json.dumps({"branch": "x", "op": "unhide", "ids": [1]}))
    # numeric order: unhide is LAST → folds empty
    assert hidden_ids(idx, "x").tolist() == []
    # next op gets seq 1000001, not a clobber of 999999
    p = hide_docs(idx, "x", [5])
    assert p.endswith("op-1000001.json")
    assert _op_files(idx)[-1] == "op-1000001.json"
    assert hidden_ids(idx, "x").tolist() == [5]
