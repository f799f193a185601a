"""Direct regex line scan (reference global_repos/regex_search.py analog):
brute-force parity for line numbers / match columns / context, edge cases
(first/last line, match at column 1, no matches), and the service-level
truncation contract."""

from __future__ import annotations

import re

import pyarrow as pa

from code_indexer_ray.text.grepscan import regex_line_scan, regex_search, scan_batch

DOCS = pa.table(
    {
        "doc_id": pa.array([10, 11, 12], type=pa.int64()),
        "text": [
            "alpha beta\nspark at start\nno hit here\ntail spark end",
            "spark",
            "nothing to see\nstill nothing",
        ],
    }
)


def _brute(docs: pa.Table, pattern: str):
    out = []
    rx = re.compile(pattern)
    for doc_id, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        lines = text.split("\n")
        for i, line in enumerate(lines):
            m = rx.search(line)
            if not m:
                continue
            out.append(
                {
                    "doc_id": doc_id,
                    "line_number": i + 1,
                    "col": m.start() + 1,
                    "line_content": line,
                    "ctx_before": lines[i - 1] if i > 0 else "",
                    "ctx_after": lines[i + 1] if i + 1 < len(lines) else "",
                }
            )
    return out


def test_scan_batch_matches_brute():
    pattern = "sp\\w+k"
    got = scan_batch(DOCS, pattern, context=1).to_pylist()
    got.sort(key=lambda r: (r["doc_id"], r["line_number"]))
    assert got == _brute(DOCS, pattern)


def test_column_is_match_start():
    rows = scan_batch(DOCS, "start", context=0).to_pylist()
    assert rows == [
        {
            "doc_id": 10,
            "line_number": 2,
            "col": 10,
            "line_content": "spark at start",
            "ctx_before": "",
            "ctx_after": "",
        }
    ]


def test_single_line_doc_has_empty_context():
    rows = [r for r in scan_batch(DOCS, "spark", context=1).to_pylist() if r["doc_id"] == 11]
    assert rows == [
        {
            "doc_id": 11,
            "line_number": 1,
            "col": 1,
            "line_content": "spark",
            "ctx_before": "",
            "ctx_after": "",
        }
    ]


def test_no_match_returns_typed_empty_table():
    tbl = scan_batch(DOCS, "zebra", context=1)
    assert tbl.num_rows == 0
    assert tbl.schema.names == [
        "doc_id",
        "line_number",
        "col",
        "line_content",
        "ctx_before",
        "ctx_after",
    ]


def test_regex_search_truncation(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(DOCS)
    res = regex_search(ds, "spark", max_matches=2)
    assert res["total_matches"] == 3
    assert res["truncated"] is True
    assert [(r["doc_id"], r["line_number"]) for r in res["matches"]] == [(10, 2), (10, 4)]
    full = regex_search(ds, "spark", max_matches=100)
    assert full["truncated"] is False
    assert len(full["matches"]) == 3


def test_dataset_scan_parity(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(DOCS)
    rows = regex_line_scan(ds, "no\\w* ", context=1).take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["line_number"]))
    assert rows == _brute(DOCS, "no\\w* ")
