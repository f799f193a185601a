"""SCIP-analog symbol extraction: defs / calls / enclosing-caller
attribution on hand-written code (independent of the planted-call
synthesis the oracle entries use)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from code_indexer_ray.text.symbols import extract_symbols_batch


def _rows(code: str, doc_id: int = 0):
    t = extract_symbols_batch(
        pa.table({"doc_id": pa.array([doc_id], pa.int64()), "text": pa.array([code])})
    )
    return t.to_pylist()


class TestExtraction:
    def test_defs_calls_and_callers(self):
        code = (
            "helper()\n"            # call before any def → caller null
            "def alpha():\n"
            "    x = beta()\n"       # not end-of-line () → NOT a call? it is: ends 'beta()'
            "    gamma()\n"
            "def beta():\n"
            "    alpha()\n"
        )
        rows = _rows(code)
        defs = [(r["sym"], r["line"]) for r in rows if r["kind"] == "def"]
        assert defs == [("alpha", 2), ("beta", 5)]
        calls = {(r["sym"], r["line"]): r["caller"] for r in rows if r["kind"] == "call"}
        assert calls[("helper", 1)] is None          # precedes every def
        assert calls[("beta", 3)] == "alpha"
        assert calls[("gamma", 4)] == "alpha"
        assert calls[("alpha", 6)] == "beta"

    def test_def_lines_are_not_calls(self):
        rows = _rows("def f0():\n    f0()\n")
        kinds = [(r["kind"], r["sym"]) for r in rows]
        assert kinds == [("def", "f0"), ("call", "f0")]

    def test_caller_never_leaks_across_docs(self):
        t = extract_symbols_batch(
            pa.table(
                {
                    "doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["def owner():\n    x()\n", "y()\n"]),
                }
            )
        )
        rows = t.to_pylist()
        y = [r for r in rows if r["sym"] == "y"][0]
        assert y["caller"] is None  # doc 1 has no defs; doc 0's must not leak
        x = [r for r in rows if r["sym"] == "x"][0]
        assert x["caller"] == "owner"

    def test_empty_and_plain_text(self):
        assert _rows("") == []
        assert _rows("just some prose with no code at all") == []


class TestPipelines:
    def test_call_graph_counts(self, ray_session):
        import ray
        import ray.data as rd

        from code_indexer_ray.text.symbols import call_graph_edges, find_references

        rows = [
            {"doc_id": 0, "text": "def a():\n    b()\n    b()\ndef b():\n    a()\n"},
            {"doc_id": 1, "text": "def c():\n    b()\n"},
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows)).repartition(2)
        edges = {
            (r["caller"], r["callee"]): r["n_calls"]
            for r in pa.concat_tables(
                [t for t in ray.get(call_graph_edges(ds).to_arrow_refs()) if t.num_rows]
            ).to_pylist()
        }
        assert edges == {("a", "b"): 2, ("b", "a"): 1, ("c", "b"): 1}

        refs = pa.concat_tables(
            [t for t in ray.get(find_references(ds, "b").to_arrow_refs()) if t.num_rows]
        ).to_pylist()
        assert sorted((r["doc_id"], r["line"], r["caller"]) for r in refs) == [
            (0, 2, "a"), (0, 3, "a"), (1, 2, "c"),
        ]
