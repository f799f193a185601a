"""AST-accurate Python symbol extraction (`text/pyast.py` — the precision
tier over the regex anchors; reference scip/indexers/python.py analog)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from code_indexer_ray.text.pyast import (
    extract_python_ast_batch,
    python_ast_rows,
)


def rows_of(src: str, doc_id: int = 0):
    return python_ast_rows(doc_id, src)


class TestDefs:
    def test_nested_and_methods_qualified(self):
        src = (
            "def outer():\n"
            "    def inner():\n"
            "        pass\n"
            "class C:\n"
            "    def meth(self):\n"
            "        pass\n"
            "    class Inner:\n"
            "        def deep(self):\n"
            "            pass\n"
        )
        defs = [(k, s, ln) for _, k, s, _t, ln, _c in rows_of(src) if k in ("def", "class")]
        assert defs == [
            ("def", "outer", 1),
            ("def", "outer.inner", 2),
            ("class", "C", 4),
            ("def", "C.meth", 5),
            ("class", "C.Inner", 7),
            ("def", "C.Inner.deep", 8),
        ]

    def test_async_def(self):
        rows = rows_of("async def a():\n    pass\n")
        assert rows[0][1:3] == ("def", "a")


class TestImports:
    def test_alias_forms(self):
        src = (
            "import numpy as np\n"
            "import os.path\n"
            "from pkg.sub import thing as th\n"
            "from pkg import plain\n"
            "from x import *\n"
        )
        imps = [(s, t, ln) for _, k, s, t, ln, _c in rows_of(src) if k == "import"]
        assert imps == [
            ("np", "numpy", 1),
            ("os", "os.path", 2),
            ("th", "pkg.sub.thing", 3),
            ("plain", "pkg.plain", 4),
        ]  # star import binds nothing


class TestCallResolution:
    def test_alias_resolved(self):
        src = "import numpy as np\ndef f():\n    np.zeros()\n"
        calls = [(s, c) for _, k, s, _t, _l, c in rows_of(src) if k == "call"]
        assert calls == [("numpy.zeros", "f")]

    def test_dotted_import_chain(self):
        src = "import os.path\ndef f():\n    os.path.join()\n"
        calls = [s for _, k, s, *_ in rows_of(src) if k == "call"]
        assert calls == ["os.path.join"]

    def test_lexical_scope_inner_def(self):
        src = "def outer():\n    def inner():\n        pass\n    inner()\n"
        calls = [(s, c) for _, k, s, _t, _l, c in rows_of(src) if k == "call"]
        assert calls == [("outer.inner", "outer")]

    def test_module_level_sibling(self):
        src = "def f():\n    g()\ndef g():\n    pass\n"
        calls = [(s, c) for _, k, s, _t, _l, c in rows_of(src) if k == "call"]
        assert calls == [("g", "f")]  # g resolves even though defined later

    def test_class_scope_invisible_to_methods(self):
        # Python scoping: a method body cannot see class-level names —
        # sibling() must stay UNresolved (bare), not become C.sibling
        src = (
            "class C:\n"
            "    def sibling(self):\n"
            "        pass\n"
            "    def meth(self):\n"
            "        sibling()\n"
        )
        calls = [s for _, k, s, *_ in rows_of(src) if k == "call"]
        assert calls == ["sibling"]

    def test_module_caller_is_null(self):
        src = "def f():\n    pass\nf()\n"
        calls = [(s, c) for _, k, s, _t, _l, c in rows_of(src) if k == "call"]
        assert calls == [("f", None)]

    def test_nested_call_args_visited(self):
        src = "def f():\n    g(h())\n"
        calls = sorted(s for _, k, s, *_ in rows_of(src) if k == "call")
        assert calls == ["g", "h"]

    def test_computed_receiver_skipped(self):
        src = "def f(x):\n    x[0]()\n    (lambda: 1)()\n"
        calls = [s for _, k, s, *_ in rows_of(src) if k == "call"]
        assert calls == []


class TestRobustness:
    def test_syntax_error_yields_nothing(self):
        assert rows_of("def broken(:\n") == []

    def test_batch_wrapper(self):
        batch = pa.table(
            {"doc_id": [5, 6], "text": ["def a():\n    pass\n", "oops((„"]}
        )
        out = extract_python_ast_batch(batch)
        assert out.num_rows == 1
        assert out["doc_id"][0].as_py() == 5

    def test_empty_batch(self):
        out = extract_python_ast_batch(pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}))
        assert out.num_rows == 0
        assert out.schema.names == ["doc_id", "kind", "sym", "target", "line", "caller"]


def test_regex_path_provably_misses_ast_fixtures():
    """The constructs the AST tier exists for: indented defs, qualification,
    alias resolution — run the SAME source through the regex extractor and
    show it cannot see them (VERDICT r3 #5 'provably gets wrong today')."""
    from code_indexer_ray.text.symbols import extract_symbols_batch

    src = (
        "import mod2 as m2\n"
        "def outer():\n"
        "    def inner():\n"
        "        m2.call0()\n"
        "    inner()\n"
        "class C:\n"
        "    def meth(self):\n"
        "        helper()\n"
    )
    batch = pa.table({"doc_id": [0], "text": [src]})
    regex_rows = extract_symbols_batch(batch).to_pylist()
    regex_defs = {r["sym"] for r in regex_rows if r["kind"] == "def"}
    ast_rows = rows_of(src)
    ast_defs = {s for _, k, s, *_ in ast_rows if k in ("def", "class")}
    # regex: only the column-0 def, unqualified
    assert regex_defs == {"outer"}
    # AST: nested + methods, qualified
    assert ast_defs == {"outer", "outer.inner", "C", "C.meth"}
    # regex resolves nothing through the alias; AST yields the module path
    ast_callees = {s for _, k, s, *_ in ast_rows if k == "call"}
    assert "mod2.call0" in ast_callees
    regex_calls = {r["sym"] for r in regex_rows if r["kind"] == "call"}
    assert "mod2.call0" not in regex_calls
