"""SCIP-analog graph queries + persisted symbol store (scip/)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs_tbl():
    # hand-built corpus: doc 0 defines a->b->c chain; doc 1 adds a cycle and
    # a cross-doc edge into 'a'
    t0 = "def a():\n    x b()\ndef b():\n    x c()\ndef c():\n    x x\n"
    t1 = "def d():\n    x a()\ndef e():\n    x d()\n    x e()\n"
    return pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": [t0, t1]})


@pytest.fixture(scope="module")
def edges(ray_session):
    import ray.data as rd

    from code_indexer_ray.text.symbols import call_graph_edges

    ds = rd.from_arrow(_docs_tbl())
    return call_graph_edges(ds).materialize()


def _edge_set(tbl_rows):
    return {(r["caller"], r["callee"], r["n_calls"]) for r in tbl_rows}


def test_edges_expected(edges):
    assert _edge_set(edges.take_all()) == {
        ("a", "b", 1),
        ("b", "c", 1),
        ("d", "a", 1),
        ("e", "d", 1),
        ("e", "e", 1),
    }


def test_dependencies_dependents(edges):
    from code_indexer_ray.scip import dependencies, dependents

    dep = dependencies(edges, "a").take_all()
    assert [(r["callee"], r["n_calls"]) for r in dep] == [("b", 1)]
    dpt = dependents(edges, "a").take_all()
    assert [(r["caller"], r["n_calls"]) for r in dpt] == [("d", 1)]


def test_analyze_impact_bfs_min_depth(edges):
    from code_indexer_ray.scip import analyze_impact

    imp = analyze_impact(edges, "c", max_depth=3)
    # reverse: c <- b (1) <- a (2) <- d (3); e is at depth 4 → excluded
    assert imp.to_pydict() == {"sym": ["b", "a", "d"], "depth": [1, 2, 3]}
    # root excluded even on cycles
    imp_e = analyze_impact(edges, "e", max_depth=3)
    assert imp_e.to_pydict() == {"sym": [], "depth": []}


def test_trace_call_chain_simple_paths(edges):
    from code_indexer_ray.scip import trace_call_chain

    ch = trace_call_chain(edges, "e", "c", max_depth=4)
    assert ch.to_pydict() == {"chain": ["e -> d -> a -> b -> c"], "depth": [4]}
    # self-loop edge (e -> e) never enters a simple path
    assert trace_call_chain(edges, "e", "e", max_depth=3).num_rows == 0
    # depth cap cuts the only path
    assert trace_call_chain(edges, "e", "c", max_depth=3).num_rows == 0


def test_affected_files(edges, ray_session):
    import ray.data as rd

    from code_indexer_ray.scip import affected_files, analyze_impact
    from code_indexer_ray.text.symbols import symbol_defs

    ds = rd.from_arrow(_docs_tbl())
    imp = analyze_impact(edges, "c", max_depth=3)  # b, a, d
    rows = sorted(affected_files(symbol_defs(ds), imp).take_all(), key=lambda r: r["doc_id"])
    # doc 0 defines a(depth 2) + b(depth 1); doc 1 defines d(depth 3)
    assert [(r["doc_id"], r["n_symbols"], r["min_depth"]) for r in rows] == [
        (0, 2, 1),
        (1, 1, 3),
    ]


def test_fnv64_matches_vectorized_hash():
    from code_indexer_ray.index.build import _hash64_batch
    from code_indexer_ray.scip.store import fnv64

    syms = ["a", "f0", "f123", "some_longer_symbol_name", "é™"]
    vec = _hash64_batch(pa.array(syms, type=pa.string()))
    assert [fnv64(s) for s in syms] == [int(x) for x in vec]


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    import ray.data as rd

    from code_indexer_ray.scip import build_symbol_store

    root = str(tmp_path_factory.mktemp("symstore"))
    ds = rd.from_arrow(_docs_tbl())
    man = build_symbol_store(ds, root, num_parts=4, fingerprint="t")
    from code_indexer_ray.scip import SymbolStore

    return SymbolStore(root), man


def test_store_point_reads(store):
    s, man = store
    assert man["total_defs"] == 5
    d = s.definitions("a")
    assert d.to_pydict() == {"doc_id": [0], "line": [1]}
    r = s.references("a")
    assert r.to_pydict() == {"doc_id": [1], "line": [2], "caller": ["d"]}
    # unknown symbol: empty with the right schema
    assert s.definitions("zzz").num_rows == 0
    assert s.references("zzz").column_names == ["doc_id", "line", "caller"]


def test_store_graph_parity(store, edges):
    from code_indexer_ray.scip import analyze_impact, trace_call_chain

    s, _ = store
    assert s.analyze_impact("c", 3).equals(analyze_impact(edges, "c", 3))
    assert s.trace_call_chain("e", "c", 4).equals(trace_call_chain(edges, "e", "c", 4))
    assert s.dependencies("a").to_pydict() == {"callee": ["b"], "n_calls": [1]}
    assert s.dependents("a").to_pydict() == {"caller": ["d"], "n_calls": [1]}


def test_store_rebuild_noop_and_refingerprint(store, ray_session):
    import os

    import ray.data as rd

    from code_indexer_ray.scip import build_symbol_store

    s, _ = store
    mtime = os.path.getmtime(os.path.join(s.root, "manifest.json"))
    ds = rd.from_arrow(_docs_tbl())
    build_symbol_store(ds, s.root, num_parts=4, fingerprint="t")  # no-op
    assert os.path.getmtime(os.path.join(s.root, "manifest.json")) == mtime


def test_store_empty_corpus(ray_session, tmp_path):
    import ray.data as rd

    from code_indexer_ray.scip import SymbolStore, build_symbol_store

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    root = str(tmp_path / "empty_store")
    man = build_symbol_store(ds, root, num_parts=4, fingerprint="e")
    assert man["total_rows"] == 0
    s = SymbolStore(root)
    assert s.definitions("a").num_rows == 0
    assert s.analyze_impact("a", 3).num_rows == 0


def test_transitive_dependencies(edges, store):
    from code_indexer_ray.scip import transitive_dependencies

    t = transitive_dependencies(edges, "e", max_depth=4)
    # forward from e: d(1) [e self-loop excluded], a(2), b(3), c(4)
    assert t.to_pydict() == {"sym": ["d", "a", "b", "c"], "depth": [1, 2, 3, 4]}
    s, _ = store
    assert s.transitive_dependencies("e", 4).equals(t)
    assert transitive_dependencies(edges, "c", 3).num_rows == 0


def test_reference_limit_early_stop(store):
    s, _ = store
    full = s.references("a")
    lim = s.references("a", limit=1)
    assert lim.num_rows == min(1, full.num_rows)
    assert lim.to_pylist() == full.to_pylist()[:1]
    # limit larger than result: identical
    assert s.references("a", limit=99).equals(full)
    assert s.definitions("a", limit=1).num_rows == 1


def test_verify_store_clean_and_corrupt(store, tmp_path):
    import json
    import os
    import shutil

    from code_indexer_ray.scip import verify_store

    s, _ = store
    out = verify_store(s.root)
    assert out["valid"], out["errors"]
    assert out["rows_checked"] == s.manifest["total_rows"]

    # corrupt a copy: claim one extra def in the manifest + tamper an edge
    bad = str(tmp_path / "bad_store")
    shutil.copytree(s.root, bad)
    man = json.load(open(os.path.join(bad, "manifest.json")))
    man["parts"][0]["n_defs"] += 1
    json.dump(man, open(os.path.join(bad, "manifest.json"), "w"))
    import pyarrow.parquet as _pq

    edir = os.path.join(bad, "edges")
    efile = sorted(
        os.path.join(edir, f) for f in os.listdir(edir) if f.endswith(".parquet")
    )[0]
    t = _pq.read_table(efile)
    import pyarrow.compute as _pc

    t = t.set_column(
        t.schema.get_field_index("n_calls"),
        "n_calls",
        _pc.add(t["n_calls"], 1),
    )
    _pq.write_table(t, efile)
    out = verify_store(bad)
    assert not out["valid"]
    assert any("n_defs" in e or "defs" in e for e in out["errors"])
    assert any("edge sidecar" in e for e in out["errors"])


def test_multilanguage_extraction(ray_session):
    from code_indexer_ray.text.symbols import extract_symbols_batch

    cases = {
        "go": "func main() {\n    x helper()\nfunc helper() {\n    x x\n",
        "rust": "fn run() {\n    x step()\nfn step() {\n    x x\n",
        "javascript": "function init$() {\n    x load()\nfunction load() {\n    x x\n",
        "java": "public static void main() {\n    x work()\nprivate void work() {\n    x x\n",
    }
    for lang, text in cases.items():
        t = extract_symbols_batch(
            pa.table({"doc_id": pa.array([0], pa.int64()), "text": [text]}),
            language=lang,
        )
        defs = t.filter(pa.compute.equal(t["kind"], "def"))
        calls = t.filter(pa.compute.equal(t["kind"], "call"))
        assert defs.num_rows == 2, (lang, t.to_pydict())
        assert calls.num_rows == 1, (lang, t.to_pydict())
        # caller attribution: the call's enclosing def is the first one
        assert calls["caller"][0].as_py() == defs["sym"][0].as_py()
    # default stays python (back-compat for every existing pipeline)
    t = extract_symbols_batch(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["def a():\n    x b()\n"]})
    )
    assert t.filter(pa.compute.equal(t["kind"], "def"))["sym"].to_pylist() == ["a"]


class TestPyAstExtractor:
    """build_symbol_store(extractor="python_ast"): the precision tier wired
    into the persisted store — same layout, same query paths."""

    @pytest.fixture(scope="class")
    def ast_store(self, ray_session, tmp_path_factory):
        import ray.data as rd

        from code_indexer_ray.scip.store import SymbolStore, build_symbol_store

        src = (
            "import numpy as np\n"
            "def outer():\n"
            "    def inner():\n"
            "        np.zeros()\n"
            "    inner()\n"
            "class C:\n"
            "    def meth(self):\n"
            "        outer()\n"
        )
        docs = pa.table({"doc_id": list(range(8)), "text": [src] * 8})
        root = str(tmp_path_factory.mktemp("aststore") / "store")
        man = build_symbol_store(
            rd.from_arrow(docs), root, num_parts=4, extractor="python_ast"
        )
        return SymbolStore(root), man

    def test_qualified_defs_and_classes(self, ast_store):
        ss, man = ast_store
        assert man["extractor"] == "python_ast"
        # nested def under its qualified name; class folded into kind=def
        assert ss.definitions("outer.inner").num_rows == 8
        assert ss.definitions("C").num_rows == 8
        assert ss.definitions("C.meth").num_rows == 8
        # the regex path's unqualified names don't exist here
        assert ss.definitions("inner").num_rows == 0

    def test_alias_resolved_references(self, ast_store):
        ss, _ = ast_store
        refs = ss.references("numpy.zeros")
        assert refs.num_rows == 8
        assert set(refs["caller"].to_pylist()) == {"outer.inner"}

    def test_import_site_lookup(self, ast_store):
        ss, _ = ast_store
        imp = ss.occurrences("numpy", kind="import")
        assert imp.num_rows == 8

    def test_call_graph_qualified(self, ast_store):
        ss, _ = ast_store
        deps = {r["callee"]: r["n_calls"] for r in ss.dependencies("outer").to_pylist()}
        assert deps == {"outer.inner": 8}
        dents = {r["caller"] for r in ss.dependents("outer").to_pylist()}
        assert dents == {"C.meth"}

    def test_extractor_mismatch_rebuilds(self, ray_session, tmp_path):
        import ray.data as rd

        from code_indexer_ray.scip.store import build_symbol_store

        docs = pa.table({"doc_id": [0], "text": ["def f():\n    g()\n"]})
        root = str(tmp_path / "store")
        m1 = build_symbol_store(rd.from_arrow(docs), root, num_parts=2)
        assert m1["extractor"] == "regex"
        m2 = build_symbol_store(
            rd.from_arrow(docs), root, num_parts=2, extractor="python_ast"
        )
        assert m2["extractor"] == "python_ast"  # param mismatch → rebuild
        with pytest.raises(ValueError, match="unknown extractor"):
            build_symbol_store(rd.from_arrow(docs), root, extractor="clang")
