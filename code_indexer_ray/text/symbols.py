"""Symbol definitions / references / call graph — the SCIP analog.

Reference analog: ``scip/`` (symbol definitions, references and call-graph
queries over a SQLite backend, ``scip/query/backends.py:34-133``) — the
reference's second-biggest feature surface after FTS.  This module is the
Ray-Data-native distillation: a vectorized per-batch extractor producing
(doc, kind, symbol, line, enclosing def) rows, and the three standard
queries over them — definitions, find-references, and the call graph — as
ordinary map_batches + groupby pipelines with exact SQL twins.

Extraction semantics (deterministic, regex-anchored, honest subset):
- a DEFINITION is a line matching ``^def NAME():`` (the python boundary
  rule the structural chunker uses);
- a CALL is a line ending in ``NAME()`` (not a def — def lines end ``():``);
- a call's CALLER is the nearest definition at or above it in the same
  document (forward-fill; calls before any def have no caller).

Everything is one line-split + two RE2 extracts + numpy forward-fill per
batch — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

DEF_RE = r"^def (?P<s>[A-Za-z_][A-Za-z0-9_]*)\(\):"
CALL_RE = r"(?P<s>[A-Za-z_][A-Za-z0-9_]*)\(\)$"

#: per-language definition anchors (reference ships one indexer per
#: language — scip/indexers/{python,go,java,typescript,csharp}.py; this is
#: the same surface as the structural chunker's BOUNDARY_PATTERNS, anchored
#: on the definition NAME).  Call sites share CALL_RE (C-family call syntax).
DEF_PATTERNS: dict[str, str] = {
    "python": DEF_RE,
    "go": r"^func (?P<s>[A-Za-z_][A-Za-z0-9_]*)\(\) \{",
    "rust": r"^fn (?P<s>[A-Za-z_][A-Za-z0-9_]*)\(\) \{",
    "javascript": r"^function (?P<s>[A-Za-z_][A-Za-z0-9_$]*)\(\) \{",
    "typescript": r"^function (?P<s>[A-Za-z_][A-Za-z0-9_$]*)\(\) \{",
    "java": r"^(?:public |private |protected )?(?:static )?void (?P<s>[A-Za-z_][A-Za-z0-9_]*)\(\) \{",
}


def def_pattern(language: str | None) -> str:
    return DEF_PATTERNS.get((language or "python").lower(), DEF_RE)


def extract_symbols_batch(
    batch: pa.Table,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    language: str | None = None,
) -> pa.Table:
    """(doc_id, kind, sym, line, caller) rows — kind ∈ {def, call}; ``line``
    is 1-based; ``caller`` is the enclosing definition's symbol (equal to
    ``sym`` for def rows, null for calls before any def)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)

    line_lists = pc.split_pattern(texts, "\n")
    flat = pc.list_flatten(line_lists)
    parents = pc.list_parent_indices(line_lists).to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return _empty()
    n_lines = np.bincount(parents, minlength=len(texts)).astype(np.int64)
    row_offs = np.concatenate(([0], np.cumsum(n_lines)))
    line_no = np.arange(len(flat), dtype=np.int64) - row_offs[parents] + 1

    dm = pc.extract_regex(flat, def_pattern(language))
    def_sym = pc.struct_field(dm, "s")
    is_def = pc.is_valid(def_sym).to_numpy(zero_copy_only=False)
    cm = pc.extract_regex(flat, CALL_RE)
    call_sym = pc.struct_field(cm, "s")
    is_call = pc.is_valid(call_sym).to_numpy(zero_copy_only=False) & ~is_def

    # enclosing def per line: forward-fill the last def's flat index within
    # each document (docs whose prefix has no def stay caller-less)
    idxs = np.arange(len(flat), dtype=np.int64)
    def_idx = np.where(is_def, idxs, -1)
    ffill = np.maximum.accumulate(def_idx)
    first_of_doc = row_offs[parents]
    valid_caller = ffill >= first_of_doc

    out_doc, out_kind, out_sym, out_line, out_caller = [], [], [], [], []
    if is_def.any():
        sel = np.flatnonzero(is_def)
        out_doc.append(ids[parents[sel]])
        out_kind.append(np.full(len(sel), "def", dtype=object))
        out_sym.append(def_sym.take(pa.array(sel)))
        out_line.append(line_no[sel])
        out_caller.append(def_sym.take(pa.array(sel)))
    if is_call.any():
        sel = np.flatnonzero(is_call)
        out_doc.append(ids[parents[sel]])
        out_kind.append(np.full(len(sel), "call", dtype=object))
        out_sym.append(call_sym.take(pa.array(sel)))
        out_line.append(line_no[sel])
        caller_pos = ffill[sel]
        ok = valid_caller[sel]
        caller = def_sym.take(pa.array(np.where(ok, caller_pos, 0)))
        if not ok.all():
            caller = pc.if_else(pa.array(ok), caller, pa.scalar(None, pa.string()))
        out_caller.append(caller)
    if not out_doc:
        return _empty()
    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_doc), type=pa.int64()),
            "kind": pa.array(np.concatenate(out_kind), type=pa.string()),
            "sym": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_sym]
            ).cast(pa.string()),
            "line": pa.array(np.concatenate(out_line), type=pa.int64()),
            "caller": pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_caller]
            ).cast(pa.string()),
        }
    )


def symbol_defs(ds, **kw):
    """All definitions: (doc_id, sym, line) — the SCIP 'definitions' table."""

    def fn(batch: pa.Table) -> pa.Table:
        t = extract_symbols_batch(batch, **kw)
        t = t.filter(pc.equal(t["kind"], "def"))
        return t.select(["doc_id", "sym", "line"])

    return ds.map_batches(fn, batch_format="pyarrow")


def find_references(ds, symbol: str, **kw):
    """Find-references for one symbol: (doc_id, line, caller) of every call
    site — the SCIP 'references' query.  One corpus pass, no shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        t = extract_symbols_batch(batch, **kw)
        m = pc.and_(pc.equal(t["kind"], "call"), pc.equal(t["sym"], symbol))
        return t.filter(m).select(["doc_id", "line", "caller"])

    return ds.map_batches(fn, batch_format="pyarrow")


def call_graph_edges(ds, **kw):
    """Global call-graph edge counts: (caller, callee, n_calls) — map-side
    partial counts per batch, one small groupby (edges ≪ calls)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = extract_symbols_batch(batch, **kw)
        t = t.filter(
            pc.and_(pc.equal(t["kind"], "call"), pc.is_valid(t["caller"]))
        )
        g = (
            pa.table({"caller": t["caller"], "callee": t["sym"]})
            .group_by(["caller", "callee"], use_threads=False)
            .aggregate([("callee", "count")])
        )
        return pa.table(
            {
                "caller": g["caller"],
                "callee": g["callee"],
                "n": g["callee_count"].cast(pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["caller", "callee"])
        .aggregate(Sum("n", alias_name="n_calls"))
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "sym": pa.array([], pa.string()),
            "line": pa.array([], pa.int64()),
            "caller": pa.array([], pa.string()),
        }
    )
