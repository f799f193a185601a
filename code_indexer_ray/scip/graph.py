"""Call-graph queries — the SCIP impact/chain surface (round 3).

Reference analog: ``scip/query/primitives.py:273-340`` (get_dependencies /
get_dependents / analyze_impact / trace_call_chain) and
``scip/query/composites.py:247-414`` (_bfs_traverse_dependents, chain
dedup, _aggregate_by_file).  The reference runs these as SQLite lookups
over a single-box ``.scip.db``; here they are Ray-Data operators over the
AGGREGATED call-graph edge Dataset (caller, callee, n_calls) produced by
:func:`..text.symbols.call_graph_edges`:

- **dependencies / dependents** are single filters on the edge Dataset —
  no driver state, streaming.
- **analyze_impact** is a breadth-first expansion over REVERSED edges:
  each round broadcasts the (result-sized) frontier and runs ONE filter
  pass over the edge blocks; only newly-reached symbols return to the
  driver.  Driver-resident state is the impacted-symbol set — the query's
  own result — never the corpus and never the full edge table.
- **trace_call_chain** extends simple paths level-by-level; per round one
  edge-filter pass ships back only edges adjacent to current path tips.
  Path state is result-sized (the chains being built).

The edge table itself is bounded by (symbols²), orders of magnitude below
the corpus; ``analyze_impact``/``trace_call_chain`` materialize it once so
the per-round passes re-read object-store blocks instead of re-running
extraction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def dependencies(edges_ds, symbol: str):
    """Direct dependencies of ``symbol``: the symbols it calls, with call
    counts — (callee, n_calls).  One filter pass, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        m = pc.equal(t["caller"], symbol)
        return t.filter(m).select(["callee", "n_calls"])

    return edges_ds.map_batches(fn, batch_format="pyarrow")


def dependents(edges_ds, symbol: str):
    """Direct dependents of ``symbol``: the symbols that call it, with call
    counts — (caller, n_calls).  One filter pass, no shuffle."""

    def fn(t: pa.Table) -> pa.Table:
        m = pc.equal(t["callee"], symbol)
        return t.filter(m).select(["caller", "n_calls"])

    return edges_ds.map_batches(fn, batch_format="pyarrow")


def _neighbors(edges, frontier: list[str], reverse: bool) -> set[str]:
    """One BFS round: distinct callers (reverse) or callees (forward) of any
    frontier symbol.  The frontier rides the closure (result-sized);
    per-batch output is deduped so only distinct symbols return."""
    vals = pa.array(sorted(frontier), type=pa.string())
    src, dst = ("callee", "caller") if reverse else ("caller", "callee")

    def fn(t: pa.Table) -> pa.Table:
        m = pc.is_in(t[src].cast(pa.string()), value_set=vals)
        return pa.table({"n": t.filter(m)[dst].unique()})

    out = edges.map_batches(fn, batch_format="pyarrow").take_all()
    return {r["n"] for r in out}


def _bfs_table(edges, symbol: str, max_depth: int, reverse: bool) -> pa.Table:
    seen: dict[str, int] = {symbol: 0}
    frontier = [symbol]
    rows: list[tuple[str, int]] = []
    for depth in range(1, max_depth + 1):
        if not frontier:
            break
        new = _neighbors(edges, frontier, reverse) - seen.keys()
        for s in new:
            seen[s] = depth
            rows.append((s, depth))
        frontier = sorted(new)
    rows.sort(key=lambda r: (r[1], r[0]))
    return pa.table(
        {
            "sym": pa.array([r[0] for r in rows], type=pa.string()),
            "depth": pa.array([r[1] for r in rows], type=pa.int64()),
        }
    )


def analyze_impact(edges_ds, symbol: str, max_depth: int = 3) -> pa.Table:
    """Transitive impact of changing ``symbol``: every symbol that depends
    on it within ``max_depth`` reverse-call hops, at its FIRST-VISIT (= min)
    depth, root excluded — (sym, depth) ordered by (depth, sym).

    Reference: ``analyze_impact`` / ``_bfs_traverse_dependents``
    (``scip/query/composites.py:247``) — same BFS-with-seen-set semantics,
    expressed as one broadcast-filter pass over the edge Dataset per level.
    """
    return _bfs_table(edges_ds.materialize(), symbol, max_depth, reverse=True)


def transitive_dependencies(edges_ds, symbol: str, max_depth: int = 3) -> pa.Table:
    """Transitive dependencies (what ``symbol`` calls, directly or through
    intermediaries) within ``max_depth`` forward hops — (sym, depth), same
    first-visit semantics as :func:`analyze_impact`.  Reference:
    ``get_dependencies(depth=...)``, ``scip/query/primitives.py:273``."""
    return _bfs_table(edges_ds.materialize(), symbol, max_depth, reverse=False)


def trace_call_chain(
    edges_ds, frm: str, to: str, max_depth: int = 3, max_chains: int | None = None
) -> pa.Table:
    """All simple (cycle-free) call chains ``frm → … → to`` of length ≤
    ``max_depth`` edges — (chain, depth), chain rendered ``a -> b -> c``,
    ordered by (depth, chain).  A chain stops at its first arrival at
    ``to`` (paths through ``to`` are not extended), matching the
    reference's chain tracer (``scip/query/composites.py:550``).

    Per level: one filter pass over the edge Dataset for edges whose caller
    is a current path tip; only those adjacent edges return to the driver.
    ``max_chains`` (optional) truncates pathological fan-out after sorting.
    """
    edges = edges_ds.materialize()
    # paths: tuple of symbols, last element is the tip
    live: list[tuple[str, ...]] = [(frm,)]
    done: list[tuple[str, ...]] = []
    for _ in range(max_depth):
        if not live:
            break
        tips = sorted({p[-1] for p in live})
        vals = pa.array(tips, type=pa.string())

        def fn(t: pa.Table) -> pa.Table:
            m = pc.is_in(t["caller"].cast(pa.string()), value_set=vals)
            return t.filter(m).select(["caller", "callee"])

        adj: dict[str, list[str]] = {}
        for r in edges.map_batches(fn, batch_format="pyarrow").take_all():
            adj.setdefault(r["caller"], []).append(r["callee"])
        nxt: list[tuple[str, ...]] = []
        for p in live:
            for c in adj.get(p[-1], ()):
                if c in p:
                    continue  # simple paths only
                q = p + (c,)
                (done if c == to else nxt).append(q)
        live = nxt
    done.sort(key=lambda p: (len(p) - 1, " -> ".join(p)))
    if max_chains is not None:
        done = done[:max_chains]
    return pa.table(
        {
            "chain": pa.array([" -> ".join(p) for p in done], type=pa.string()),
            "depth": pa.array([len(p) - 1 for p in done], type=pa.int64()),
        }
    )


def affected_files(defs_ds, impact: pa.Table):
    """Impact aggregated by file (reference ``_aggregate_by_file``,
    ``scip/query/composites.py:347``): for every document that DEFINES an
    impacted symbol, (doc_id, n_symbols, min_depth) — the files a change
    would touch, nearest-impact first.  The impact table (result-sized)
    broadcasts into a filter+annotate pass over the definitions Dataset;
    the per-doc fold is a doc_id-keyed groupby."""
    order = pc.sort_indices(impact["sym"])
    skeys = np.asarray(impact["sym"].take(order).to_numpy(zero_copy_only=False))
    sdepth = impact["depth"].take(order).to_numpy(zero_copy_only=False)
    vals = pa.array(skeys, type=pa.string())

    def fn(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["sym"].cast(pa.string()), value_set=vals)
        t = t.filter(m)
        s = np.asarray(t["sym"].to_numpy(zero_copy_only=False))
        d = sdepth[np.searchsorted(skeys, s)] if len(s) else np.empty(0, np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "sym": t["sym"],
                "depth": pa.array(d, type=pa.int64()),
            }
        )

    def fold(g: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array([g["doc_id"][0].as_py()], type=pa.int64()),
                "n_symbols": pa.array(
                    [pc.count_distinct(g["sym"]).as_py()], type=pa.int64()
                ),
                "min_depth": pa.array([pc.min(g["depth"]).as_py()], type=pa.int64()),
            }
        )

    return (
        defs_ds.map_batches(fn, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(fold, batch_format="pyarrow")
    )
