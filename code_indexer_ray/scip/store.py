"""Persisted symbol-occurrence store — the reference's ``.scip.db`` analog.

Reference: ``scip/database/builder.py`` + ``schema.py`` convert the protobuf
SCIP index into a SQLite database (symbols / occurrences / call_graph
tables, indexed by symbol and location) because point lookups over it are
"300-400x faster" than protobuf scans (``scip/query/primitives.py:234``).
This module is the Ray-Data-native equivalent:

- **Layout**: occurrence rows (doc_id, kind, sym, line, caller) are
  hash-partitioned by symbol into ``num_parts`` parquet files, each sorted
  by (sym, doc_id, line) and written with small row groups — a symbol
  lookup opens exactly ONE part file and parquet row-group statistics
  prune it to a handful of row groups (the same sorted-key point-read
  design as ``index/kvstore.py`` and the temporal doc store).
- **Call graph**: the aggregated (caller, callee, n_calls) edge table is
  derived once at build time and stored as a parquet sidecar — it is
  bounded by (symbols²), ≪ corpus, exactly what the reference keeps in its
  ``call_graph`` SQLite table.
- **Build** is one extraction pass + ONE part-keyed shuffle
  (``groupby(part).map_groups`` with per-part sink tasks), then a streaming
  read-back of the written parts for the edge aggregation — the corpus is
  never driver-resident.  The manifest is written LAST; its presence marks
  a complete store (crash-safe, same convention as the index manifests).

Queries (``SymbolStore``): definitions / references / occurrences are
partition-pruned point reads; dependencies / dependents filter the edge
sidecar; analyze_impact / trace_call_chain BFS over the (in-memory,
symbols²-bounded) edge table — the same single-box graph state the
reference's SQLite backend holds.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..index.build import _hash64_batch
from ..text.symbols import extract_symbols_batch

MANIFEST = "manifest.json"
EDGES_DIR = "edges"
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = (1 << 64) - 1


def fnv64(s: str) -> int:
    """Scalar twin of ``index.build._hash64_batch`` (FNV-1a-64)."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def build_symbol_store(
    ds,
    out_dir: str,
    *,
    num_parts: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    row_group_size: int = 4096,
    fingerprint: str | None = None,
    extractor: str = "regex",
) -> dict:
    """Extract symbol occurrences from ``ds`` (a docs Dataset) and persist
    the partitioned store at ``out_dir``.  Returns the manifest dict.  A
    complete store with a matching fingerprint is a no-op fast path.

    ``extractor``: ``"regex"`` (default — the language-generic anchor
    extractor, closed-form-verifiable) or ``"python_ast"`` (the
    ``text/pyast.py`` precision tier for Python corpora: QUALIFIED nested
    defs, classes folded into kind=def, alias-resolved callees, import rows
    kept as kind=import keyed by the imported TARGET so
    ``occurrences(module, kind="import")`` answers import-site queries).
    Store layout and every query path are identical either way.
    """
    import shutil

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    mpath = os.path.join(out_dir, MANIFEST)
    if os.path.exists(mpath):
        try:
            with open(mpath) as f:
                man = json.load(f)
            # a complete store is reused only when its recorded parameters
            # match; content staleness is the caller's contract via
            # fingerprint= (same as build_index)
            if (
                man.get("num_parts") == num_parts
                and man.get("extractor", "regex") == extractor
                and (fingerprint is None or man.get("fingerprint") == fingerprint)
            ):
                return man
        except (OSError, ValueError):
            pass
    # no manifest = a partial/param-mismatched build: stale part files would
    # survive the groupby rewrite (a rerun with fewer parts, or a part that
    # gets zero rows) and pollute point reads AND the edge read-back glob —
    # always start from an empty dir
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    if extractor not in ("regex", "python_ast"):
        raise ValueError(f"unknown extractor {extractor!r} (regex | python_ast)")

    def extract(batch: pa.Table) -> pa.Table:
        if extractor == "regex":
            return extract_symbols_batch(batch, id_col=id_col, text_col=text_col)
        from ..text.pyast import extract_python_ast_batch

        t = extract_python_ast_batch(batch, id_col=id_col, text_col=text_col)
        kind = t["kind"].combine_chunks() if isinstance(t["kind"], pa.ChunkedArray) else t["kind"]
        # classes are definitions for the store's query surface; import rows
        # key on the imported TARGET (import-site lookup by module path)
        new_kind = pc.if_else(pc.equal(kind, "class"), pa.scalar("def"), kind)
        sym_col = pc.if_else(
            pc.equal(kind, "import"),
            t["target"].combine_chunks() if isinstance(t["target"], pa.ChunkedArray) else t["target"],
            t["sym"].combine_chunks() if isinstance(t["sym"], pa.ChunkedArray) else t["sym"],
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "kind": new_kind,
                "sym": sym_col,
                "line": t["line"],
                "caller": t["caller"],
            }
        )

    def occ(batch: pa.Table) -> pa.Table:
        t = extract(batch)
        sym = t["sym"].combine_chunks() if isinstance(t["sym"], pa.ChunkedArray) else t["sym"]
        enc = sym.dictionary_encode()
        hp = (_hash64_batch(enc.dictionary) % np.uint64(num_parts)).astype(np.int64)
        part = hp[enc.indices.to_numpy(zero_copy_only=False)] if len(t) else hp[:0]
        return t.append_column("part", pa.array(part, type=pa.int64()))

    def write_part(g: pa.Table) -> pa.Table:
        p = int(g["part"][0].as_py())
        t = g.sort_by([("sym", "ascending"), ("doc_id", "ascending"), ("line", "ascending")])
        t = t.drop_columns(["part"])
        path = os.path.join(out_dir, f"part-{p:05d}.parquet")
        pq.write_table(t, path, row_group_size=row_group_size)
        n_defs = int(pc.sum(pc.equal(t["kind"], "def")).as_py() or 0)
        return pa.table(
            {
                "part": pa.array([p], type=pa.int64()),
                "rows": pa.array([len(t)], type=pa.int64()),
                "n_defs": pa.array([n_defs], type=pa.int64()),
            }
        )

    stats = (
        ds.map_batches(occ, batch_format="pyarrow")
        .groupby("part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )

    # edge sidecar: streaming read-back of the written parts (pruned to call
    # rows), map-side partial counts, one small groupby — never the corpus
    # at the driver
    part_files = sorted(
        os.path.join(out_dir, f) for f in os.listdir(out_dir) if f.startswith("part-")
    )
    edir = os.path.join(out_dir, EDGES_DIR)
    shutil.rmtree(edir, ignore_errors=True)
    if part_files:

        def partial(t: pa.Table) -> pa.Table:
            t = t.filter(pc.and_(pc.equal(t["kind"], "call"), pc.is_valid(t["caller"])))
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

        (
            rd.read_parquet(part_files, columns=["kind", "sym", "caller"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["caller", "callee"])
            .aggregate(Sum("n", alias_name="n_calls"))
            .write_parquet(edir)
        )
    else:
        os.makedirs(edir, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "caller": pa.array([], pa.string()),
                    "callee": pa.array([], pa.string()),
                    "n_calls": pa.array([], pa.int64()),
                }
            ),
            os.path.join(edir, "empty.parquet"),
        )

    man = {
        "num_parts": num_parts,
        "fingerprint": fingerprint,
        "extractor": extractor,
        "parts": sorted(
            [
                {"part": r["part"], "rows": r["rows"], "n_defs": r["n_defs"]}
                for r in stats
            ],
            key=lambda r: r["part"],
        ),
        "total_rows": int(sum(r["rows"] for r in stats)),
        "total_defs": int(sum(r["n_defs"] for r in stats)),
    }
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
    os.replace(tmp, mpath)
    return man


def verify_store(root: str) -> dict:
    """Store integrity check — the reference's ``scip/database/verify.py``
    (``SCIPDatabaseVerifier``: symbol/occurrence counts + sampled content
    equality between the database and its source).  Checks, per part file:
    existence, manifest row/def counts vs parquet metadata, the (sym,
    doc_id, line) sort invariant (vectorized), hash routing (every row's
    symbol belongs in its part), and the edge sidecar equals a recount from
    the call rows.  One part in memory at a time; returns
    {valid, errors, parts_checked, rows_checked}."""
    errors: list[str] = []
    with open(os.path.join(root, MANIFEST)) as f:
        man = json.load(f)
    num_parts = int(man["num_parts"])
    rows_checked = 0
    recount: dict[tuple[str, str], int] = {}
    tot_rows = tot_defs = 0
    for ent in man["parts"]:
        p = int(ent["part"])
        path = os.path.join(root, f"part-{p:05d}.parquet")
        if not os.path.exists(path):
            errors.append(f"part {p}: file missing")
            continue
        t = pq.read_table(path)
        rows_checked += t.num_rows
        if t.num_rows != int(ent["rows"]):
            errors.append(f"part {p}: rows {t.num_rows} != manifest {ent['rows']}")
        n_defs = int(pc.sum(pc.equal(t["kind"], "def")).as_py() or 0)
        if n_defs != int(ent["n_defs"]):
            errors.append(f"part {p}: defs {n_defs} != manifest {ent['n_defs']}")
        tot_rows += t.num_rows
        tot_defs += n_defs
        if t.num_rows:
            key = pa.table(
                {"sym": t["sym"], "doc_id": t["doc_id"], "line": t["line"]}
            )
            order = pc.sort_indices(
                key,
                sort_keys=[("sym", "ascending"), ("doc_id", "ascending"), ("line", "ascending")],
            ).to_numpy(zero_copy_only=False)
            if not (order == np.arange(len(order))).all():
                errors.append(f"part {p}: rows not (sym, doc_id, line)-sorted")
            uniq = t["sym"].combine_chunks().unique()
            hp = _hash64_batch(uniq) % np.uint64(num_parts)
            if not (hp == np.uint64(p)).all():
                errors.append(f"part {p}: contains symbols routed to other parts")
            calls = t.filter(
                pc.and_(pc.equal(t["kind"], "call"), pc.is_valid(t["caller"]))
            )
            g = (
                pa.table({"caller": calls["caller"], "callee": calls["sym"]})
                .group_by(["caller", "callee"], use_threads=False)
                .aggregate([("callee", "count")])
            )
            for r in g.to_pylist():
                k = (r["caller"], r["callee"])
                recount[k] = recount.get(k, 0) + int(r["callee_count"])
    if tot_rows != int(man["total_rows"]):
        errors.append(f"total_rows {tot_rows} != manifest {man['total_rows']}")
    if tot_defs != int(man["total_defs"]):
        errors.append(f"total_defs {tot_defs} != manifest {man['total_defs']}")
    e = pads.dataset(os.path.join(root, EDGES_DIR)).to_table()
    stored = {
        (c, d): int(n)
        for c, d, n in zip(
            e["caller"].to_pylist(), e["callee"].to_pylist(), e["n_calls"].to_pylist()
        )
    }
    if stored != recount:
        extra = set(stored) - set(recount)
        missing = set(recount) - set(stored)
        wrong = {k for k in set(stored) & set(recount) if stored[k] != recount[k]}
        errors.append(
            f"edge sidecar mismatch: {len(extra)} extra, {len(missing)} missing, "
            f"{len(wrong)} wrong counts"
        )
    return {
        "valid": not errors,
        "errors": errors,
        "parts_checked": len(man["parts"]),
        "rows_checked": rows_checked,
    }


class SymbolStore:
    """Point-lookup reader over a built store (see module docstring)."""

    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, MANIFEST)) as f:
            self.manifest = json.load(f)
        self.num_parts = int(self.manifest["num_parts"])
        self._edges: pa.Table | None = None
        # per-part (ParquetFile, sym row-group min/max) — stats once per part
        self._parts: dict[str, tuple] = {}

    def _part_path(self, sym: str) -> str:
        return os.path.join(
            self.root, f"part-{fnv64(sym) % self.num_parts:05d}.parquet"
        )

    def _part(self, path: str):
        got = self._parts.get(path)
        if got is None:
            pf = pq.ParquetFile(path)
            sym_idx = pf.schema_arrow.get_field_index("sym")
            mins, maxs = [], []
            for i in range(pf.metadata.num_row_groups):
                st = pf.metadata.row_group(i).column(sym_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            got = (pf, mins, maxs)
            while len(self._parts) >= 64:
                try:
                    self._parts.pop(next(iter(self._parts)))
                except (KeyError, RuntimeError, StopIteration):
                    break
            self._parts[path] = got
        return got

    def occurrences(
        self, sym: str, kind: str | None = None, limit: int | None = None
    ) -> pa.Table:
        """Occurrence rows for one symbol: ONE part file; the sorted sym
        column makes matching row groups CONTIGUOUS, so the read walks only
        the covering groups and — rows being (sym, doc_id, line)-sorted —
        stops early once ``limit`` rows are collected (the reference's
        find_references(limit=100), primitives.py:250)."""
        path = self._part_path(sym)
        if not os.path.exists(path):
            from ..text.symbols import _empty

            t = _empty()
            return t if kind is None else t.filter(pc.equal(t["kind"], kind))
        pf, mins, maxs = self._part(path)
        parts = []
        got = 0
        for i in range(len(mins)):
            if mins[i] > sym:
                break
            if maxs[i] < sym:
                continue
            t = pf.read_row_group(i)
            m = pc.equal(t["sym"], sym)
            if kind is not None:
                m = pc.and_(m, pc.equal(t["kind"], kind))
            t = t.filter(m)
            if t.num_rows:
                parts.append(t)
                got += t.num_rows
                if limit is not None and got >= limit:
                    break
        if not parts:
            from ..text.symbols import _empty

            return _empty()
        out = pa.concat_tables(parts)
        return out.slice(0, limit) if limit is not None else out

    def definitions(self, sym: str, limit: int | None = None) -> pa.Table:
        return self.occurrences(sym, kind="def", limit=limit).select(
            ["doc_id", "line"]
        )

    def references(self, sym: str, limit: int | None = None) -> pa.Table:
        return self.occurrences(sym, kind="call", limit=limit).select(
            ["doc_id", "line", "caller"]
        )

    def edges(self) -> pa.Table:
        """The aggregated call graph (symbols²-bounded — the reference's
        ``call_graph`` SQLite table, held the same single-box way)."""
        if self._edges is None:
            self._edges = pads.dataset(os.path.join(self.root, EDGES_DIR)).to_table()
        return self._edges

    def dependencies(self, sym: str) -> pa.Table:
        e = pads.dataset(os.path.join(self.root, EDGES_DIR)).to_table(
            filter=pc.field("caller") == sym
        )
        return e.select(["callee", "n_calls"]).sort_by("callee")

    def dependents(self, sym: str) -> pa.Table:
        e = pads.dataset(os.path.join(self.root, EDGES_DIR)).to_table(
            filter=pc.field("callee") == sym
        )
        return e.select(["caller", "n_calls"]).sort_by("caller")

    def _adj(self, reverse: bool) -> dict[str, list[str]]:
        e = self.edges()
        a = e["callee" if reverse else "caller"].to_pylist()
        b = e["caller" if reverse else "callee"].to_pylist()
        adj: dict[str, list[str]] = {}
        for k, v in zip(a, b):
            adj.setdefault(k, []).append(v)
        return adj

    def _bfs(self, sym: str, max_depth: int, reverse: bool) -> pa.Table:
        """First-visit-depth BFS over the in-memory adjacency — ONE
        implementation for both directions, semantics identical to
        :func:`..scip.graph._bfs_table` (parity-tested)."""
        adj = self._adj(reverse=reverse)
        seen = {sym}
        frontier = [sym]
        rows: list[tuple[str, int]] = []
        for depth in range(1, max_depth + 1):
            nxt: set[str] = set()
            for s in frontier:
                nxt.update(adj.get(s, ()))
            new = nxt - seen
            seen |= new
            rows.extend((s, depth) for s in new)
            frontier = sorted(new)
            if not frontier:
                break
        rows.sort(key=lambda r: (r[1], r[0]))
        return pa.table(
            {
                "sym": pa.array([r[0] for r in rows], type=pa.string()),
                "depth": pa.array([r[1] for r in rows], type=pa.int64()),
            }
        )

    def analyze_impact(self, sym: str, max_depth: int = 3) -> pa.Table:
        """(sym, depth) BFS over reverse edges — identical semantics to
        :func:`..scip.graph.analyze_impact` (parity-tested)."""
        return self._bfs(sym, max_depth, reverse=True)

    def transitive_dependencies(self, sym: str, max_depth: int = 3) -> pa.Table:
        """(sym, depth) forward BFS — identical semantics to
        :func:`..scip.graph.transitive_dependencies` (parity-tested)."""
        return self._bfs(sym, max_depth, reverse=False)

    def trace_call_chain(
        self, frm: str, to: str, max_depth: int = 3, max_chains: int | None = None
    ) -> pa.Table:
        """Simple call chains frm→…→to — identical semantics to
        :func:`..scip.graph.trace_call_chain` (parity-tested)."""
        adj = self._adj(reverse=False)
        live: list[tuple[str, ...]] = [(frm,)]
        done: list[tuple[str, ...]] = []
        for _ in range(max_depth):
            nxt: list[tuple[str, ...]] = []
            for p in live:
                for c in adj.get(p[-1], ()):
                    if c in p:
                        continue
                    q = p + (c,)
                    (done if c == to else nxt).append(q)
            live = nxt
            if not live:
                break
        done.sort(key=lambda p: (len(p) - 1, " -> ".join(p)))
        if max_chains is not None:
            done = done[:max_chains]
        return pa.table(
            {
                "chain": pa.array([" -> ".join(p) for p in done], type=pa.string()),
                "depth": pa.array([len(p) - 1 for p in done], type=pa.int64()),
            }
        )
