"""AST-accurate Python symbol extraction — the precision tier above
``text/symbols.py``'s regex anchors.

Reference analog: ``scip/indexers/python.py`` (per-language SCIP indexer
emitting qualified symbol occurrences via real parsing).  The regex path
(kept for other languages and for the closed-form SCIP demo corpus) only
sees top-level ``def name():`` lines; this module uses stdlib ``ast`` to
get what that provably misses:

- NESTED scopes: ``def inner`` inside ``def outer`` → qualified
  ``outer.inner``; methods → ``Class.method``.
- IMPORT ALIASES: ``import numpy as np`` / ``from a import b as c`` bind
  alias → target; calls through an alias resolve to the real module path
  (``np.zeros()`` → ``numpy.zeros``).
- CALL RESOLUTION: a called name is looked up through the lexical scope
  chain (a scope's bindings are ALL defs declared anywhere in it — static
  approximation of runtime lookup); hits resolve to the qualified symbol,
  misses stay the bare name.
- CALLER attribution is the innermost enclosing function/method (classes
  don't call; module-level calls have a null caller) — exact, not the
  regex path's nearest-preceding-line heuristic.

The extractor is a ``map_batches`` stage: ``ast.parse`` per document is
irreducibly per-doc Python (same cost shape as the reference's indexer);
parallelism across documents in the pool is the scale axis.  Documents
that fail to parse contribute no rows (the reference skips unparseable
files the same way).

Output: one table with kind ∈ {def, class, import, call}:
  (doc_id, kind, sym, target, line, caller)
- def/class: sym = qualified name, target = null
- import:    sym = bound alias,   target = imported module path
- call:      sym = resolved callee (qualified / module path / bare),
             target = null, caller = enclosing qualified def or null
"""

from __future__ import annotations

import ast

import numpy as np
import pyarrow as pa

__all__ = [
    "extract_python_ast_batch",
    "python_ast_rows",
    "PyAstStage",
]


def python_ast_rows(doc_id: int, source: str) -> list[tuple]:
    """(doc_id, kind, sym, target, line, caller) rows for one document."""
    try:
        tree = ast.parse(source)
    except (SyntaxError, ValueError, MemoryError, RecursionError):
        return []
    rows: list[tuple] = []
    # import-alias table: binding name → dotted target (module-level only;
    # function-local imports are rare and resolve identically in practice)
    aliases: dict[str, str] = {}

    def collect_scope_defs(node) -> dict[str, str]:
        """name → qualified symbol for defs declared ANYWHERE in this scope
        (depth-1 children; nested scopes own their own bindings)."""
        out = {}
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                out[child.name] = child.name  # qualified later by the caller
        return out

    def resolve_call(func, scope_chain: list[tuple[str, dict[str, str], bool]]) -> str | None:
        """Resolved callee symbol for a Call's func node."""
        if isinstance(func, ast.Name):
            name = func.id
            # lexical lookup, innermost first — Python scoping: CLASS scopes
            # are invisible to nested functions (only the innermost scope,
            # i.e. code directly in the class body, sees class-level names)
            for depth, (prefix, bindings, is_class) in enumerate(reversed(scope_chain)):
                if is_class and depth != 0:
                    continue
                if name in bindings:
                    return f"{prefix}.{name}" if prefix else name
            if name in aliases:
                return aliases[name]
            return name
        if isinstance(func, ast.Attribute):
            # walk the attribute chain down to its base
            parts = [func.attr]
            cur = func.value
            while isinstance(cur, ast.Attribute):
                parts.append(cur.attr)
                cur = cur.value
            if isinstance(cur, ast.Name):
                base = aliases.get(cur.id, cur.id)
                return ".".join([base, *reversed(parts)])
            return None  # computed receiver — no static name
        return None  # lambda / subscript / call-of-call

    def visit(node, qual: str, caller: str | None,
              scope_chain: list[tuple[str, dict[str, str], bool]]) -> None:
        for child in ast.iter_child_nodes(node):
            if isinstance(child, ast.Import):
                for a in child.names:
                    if a.asname:
                        bound, alias_target = a.asname, a.name
                    else:
                        # `import os.path` binds the TOP-LEVEL name `os`;
                        # attribute chains through it are already fully
                        # qualified, so the alias maps to itself
                        bound = a.name.split(".", 1)[0]
                        alias_target = bound
                    aliases[bound] = alias_target
                    rows.append((doc_id, "import", bound, a.name, child.lineno, None))
            elif isinstance(child, ast.ImportFrom):
                mod = child.module or ""
                for a in child.names:
                    if a.name == "*":
                        continue
                    bound = a.asname or a.name
                    target = f"{mod}.{a.name}" if mod else a.name
                    aliases[bound] = target
                    rows.append((doc_id, "import", bound, target, child.lineno, None))
            elif isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                q = f"{qual}.{child.name}" if qual else child.name
                kind = "class" if isinstance(child, ast.ClassDef) else "def"
                rows.append((doc_id, kind, q, None, child.lineno, None))
                child_bindings = collect_scope_defs(child)
                is_class = isinstance(child, ast.ClassDef)
                visit(
                    child,
                    q,
                    caller if is_class else q,
                    scope_chain + [(q, child_bindings, is_class)],
                )
            elif isinstance(child, ast.Call):
                callee = resolve_call(child.func, scope_chain)
                if callee is not None:
                    rows.append((doc_id, "call", callee, None, child.lineno, caller))
                visit(child, qual, caller, scope_chain)
            else:
                visit(child, qual, caller, scope_chain)

    module_bindings = collect_scope_defs(tree)
    visit(tree, "", None, [("", module_bindings, False)])
    return rows


def extract_python_ast_batch(
    batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """Vector-framed batch wrapper: per-doc AST parse, columnar output."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    texts = batch[text_col].to_pylist()
    rows: list[tuple] = []
    for did, src in zip(ids, texts):
        if src:
            rows.extend(python_ast_rows(int(did), src))
    if not rows:
        return _empty()
    cols = list(zip(*rows))
    return pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1], pa.string()),
            "sym": pa.array(cols[2], pa.string()),
            "target": pa.array(cols[3], pa.string()),
            "line": pa.array(cols[4], pa.int64()),
            "caller": pa.array(cols[5], pa.string()),
        }
    )


def _empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "kind": pa.array([], pa.string()),
            "sym": pa.array([], pa.string()),
            "target": pa.array([], pa.string()),
            "line": pa.array([], pa.int64()),
            "caller": pa.array([], pa.string()),
        }
    )


class PyAstStage:
    """Actor-pool form for big corpora (state-free today, but the actor
    shape keeps a future symbol-interning table or parse cache per worker)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_python_ast_batch(
            batch, id_col=self.id_col, text_col=self.text_col
        )
