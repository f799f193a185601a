"""RAG context extraction — reference ``services/rag_context_extractor.py``.

The reference groups search hits by file, expands a ±``context_lines``
window around each hit's chunk lines, merges overlapping/adjacent windows
per file (keeping the best hit's score), and extracts the merged line
ranges under a global ``max_total_lines`` budget, shrinking the window when
many files must fit (``extract_context_from_results``,
``rag_context_extractor.py:42-114``; merge rule ``:185-258``).

This is the deterministic distillation of those semantics over the docs
table (NOT a port — the reference is a driver-side loop over a local
checkout with caches):

1. ``C`` (effective context): if ``ensure_all_files`` and
   ``n_files × (context_lines + buffer) > max_total_lines`` then
   ``C = max(min_context, max_total_lines // n_files - buffer)`` else
   ``context_lines`` (the reference's constants buffer=50 / min_context=50
   are parameters here).
2. per doc: window = [max(1, line_start-C), min(n_lines, line_end+C)]
   (1-based, inclusive); sort by (start, end); merge while
   ``start <= prev_end + 1``; island score = max hit score.
3. global order: (file best score DESC, doc_id ASC, start ASC) — the
   reference iterates files in first-hit (rank) order; islands cross the
   running ``max_total_lines`` budget in that order, the crossing island is
   truncated, the rest dropped.
4. content = the island's lines joined by ``\\n``; emitted as ``md5`` so
   result rows stay constant-size.

Execution shape: hits are top-k (result-sized) by contract, so they
broadcast; the two corpus passes stream — pass A computes per-doc merged
islands for hit docs only, pass B extracts content for the (budgeted)
surviving islands.  Nothing corpus-sized ever sits at the driver.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def format_contexts(
    contexts: list[dict],
    *,
    include_line_numbers: bool = True,
    max_chars: int = 50_000,
) -> str:
    """Render extracted contexts as a prompt block (reference
    ``format_contexts_for_prompt``, ``rag_context_extractor.py:295`` —
    minus its repo-specific path guessing): one ``## Context i`` header per
    context with line range + relevance tier (HIGH >0.8 / MEDIUM >0.5 /
    LOW), a line-numbered fenced code block, and a global character budget
    that truncates the crossing section and notes the cut.

    ``contexts``: dicts with ``path`` (or doc_id), ``line_start``,
    ``line_end``, ``score``, ``content``, optional ``language`` /
    ``total_lines``."""
    if not contexts:
        return "No relevant code contexts found."
    parts: list[str] = []
    total = 0
    for i, c in enumerate(contexts, 1):
        where = c.get("path") or f"doc {c.get('doc_id')}"
        lang = c.get("language") or ""
        score = float(c.get("score", 0.0))
        tier = "HIGH" if score > 0.8 else "MEDIUM" if score > 0.5 else "LOW"
        header = f"\n## Context {i}: {where}" + (f" ({lang})" if lang else "")
        span = f"{c['line_start']}-{c['line_end']}"
        if c.get("total_lines"):
            span += f"/{c['total_lines']}"
        header += f"\n**Lines {span}** | **Relevance: {score:.3f} ({tier})**\n"
        content = c.get("content", "")
        if include_line_numbers:
            content = "\n".join(
                f"{int(c['line_start']) + j:4d}: {line}"
                for j, line in enumerate(content.split("\n"))
            )
        section = header + f"```{lang}\n{content}\n```\n"
        if total + len(section) > max_chars:
            remaining = max_chars - total
            if remaining > 100:
                parts.append(section[: remaining - 50] + "\n... [truncated]\n```\n")
            parts.append(
                f"\n*Note: output truncated at {max_chars:,} characters; "
                f"{len(contexts)} contexts available.*"
            )
            break
        parts.append(section)
        total += len(section)
    return "".join(parts)


def _empty() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "line_start": pa.array([], pa.int64()),
            "line_end": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "content_md5": pa.array([], pa.string()),
        }
    )


def effective_context(
    n_files: int,
    *,
    context_lines: int,
    max_total_lines: int,
    buffer: int,
    min_context: int,
    ensure_all_files: bool,
) -> int:
    if ensure_all_files and n_files and n_files * (context_lines + buffer) > max_total_lines:
        return max(min_context, max_total_lines // n_files - buffer)
    return context_lines


def merge_islands(spans: list[tuple[int, int, int]]) -> list[tuple[int, int, int]]:
    """[(start, end, score)] → merged islands, overlap-or-adjacent rule,
    max score per island.  Input need not be sorted."""
    out: list[tuple[int, int, int]] = []
    for s, e, sc in sorted(spans):
        if out and s <= out[-1][1] + 1:
            ps, pe, psc = out[-1]
            out[-1] = (ps, max(pe, e), max(psc, sc))
        else:
            out.append((s, e, sc))
    return out


def extract_contexts(
    hits: pa.Table,
    docs_ds,
    *,
    context_lines: int = 500,
    max_total_lines: int = 5000,
    buffer: int = 50,
    min_context: int = 50,
    ensure_all_files: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """hits (doc_id, line_start, line_end, score) + docs Dataset →
    (doc_id, line_start, line_end, score, content_md5) context table."""
    if hits.num_rows == 0:
        return _empty()
    by_doc: dict[int, list[tuple[int, int, int]]] = {}
    for r in hits.select(["doc_id", "line_start", "line_end", "score"]).to_pylist():
        by_doc.setdefault(int(r["doc_id"]), []).append(
            (int(r["line_start"]), int(r["line_end"]), int(r["score"]))
        )
    c_eff = effective_context(
        len(by_doc),
        context_lines=context_lines,
        max_total_lines=max_total_lines,
        buffer=buffer,
        min_context=min_context,
        ensure_all_files=ensure_all_files,
    )
    doc_ids = pa.array(sorted(by_doc), type=pa.int64())

    # pass A: per-doc merged islands (hit docs only; hits broadcast)
    def islands(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col].cast(pa.int64()), value_set=doc_ids)
        t = batch.filter(m)
        o_doc, o_s, o_e, o_sc, o_fb = [], [], [], [], []
        for d, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            nl = txt.count("\n") + 1
            spans = [
                (max(1, ls - c_eff), min(nl, le + c_eff), sc)
                for ls, le, sc in by_doc[int(d)]
            ]
            fbest = max(sc for _, _, sc in spans)
            for s, e, sc in merge_islands(spans):
                o_doc.append(int(d))
                o_s.append(s)
                o_e.append(e)
                o_sc.append(sc)
                o_fb.append(fbest)
        return pa.table(
            {
                "doc_id": pa.array(o_doc, type=pa.int64()),
                "s": pa.array(o_s, type=pa.int64()),
                "e": pa.array(o_e, type=pa.int64()),
                "sc": pa.array(o_sc, type=pa.int64()),
                "fbest": pa.array(o_fb, type=pa.int64()),
            }
        )

    isl = docs_ds.map_batches(islands, batch_format="pyarrow").take_all()
    isl.sort(key=lambda r: (-r["fbest"], r["doc_id"], r["s"]))

    # global budget fold (result-sized, driver)
    final: dict[int, list[tuple[int, int, int]]] = {}
    used = 0
    for r in isl:
        if used >= max_total_lines:
            break
        s, e = r["s"], r["e"]
        if used + (e - s + 1) > max_total_lines:
            e = s + (max_total_lines - used) - 1
            if e < s:
                break
        final.setdefault(r["doc_id"], []).append((s, e, r["sc"]))
        used += e - s + 1

    if not final:
        return _empty()
    fin_ids = pa.array(sorted(final), type=pa.int64())

    # pass B: content for the surviving islands
    def content(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch[id_col].cast(pa.int64()), value_set=fin_ids)
        t = batch.filter(m)
        o = {"doc_id": [], "line_start": [], "line_end": [], "score": [], "content_md5": []}
        for d, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            lines = txt.split("\n")
            for s, e, sc in final[int(d)]:
                piece = "\n".join(lines[s - 1 : e])
                o["doc_id"].append(int(d))
                o["line_start"].append(s)
                o["line_end"].append(e)
                o["score"].append(sc)
                o["content_md5"].append(hashlib.md5(piece.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(o["doc_id"], type=pa.int64()),
                "line_start": pa.array(o["line_start"], type=pa.int64()),
                "line_end": pa.array(o["line_end"], type=pa.int64()),
                "score": pa.array(o["score"], type=pa.int64()),
                "content_md5": pa.array(o["content_md5"], type=pa.string()),
            }
        )

    out = docs_ds.map_batches(content, batch_format="pyarrow").take_all()
    if not out:
        return _empty()
    return pa.Table.from_pylist(out, schema=_empty().schema)
