"""PII detection / redaction over text columns.

Standard webtext-curation stage (the C4 / CCNet pipelines strip emails,
IPs and phone numbers before training): one vectorized RE2 pass per
pattern via ``pyarrow.compute`` string kernels — pyarrow and DuckDB both
embed RE2, so the DuckDB ``regexp_replace(..., 'g')`` twin is exact.

Shape: stateless ``map_batches``; no shuffle, no per-row Python.  The
pattern list is applied in a FIXED order (email → ipv4 → phone) because
replacements can overlap (an email contains digit runs); the oracle nests
``regexp_replace`` in the same order.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — applied in order.  RE2-only syntax
# (no lookarounds), identical semantics in pyarrow and DuckDB.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d{3}[- ]\d{3}[- ]\d{4}", "<PHONE>"),
)


def redact_batch(batch: pa.Table, text_col: str = "text",
                 out_col: str = "redacted") -> pa.Table:
    """Append ``out_col`` (redacted text) and one ``n_<name>`` count column
    per pattern plus ``n_pii`` (total).  Counts are measured on the text as
    it looks when that pattern runs (after earlier replacements) — exactly
    what the nested-``regexp_replace`` oracle sees."""
    s = batch[text_col]
    counts = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(s, pat)
        s = pc.replace_substring_regex(s, pat, repl)
    total = None
    for c in counts.values():
        total = c if total is None else pc.add(total, c)
    out = batch.append_column(out_col, s)
    for k, v in counts.items():
        out = out.append_column(k, v.cast(pa.int64()))
    return out.append_column("n_pii", total.cast(pa.int64()))


def sql_redact_expr(col: str) -> str:
    """DuckDB expression computing the same redacted text (nested
    regexp_replace with the global flag, same pattern order)."""
    expr = col
    for _, pat, repl in PII_PATTERNS:
        # standard SQL single-quoted strings: backslashes pass through literally
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr


def sql_count_exprs(col: str) -> list[tuple[str, str]]:
    """(alias, DuckDB expression) per-pattern match counts measured on the
    progressively-redacted text, mirroring :func:`redact_batch`."""
    out = []
    expr = col
    for name, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        out.append((f"n_{name}", f"len(regexp_extract_all({expr}, '{p}'))::BIGINT"))
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return out
