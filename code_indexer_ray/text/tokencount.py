"""Token counting for training-data budgeting (SURVEY ST2 analog).

The reference holds a tokenizer client as per-process state and counts tokens
per document before embedding (``services/`` token-budget plumbing); the
Ray-native shape is a *stateful actor-pool stage*: the pattern set is built
once per actor in ``__init__`` and every batch is counted with vectorized
RE2 kernels (``pyarrow.compute.count_substring_regex``).

Two counts per document:

- ``n_bpe`` — matches of a GPT-2-style pre-tokenizer regex (public knowledge,
  Radford et al. 2019 / the tiktoken pattern), adapted to be RE2-safe: the
  original's ``\\s+(?!\\S)`` lookahead is unsupported by RE2, so trailing
  whitespace folds into the plain ``\\s+`` arm.  This is the "BPE-ish"
  budget count — each pre-token maps to ≥1 BPE token, so it is a stable
  lower-bound proxy without shipping a vocabulary.
- ``n_ws`` — whitespace-delimited tokens (``\\S+`` runs).

Oracle parity: pyarrow and DuckDB both embed RE2, so counting matches of the
IDENTICAL pattern string is exact on both sides (``sql_token_count``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe GPT-2-style pre-tokenizer (no lookahead; leftmost-first alternation)
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
WS_PATTERN = r"\S+"


class TokenCountStage:
    """Actor-pool ``map_batches`` stage: per-doc token counts.

    Use as ``ds.map_batches(TokenCountStage, concurrency=N,
    batch_format="pyarrow")`` — construction (the stage's "model load")
    happens once per actor, ``__call__`` is pure vectorized compute.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        # per-actor state: the pattern set (a real tokenizer client would
        # load its merges/vocab here, once, not per batch)
        self.patterns = {"n_bpe": BPE_PATTERN, "n_ws": WS_PATTERN}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col]
        cols = {"doc_id": batch[self.id_col].cast(pa.int64())}
        for name, pat in self.patterns.items():
            cols[name] = pc.count_substring_regex(texts, pattern=pat).cast(pa.int64())
        cols["n_bytes"] = pc.binary_length(texts).cast(pa.int64())
        return pa.table(cols)


def sql_token_count(table: str = "documents", id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB twin: identical RE2 patterns, match-count per row."""
    bpe = BPE_PATTERN.replace("'", "''")
    ws = WS_PATTERN.replace("'", "''")
    return (
        f"SELECT {id_col}::BIGINT AS doc_id,\n"
        f"  len(regexp_extract_all({text_col}, '{bpe}'))::BIGINT AS n_bpe,\n"
        f"  len(regexp_extract_all({text_col}, '{ws}'))::BIGINT AS n_ws,\n"
        f"  strlen({text_col})::BIGINT AS n_bytes\n"
        f"FROM {table}"
    )
