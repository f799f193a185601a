"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, token counting, document fingerprinting.

All deterministic, oracle-SQL-expressible (DuckDB twins embedded in
``__ray_entry__``): counts are exact integers, ratios are integer/integer
double divisions, fingerprints are md5 over canonical strings.  Vectorized
``map_batches`` kernels over Arrow — the per-row python is only md5 over
short canonical strings.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import tokenize_flat

# small fixed stopword sets per language for the n-gram/stopword language
# heuristic (public-knowledge common-word lists, deliberately tiny)
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on"),
    "de": ("der", "die", "das", "und", "ist", "ein", "mit", "von", "zu", "den"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du", "que"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "de", "que"),
}


def text_stats_batch(batch: pa.Table, *, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc stats: n_tokens, n_unique, stop_en (en-stopword token count),
    punct_chars, mean_token_len (rounded 4dp), fingerprint (md5 of
    space-joined sorted unique tokens), lang_guess (argmax stopword hits,
    'unknown' when zero; ties broken by language-code order)."""
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    tokens, rows = tokenize_flat(texts)

    n_tokens = np.zeros(n, dtype=np.int64)
    np.add.at(n_tokens, rows, 1)
    tok_lens = pc.utf8_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    len_sum = np.zeros(n, dtype=np.int64)
    np.add.at(len_sum, rows, tok_lens)

    stop_counts = {}
    for lang, words in STOPWORDS.items():
        hit = pc.is_in(tokens, value_set=pa.array(list(words))).to_numpy(zero_copy_only=False)
        c = np.zeros(n, dtype=np.int64)
        np.add.at(c, rows[hit], 1)
        stop_counts[lang] = c

    punct = pc.count_substring_regex(texts, pattern=r"[^\p{L}\p{N}\s]").to_numpy(
        zero_copy_only=False
    ).astype(np.int64)

    # unique tokens + fingerprint per row — vectorized: dictionary-encode the
    # token stream, replace each code with its LEXICOGRAPHIC rank, and one
    # np.unique over packed (row, rank) keys yields every row's sorted unique
    # tokens at once.  Only the md5 over each row's (short) canonical string
    # stays in Python — that part is hash-bound by design (oracle parity).
    n_unique = np.zeros(n, dtype=np.int64)
    fingerprint = [hashlib.md5(b"").hexdigest()] * n
    if len(tokens):
        dic = pc.dictionary_encode(tokens)
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = np.asarray(dic.dictionary.to_pylist(), dtype=object)
        order = np.argsort(terms, kind="stable")  # lexicographic (matches sorted())
        rank_of_code = np.empty(len(terms), dtype=np.int64)
        rank_of_code[order] = np.arange(len(terms))
        keys = rows.astype(np.int64) * len(terms) + rank_of_code[codes]
        uniq = np.unique(keys)  # sorted → grouped by row, ranks ascending
        urows = uniq // len(terms)
        uranks = uniq % len(terms)
        np.add.at(n_unique, urows, 1)
        terms_by_rank = terms[order]
        bounds = np.searchsorted(urows, np.arange(n + 1))
        fingerprint = [
            hashlib.md5(
                " ".join(terms_by_rank[uranks[bounds[r] : bounds[r + 1]]]).encode("utf-8")
            ).hexdigest()
            for r in range(n)
        ]

    langs = sorted(STOPWORDS)
    stack = np.stack([stop_counts[lang] for lang in langs], axis=1)
    best = np.argmax(stack, axis=1)
    best_cnt = stack[np.arange(n), best]
    lang_guess = [langs[b] if c > 0 else "unknown" for b, c in zip(best, best_cnt)]

    # exact integer fixed-point (×10⁴) mean token length: avoids the
    # banker's-vs-half-away rounding mismatch between numpy and SQL on
    # terminating rationals like 82469/20
    mean_len_e4 = np.where(n_tokens > 0, (len_sum * 10000) // np.maximum(n_tokens, 1), 0)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_tokens": pa.array(n_tokens),
            "n_unique": pa.array(n_unique),
            "stop_en": pa.array(stop_counts["en"]),
            "punct_chars": pa.array(punct),
            "mean_len_e4": pa.array(mean_len_e4.astype(np.int64)),
            "fingerprint": pa.array(fingerprint, type=pa.string()),
            "lang_guess": pa.array(lang_guess, type=pa.string()),
        }
    )


def rolling_hash_fingerprint(texts: pa.Array, window: int = 64, mod: int = (1 << 61) - 1) -> np.ndarray:
    """Polynomial rolling-hash document fingerprint (Rabin-style): hash of the
    whole token stream — deterministic int64 column for cheap pre-clustering."""
    tokens, rows = tokenize_flat(texts)
    n = len(texts)
    # Python-int accumulation: exact Rabin mod-p arithmetic (a uint64
    # accumulator would wrap mod 2^64 BEFORE the % p reduction, which is a
    # different hash function and raises overflow warnings).
    base = 1_000_003
    acc = [0] * n
    for t, r in zip(tokens.to_pylist(), rows):
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        acc[r] = (acc[r] * base + h) % mod
    return np.array(acc, dtype=np.int64)
