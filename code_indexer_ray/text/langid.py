"""Char-n-gram language identification (the Cavnar & Trenkle 1994 profile
pattern), built integer-exact so the DuckDB twin matches bit-for-bit.

Reference parity: the reference maps languages from file extensions with a
user override (`services/language_mapper.py`) and never inspects content;
this module adds the content-based detector a web-text pipeline needs
(SURVEY M4).  Design:

- **Training** is a deterministic labeled sample (``doc_id % train_mod == 0``)
  — at 100 TB you train on a tiny consistent-hash sample, never the corpus.
  Per language, count codepoint trigrams and keep the top ``profile_size``
  by (count desc, trigram asc).
- **Classification** is a broadcast-lookup ``map_batches`` stage (no
  shuffle): a document's score for a language is the integer sum, over its
  trigram *occurrences*, of that language's profile count for the trigram;
  argmax with lang-asc tiebreak.  A document with no trigrams (< 3 chars)
  scores 0 everywhere and deterministically falls back to the first profile
  language.

Everything is integer arithmetic on codepoint trigrams, so the SQL twin
(substr char trigrams + the same top-K window + SUM/argmax) is exact —
no float drift, no hash dependence.

Vectorization: texts are decoded once to a UTF-32 codepoint array; trigram
keys pack three 21-bit codepoints into one uint64 (``c0<<42 | c1<<21 | c2``),
so key order == codepoint-lex order == UTF-8 byte order (what DuckDB's
string comparison uses for the top-K tiebreak).  Profile lookups are one
``searchsorted`` per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_SHIFT1 = np.uint64(42)
_SHIFT2 = np.uint64(21)


def trigram_keys(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """All codepoint-trigram occurrences across ``texts``.

    Returns ``(keys, row_ids)`` — one entry per trigram occurrence, where
    ``keys`` packs the three codepoints into a uint64 and ``row_ids`` maps
    each occurrence back to its text's index.  Windows never cross text
    boundaries.
    """
    if not texts:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    if len(cp) < 3:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    keys = (
        (cp[:-2].astype(np.uint64) << _SHIFT1)
        | (cp[1:-1].astype(np.uint64) << _SHIFT2)
        | cp[2:].astype(np.uint64)
    )
    # window at global position p belongs to text i iff p+2 < starts[i]+lens[i]
    pos = np.arange(len(keys), dtype=np.int64)
    row = np.searchsorted(starts, pos, side="right") - 1
    keep = pos + 2 < starts[row] + lens[row]
    return keys[keep], row[keep]


def key_to_trigram(key: int) -> str:
    """Inverse of the 21-bit packing (tests / profile export)."""
    k = int(key)
    return "".join(chr(c) for c in ((k >> 42) & 0x1FFFFF, (k >> 21) & 0x1FFFFF, k & 0x1FFFFF))


class LangProfiles:
    """Broadcastable profile state: sorted trigram keys + per-language count
    matrix.  Built once (driver or a small Ray aggregate), shipped via
    ``ray.put`` to every classify task."""

    def __init__(self, langs: list[str], keys: np.ndarray, counts: np.ndarray):
        self.langs = langs  # sorted ascending — argmax first-hit == lang-asc tiebreak
        self.keys = keys  # sorted uint64, union of every language's profile
        self.counts = counts  # int64 [len(keys), len(langs)]

    @classmethod
    def from_counts(
        cls, per_lang: dict[str, dict[int, int]], profile_size: int
    ) -> "LangProfiles":
        """Top-``profile_size`` trigrams per language by (count desc, key asc);
        key asc == trigram asc (see module docstring)."""
        langs = sorted(per_lang)
        kept: dict[str, dict[int, int]] = {}
        for lang in langs:
            items = sorted(per_lang[lang].items(), key=lambda kv: (-kv[1], kv[0]))
            kept[lang] = dict(items[:profile_size])
        union = np.array(sorted({k for d in kept.values() for k in d}), dtype=np.uint64)
        counts = np.zeros((len(union), len(langs)), dtype=np.int64)
        for j, lang in enumerate(langs):
            for k, c in kept[lang].items():
                counts[np.searchsorted(union, np.uint64(k)), j] = c
        return cls(langs, union, counts)


def profile_counts_batch(batch: pa.Table, *, lang_col: str = "lang", text_col: str = "text") -> pa.Table:
    """Partial per-batch (lang, key, cnt) trigram counts — the map side of
    the training aggregation (combine before the one small groupby)."""
    texts = batch[text_col].to_pylist()
    langs = batch[lang_col].to_pylist()
    keys, rows = trigram_keys([t or "" for t in texts])
    if len(keys) == 0:
        return pa.table(
            {
                "lang": pa.array([], pa.string()),
                "key": pa.array([], pa.uint64()),
                "cnt": pa.array([], pa.int64()),
            }
        )
    lang_codes, lang_idx = np.unique(np.asarray(langs, dtype=object)[rows], return_inverse=True)
    # group by (lang_idx, key): sort a structured pair once
    order = np.lexsort((keys, lang_idx))
    li, ks = lang_idx[order], keys[order]
    new = np.empty(len(ks), dtype=bool)
    new[0] = True
    new[1:] = (ks[1:] != ks[:-1]) | (li[1:] != li[:-1])
    grp_start = np.flatnonzero(new)
    cnt = np.diff(np.append(grp_start, len(ks)))
    return pa.table(
        {
            "lang": pa.array(lang_codes[li[grp_start]].tolist(), pa.string()),
            "key": pa.array(ks[grp_start]),
            "cnt": pa.array(cnt.astype(np.int64)),
        }
    )


def build_profiles_ray(
    ds, *, profile_size: int = 200, lang_col: str = "lang", text_col: str = "text"
) -> LangProfiles:
    """Train profiles from a (small, pre-sampled) labeled Dataset: per-batch
    partial counts → one ``groupby`` over (lang, key) → driver-side top-K.
    Only (lang, trigram, count) rows ever reach the driver — bounded by
    |langs| × |observed trigrams of the sample|, never corpus-sized."""
    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(
            lambda b: profile_counts_batch(b, lang_col=lang_col, text_col=text_col),
            batch_format="pyarrow",
        )
        .groupby(["lang", "key"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    per_lang: dict[str, dict[int, int]] = {}
    for batch in agg.iter_batches(batch_format="pyarrow"):
        for lang, key, cnt in zip(
            batch["lang"].to_pylist(), batch["key"].to_pylist(), batch["cnt"].to_pylist()
        ):
            per_lang.setdefault(lang, {})[int(key)] = int(cnt)
    return LangProfiles.from_counts(per_lang, profile_size)


def classify_batch(
    batch: pa.Table,
    profiles: LangProfiles,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pa.Table:
    """(doc_id, pred_lang, score): integer profile-count sum per language,
    argmax with lang-asc tiebreak; trigram-less docs fall back to
    ``profiles.langs[0]`` with score 0."""
    texts = [t or "" for t in batch[text_col].to_pylist()]
    n = len(texts)
    keys, rows = trigram_keys(texts)
    scores = np.zeros((n, len(profiles.langs)), dtype=np.int64)
    if len(keys):
        pos = np.searchsorted(profiles.keys, keys)
        pos_c = np.minimum(pos, len(profiles.keys) - 1)
        hit = profiles.keys[pos_c] == keys
        if hit.any():
            np.add.at(scores, rows[hit], profiles.counts[pos_c[hit]])
    best = np.argmax(scores, axis=1)  # first max → lang-asc tiebreak (langs sorted)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "pred_lang": pa.array([profiles.langs[int(b)] for b in best], pa.string()),
            "score": pa.array(scores[np.arange(n), best]),
        }
    )
