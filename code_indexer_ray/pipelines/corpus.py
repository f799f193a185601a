"""Corpus synthesis/derivation at the BASELINE input_hint shape.

Input shape (BASELINE.json): Parquet of Common-Crawl-style pages
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Two deterministic sources, no external data:

- :func:`pages_from_documents` — derive pages from the driver-provided
  ``documents`` table (FIXTURES.md §1 note): ``url := source/doc_id``,
  ``warc_ts := 2025-01-01 + doc_id seconds``, ``html := wrapper(text)``.
- :func:`generate_pages` — seeded Zipf synthetic corpus for scale benches
  (vocabulary t000000..t049999, Zipf s≈1.1 so head-term groupby skew is
  real; anchor terms with known df; ~1‰ wide records; per-doc seeded RNG so
  any row range can be generated independently on any worker).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..text.extract import wrap_body

EPOCH_2025 = np.datetime64("2025-01-01T00:00:00", "us")

VOCAB_SIZE = 50_000
ZIPF_S = 1.1


def pages_from_documents(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents row → pages row (input_hint schema + doc_id)."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    urls = pc.binary_join_element_wise(
        batch["source"].combine_chunks() if isinstance(batch["source"], pa.ChunkedArray) else batch["source"],
        pa.array([str(i) for i in doc_ids]),
        "/",
    )
    ts = EPOCH_2025 + doc_ids.astype("timedelta64[us]") * 1_000_000
    texts = batch["text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return pa.table(
        {
            "doc_id": pa.array(doc_ids),
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": wrap_body(doc_ids, texts),
            "text": texts,
            "lang": batch["lang"],
        }
    )


def _zipf_weights(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return w / w.sum()


_CUM_WEIGHTS: np.ndarray | None = None


def _cum_weights() -> np.ndarray:
    global _CUM_WEIGHTS
    if _CUM_WEIGHTS is None:
        _CUM_WEIGHTS = np.cumsum(_zipf_weights(VOCAB_SIZE, ZIPF_S))
    return _CUM_WEIGHTS


def generate_pages_block(start: int, count: int, seed: int = 42) -> pa.Table:
    """Deterministically generate pages rows [start, start+count)."""
    return generate_pages_for_ids(np.arange(start, start + count, dtype=np.int64), seed)


def generate_pages_for_ids(ids: np.ndarray, seed: int = 42) -> pa.Table:
    """Row i depends only on (seed, i) — any id set can be generated on any
    worker independently (stateless parallel generation)."""
    cw = _cum_weights()
    ids = np.asarray(ids, dtype=np.int64)
    texts = []
    langs = []
    lang_choices = np.array(["en", "en", "en", "en", "en", "en", "en", "en", "de", "fr"])
    for i in ids:
        rng = np.random.default_rng(seed * 1_000_003 + int(i))
        n_tok = int(rng.integers(50, 2001))
        if i % 1000 == 17:  # ~1‰ wide records (multi-100KB) — wide-row stress
            n_tok = 40_000
        toks = np.searchsorted(cw, rng.random(n_tok))
        words = [f"t{t:06d}" for t in toks]
        if i % 977 == 3:
            words.append("needlerare")  # known low-df anchor terms
        if i == 123:
            words.append("needleunique")
        # newlines every ~12 tokens so line numbers are meaningful
        parts = []
        for j in range(0, len(words), 12):
            parts.append(" ".join(words[j : j + 12]))
        texts.append("\n".join(parts))
        langs.append(lang_choices[int(i) % 10])
    t_texts = pa.array(texts, type=pa.string())
    urls = pa.array([f"https://site{int(i) % 1000}.example/p/{int(i)}" for i in ids])
    ts = EPOCH_2025 + ids.astype("timedelta64[us]") * 1_000_000
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "url": urls,
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": wrap_body(ids, t_texts),
            "text": t_texts,
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_corpus(path: str, n_docs: int, seed: int = 42, block_rows: int = 2000) -> str:
    """Generate a corpus to partitioned Parquet with Ray (parallel, seeded)."""
    import ray.data as rd

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        return generate_pages_for_ids(ids, seed)

    (
        rd.range(n_docs)
        .repartition(max(1, n_docs // block_rows))
        .map_batches(gen, batch_format="pyarrow", batch_size=block_rows)
        .write_parquet(path, row_group_size=512)
    )
    return path
