"""Embedder-client analog (SURVEY ST1): deterministic feature-hashing text
embeddings as an actor-pool stage.

The reference's embedder is a stateful client that holds a loaded model per
worker process and embeds batches of chunk texts (``services/`` embedding
provider pool).  The sandbox has no model, so the "model" here is the
classic feature-hashing trick (Weinberger et al. 2009): token → md5 bucket
with a ±1 sign hash, signed counts accumulated per document and
L2-normalized.  That keeps every part of the *pipeline* real — per-actor
init, batched vectorized embedding, a normalized fixed-dim output — while
the transform itself stays exactly reproducible in DuckDB
(``md5_number_lower`` is the same lower-64-bits-of-md5 the Python side
uses), so this stage is oracle-gated, not just smoke-tested.

Output is EXPLODED to (doc_id, i, v_r) scalar rows (v_r = component rounded
4dp) so the driver's value-hash comparison never sees a list column.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .analysis import sql_tokens_cte, tokenize_flat
from ..dedup.minhash import md5_lower64

DEFAULT_EMBED_DIM = 16
SEMANTIC_DIM = 16  # end-to-end semantic-search pipeline dimension


class TextEmbedStage:
    """``ds.map_batches(TextEmbedStage, fn_constructor_kwargs={...},
    concurrency=N, batch_format="pyarrow")`` — embedder actor pool."""

    def __init__(
        self,
        dim: int = DEFAULT_EMBED_DIM,
        id_col: str = "doc_id",
        text_col: str = "text",
        output: str = "exploded",
    ):
        # per-actor "model load": the projection config + the unique-token
        # hash cache (persists across batches, like a tokenizer/model cache)
        if output not in ("exploded", "list"):
            raise ValueError(f"output must be 'exploded' or 'list', got {output!r}")
        self.dim = dim
        self.id_col = id_col
        self.text_col = text_col
        self.output = output
        self._hash_cache: dict[str, int] = {}

    def _hash_unique(self, terms: list[str]) -> np.ndarray:
        out = np.empty(len(terms), dtype=np.uint64)
        cache = self._hash_cache
        for i, t in enumerate(terms):
            h = cache.get(t)
            if h is None:
                h = md5_lower64(t)
                if len(cache) < 2_000_000:  # bounded actor-state cache
                    cache[t] = h
            out[i] = h
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        dim = self.dim
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tokens, rows = tokenize_flat(batch[self.text_col])
        acc = np.zeros((n, dim), dtype=np.float64)
        if len(tokens):
            dic = pc.dictionary_encode(tokens)
            codes = dic.indices.to_numpy(zero_copy_only=False)
            uh = self._hash_unique(dic.dictionary.to_pylist())
            th = uh[codes]
            bucket = (th % np.uint64(dim)).astype(np.int64)
            sign = np.where((th // np.uint64(dim)) % np.uint64(2) == 0, 1.0, -1.0)
            np.add.at(acc, (rows, bucket), sign)
        norms = np.sqrt((acc * acc).sum(axis=1))
        emb = np.divide(acc, norms[:, None], out=np.zeros_like(acc), where=norms[:, None] > 0)
        if self.output == "list":
            # full-precision normalized vectors (downstream ANN / vector
            # store input); token-less docs are zero vectors — filter with
            # the returned norm column if the consumer needs unit vectors
            return pa.table(
                {
                    "doc_id": pa.array(doc_ids),
                    "embedding": pa.FixedSizeListArray.from_arrays(
                        pa.array(emb.reshape(-1)), dim
                    ).cast(pa.list_(pa.float64())),
                    "norm": pa.array(norms),
                }
            )
        emb_r = np.round(emb, 4)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, dim)),
                "i": pa.array(np.tile(np.arange(dim, dtype=np.int64), n)),
                "v_r": pa.array(emb_r.reshape(-1)),
            }
        )


def sql_embed_text(
    dim: int = DEFAULT_EMBED_DIM,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :class:`TextEmbedStage` (exploded components)."""
    return (
        f"WITH toks AS ({sql_tokens_cte(table, id_col, text_col)}),\n"
        f"h AS (SELECT doc_id, md5_number_lower(term) AS h FROM toks),\n"
        f"bu AS (SELECT doc_id, (h % {dim})::BIGINT AS bucket,\n"
        f"  CASE WHEN ((h // {dim}) % 2) = 0 THEN 1.0 ELSE -1.0 END AS sgn FROM h),\n"
        f"acc AS (SELECT doc_id, bucket, sum(sgn)::DOUBLE AS v FROM bu GROUP BY doc_id, bucket),\n"
        f"dense AS (SELECT d.{id_col} AS doc_id, g.b AS i, coalesce(a.v, 0)::DOUBLE AS v\n"
        f"  FROM {table} d CROSS JOIN (SELECT unnest(generate_series(0, {dim - 1})) AS b) g\n"
        f"  LEFT JOIN acc a ON a.doc_id = d.{id_col} AND a.bucket = g.b),\n"
        f"nrm AS (SELECT doc_id, sqrt(sum(v * v)) AS n FROM dense GROUP BY doc_id)\n"
        f"SELECT dense.doc_id::BIGINT AS doc_id, dense.i::BIGINT AS i,\n"
        f"  round(CASE WHEN nrm.n > 0 THEN dense.v / nrm.n ELSE 0 END, 4) AS v_r\n"
        f"FROM dense JOIN nrm USING (doc_id)"
    )
