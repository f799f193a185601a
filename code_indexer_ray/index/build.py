"""Distributed inverted-index build — the core Ray Data pipeline.

Replaces the reference's single-process Tantivy writer path
(``services/smart_indexer.py:249`` → ``high_throughput_processor.py:263`` →
``tantivy_index_manager.py:187-269``) with a streaming two-stage plan:

  read_parquet(columns pruned)
    → map_batches(tokenize → (term, doc_id, tf, norm, shard, bucket))   [stateless tasks]
    → groupby([shard, bucket]).map_groups(encode segment)               [THE wide shuffle]
    → per-partition atomic parquet segment + manifest                   [resumable sink]

Skew strategy (SURVEY.md §4, §7.3): the partition key is
``(doc-range shard, hash(term) % num_buckets)``.  Doc-range sharding is the
salt — a Zipf head term ("the") is split across all shards, so no single
group ever exceeds one shard's postings; ``num_buckets`` further splits a
shard's vocabulary so group memory is bounded by
``shard_docs × avg_dl / num_buckets`` regardless of term skew.  Global df for
scoring is recovered at query time by summing per-shard df (every shard is
searched anyway — document-partitioned search, the standard web-scale
layout), so no vocabulary-wide shuffle is ever needed.

The per-group encoder is fully vectorized: one Arrow sort, one delta pass,
one varbyte pass over the whole group, and zero-copy Arrow binary columns
sliced by offset — no per-term Python loop.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .codec import BLOCK_SIZE, varbyte_encode
from .fieldnorm import fieldnorm_to_id
from .manifest import (
    DOCSTORE_DIR,
    SEGMENT_DIR,
    IndexManifest,
    PartitionInfo,
    completed_partitions,
    incomplete_shards,
    load_manifest,
    partition_manifest_path,
    publish_manifest,
    write_partition_manifest,
)
from ..text.analysis import term_frequencies

# 16 measured better than 8 at ≥200k docs on 32 cpus (encode straggler tail
# from head-term buckets halves; neutral at 8 cpus / small corpora) — see
# BASELINE.md scale-tuning notes.  At ≥500k docs, 32 buckets measured
# another 17–39 % faster in two interleaved 1M-doc pairs (finer encode
# grain), so build_index resolves an unspecified num_buckets by corpus size.
DEFAULT_NUM_BUCKETS = 16
LARGE_CORPUS_NUM_BUCKETS = 32
LARGE_CORPUS_DOCS = 500_000

#: multi-field term-key separator: an indexed key for field ``f`` is
#: ``f + FIELD_SEP + term``.  The analyzer never emits \x1f (tokens are
#: letter/digit runs), so prefixed keys can't collide with plain terms, and
#: all keys of one field are CONTIGUOUS in any sorted term dictionary
#: (shared prefix) — per-field stats are two bisects per segment.
FIELD_SEP = "\x1f"


def field_key(fname: str, term: str) -> str:
    """The dictionary key under which field ``fname``'s ``term`` is indexed."""
    return fname + FIELD_SEP + term


def term_bucket(terms: pa.Array, num_buckets: int) -> np.ndarray:
    """Stable bucket id per term (hash64 % buckets), computed once per
    *unique* term in the batch and broadcast back (vocab ≪ postings)."""
    if pa.types.is_dictionary(terms.type):
        uniq = terms.dictionary
        codes = terms.indices.to_numpy(zero_copy_only=False)
    else:
        uniq = pc.unique(terms)
        codes = pc.index_in(terms, value_set=uniq).to_numpy(zero_copy_only=False)
    uniq_buckets = (_hash64_batch(uniq) % np.uint64(num_buckets)).astype(np.int32)
    return uniq_buckets[codes]


def shard_of(doc_ids: np.ndarray, num_shards: int, doc_id_upper: int) -> np.ndarray:
    """Balanced doc-range shard: shard = doc_id * S // (upper+1).

    Range sharding (not hash) keeps doc ids within a shard dense, which makes
    posting deltas small and lets resume push a doc-range predicate into the
    Parquet scan. Overflow-safe for doc_id_upper * num_shards < 2^63.
    """
    return (doc_ids.astype(np.int64) * num_shards) // (doc_id_upper + 1)


def shard_doc_range(shard: int, num_shards: int, doc_id_upper: int) -> tuple[int, int]:
    """Inclusive-exclusive [lo, hi) doc-id range owned by ``shard``."""
    u = doc_id_upper + 1
    lo = -(-shard * u // num_shards)  # ceil(shard*u/S)
    hi = -(-(shard + 1) * u // num_shards)
    return lo, hi


def _shard_lo_vec(shards: np.ndarray, num_shards: int, doc_id_upper: int) -> np.ndarray:
    """Vectorized first-doc-id of each shard (exact twin of shard_doc_range.lo)."""
    u = doc_id_upper + 1
    return -(-(shards.astype(np.int64) * u) // num_shards)


VOCAB_DIR = "vocab"


def ensure_threadsafe_fs_imports() -> None:
    """Make Ray's fsspec-http probe deterministic before driving Ray Data
    pipelines from multiple driver threads.

    ``fsspec.implementations.http`` raises at import when aiohttp is absent
    (this container); Ray probes it on every path resolution and catches
    only ``ModuleNotFoundError``.  CPython retries failed module inits, so
    two threads resolving paths concurrently can observe the neighbor's
    half-initialized module and get a bare ``ImportError`` ("cannot import
    name 'HTTPFileSystem'") that Ray does NOT catch — a ~1-in-4 flake under
    thread overlap.  When the real import fails, install a minimal stub
    with a sentinel ``HTTPFileSystem`` (nothing is ever an instance), so
    every later probe resolves instantly and identically.  Harmless: no
    http filesystem can work without aiohttp anyway."""
    import sys as _sys

    try:
        import fsspec.implementations.http  # noqa: F401
    except ModuleNotFoundError:
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — never instantiated
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = mod
    except Exception:
        pass

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _hash64_batch(uniq: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a-64 over a (unique-term) string array — no per-term
    Python.  Bytewise over ≤40 positions of the ~vocab-sized array; quality is
    ample for bucketing, and 64-bit collisions are detected at encode."""
    a = uniq.combine_chunks() if isinstance(uniq, pa.ChunkedArray) else uniq
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(a.type) else np.int32
    offs = np.frombuffer(a.buffers()[1], dtype=off_dtype)[a.offset : a.offset + n + 1].astype(
        np.int64
    )
    buf = np.frombuffer(a.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    for j in range(int(lens.max()) if n else 0):
        m = lens > j
        h[m] = (h[m] ^ buf[starts[m] + j].astype(np.uint64)) * _FNV_PRIME
    return h


class TokenizeStage:
    """Stateful tokenize stage (actor pool): the term→(bucket, hash) cache and
    compiled analyzer state live once per actor and amortize across batches
    (the load-once-per-worker pattern, SURVEY.md §2.3).

    With ``vocab_dir`` set (the build path), postings ship FIXED-WIDTH —
    (term_hash u64, doc_rel u32, tf u16, norm u8, pkey i32, 19 B/posting) —
    through the one wide shuffle, and the hash→term mapping rides as tiny
    per-(task, shard) vocab side-files instead (vocab ≪ postings; ~27% fewer
    shuffle bytes than shipping strings, and the sort gathers pure numerics).
    Without ``vocab_dir`` the stage emits term strings (standalone use)."""

    def __init__(
        self,
        id_col: str,
        text_col: str,
        num_shards: int,
        num_buckets: int,
        doc_id_upper: int,
        vocab_dir: str | None = None,
        index_positions: bool = False,
        fields: dict[str, str] | None = None,
    ):
        self.id_col = id_col
        self.text_col = text_col
        self.num_shards = num_shards
        self.num_buckets = num_buckets
        self.doc_id_upper = doc_id_upper
        self.vocab_dir = vocab_dir
        self.index_positions = index_positions
        self.fields = fields
        if fields and index_positions:
            raise ValueError("index_positions is not supported with a multi-field schema")

    def _uniq_codes(self, terms: pa.Array):
        if pa.types.is_dictionary(terms.type):
            uniq = terms.dictionary
            codes = terms.indices.to_numpy(zero_copy_only=False)
        else:
            uniq = pc.unique(terms)
            codes = pc.index_in(terms, value_set=uniq).to_numpy(zero_copy_only=False)
        return uniq, codes

    def _bucket_hash(self, uniq: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(bucket, hash64) per unique term — bucket = hash64 % num_buckets,
        so one vectorized hash pass serves both roles."""
        hashes = _hash64_batch(uniq)
        buckets = (hashes % np.uint64(self.num_buckets)).astype(np.int32)
        return buckets, hashes

    def _write_vocab(
        self,
        uniq: pa.Array,
        buckets_u: np.ndarray,
        hashes_u: np.ndarray,
        codes: np.ndarray,
        shards: np.ndarray,
        post_docs: np.ndarray,
        fname: str | None = None,
    ) -> None:
        """Side-write each unique (term, shard) pair's vocab row, bucket-sorted
        (row-group pruning at encode).  File names are keyed by the batch's
        doc range per shard — a retried task overwrites the same file with
        identical content (same idempotency as the doc-store side-writes).
        In multi-field mode the field name joins the key so two fields of the
        same batch never overwrite each other's file."""
        packed = codes.astype(np.int64) * self.num_shards + shards
        upairs = np.unique(packed)
        v_codes = (upairs // self.num_shards).astype(np.int64)
        v_shards = (upairs % self.num_shards).astype(np.int64)
        for s in np.unique(v_shards):
            sel = v_codes[v_shards == s]
            order = np.argsort(buckets_u[sel], kind="stable")
            sel = sel[order]
            tbl = pa.table(
                {
                    "bucket": pa.array(buckets_u[sel], type=pa.int32()),
                    "hash": pa.array(hashes_u[sel], type=pa.uint64()),
                    "term": uniq.take(pa.array(sel)),
                }
            )
            d = os.path.join(self.vocab_dir, f"shard={int(s)}")
            os.makedirs(d, exist_ok=True)
            in_s = post_docs[shards == s]
            lo_id, hi_id = int(in_s.min()), int(in_s.max())
            suffix = f"-{fname}" if fname is not None else ""
            path = os.path.join(d, f"part-{lo_id:012d}-{hi_id:012d}{suffix}.parquet")
            tmp = path + f".tmp-{os.getpid()}"
            # scratch files, read once by encode — skip compression CPU
            pq.write_table(tbl, tmp, compression="none", row_group_size=8192)
            os.replace(tmp, path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.fields is not None:
            # one pass per field; postings concat into one table (same
            # shuffle).  Each field's term keys are FIELD_SEP-prefixed and
            # its norm byte quantizes THAT field's token count — per-field
            # norms/df/avgdl fall out of the ordinary machinery.
            parts = [
                self._emit_field(batch, col, fname)
                for fname, col in self.fields.items()
            ]
            return pa.concat_tables(parts)
        return self._emit_field(batch, self.text_col, None)

    def _emit_field(self, batch: pa.Table, text_col: str, fname: str | None) -> pa.Table:
        pos_flat = pos_offsets = None
        if self.index_positions:
            from ..text.analysis import term_positions

            terms, rows, tfs, row_counts, pos_flat, pos_offsets = term_positions(
                batch[text_col]
            )
        else:
            terms, rows, tfs, row_counts = term_frequencies(batch[text_col])
        doc_ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        post_docs = doc_ids[rows]
        norm_ids = fieldnorm_to_id(row_counts)[rows]
        shards = shard_of(post_docs, self.num_shards, self.doc_id_upper)
        uniq, codes = self._uniq_codes(terms)
        if fname is not None:
            # field-prefixed keys, prefixed ONCE per unique term (vocab ≪
            # postings); hashing / bucketing / vocab rows all see the key
            uniq = pc.binary_join_element_wise(
                pa.scalar(fname + FIELD_SEP), uniq.cast(pa.string()), pa.scalar("")
            )
        buckets_u, hashes_u = self._bucket_hash(uniq)
        # single packed partition key — fewer shuffle bytes, single-column sort
        pkey = (shards * self.num_buckets + buckets_u[codes]).astype(np.int32)
        # doc ids ship shard-RELATIVE as u32 (shard base is implied by pkey;
        # a doc-range shard holds < 2^32 docs even at 10^12-doc scale) —
        # 4 bytes/posting less through the one wide shuffle.
        shard_lo = _shard_lo_vec(shards, self.num_shards, self.doc_id_upper)
        doc_rel = (post_docs - shard_lo).astype(np.uint32)
        # tf ships u16: 2 bytes/posting less through the one wide shuffle.
        # Exactness guard (BM25 parity needs true tf): a (term, doc) pair
        # repeating >= 2^16 times means a pathological >65k-token document —
        # refuse loudly rather than clamp silently.
        if len(tfs) and int(tfs.max()) >= (1 << 16):
            raise ValueError(
                "per-document term frequency >= 2^16 — document too large for "
                "u16 tf postings; split oversized documents before indexing"
            )
        cols = {
            "doc_rel": pa.array(doc_rel),
            "tf": pa.array(tfs.astype(np.uint16), type=pa.uint16()),
            "norm": pa.array(norm_ids, type=pa.uint8()),
            "pkey": pa.array(pkey),
        }
        if pos_flat is not None:
            # per-posting varbyte(delta(position)) blob — positions are the
            # optional phrase-query payload; anchor resets at each posting
            n_pos = len(pos_flat)
            deltas = np.empty(n_pos, dtype=np.uint64)
            if n_pos:
                deltas[1:] = (pos_flat[1:] - pos_flat[:-1]).astype(np.uint64)
                starts_mask = pos_offsets[:-1]
                deltas[starts_mask] = pos_flat[starts_mask].astype(np.uint64)
            buf, vstarts = varbyte_encode(deltas)
            byte_offs = np.empty(len(pos_offsets), dtype=np.int64)
            byte_offs[:-1] = vstarts[pos_offsets[:-1]] if n_pos else 0
            byte_offs[-1] = len(buf)
            cols["pos_enc"] = _binary_col32(buf, byte_offs)
        if self.vocab_dir is not None:
            self._write_vocab(uniq, buckets_u, hashes_u, codes, shards, post_docs, fname)
            cols = {"term_hash": pa.array(hashes_u[codes]), **cols}
        else:
            # standalone mode: plain strings (dictionary columns measured 5x
            # SLOWER through the sort shuffle — reduce-side unification)
            term_col = (
                uniq.take(pa.array(codes)) if fname is not None else terms.cast(pa.string())
            )
            cols = {"term": term_col, **cols}
        return pa.table(cols)


def make_tokenize_fn(
    id_col: str,
    text_col: str,
    num_shards: int,
    num_buckets: int,
    doc_id_upper: int,
    vocab_dir: str | None = None,
    index_positions: bool = False,
    fields: dict[str, str] | None = None,
):
    """Stateless-task variant of :class:`TokenizeStage` (tests/small runs)."""
    stage = TokenizeStage(
        id_col, text_col, num_shards, num_buckets, doc_id_upper, vocab_dir,
        index_positions, fields,
    )

    def tokenize_batch(batch: pa.Table) -> pa.Table:
        return stage(batch)

    return tokenize_batch


def _binary_col(data: bytes | np.ndarray, offsets: np.ndarray) -> pa.LargeBinaryArray:
    """Zero-copy LargeBinary column from one buffer + per-row offsets."""
    buf = pa.py_buffer(data if isinstance(data, bytes) else data.tobytes())
    offs = pa.py_buffer(offsets.astype(np.int64).tobytes())
    return pa.LargeBinaryArray.from_buffers(pa.large_binary(), len(offsets) - 1, [None, offs, buf])


def _binary_col32(data: bytes | np.ndarray, offsets: np.ndarray) -> pa.Array:
    """32-bit-offset Binary column — 4 B/row less than LargeBinary through
    the shuffle.  A single batch whose payload exceeds 2 GiB raises loudly
    (a silent LargeBinary fallback would mix offset widths across blocks of
    the same shuffle column): shrink the map batch size instead."""
    total = int(offsets[-1]) if len(offsets) else 0
    if total >= (1 << 31):
        raise ValueError(
            "a single batch's positions payload exceeds 2 GiB — reduce the "
            "read/tokenize batch size (override_num_blocks) for this corpus"
        )
    buf = pa.py_buffer(data if isinstance(data, bytes) else data.tobytes())
    offs = pa.py_buffer(offsets.astype(np.int32).tobytes())
    return pa.BinaryArray.from_buffers(pa.binary(), len(offsets) - 1, [None, offs, buf])


def _binary_offsets(col: pa.Array, n: int) -> np.ndarray:
    """int64 view of a Binary/LargeBinary column's offsets buffer."""
    dt = np.int64 if pa.types.is_large_binary(col.type) else np.int32
    return np.frombuffer(col.buffers()[1], dtype=dt)[col.offset : col.offset + n + 1].astype(
        np.int64
    )


def encode_segment_table(tbl: pa.Table) -> tuple[pa.Table, int]:
    """Encode one (shard, bucket) group of postings into a segment table.

    Returns (segment_table, total_tokens). Fully vectorized; the group must
    fit in worker memory — bounded by shard_docs × avgdl / num_buckets.
    """
    # sort by (term, doc) WITHOUT a full-table string sort: work on dictionary
    # codes, sort only the (small) unique-term set, then integer lexsort —
    # ~5x less memory traffic than tbl.sort_by on a string column
    terms_raw = tbl["term"].combine_chunks() if isinstance(tbl["term"], pa.ChunkedArray) else tbl["term"]
    if pa.types.is_dictionary(terms_raw.type):
        codes_all = terms_raw.indices.to_numpy(zero_copy_only=False)
        dict_all = terms_raw.dictionary
        # a shuffled block's unified dictionary may carry terms from OTHER
        # groups — compact to the codes actually present in this group
        present = np.unique(codes_all)
        uniq = dict_all.take(pa.array(present))
        remap = np.full(len(dict_all), -1, dtype=np.int64)
        remap[present] = np.arange(len(present))
        codes_raw = remap[codes_all]
    else:
        dic = pc.dictionary_encode(terms_raw)
        codes_raw = dic.indices.to_numpy(zero_copy_only=False)
        uniq = dic.dictionary
    order_u = pc.sort_indices(uniq).to_numpy(zero_copy_only=False)
    rank = np.empty(len(uniq), dtype=np.int64)
    rank[order_u] = np.arange(len(uniq))

    docs_u = tbl["doc_id"].to_numpy(zero_copy_only=False)
    ranked = rank[codes_raw]
    # single packed-key sort (term-rank << 32 | doc-offset): ~5x cheaper than
    # a two-key lexsort. A partition's doc span is < 2^32 by the build's u32
    # shard-span guard and its vocab < 2^31; fall back to lexsort otherwise.
    dmin = int(docs_u.min()) if len(docs_u) else 0
    span = (int(docs_u.max()) - dmin + 1) if len(docs_u) else 0
    if span < (1 << 32) and len(uniq) < (1 << 31):
        key = (ranked.astype(np.uint64) << np.uint64(32)) | (docs_u - dmin).astype(np.uint64)
        perm = np.argsort(key)
    else:
        perm = np.lexsort((docs_u, ranked))
    docs = docs_u[perm].astype(np.int64)
    tfs = tbl["tf"].to_numpy(zero_copy_only=False)[perm].astype(np.int64)
    norms = tbl["norm"].to_numpy(zero_copy_only=False)[perm].astype(np.uint8)
    codes = ranked[perm]
    n = len(docs)

    change = np.flatnonzero(np.diff(codes)) + 1
    term_starts = np.concatenate(([0], change))
    term_ends = np.concatenate((change, [n]))
    dfs = term_ends - term_starts
    n_terms = len(term_starts)
    sorted_terms = uniq.take(pa.array(order_u))

    # continuous delta stream with per-term anchor reset
    deltas = np.empty(n, dtype=np.uint64)
    deltas[1:] = (docs[1:] - docs[:-1]).astype(np.uint64)
    deltas[term_starts] = docs[term_starts].astype(np.uint64)
    docs_buf, vstarts = varbyte_encode(deltas)
    tfs_buf, tstarts = varbyte_encode(tfs.astype(np.uint64))

    # global block starts (every term start is a block start → reduceat
    # segments never cross term boundaries)
    nb = (dfs + BLOCK_SIZE - 1) // BLOCK_SIZE
    total_blocks = int(nb.sum())
    first_block = np.concatenate(([0], np.cumsum(nb)[:-1]))
    intra = np.arange(total_blocks) - np.repeat(first_block, nb)
    bstarts = np.repeat(term_starts, nb) + BLOCK_SIZE * intra
    bterm_end = np.repeat(term_ends, nb)
    last_idx = np.minimum(bstarts + BLOCK_SIZE - 1, bterm_end - 1)

    last_docs = docs[last_idx].astype(np.uint64)
    max_tfs = np.maximum.reduceat(tfs, bstarts).astype(np.uint32)
    min_norms = np.minimum.reduceat(norms, bstarts).astype(np.uint8)
    cell_base_d = np.repeat(vstarts[term_starts], nb)
    cell_base_t = np.repeat(tstarts[term_starts], nb)
    doc_offsets = (vstarts[bstarts] - cell_base_d).astype(np.uint32)
    tf_offsets = (tstarts[bstarts] - cell_base_t).astype(np.uint32)

    def offs(starts_vals: np.ndarray, total: int, itemsize: int = 1) -> np.ndarray:
        o = np.empty(n_terms + 1, dtype=np.int64)
        o[:-1] = starts_vals * itemsize
        o[-1] = total * itemsize
        return o

    seg_cols = {
        "term": sorted_terms,
        "df": pa.array(dfs.astype(np.int64)),
        "cf": pa.array(np.add.reduceat(tfs, term_starts).astype(np.int64)),
        "docs_enc": _binary_col(docs_buf, offs(vstarts[term_starts], len(docs_buf))),
        "tfs_enc": _binary_col(tfs_buf, offs(tstarts[term_starts], len(tfs_buf))),
        "norms": _binary_col(norms, offs(term_starts, n)),
        "last_docs": _binary_col(last_docs, offs(first_block, total_blocks, 8)),
        "max_tfs": _binary_col(max_tfs, offs(first_block, total_blocks, 4)),
        "min_norms": _binary_col(min_norms, offs(first_block, total_blocks, 1)),
        "doc_offsets": _binary_col(doc_offsets, offs(first_block, total_blocks, 4)),
        "tf_offsets": _binary_col(tf_offsets, offs(first_block, total_blocks, 4)),
    }
    if "pos_enc" in tbl.schema.names:
        # optional phrase payload: per-term concat of the doc-ordered
        # per-posting position blobs + a u32 relative byte offset per posting
        # cast to 64-bit offsets BEFORE combining: a whole (shard, bucket)
        # group's positions payload can exceed the 2 GiB int32 offset limit
        # even though every individual batch fit (offset overflow on concat)
        pe_col = tbl["pos_enc"]
        if not pa.types.is_large_binary(pe_col.type):
            pe_col = pe_col.cast(pa.large_binary())
        pe = pe_col.combine_chunks().take(pa.array(perm))
        p_offs = _binary_offsets(pe, n)
        p_data = np.frombuffer(pe.buffers()[2], dtype=np.uint8)[p_offs[0] : p_offs[-1]]
        p_offs = p_offs - p_offs[0]
        term_pos_offs = np.concatenate((p_offs[term_starts], [p_offs[-1]]))
        rel = (p_offs[:-1] - np.repeat(p_offs[term_starts], dfs)).astype(np.uint32)
        seg_cols["positions_enc"] = _binary_col(
            np.ascontiguousarray(p_data), term_pos_offs
        )
        seg_cols["pos_offsets"] = _binary_col(rel, offs(term_starts, n, 4))
    return pa.table(seg_cols), int(tfs.sum())


#: per-worker-process cache of a shard's deduped vocab (keyed by dir+shard);
#: the 8 bucket-encode tasks of a shard reuse one load when scheduled on the
#: same worker.  Bounded (few entries, each ~vocab/shard strings).
_VOCAB_CACHE: dict[tuple[str, int], tuple[np.ndarray, pa.Array, np.ndarray]] = {}
_VOCAB_CACHE_MAX = 4


def _load_shard_vocab(vocab_dir: str, shard: int) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """(sorted unique hashes, terms in that order, bucket per entry) for one
    shard — deduped across task side-files, hash-collision-checked."""
    d = os.path.join(vocab_dir, f"shard={shard}")
    # freshness signature: (name, mtime, size) of every side-file — a rebuild
    # into the same out_dir must never serve a stale cached vocab
    sig: tuple = ()
    files: list[str] = []
    if os.path.isdir(d):
        entries = sorted(
            (e.name, e.stat().st_mtime_ns, e.stat().st_size)
            for e in os.scandir(d)
            if e.name.endswith(".parquet")
        )
        sig = tuple(entries)
        files = [os.path.join(d, name) for name, _, _ in entries]
    key = (vocab_dir, shard, sig)
    hit = _VOCAB_CACHE.get(key)
    if hit is not None:
        return hit
    import pyarrow.dataset as pads

    if not files:
        out = (np.empty(0, dtype=np.uint64), pa.array([], type=pa.string()), np.empty(0, np.int32))
    else:
        tbl = pads.dataset(files).to_table(columns=["bucket", "hash", "term"])
        vh = tbl["hash"].to_numpy(zero_copy_only=False)
        vb = tbl["bucket"].to_numpy(zero_copy_only=False)
        vt = tbl["term"].combine_chunks()
        order = np.argsort(vh, kind="stable")
        vh_s, vb_s = vh[order], vb[order]
        vt_s = vt.take(pa.array(order))
        if len(vh_s) > 1:
            dup = vh_s[1:] == vh_s[:-1]
            if dup.any():
                same = pc.equal(vt_s.slice(1), vt_s.slice(0, len(vt_s) - 1)).to_numpy(
                    zero_copy_only=False
                )
                if (dup & ~same).any():
                    raise ValueError(
                        "64-bit term-hash collision detected in vocab side-files — "
                        "rebuild with string postings (vocab_dir=None)"
                    )
        bounds = (
            np.flatnonzero(np.r_[True, vh_s[1:] != vh_s[:-1]]) if len(vh_s) else np.empty(0, np.int64)
        )
        out = (vh_s[bounds], vt_s.take(pa.array(bounds)), vb_s[bounds].astype(np.int32))
    if len(_VOCAB_CACHE) >= _VOCAB_CACHE_MAX:
        _VOCAB_CACHE.pop(next(iter(_VOCAB_CACHE)))
    _VOCAB_CACHE[key] = out
    return out


def _load_vocab(vocab_dir: str, shard: int, bucket: int) -> tuple[np.ndarray, pa.Array]:
    """(sorted unique hashes, term strings) for one (shard, bucket) partition."""
    vh, vt, vb = _load_shard_vocab(vocab_dir, shard)
    sel = np.flatnonzero(vb == bucket)
    return vh[sel], vt.take(pa.array(sel))


def _field_token_sums(seg: pa.Table, field_names: tuple[str, ...]) -> dict[str, int]:
    """Per-field token totals of one segment: terms are sorted and all keys of
    a field share the ``f + FIELD_SEP`` prefix, so each field is one
    contiguous slice — two bisects + one cf-slice sum per field."""
    terms = seg["term"]
    if isinstance(terms, pa.ChunkedArray):
        terms = terms.combine_chunks()
    cf = seg["cf"].to_numpy(zero_copy_only=False)

    def bis(key: str) -> int:
        lo, hi = 0, len(terms)
        while lo < hi:
            mid = (lo + hi) // 2
            if terms[mid].as_py() < key:
                lo = mid + 1
            else:
                hi = mid
        return lo

    out: dict[str, int] = {}
    for f in field_names:
        a = bis(f + FIELD_SEP)
        b = bis(f + FIELD_SEP + chr(0x10FFFF))
        out[f] = int(cf[a:b].sum()) if b > a else 0
    return out


def make_encode_fn(
    out_dir: str,
    fingerprint: str,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    num_shards: int = 1,
    doc_id_upper: int = 0,
    field_names: tuple[str, ...] | None = None,
):
    """Per-(shard,bucket) encode + atomic segment write + partition manifest."""

    def encode_group(tbl: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pkey = int(tbl["pkey"][0].as_py())
        shard, bucket = pkey // num_buckets, pkey % num_buckets
        rel = os.path.join(SEGMENT_DIR, f"shard={shard:05d}", f"bucket={bucket:03d}.parquet")
        abspath = os.path.join(out_dir, rel)
        mpath = partition_manifest_path(out_dir, shard, bucket)

        # idempotent skip: a completed partition (manifest + file) is not re-encoded
        if os.path.exists(mpath) and os.path.exists(abspath):
            import json

            with open(mpath) as f:
                d = json.load(f)
            if d.get("fingerprint") == fingerprint:
                return _stats_row(d)

        # reconstruct absolute doc ids from the shard-relative u32 column
        lo = shard_doc_range(shard, num_shards, doc_id_upper)[0]
        doc_ids = tbl["doc_rel"].to_numpy(zero_copy_only=False).astype(np.int64) + lo
        body = tbl.drop_columns(["pkey", "doc_rel"]).append_column(
            "doc_id", pa.array(doc_ids, type=pa.int64())
        )
        if "term_hash" in body.schema.names:
            # fixed-width shuffle path: resolve hashes → term strings from the
            # shard's vocab side-files (dictionary-coded; the encoder compacts)
            vh_u, vt_u = _load_vocab(os.path.join(out_dir, VOCAB_DIR), shard, bucket)
            hashes = body["term_hash"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(vh_u, hashes)
            if len(hashes) and (
                (pos >= len(vh_u)).any() or (vh_u[np.minimum(pos, len(vh_u) - 1)] != hashes).any()
            ):
                raise ValueError("posting term_hash missing from vocab side-files (corrupt build)")
            term_col = pa.DictionaryArray.from_arrays(pa.array(pos.astype(np.int32)), vt_u)
            body = body.drop_columns(["term_hash"]).append_column("term", term_col)
        seg, total_tokens = encode_segment_table(body)
        os.makedirs(os.path.dirname(abspath), exist_ok=True)
        tmp = abspath + f".tmp-{os.getpid()}"
        pq.write_table(seg, tmp, compression="zstd", row_group_size=64 * 1024)
        os.replace(tmp, abspath)
        info = PartitionInfo(
            shard=shard,
            bucket=bucket,
            n_terms=seg.num_rows,
            n_postings=len(tbl),
            total_tokens=total_tokens,
            n_bytes=os.path.getsize(abspath),
            path=rel,
            build_secs=round(time.perf_counter() - t0, 4),
            fingerprint=fingerprint,
            field_tokens=_field_token_sums(seg, field_names) if field_names else {},
        )
        write_partition_manifest(out_dir, info)
        from dataclasses import asdict

        return _stats_row(asdict(info))

    return encode_group


def _stats_row(d: dict) -> pa.Table:
    return pa.table(
        {
            "shard": [int(d["shard"])],
            "bucket": [int(d["bucket"])],
            "n_terms": [int(d["n_terms"])],
            "n_postings": [int(d["n_postings"])],
            "total_tokens": [int(d["total_tokens"])],
            "n_bytes": [int(d["n_bytes"])],
            "path": [str(d["path"])],
            "build_secs": [float(d["build_secs"])],
        }
    )


def _dataset_count_and_max(paths, id_col: str) -> tuple[int, int]:
    """(row count, max id) from Parquet metadata / column stats — no full scan."""
    import pyarrow.dataset as pads

    dset = pads.dataset(paths)
    count = 0
    max_id = None
    for frag in dset.get_fragments():
        md = frag.metadata
        count += md.num_rows
        idx = md.schema.to_arrow_schema().get_field_index(id_col)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                max_id = st.max if max_id is None else max(max_id, st.max)
    if max_id is None:  # stats missing → one-column scan
        tbl = dset.to_table(columns=[id_col])
        max_id = pc.max(tbl[id_col]).as_py()
    if max_id is None:  # empty input (e.g. a pure-delete watch delta)
        return count, -1
    return count, int(max_id)


def _merge_ranges(ranges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Coalesce adjacent/overlapping [lo, hi) ranges (sorted input order not
    required) — contiguous shard groups become ONE predicate clause."""
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(ranges):
        if out and lo <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return out


#: one sort group's postings budget (bytes through a single sort shuffle).
#: Estimated payload above this splits the build into per-shard-group
#: sorts.  4 GiB keeps each single-box sort's working set inside the page
#: cache with headroom; on a real cluster the aggregate memory scales with
#: nodes, so raise via CIDX_SORT_GROUP_BYTES.
SORT_GROUP_BYTES_DEFAULT = 4 << 30


def _estimate_postings_bytes(input_paths, text_cols: list[str], positions: bool) -> int:
    """Postings-payload estimate from Parquet metadata only (no data read):
    uncompressed text bytes × an empirically-fitted 1.4 B postings per text
    byte (19 B/posting ÷ ~6.3 chars/token ÷ ~0.47 postings/token measured on
    the synthetic web corpus); ×1.6 with the positions payload."""
    import pyarrow.dataset as pads

    total = 0
    for frag in pads.dataset(input_paths).get_fragments():
        md = frag.metadata
        schema = md.schema.to_arrow_schema()
        for c in text_cols:
            idx = schema.get_field_index(c)
            if idx < 0:
                continue
            for rg in range(md.num_row_groups):
                total += md.row_group(rg).column(idx).total_uncompressed_size
    est = int(total * 1.4)
    return int(est * 1.6) if positions else est


def _plan_sort_groups(
    input_paths,
    text_cols: list[str],
    todo_shards: list[int],
    num_shards: int,
    n_docs: int,
    positions: bool,
) -> list[list[int]]:
    """Split the shards to (re)build into contiguous groups whose estimated
    postings payload each fits one sort-group budget.  One group (== the
    round-2 single-sort plan) whenever the estimate fits."""
    target = int(os.environ.get("CIDX_SORT_GROUP_BYTES", SORT_GROUP_BYTES_DEFAULT))
    if target <= 0 or not todo_shards:
        return [list(todo_shards)]
    est = _estimate_postings_bytes(input_paths, text_cols, positions)
    est = est * len(todo_shards) // max(num_shards, 1)  # resume: only TODO slice re-reads
    n_groups = min(len(todo_shards), max(1, -(-est // target)))
    if n_groups <= 1:
        return [list(todo_shards)]
    per = -(-len(todo_shards) // n_groups)
    return [todo_shards[i : i + per] for i in range(0, len(todo_shards), per)]


def _read_parallelism() -> int:
    """Read/tokenize task count: a few blocks per CPU so the map stages keep
    every core busy (input files alone may under-split).  ``CIDX_READ_BLOCKS``
    pins it so a scaling comparison runs the identical task decomposition at
    both cluster sizes."""
    env = os.environ.get("CIDX_READ_BLOCKS")
    if env:
        return int(env)
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(32, cpus * 4)


def build_index(
    input_paths,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    store_cols: tuple[str, ...] = (),
    num_shards: int | None = None,
    num_buckets: int | None = None,
    target_docs_per_shard: int = 250_000,
    resume: bool = True,
    doc_id_upper: int | None = None,
    index_positions: bool = False,
    ray_remote_args: dict | None = None,
    fields: dict[str, str] | None = None,
) -> IndexManifest:
    """Build a queryable sharded inverted index under ``out_dir``.

    ``store_cols`` are kept in the doc store for retrieval/snippets (the
    reference's stored ``path``/``content_raw``/``language`` fields,
    ``tantivy_index_manager.py:91-115``). Resumable: completed partitions are
    skipped, and fully-complete shards are excluded from the input scan via a
    doc-range predicate.

    ``fields`` declares a MULTI-FIELD schema (the reference's declared
    Tantivy fields, ``tantivy_index_manager.py:96-115``): a dict of field
    name → input column.  Each field's terms are indexed under
    ``field_key(fname, term)`` with that field's OWN quantized length norm,
    df and token totals — one build, one shuffle; per-field avgdl lands in
    ``manifest.metrics["fields"]`` for BM25-per-field / BM25F scoring
    (``IndexSearcher.search_multifield``).  ``text_col`` is ignored when
    ``fields`` is given; all field columns are kept in the doc store and the
    manifest's ``text_col`` names the FIRST declared field's column so
    stored-field point reads (``mget`` / snippets / the KV store) work on
    multi-field indexes too.
    """
    import ray.data as rd

    if fields is not None:
        if index_positions:
            raise ValueError("index_positions is not supported with a multi-field schema")
        if not fields:
            raise ValueError("fields must name at least one field")
        for f in fields:
            if FIELD_SEP in f or not f:
                raise ValueError(f"invalid field name {f!r}")

    n_docs, max_id = _dataset_count_and_max(input_paths, id_col)
    if doc_id_upper is None:
        doc_id_upper = max_id
    elif max_id > doc_id_upper:
        raise ValueError(f"input contains doc_id {max_id} > doc_id_upper {doc_id_upper}")
    if num_shards is None:
        num_shards = max(1, -(-n_docs // target_docs_per_shard))
    if num_buckets is None:
        # corpus-size-adaptive encode grain (see the constants above); a
        # delta build must pass the BASE index's bucket count explicitly
        # (apply_delta/merge already do — the manifest records it)
        num_buckets = (
            DEFAULT_NUM_BUCKETS if n_docs < LARGE_CORPUS_DOCS else LARGE_CORPUS_NUM_BUCKETS
        )
    # Postings ship shard-RELATIVE u32 doc ids: every shard's id-range span
    # (ceil(id_space / num_shards)) must fit in uint32 or doc_rel wraps and
    # the index is silently corrupt. Doc-id space can be much wider than the
    # doc COUNT (sparse ids for delta headroom), so guard on id width and
    # widen the shard count as needed.
    min_shards_for_u32 = max(1, -(-(doc_id_upper + 1) // (1 << 32)))
    if num_shards < min_shards_for_u32:
        num_shards = min_shards_for_u32
    fp_text = (
        "fields(" + ",".join(f"{k}={v}" for k, v in sorted(fields.items())) + ")"
        if fields is not None
        else text_col
    )
    fingerprint = f"v1:{n_docs}:{doc_id_upper}:{num_shards}:{num_buckets}:{fp_text}" + (
        ":pos" if index_positions else ""
    )

    # fast path: complete index with matching fingerprint already published
    if resume and os.path.exists(os.path.join(out_dir, "manifest.json")):
        try:
            m = load_manifest(out_dir)
            if m.metrics.get("fingerprint") == fingerprint:
                return m
        except (OSError, KeyError, ValueError):
            pass

    os.makedirs(out_dir, exist_ok=True)

    # build plan: written before any work so progress observers know the
    # expected partition count mid-build (reference progress/ +
    # indexing_progress_log.py analog — see index/progress.py)
    import time as _time

    from .manifest import atomic_write_json as _awj

    _awj(
        os.path.join(out_dir, "_build_plan.json"),
        {
            "fingerprint": fingerprint,
            "num_shards": num_shards,
            "num_buckets": num_buckets,
            "num_docs": int(n_docs),
            "started_unix": int(_time.time()),
        },
    )

    # ---- ONE fused pass: docstore side-writes + tokenize → shuffle → encode.
    # The map stage writes its batch's stored fields to the doc store (atomic
    # per-(batch, shard) files) and emits postings — the corpus is read ONCE.
    # Safe under retries (same-name overwrite, identical content) and under
    # resume (a segment partition manifest can only exist if every map task of
    # its build finished, because the sort is an all-to-all barrier).
    docstore_dir = os.path.join(out_dir, DOCSTORE_DIR)
    todo_shards = (
        incomplete_shards(out_dir, num_shards, num_buckets, fingerprint)
        if resume
        else list(range(num_shards))
    )
    if todo_shards:
        import shutil

        # wipe doc-store + vocab partitions of shards being (re)built:
        # side-write file names depend on block boundaries, so stale partial
        # files from an interrupted run could otherwise duplicate documents
        vocab_dir = os.path.join(out_dir, VOCAB_DIR)
        for s in todo_shards:
            shutil.rmtree(os.path.join(docstore_dir, f"shard={s}"), ignore_errors=True)
            shutil.rmtree(os.path.join(vocab_dir, f"shard={s}"), ignore_errors=True)

        text_cols = list(dict.fromkeys(fields.values())) if fields is not None else [text_col]
        cols = list(dict.fromkeys([id_col, *text_cols, *store_cols]))
        nblocks = _read_parallelism()

        tokenize = make_tokenize_fn(
            id_col, text_col, num_shards, num_buckets, doc_id_upper, vocab_dir,
            index_positions, fields,
        )

        def fused(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            shards = shard_of(ids, num_shards, doc_id_upper)
            store = batch.select(cols)
            for s in np.unique(shards):
                sub = store.filter(pa.array(shards == s))
                d = os.path.join(docstore_dir, f"shard={int(s)}")
                os.makedirs(d, exist_ok=True)
                lo_id, hi_id = int(ids[shards == s].min()), int(ids[shards == s].max())
                path = os.path.join(d, f"part-{lo_id:012d}-{hi_id:012d}.parquet")
                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(sub, tmp, row_group_size=64, compression="zstd")
                os.replace(tmp, path)
            return tokenize(batch)

        encode = make_encode_fn(
            out_dir, fingerprint, num_buckets, num_shards, doc_id_upper,
            tuple(fields) if fields is not None else None,
        )
        # Two-level shuffle: when the estimated postings payload exceeds one
        # sort-group budget, split the TODO shards into contiguous groups and
        # run read → tokenize → sort → encode once per group.  Each sort then
        # moves a bounded slice instead of the whole corpus — the measured
        # 1M-doc single-box sublinearity was the one big sort's multi-round
        # merge + page-cache pressure, not spill (BASELINE.md r2).  Reads
        # stay pruned per group (doc-range predicate → row-group pruning),
        # so total read/tokenize work is unchanged.
        shard_groups = _plan_sort_groups(
            input_paths, text_cols, todo_shards, num_shards, n_docs, index_positions
        )

        def run_group(gshards: list[int]) -> None:
            # FULL nblocks for every group, not a pro-rated share: Ray
            # splits ALL fragments (including filter-pruned-empty ones)
            # across the blocks, and a group's matching files are
            # CONTIGUOUS — with few blocks they cluster into a handful of
            # read tasks and the tokenize wave serializes (measured on the
            # 5M corpus: same 450k-doc slice, 32 blocks = 32.4 s vs 128
            # blocks = 9.2 s).  Empty-pruned tasks finish in milliseconds,
            # so the extra task count is free.
            read_kwargs: dict = {
                "columns": cols,
                "override_num_blocks": nblocks,
            }
            if len(gshards) < num_shards:
                expr = None
                for lo, hi in _merge_ranges(
                    [shard_doc_range(s, num_shards, doc_id_upper) for s in gshards]
                ):
                    e = (pc.field(id_col) >= lo) & (pc.field(id_col) < hi)
                    expr = e if expr is None else (expr | e)
                read_kwargs["filter"] = expr
            ds = rd.read_parquet(input_paths, **read_kwargs)
            # stateless tasks, not an actor pool: measured 1.5x faster
            # end-to-end (a pool's reserved CPUs starve the sort/encode)
            tok = ds.map_batches(fused, batch_format="pyarrow", **(ray_remote_args or {}))
            mat = tok.groupby("pkey").map_groups(
                encode, batch_format="pyarrow"
            ).materialize()  # consume; stats are read back from partition manifests
            if os.environ.get("CIDX_PRINT_STATS"):
                print(mat.stats(), file=sys.stderr)

        # CIDX_SORT_GROUP_OVERLAP > 1 runs that many group pipelines on
        # driver threads so one group's read/encode ramp hides under its
        # neighbor's sort barrier (groups touch disjoint doc ranges and
        # disjoint output partitions, so concurrency is safe); the cost is
        # ~2× sort payload in flight, so the default stays sequential
        overlap = int(os.environ.get("CIDX_SORT_GROUP_OVERLAP", "1"))
        if overlap > 1 and len(shard_groups) > 1:
            from concurrent.futures import ThreadPoolExecutor

            ensure_threadsafe_fs_imports()
            with ThreadPoolExecutor(max_workers=overlap) as ex:
                list(ex.map(run_group, shard_groups))
        else:
            for gshards in shard_groups:
                run_group(gshards)

    # pick up partitions completed in earlier runs (resume) or this run —
    # fingerprint-filtered so stale partitions from a different build never
    # enter the published manifest
    done = completed_partitions(out_dir, fingerprint)
    partitions: list[dict] = []
    total_tokens = 0
    field_totals: dict[str, int] = dict.fromkeys(fields, 0) if fields is not None else {}
    import json

    for shard, bucket in sorted(done):
        with open(partition_manifest_path(out_dir, shard, bucket)) as f:
            d = json.load(f)
        partitions.append(d)
        total_tokens += int(d["total_tokens"])
        for f_, n in (d.get("field_tokens") or {}).items():
            field_totals[f_] = field_totals.get(f_, 0) + int(n)

    manifest = IndexManifest(
        num_docs=n_docs,
        total_tokens=total_tokens,
        num_shards=num_shards,
        num_buckets=num_buckets,
        doc_id_upper=doc_id_upper,
        # a fields= build ignores text_col; the stored-field point-read paths
        # (mget / _fetch_texts / KV store) serve the FIRST declared field's
        # column — every field column is in the doc store, this names the
        # default one
        text_col=next(iter(fields.values())) if fields is not None else text_col,
        id_col=id_col,
        partitions=partitions,
        metrics={
            "fingerprint": fingerprint,
            "n_partitions": len(partitions),
            "built_unix": time.time(),
            "index_positions": bool(index_positions),
            "encode_secs_sum": round(sum(float(r.get("build_secs", 0)) for r in partitions), 4),
            **(
                {
                    "fields": {
                        f_: {"col": fields[f_], "total_tokens": field_totals.get(f_, 0)}
                        for f_ in fields
                    }
                }
                if fields is not None
                else {}
            ),
        },
    )
    publish_manifest(out_dir, manifest)
    # vocab side-files are build scratch (segments store the term strings);
    # drop them once the manifest is live
    import shutil

    shutil.rmtree(os.path.join(out_dir, VOCAB_DIR), ignore_errors=True)
    return manifest
