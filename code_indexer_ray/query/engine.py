"""Top-k BM25 query engine over the sharded segment index.

Document-partitioned search (the reference's daemon/multi-repo pattern,
``server/cache/fts_index_cache.py`` / ``server/multi/multi_search_service.py:159-166``,
rebuilt Ray-native): one :class:`ShardSearcher` per shard loads its segment
files and doc metadata ONCE (the stateful actor-pool pattern), serves
AND/fuzzy/regex queries with block-skipping posting reads, returns per-shard
top-m; the driver heap-merges to a global top-k — never a full sort.

Search semantics are a behavioral port of the reference's
``TantivyIndexManager.search`` (``tantivy_index_manager.py:394-780``):

- whitespace-split query words; ALL words must match (AND),
- fuzzy (OSA distance ≤ 3, transposition cost 1) / regex expand against the
  term dictionary into OR-groups before scoring,
- ``limit=0`` → 100000 "unlimited" + snippets off,
- over-fetch ``limit*3`` when post-filters present, then post-filter in the
  CRITICAL precedence order (exclude-langs → include-langs → exclude-paths →
  include-paths), then truncate,
- include-languages with no exclusions is a pre-limit (in-query facet) filter,
- score-descending with doc_id tiebreak (pinned for rank determinism),
- case-sensitive affects only match location on the stored raw text, not the
  candidate set (index terms are always lower-cased — ``:483-485, 716-721``).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..index.codec import (
    BLOCK_SIZE,
    decode_blocks,
    decode_doc_ids,
    decode_full_many,
    decode_tfs,
    varbyte_decode,
)
from ..index.fieldnorm import id_to_fieldnorm
from ..index.manifest import DOCSTORE_DIR, IndexManifest, load_manifest
from ..text.analysis import tokenize_query
from ..text.snippets import extract_snippet, locate_fuzzy, locate_literal
from . import bm25
from .expand import VocabMatcher
from .globmatch import matches_any

UNLIMITED_LIMIT = 100_000  # reference's "limit=0 → effectively unlimited"


def _bisect_terms(arr: pa.Array, key: str) -> int:
    """Leftmost insertion point of ``key`` in a sorted Arrow string array —
    O(log V) scalar probes, no vocabulary materialization."""
    lo, hi = 0, len(arr)
    while lo < hi:
        mid = (lo + hi) // 2
        if arr[mid].as_py() < key:
            lo = mid + 1
        else:
            hi = mid
    return lo

_BUCKET_FILE_RE = re.compile(r"bucket=(\d+)\.parquet$")


class ShardSearcher:
    """Holds one shard's term dictionary, postings and doc metadata in memory.

    Load-once state (segment parquet + docstore metadata columns) — run it
    inside an actor and amortize across queries, exactly the reference's
    10-min-TTL index cache but partition-local.
    """

    def __init__(
        self,
        shard: int,
        segment_files: list[str],
        docstore_dir: str | None = None,
        num_buckets: int | None = None,
    ):
        self.shard = shard
        self._seg_files = sorted(segment_files)
        # bucket-LAZY segment loading: a query term lives in exactly one
        # bucket (hash64 % num_buckets — the build's partition key), so a
        # cold single-term search reads ONE bucket file per shard, not all
        # of them.  Vocabulary-wide operations (expand/vocab/terms_arrow)
        # force-load everything on first use.  ``num_buckets`` must be the
        # MANIFEST value (an empty bucket has no file); without it, or with
        # unrecognized file names, loading is eager as before.
        self._bucket_files: dict[int, str] | None = None
        if num_buckets:
            bf = {}
            for f in self._seg_files:
                m = _BUCKET_FILE_RE.search(os.path.basename(f))
                if m is None:
                    bf = None
                    break
                bf[int(m.group(1))] = f
            self._bucket_files = bf
        self._num_buckets = num_buckets
        self._states: dict[int, tuple] = {}  # bucket → (tbl, sorted_terms, order, dfs)
        self._eager_state: tuple | None = None
        if self._bucket_files is None:
            self._eager_state = self._load_state(self._seg_files)
        self._docstore_dir = docstore_dir
        self._meta = None  # lazy (doc_ids, url, lang) sorted by doc_id
        self._vocab_np: np.ndarray | None = None  # lazy object array (expansion only)
        self._matcher: VocabMatcher | None = None  # lazy per-shard fuzzy/regex structures
        self._union_state: tuple | None = None  # lazy all-buckets view

    @staticmethod
    def _load_state(files: list[str]) -> tuple:
        tables = [pq.read_table(f) for f in files]
        tbl = pa.concat_tables(tables) if tables else None
        if tbl is not None and tbl.num_rows:
            terms_arr = tbl["term"].combine_chunks()
            # sorted-array dictionary + bisect lookups: no per-term Python
            # dict or object materialization (a hash LUT over a 10⁸-term
            # web-scale shard vocab would be a driver/actor memory killer;
            # the sorted Arrow array is the SSTable layout queries bisect,
            # and keeping it Arrow-side keeps cold start GIL-free)
            order = pc.sort_indices(terms_arr).to_numpy(zero_copy_only=False).astype(np.int64)
            return (tbl, terms_arr.take(pa.array(order)), order, tbl["df"].to_numpy(zero_copy_only=False))
        return (None, pa.array([], type=pa.string()), np.empty(0, np.int64), np.empty(0, np.int64))

    def _bucket_of(self, term: str) -> int:
        # scalar FNV-1a-64, bit-identical to the build's vectorized
        # _hash64_batch (equality asserted in tests) — the numpy batch kernel
        # costs ~0.3 ms per single-term call, this ~2 µs
        h = 0xCBF29CE484222325
        for b in term.encode("utf-8"):
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h % self._num_buckets

    def _state_for(self, term: str) -> tuple:
        if self._eager_state is not None:
            return self._eager_state
        b = self._bucket_of(term)
        st = self._states.get(b)
        if st is None:
            f = self._bucket_files.get(b)
            st = self._load_state([f] if f else [])
            self._states[b] = st
        return st

    def warm_buckets(self, lang_col: str | None = None, url_col: str | None = None) -> None:
        """Load every bucket's segment table (daemon cache-warm step); with
        the metadata columns given, also pre-load the per-shard doc metadata
        (lazy `_load_meta` was the residual ~0.5 s of a warmed searcher's
        first filtered query at 1.29M docs)."""
        self._all_state()
        if lang_col or url_col:
            self._load_meta(lang_col, url_col)

    def _all_state(self) -> tuple:
        """Union view across all buckets (vocabulary-wide operations).

        Built by filling the per-bucket cache and concatenating those tables
        (zero-copy) — the bucket and union views share the same backing
        buffers instead of reading the files twice."""
        if self._eager_state is not None:
            return self._eager_state
        if self._union_state is None:
            for f in self._seg_files:
                b = int(_BUCKET_FILE_RE.search(os.path.basename(f)).group(1))
                if b not in self._states:
                    self._states[b] = self._load_state([f])
            tables = [
                st[0]
                for _, st in sorted(self._states.items())
                if st[0] is not None
            ]
            tbl = pa.concat_tables(tables) if tables else None
            if tbl is not None and tbl.num_rows:
                terms_arr = tbl["term"].combine_chunks()
                order = pc.sort_indices(terms_arr).to_numpy(zero_copy_only=False).astype(np.int64)
                self._union_state = (
                    tbl,
                    terms_arr.take(pa.array(order)),
                    order,
                    tbl["df"].to_numpy(zero_copy_only=False),
                )
            else:
                self._union_state = self._load_state([])
        return self._union_state

    # ---- term dictionary ----
    def vocab(self) -> np.ndarray:
        if self._vocab_np is None:
            self._vocab_np = np.array(self._all_state()[1].to_pylist(), dtype=object)
        return self._vocab_np

    def terms_arrow(self) -> pa.Array:
        """The shard's sorted Arrow term dictionary (zero-copy view)."""
        return self._all_state()[1]

    @staticmethod
    def _find_in(state: tuple, term: str) -> int | None:
        """Bisect the sorted Arrow dictionary → row index into the segment
        table (log₂|vocab| ``as_py`` probes — no O(vocab) materialization)."""
        _, arr, order, _ = state
        lo, hi = 0, len(arr)
        while lo < hi:
            mid = (lo + hi) // 2
            if arr[mid].as_py() < term:
                lo = mid + 1
            else:
                hi = mid
        if lo < len(arr) and arr[lo].as_py() == term:
            return int(order[lo])
        return None

    def df_of(self, terms: list[str]) -> dict[str, int]:
        out: dict[str, int] = {}
        for t in terms:
            st = self._state_for(t)
            i = self._find_in(st, t)
            if i is not None:
                out[t] = int(st[3][i])
        return out

    def stats_of(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (df, cf) from this shard's segment metadata (cf is the
        collection frequency the build stores per term — summing across
        shards gives the exact corpus cf, same as df)."""
        out: dict[str, tuple[int, int]] = {}
        for t in terms:
            st = self._state_for(t)
            i = self._find_in(st, t)
            if i is not None:
                out[t] = (int(st[3][i]), int(st[0]["cf"][i].as_py()))
        return out

    def expand(self, kind: str, pattern: str, distance: int = 0) -> list[str]:
        """Shard-local fuzzy/regex expansion (the DEFAULT path: the term
        dictionary never leaves the shard/actor, matching Tantivy's
        per-segment automaton walk)."""
        if self._matcher is None:
            self._matcher = VocabMatcher(self.vocab())
        if kind == "fuzzy":
            return self._matcher.fuzzy(pattern, distance)
        if kind == "prefix":
            return self._matcher.prefix(pattern)
        return self._matcher.regex(pattern)

    def suggest_candidates(self, word: str, cutoff: int) -> list[tuple[str, int]]:
        """Shard-local (term, plain-Levenshtein distance ≤ cutoff) pairs for
        spell suggestion — the dictionary never leaves the shard."""
        if self._matcher is None:
            self._matcher = VocabMatcher(self.vocab())
        return self._matcher.within_distance_plain(word, cutoff)

    def posting(self, term: str) -> dict | None:
        st = self._state_for(term)
        i = self._find_in(st, term)
        if i is None:
            return None
        row = st[0].slice(i, 1)
        return {name: row[name][0].as_py() for name in row.schema.names}

    # ---- doc metadata (lang/url for filters and result fields) ----
    def _load_meta(self, lang_col: str | None, url_col: str | None):
        if self._meta is not None or self._docstore_dir is None:
            return
        part = os.path.join(self._docstore_dir, f"shard={self.shard}")
        if not os.path.isdir(part):
            part = self._docstore_dir
        cols = ["doc_id"] + [c for c in (lang_col, url_col) if c]
        dset = pads.dataset(part)
        avail = [c for c in cols if c in dset.schema.names]
        t = dset.to_table(columns=avail).sort_by("doc_id")
        # keep metadata columns Arrow-side: per-hit .as_py() probes instead of
        # an O(shard-docs) to_pylist at load (cold start was dominated by it)
        self._meta = {
            "doc_id": t["doc_id"].to_numpy(zero_copy_only=False),
            "lang": t[lang_col].combine_chunks() if lang_col and lang_col in avail else None,
            "url": t[url_col].combine_chunks() if url_col and url_col in avail else None,
        }

    def _meta_for(self, doc_ids: np.ndarray) -> tuple[list, list]:
        if self._meta is None:
            return [None] * len(doc_ids), [None] * len(doc_ids)
        pos = np.searchsorted(self._meta["doc_id"], doc_ids)
        la, ua = self._meta["lang"], self._meta["url"]
        langs = [la[int(p)].as_py() if la is not None else None for p in pos]
        urls = [ua[int(p)].as_py() if ua is not None else None for p in pos]
        return langs, urls

    # ---- phrase adjacency (optional positions payload) ----
    @staticmethod
    def _decode_positions(p: dict, j: int) -> np.ndarray:
        """Ascending token positions of posting ``j`` (doc-sorted order) of a
        term built with ``index_positions=True``."""
        rel = np.frombuffer(p["pos_offsets"], dtype=np.uint32)
        blob = p["positions_enc"]
        start = int(rel[j])
        end = int(rel[j + 1]) if j + 1 < len(rel) else len(blob)
        deltas = varbyte_decode(blob[start:end])
        return np.cumsum(deltas.astype(np.int64))

    @staticmethod
    def _decode_positions_batch(
        p: dict, idxs: np.ndarray, tf_at: np.ndarray
    ) -> np.ndarray:
        """Positions of MANY postings in one pass: gather the selected blob
        slices into one buffer, ONE varbyte decode, group-wise cumsum (the
        anchor resets at each posting).  Head-term phrase verification decodes
        ~50k candidate postings without 50k Python decode calls."""
        rel = np.frombuffer(p["pos_offsets"], dtype=np.uint32).astype(np.int64)
        blob = np.frombuffer(p["positions_enc"], dtype=np.uint8)
        starts = rel[idxs]
        ends = np.where(idxs + 1 < len(rel), rel[np.minimum(idxs + 1, len(rel) - 1)], len(blob))
        lens = ends - starts
        tot = int(lens.sum())
        prev = np.concatenate(([0], np.cumsum(lens)[:-1]))
        gather = np.repeat(starts - prev, lens) + np.arange(tot, dtype=np.int64)
        deltas = varbyte_decode(blob[gather], int(tf_at.sum()))
        flat = np.cumsum(deltas.astype(np.int64))
        first = np.concatenate(([0], np.cumsum(tf_at)[:-1]))
        prevv = np.concatenate(([0], flat[first[1:] - 1])) if len(idxs) > 1 else np.zeros(1, np.int64)
        return flat - np.repeat(prevv, tf_at)

    def search_phrase(
        self,
        terms: list[str],
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        m: int,
        include_langs: list[str] | None = None,
        lang_col: str | None = None,
        url_col: str | None = None,
        slop: int = 0,
    ) -> list[tuple[int, float, str | None, str | None]]:
        """Top-m docs containing the token sequence (Tantivy phrase
        semantics: every term at consecutive positions).  ``slop`` relaxes
        adjacency in-order with a TOTAL gap budget (Lucene SpanNear
        inOrder=true): the sum of extra gaps across ALL steps must stay
        ≤ slop; slop=0 is the exact phrase.  Requires an index built with
        ``index_positions=True``; scoring is the BM25 sum of the phrase
        terms over position-verified documents."""
        posts: list[tuple[str, dict]] = []
        for t in terms:
            p = self.posting(t)
            if p is None:
                return []
            if p.get("positions_enc") is None:
                raise ValueError(
                    "phrase query requires an index built with index_positions=True"
                )
            posts.append((t, p))
        decs = [self._decode_full(p) for _, p in posts]
        cand = decs[0][0]
        for d, _, _ in decs[1:]:
            cand = np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return []
        # vectorized adjacency: pack (candidate_index, position) into one i64
        # key per occurrence; the phrase chain is then len(terms)−1 np.isin
        # membership passes — no per-candidate Python
        STRIDE = np.int64(1) << np.int64(32)
        idxs = [np.searchsorted(dec[0], cand) for dec in decs]
        keysets = []
        for (t, p), (d, tf, nm), ix in zip(posts, decs, idxs):
            tf_at = tf[ix].astype(np.int64)
            pos = self._decode_positions_batch(p, ix, tf_at)
            ci = np.repeat(np.arange(len(cand), dtype=np.int64), tf_at)
            keysets.append(ci * STRIDE + pos)
        # chain keyed on the CURRENT term's occurrences, carrying the MIN
        # total gap consumed so far: Lucene SpanNear(inOrder) semantics —
        # ``slop`` is a TOTAL budget across the whole phrase, each step may
        # spend 0..slop extra positions and the sum must stay ≤ slop
        # (slop=0 → one lookup pass/step, identical cost to the exact chain).
        # keysets are sorted (candidate index asc, positions asc within it),
        # and filtering preserves order, so budget lookups are searchsorted.
        BIG = np.iinfo(np.int64).max
        cur = keysets[0]
        bud = np.zeros(len(cur), dtype=np.int64)
        for ks in keysets[1:]:
            nb = np.full(len(ks), BIG, dtype=np.int64)
            if len(cur):
                for d in range(1, slop + 2):
                    want = ks - d
                    idx = np.minimum(np.searchsorted(cur, want), len(cur) - 1)
                    hit = cur[idx] == want
                    ok = hit & (bud[idx] + (d - 1) <= slop)
                    np.minimum(nb, np.where(ok, bud[idx] + (d - 1), BIG), out=nb)
            keep_occ = nb <= slop
            cur = ks[keep_occ]
            bud = nb[keep_occ]
            if len(cur) == 0:
                return []
        keep = np.zeros(len(cand), dtype=bool)
        keep[np.unique(cur // STRIDE)] = True
        cand = cand[keep]
        if len(cand) == 0:
            return []
        scores = np.zeros(len(cand), dtype=np.float64)
        for (t, p), (d, tf, nm) in zip(posts, decs):
            pos = np.searchsorted(d, cand)
            dl = id_to_fieldnorm(nm[pos])
            scores += bm25.term_score(tf[pos], dl, global_df[t], n_docs, avgdl)

        if include_langs is not None or lang_col or url_col:
            self._load_meta(lang_col, url_col)
        if include_langs is not None and self._meta is not None and self._meta["lang"] is not None:
            mpos = np.searchsorted(self._meta["doc_id"], cand)
            lkeep = pc.is_in(
                self._meta["lang"].take(pa.array(mpos)),
                value_set=pa.array(list(include_langs), type=pa.string()),
            ).to_numpy(zero_copy_only=False)
            cand, scores = cand[lkeep], scores[lkeep]
            if len(cand) == 0:
                return []
        sel = np.lexsort((cand, -scores))[:m]
        cand, scores = cand[sel], scores[sel]
        langs, urls = self._meta_for(cand)
        return list(zip(cand.tolist(), scores.tolist(), langs, urls))

    def search_near(
        self,
        terms: list[str],
        window: int,
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        m: int,
        include_langs: list[str] | None = None,
        lang_col: str | None = None,
        url_col: str | None = None,
    ) -> list[tuple[int, float, str | None, str | None]]:
        """Unordered proximity (Lucene SpanNearQuery inOrder=false, two
        clauses): docs where the two terms occur within ``window`` token
        positions of each other IN EITHER ORDER; scoring is the BM25 sum of
        both terms over verified docs (same contract as :meth:`search_phrase`).

        Verification is fully vectorized: occurrences pack into
        (candidate_index << 32 | position) keys; for every occurrence of term
        A one searchsorted against B's sorted keys checks the nearest
        neighbours on both sides for |Δpos| ≤ window within the same
        candidate.  Requires an ``index_positions=True`` build."""
        if len(terms) != 2:
            raise ValueError("search_near supports exactly two terms")
        posts: list[tuple[str, dict]] = []
        for t in terms:
            p = self.posting(t)
            if p is None:
                return []
            if p.get("positions_enc") is None:
                raise ValueError(
                    "near query requires an index built with index_positions=True"
                )
            posts.append((t, p))
        decs = [self._decode_full(p) for _, p in posts]
        cand = np.intersect1d(decs[0][0], decs[1][0], assume_unique=True)
        if len(cand) == 0:
            return []
        STRIDE = np.int64(1) << np.int64(32)
        keysets = []
        for (t, p), (d, tf, nm) in zip(posts, decs):
            ix = np.searchsorted(d, cand)
            tf_at = tf[ix].astype(np.int64)
            pos = self._decode_positions_batch(p, ix, tf_at)
            ci = np.repeat(np.arange(len(cand), dtype=np.int64), tf_at)
            keysets.append(ci * STRIDE + pos)
        a, b = keysets
        w = np.int64(window)
        idx = np.searchsorted(b, a)
        right = np.minimum(idx, len(b) - 1)
        ok = (b[right] - a <= w) & (b[right] >= a) & (b[right] // STRIDE == a // STRIDE)
        left = np.maximum(idx - 1, 0)
        ok |= (a - b[left] <= w) & (b[left] <= a) & (b[left] // STRIDE == a // STRIDE)
        hits = np.unique(a[ok] // STRIDE)
        if len(hits) == 0:
            return []
        cand = cand[hits]
        scores = np.zeros(len(cand), dtype=np.float64)
        for (t, p), (d, tf, nm) in zip(posts, decs):
            pos = np.searchsorted(d, cand)
            dl = id_to_fieldnorm(nm[pos])
            scores += bm25.term_score(tf[pos], dl, global_df[t], n_docs, avgdl)
        if include_langs is not None or lang_col or url_col:
            self._load_meta(lang_col, url_col)
        if include_langs is not None and self._meta is not None and self._meta["lang"] is not None:
            mpos = np.searchsorted(self._meta["doc_id"], cand)
            lkeep = pc.is_in(
                self._meta["lang"].take(pa.array(mpos)),
                value_set=pa.array(list(include_langs), type=pa.string()),
            ).to_numpy(zero_copy_only=False)
            cand, scores = cand[lkeep], scores[lkeep]
            if len(cand) == 0:
                return []
        sel = np.lexsort((cand, -scores))[:m]
        cand, scores = cand[sel], scores[sel]
        langs, urls = self._meta_for(cand)
        return list(zip(cand.tolist(), scores.tolist(), langs, urls))

    # ---- postings decode with block skipping ----
    @staticmethod
    def _decode_full(p: dict) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        docs = decode_doc_ids(p["docs_enc"], p["df"])
        tfs = decode_tfs(p["tfs_enc"], p["df"])
        norms = np.frombuffer(p["norms"], dtype=np.uint8)
        return docs, tfs, norms

    @staticmethod
    def _decode_for_candidates(p: dict, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode only blocks whose doc range can intersect ``cand`` — the
        skip-pointer read (block-max metadata §T3)."""
        last_docs = np.frombuffer(p["last_docs"], dtype=np.uint64).astype(np.int64)
        n_blocks = len(last_docs)
        if n_blocks <= 2 or len(cand) * 4 >= p["df"]:
            return ShardSearcher._decode_full(p)
        idx = np.searchsorted(last_docs, cand, side="left")
        needed = np.unique(idx[idx < n_blocks])
        if len(needed) * BLOCK_SIZE >= p["df"]:
            return ShardSearcher._decode_full(p)
        return decode_blocks(p, needed)

    # ---- scoring ----
    def _maxscore_union(
        self,
        posts: list[tuple[str, dict]],
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        m: int,
        lang_col: str | None,
        url_col: str | None,
    ) -> list[tuple[int, float, str | None, str | None]]:
        """Exact top-m over a term union via MaxScore (Turtle & Flood 1995)
        with block-max gather: terms whose summed upper bounds cannot reach
        the current m-th score are never fully decoded.

        Upper bounds come from the per-block (max_tf, min_norm) metadata —
        tfn is monotone in tf and anti-monotone in dl, so the list-level
        (max over max_tfs, min over min_norms) bounds every posting.
        """
        ubs = np.empty(len(posts), dtype=np.float64)
        for i, (t, p) in enumerate(posts):
            max_tf = int(np.frombuffer(p["max_tfs"], dtype=np.uint32).max())
            min_dl = int(id_to_fieldnorm([int(np.frombuffer(p["min_norms"], dtype=np.uint8).min())])[0])
            ubs[i] = bm25.term_upper_bound(max_tf, min_dl, global_df[t], n_docs, avgdl)
        order = np.argsort(-ubs, kind="stable")

        # batch-decode the SMALL variant lists up front (ONE varbyte pass for
        # the whole union — wide fuzzy/regex expansions are hundreds of small
        # lists where per-call decode overhead dominated); genuinely large
        # lists keep the per-candidate block-skip path so MaxScore still
        # avoids materializing non-essential heavy terms
        small = [p for _, p in posts if p["df"] <= 32 * BLOCK_SIZE]
        full = {id(p): dec for p, dec in zip(small, decode_full_many(small))}

        def decode_fn(p: dict, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
            dec = full.get(id(p))
            if dec is not None:
                return dec
            return self._decode_for_candidates(p, cand)

        def full_docs(p: dict) -> np.ndarray:
            dec = full.get(id(p))
            return dec[0] if dec is not None else self._decode_full(p)[0]

        # seed threshold: exact scores of the highest-upper-bound term's docs
        seed_docs = full_docs(posts[order[0]][1])
        seed_scores = _union_exact_scores(
            posts, seed_docs, n_docs, avgdl, global_df, decode_fn
        )
        if len(seed_scores) >= m:
            theta = float(np.partition(seed_scores, -m)[-m])
        else:
            theta = -np.inf

        # essential prefix: smallest k with sum of remaining bounds < theta
        suffix = np.concatenate((np.cumsum(ubs[order][::-1])[::-1], [0.0]))
        k = len(posts)
        for i in range(len(posts) + 1):
            if suffix[i] < theta:
                k = max(1, i)
                break
        essential = [posts[j] for j in order[:k]]

        cand_arrays = [full_docs(p) for _, p in essential]
        cand = np.unique(np.concatenate(cand_arrays))
        scores = _union_exact_scores(
            posts, cand, n_docs, avgdl, global_df, decode_fn
        )
        sel = np.lexsort((cand, -scores))[:m]
        cand, scores = cand[sel], scores[sel]
        if lang_col or url_col:
            self._load_meta(lang_col, url_col)
        langs, urls = self._meta_for(cand)
        return list(zip(cand.tolist(), scores.tolist(), langs, urls))

    def search_groups(
        self,
        groups: list[list[str]],
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        m: int,
        include_langs: list[str] | None = None,
        lang_col: str | None = None,
        url_col: str | None = None,
        exclude_terms: list[str] | None = None,
        should_terms: list[str] | None = None,
        boosts: dict[str, float] | None = None,
        after: tuple[float, int] | None = None,
        avgdl_map: dict[str, float] | None = None,
    ) -> list[tuple[int, float, str | None, str | None]]:
        """Top-m (doc_id, score, lang, url) for AND-of-OR-groups in this shard.

        ``avgdl_map`` (multi-field scoring) overrides the corpus ``avgdl``
        per term KEY — a field-prefixed key scores against its own field's
        average length (its norm byte already quantizes that field's dl), so
        per-field BM25 needs no new scoring path.

        ``after`` is the search-after cursor (Lucene/Elasticsearch
        ``searchAfter``): a ``(score, doc_id)`` position in the engine's
        ranking order (RAW score desc, doc_id asc — the exact float a prior
        search returned); only docs STRICTLY after it are returned, so deep
        paging costs O(limit) per shard at any depth — the cursor prunes
        inside the shard, never on the driver.

        ``boosts`` maps index terms to multiplicative score weights (Lucene
        query-time boost: ``term^2``); unlisted terms weigh 1.0.  Boosts
        never change the candidate set, only contributions.

        ``should_terms`` is the BooleanQuery SHOULD clause: optional terms
        that never gate matching (candidates come from the MUST groups
        alone) but add their BM25 contribution to candidates containing
        them — Lucene's must+should scoring contract.

        ``exclude_terms`` is the Lucene/Tantivy BooleanQuery MustNot clause:
        a candidate containing ANY excluded term is dropped BEFORE ranking
        and contributes no score.  Docs are sharded by id range, so a doc's
        postings for an excluded term live in this same shard — per-shard
        exclusion is exact, no cross-shard pass needed."""
        group_posts: list[list[tuple[str, dict]]] = []
        for g in groups:
            posts = [(t, self.posting(t)) for t in dict.fromkeys(g)]
            posts = [(t, p) for t, p in posts if p is not None]
            if not posts:
                return []  # AND semantics: a group with no local terms → no hits here
            group_posts.append(posts)

        # MaxScore pruning for wide single-group unions (fuzzy/regex
        # expansions): exact top-m without decoding every member's postings.
        # Skipped under a pre-limit language filter (threshold would be unsafe)
        # and under MustNot (the excluded docs must drop before the heap).
        if (
            len(group_posts) == 1
            and len(group_posts[0]) >= 8
            and include_langs is None
            and not exclude_terms
            and not should_terms
            and not boosts
            and after is None
            and avgdl_map is None
        ):
            return self._maxscore_union(
                group_posts[0], n_docs, avgdl, global_df, m, lang_col, url_col
            )

        # process groups smallest-local-df first so later decodes can skip blocks
        order = np.argsort([sum(p["df"] for _, p in posts) for posts in group_posts])
        cand: np.ndarray | None = None
        decoded: list[tuple[int, str, np.ndarray, np.ndarray, np.ndarray]] = []
        for gi in order:
            arrs = []
            for t, p in group_posts[gi]:
                d, tf, nm = (
                    self._decode_full(p) if cand is None else self._decode_for_candidates(p, cand)
                )
                decoded.append((int(gi), t, d, tf, nm))
                arrs.append(d)
            union = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            cand = union if cand is None else np.intersect1d(cand, union, assume_unique=True)
            if len(cand) == 0:
                return []

        if exclude_terms:
            for t in dict.fromkeys(exclude_terms):
                p = self.posting(t)
                if p is None:
                    continue
                d, _, _ = self._decode_for_candidates(p, cand)
                if len(d):
                    cand = cand[~np.isin(cand, d, assume_unique=True)]
                if len(cand) == 0:
                    return []

        if should_terms:
            # optional scoring terms: decoded only over the surviving
            # candidates (block-skip decode), never widen the match set
            for t in dict.fromkeys(should_terms):
                p = self.posting(t)
                if p is None:
                    continue
                d, tf, nm = self._decode_for_candidates(p, cand)
                decoded.append((-1, t, d, tf, nm))

        scores = np.zeros(len(cand), dtype=np.float64)
        for _gi, t, d, tf, nm in decoded:
            if len(d) == 0:
                continue
            pos = np.searchsorted(d, cand)
            pos_c = np.minimum(pos, len(d) - 1)
            hit = d[pos_c] == cand
            if not hit.any():
                continue
            dl = id_to_fieldnorm(nm[pos_c[hit]])
            t_avgdl = avgdl_map.get(t, avgdl) if avgdl_map else avgdl
            contrib = bm25.term_score(tf[pos_c[hit]], dl, global_df[t], n_docs, t_avgdl)
            if boosts:
                contrib = contrib * boosts.get(t, 1.0)
            scores[hit] += contrib

        if after is not None:
            # keep docs strictly after the cursor in the engine's ACTUAL
            # ranking order — RAW score desc, doc_id asc (the same lexsort
            # key the driver merge uses).  The cursor score is the exact
            # float a previous search returned (doubles survive the actor
            # boundary bit-exactly), so raw comparison is the consistent
            # policy; rounding here would disagree with the raw-order
            # ranking for sub-1e-9 score gaps and skip or duplicate docs.
            a_s, a_d = float(after[0]), int(after[1])
            keep = (scores < a_s) | ((scores == a_s) & (cand > a_d))
            cand, scores = cand[keep], scores[keep]
            if len(cand) == 0:
                return []

        langs = urls = None
        if include_langs is not None or lang_col or url_col:
            self._load_meta(lang_col, url_col)
        if include_langs is not None and self._meta is not None and self._meta["lang"] is not None:
            pos = np.searchsorted(self._meta["doc_id"], cand)
            keep = pc.is_in(
                self._meta["lang"].take(pa.array(pos)),
                value_set=pa.array(list(include_langs), type=pa.string()),
            ).to_numpy(zero_copy_only=False)
            cand, scores = cand[keep], scores[keep]
            if len(cand) == 0:
                return []

        # top-m by (-score, doc_id)
        sel = np.lexsort((cand, -scores))[:m]
        cand, scores = cand[sel], scores[sel]
        langs, urls = self._meta_for(cand)
        return list(zip(cand.tolist(), scores.tolist(), langs, urls))

    def search_lm(
        self,
        terms: list[str],
        cf_map: dict[str, int],
        total_tokens: int,
        mu: float,
        m: int,
        include_langs: list[str] | None = None,
        lang_col: str | None = None,
        url_col: str | None = None,
    ) -> list[tuple[int, float, str | None, str | None]]:
        """Top-m under the Dirichlet query-likelihood model (pluggable
        Similarity; see :mod:`..query.bm25` for the formula).  AND semantics
        over ``terms``; candidates and block-skip decodes are the exact same
        machinery as BM25 — only the per-term contribution changes.  Global
        stats (corpus cf per term, |C|) ship from the driver; dl is the same
        quantized fieldnorm BM25 uses."""
        posts: list[tuple[str, dict]] = []
        for t in dict.fromkeys(terms):
            p = self.posting(t)
            if p is None:
                return []  # AND semantics: a missing term in this shard → no hits here
            posts.append((t, p))
        order = np.argsort([p["df"] for _, p in posts])
        cand: np.ndarray | None = None
        decoded: list[tuple[str, np.ndarray, np.ndarray, np.ndarray]] = []
        for i in order:
            t, p = posts[int(i)]
            d, tf, nm = (
                self._decode_full(p) if cand is None else self._decode_for_candidates(p, cand)
            )
            decoded.append((t, d, tf, nm))
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return []
        scores = np.zeros(len(cand), dtype=np.float64)
        for t, d, tf, nm in decoded:
            pos = np.searchsorted(d, cand)  # cand ⊆ d under AND
            dl = id_to_fieldnorm(nm[pos])
            scores += bm25.lm_dirichlet_score(tf[pos], dl, cf_map[t], total_tokens, mu)
        if include_langs is not None or lang_col or url_col:
            self._load_meta(lang_col, url_col)
        if include_langs is not None and self._meta is not None and self._meta["lang"] is not None:
            pos = np.searchsorted(self._meta["doc_id"], cand)
            keep = pc.is_in(
                self._meta["lang"].take(pa.array(pos)),
                value_set=pa.array(list(include_langs), type=pa.string()),
            ).to_numpy(zero_copy_only=False)
            cand, scores = cand[keep], scores[keep]
            if len(cand) == 0:
                return []
        sel = np.lexsort((cand, -scores))[:m]
        cand, scores = cand[sel], scores[sel]
        langs, urls = self._meta_for(cand)
        return list(zip(cand.tolist(), scores.tolist(), langs, urls))

    def _match_candidates(
        self,
        groups: list[list[str]],
        exclude_terms: list[str] | None = None,
    ) -> np.ndarray:
        """ALL matching doc ids in this shard for AND-of-OR-groups + MustNot
        (the candidate computation of :meth:`search_groups` without scoring)."""
        group_posts: list[list[tuple[str, dict]]] = []
        for g in groups:
            posts = [(t, self.posting(t)) for t in dict.fromkeys(g)]
            posts = [(t, p) for t, p in posts if p is not None]
            if not posts:
                return np.empty(0, np.int64)
            group_posts.append(posts)
        order = np.argsort([sum(p["df"] for _, p in posts) for posts in group_posts])
        cand: np.ndarray | None = None
        for gi in order:
            arrs = []
            for _t, p in group_posts[gi]:
                d, _, _ = (
                    self._decode_full(p) if cand is None else self._decode_for_candidates(p, cand)
                )
                arrs.append(d)
            union = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            cand = union if cand is None else np.intersect1d(cand, union, assume_unique=True)
            if len(cand) == 0:
                return np.empty(0, np.int64)
        if exclude_terms:
            for t in dict.fromkeys(exclude_terms):
                p = self.posting(t)
                if p is None:
                    continue
                d, _, _ = self._decode_for_candidates(p, cand)
                if len(d):
                    cand = cand[~np.isin(cand, d, assume_unique=True)]
                if len(cand) == 0:
                    break
        return cand.astype(np.int64, copy=False)

    def facet_counts(
        self,
        groups: list[list[str]],
        lang_col: str | None,
        exclude_terms: list[str] | None = None,
    ) -> dict[str, int]:
        """Per-language match counts over ALL matching docs in this shard
        (search-engine facet counting / Tantivy FacetCollector analog).
        Only {lang: count} pairs cross the wire — never doc lists — so the
        driver-side merge is O(#langs × #shards) regardless of corpus size."""
        cand = self._match_candidates(groups, exclude_terms)
        if len(cand) == 0:
            return {}
        self._load_meta(lang_col, None)
        if self._meta is None or self._meta["lang"] is None:
            return {"": int(len(cand))}
        pos = np.searchsorted(self._meta["doc_id"], cand)
        langs = self._meta["lang"].take(pa.array(pos))
        vc = langs.value_counts()
        return {
            (v.as_py() or ""): c.as_py()
            for v, c in zip(vc.field("values"), vc.field("counts"))
        }

    def facet_domain_counts(
        self,
        groups: list[list[str]],
        lang_col: str | None,
        url_col: str | None,
        exclude_terms: list[str] | None = None,
    ) -> dict[str, int]:
        """Per-domain match counts over ALL matching docs in this shard — a
        terms aggregation on a stored field (Elasticsearch terms-agg /
        Tantivy TermsAggregation analog).  The domain is the url prefix
        before the first '/'; extraction is one vectorized Arrow split over
        the matched rows only, and only {domain: count} maps cross the wire."""
        cand = self._match_candidates(groups, exclude_terms)
        if len(cand) == 0:
            return {}
        self._load_meta(lang_col, url_col)
        if self._meta is None or self._meta["url"] is None:
            return {"": int(len(cand))}
        pos = np.searchsorted(self._meta["doc_id"], cand)
        urls = self._meta["url"].take(pa.array(pos))
        domains = pc.list_element(pc.split_pattern(urls, "/", max_splits=1), 0)
        vc = domains.value_counts()
        return {
            (v.as_py() or ""): c.as_py()
            for v, c in zip(vc.field("values"), vc.field("counts"))
        }

    def _match_with_norms(
        self,
        groups: list[list[str]],
        exclude_terms: list[str] | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """(candidate doc ids, decoded dl) for AND-of-OR-groups.  The
        quantized length rides in every posting as the norm byte, so no extra
        column is read; every candidate matches at least one term of group 0,
        so that group's postings cover all the norms needed."""
        cand = self._match_candidates(groups, exclude_terms)
        if len(cand) == 0:
            return cand, np.empty(0, np.int64)
        norms = np.zeros(len(cand), dtype=np.int64)
        filled = np.zeros(len(cand), dtype=bool)
        for t in dict.fromkeys(groups[0]):
            if filled.all():
                break
            p = self.posting(t)
            if p is None:
                continue
            d, _tf, nm = self._decode_for_candidates(p, cand)
            if len(d) == 0:
                continue
            pos = np.minimum(np.searchsorted(d, cand), len(d) - 1)
            hit = (d[pos] == cand) & ~filled
            norms[hit] = nm[pos[hit]]
            filled |= hit
        return cand, id_to_fieldnorm(norms).astype(np.int64)

    def match_norms(
        self,
        groups: list[list[str]],
        m: int,
        exclude_terms: list[str] | None = None,
    ) -> list[tuple[int, int]]:
        """Top-m (doc_id, dl) of matching docs ordered by decoded fieldnorm
        length DESC, doc_id ASC — Tantivy ``TopDocs::order_by_u64_field``
        (rank matches by a numeric fast field instead of relevance)."""
        cand, dl = self._match_with_norms(groups, exclude_terms)
        if len(cand) == 0:
            return []
        sel = np.lexsort((cand, -dl))[:m]
        return list(zip(cand[sel].tolist(), dl[sel].tolist()))

    def match_dl_stats(
        self,
        groups: list[list[str]],
        exclude_terms: list[str] | None = None,
    ) -> tuple[int, int, int, int]:
        """(n, Σdl, min dl, max dl) over ALL matching docs — the shard-local
        partial of an Elasticsearch stats aggregation on the length fast
        field.  Constant-size payload per shard; the driver folds."""
        cand, dl = self._match_with_norms(groups, exclude_terms)
        if len(cand) == 0:
            return (0, 0, 0, 0)
        return (int(len(cand)), int(dl.sum()), int(dl.min()), int(dl.max()))

    def collapse_best(
        self,
        groups: list[list[str]],
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        lang_col: str | None,
        url_col: str | None,
        exclude_terms: list[str] | None = None,
    ) -> list[tuple[str, int, float]]:
        """Per-domain best hit in this shard (Elasticsearch field collapsing):
        ALL candidates are scored (exactness — a shard-local top-m cut could
        hide a domain's true best), then one (domain, doc_id, score) row per
        domain ships, best chosen by the pinned (round-9 score desc, doc_id)
        order.  Payload is O(#domains in shard), never O(#matches)."""
        cand = self._match_candidates(groups, exclude_terms)
        if len(cand) == 0:
            return []
        terms = dict.fromkeys(t for g in groups for t in g)
        posts = [(t, self.posting(t)) for t in terms]
        posts = [(t, p) for t, p in posts if p is not None]
        scores = _union_exact_scores(
            posts, cand, n_docs, avgdl, global_df, self._decode_for_candidates
        )
        self._load_meta(lang_col, url_col)
        if self._meta is None or self._meta["url"] is None:
            doms = pa.array([""] * len(cand), type=pa.string())
        else:
            pos = np.searchsorted(self._meta["doc_id"], cand)
            urls = self._meta["url"].take(pa.array(pos))
            doms = pc.list_element(pc.split_pattern(urls, "/", max_splits=1), 0)
        codes = pc.dictionary_encode(doms)
        idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        rs = np.round(scores, 9)
        order = np.lexsort((cand, -rs, idx))  # per-domain pinned best first
        first = np.concatenate(([True], idx[order][1:] != idx[order][:-1]))
        sel = order[first]
        dom_dict = codes.dictionary
        return [
            (dom_dict[int(idx[i])].as_py() or "", int(cand[i]), float(scores[i]))
            for i in sel
        ]

    def search_dismax(
        self,
        terms: list[str],
        n_docs: int,
        avgdl: float,
        global_df: dict[str, int],
        m: int,
        tie: float,
    ) -> list[tuple[int, float]]:
        """Top-m disjunction-max scores (Lucene DisjunctionMaxQuery):
        candidates are the union of the terms' postings, score = best
        per-term BM25 + tie × (sum of the rest) — terms COMPETE instead of
        summing; the tie-breaker rewards multi-term docs without letting many
        weak contributions outrank one strong match (tie=0 pure max, tie=1
        degenerates to the OR-sum)."""
        posts = [(t, self.posting(t)) for t in dict.fromkeys(terms)]
        posts = [(t, p) for t, p in posts if p is not None]
        if not posts:
            return []
        decoded = [(t, *self._decode_full(p)) for t, p in posts]
        cand = np.unique(np.concatenate([d for _t, d, _tf, _nm in decoded]))
        best = np.zeros(len(cand), dtype=np.float64)
        total = np.zeros(len(cand), dtype=np.float64)
        for t, d, tf, nm in decoded:
            if len(d) == 0:
                continue
            pos = np.minimum(np.searchsorted(d, cand), len(d) - 1)
            hit = d[pos] == cand
            if not hit.any():
                continue
            dl = id_to_fieldnorm(nm[pos[hit]])
            contrib = np.zeros(len(cand), dtype=np.float64)
            contrib[hit] = bm25.term_score(tf[pos[hit]], dl, global_df[t], n_docs, avgdl)
            best = np.maximum(best, contrib)
            total += contrib
        scores = best + tie * (total - best)
        sel = np.lexsort((cand, -scores))[:m]
        return list(zip(cand[sel].tolist(), scores[sel].tolist()))

    def vocab_range(self, lo: str, hi: str, k: int) -> list[tuple[str, int]]:
        """First ``k`` (term, LOCAL df) of this shard's sorted dictionary in
        [lo, hi) — a term-dictionary range scan (Tantivy TermDictionary /
        FST range stream analog): two bisects on the sorted term array, no
        vocabulary materialization.  The driver merges per-shard heads (the
        global first k distinct terms are covered by the union of per-shard
        first k) and re-resolves exact global df afterwards."""
        _tbl, sorted_terms, order, dfs = self._all_state()
        a = _bisect_terms(sorted_terms, lo)
        b = _bisect_terms(sorted_terms, hi)
        b = min(b, a + k)
        return [
            (sorted_terms[i].as_py(), int(dfs[order[i]])) for i in range(a, b)
        ]

    def union_df(self, groups: list[list[str]]) -> list[int]:
        """Per-group LOCAL count of docs matching ANY member key — the BM25F
        document frequency (docs containing the term in any field).  Shards
        partition docs by id range, so summing these across shards is the
        exact global df of the union."""
        out: list[int] = []
        for g in groups:
            arrs = []
            for t in dict.fromkeys(g):
                p = self.posting(t)
                if p is None:
                    continue
                d, _, _ = self._decode_full(p)
                if len(d):
                    arrs.append(d)
            if not arrs:
                out.append(0)
            elif len(arrs) == 1:
                out.append(int(len(arrs[0])))
            else:
                out.append(int(len(np.unique(np.concatenate(arrs)))))
        return out

    def search_bm25f(
        self,
        groups: list[list[str]],
        key_weight: dict[str, float],
        key_avgdl: dict[str, float],
        group_idf: list[float],
        m: int,
        k1: float,
        b: float,
    ) -> list[tuple[int, float]]:
        """Top-m under TRUE BM25F (Robertson–Zaragoza simple variant): one
        group per query term holding its field keys; per candidate,
        tf̃ = Σ_key w·tf/(1−b+b·dl_f/avgdl_f) folds the field frequencies
        BEFORE saturation, then score += idf_term · tf̃/(k1+tf̃).  AND across
        groups, same decode machinery as search_groups; ``group_idf`` ships
        from the driver (idf over union-df, resolved by :meth:`union_df`)."""
        group_posts: list[list[tuple[str, dict]]] = []
        for g in groups:
            posts = [(t, self.posting(t)) for t in dict.fromkeys(g)]
            posts = [(t, p) for t, p in posts if p is not None]
            if not posts:
                return []
            group_posts.append(posts)

        order = np.argsort([sum(p["df"] for _, p in posts) for posts in group_posts])
        cand: np.ndarray | None = None
        decoded: list[tuple[int, str, np.ndarray, np.ndarray, np.ndarray]] = []
        for gi in order:
            arrs = []
            for t, p in group_posts[gi]:
                d, tf, nm = (
                    self._decode_full(p) if cand is None else self._decode_for_candidates(p, cand)
                )
                decoded.append((int(gi), t, d, tf, nm))
                arrs.append(d)
            union = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            cand = union if cand is None else np.intersect1d(cand, union, assume_unique=True)
            if len(cand) == 0:
                return []

        # fold per-group (per-term) field frequencies, then saturate once
        tft = np.zeros((len(groups), len(cand)), dtype=np.float64)
        for gi, t, d, tf, nm in decoded:
            if len(d) == 0:
                continue
            pos = np.searchsorted(d, cand)
            pos_c = np.minimum(pos, len(d) - 1)
            hit = d[pos_c] == cand
            if not hit.any():
                continue
            dl = id_to_fieldnorm(nm[pos_c[hit]]).astype(np.float64)
            w = key_weight.get(t, 1.0)
            tft[gi, hit] += w * tf[pos_c[hit]].astype(np.float64) / (
                1.0 - b + b * dl / key_avgdl[t]
            )
        scores = np.zeros(len(cand), dtype=np.float64)
        for gi in range(len(groups)):
            scores += group_idf[gi] * (tft[gi] / (k1 + tft[gi]))
        sel = np.lexsort((cand, -scores))[:m]
        return [(int(cand[i]), float(scores[i])) for i in sel]

    def vocab_topdf(self, lo: str, hi: str, c: int) -> tuple[list[tuple[str, int]], int]:
        """Local df-ranked head of the dictionary slice [lo, hi): the top-``c``
        (term, LOCAL df) pairs by (df desc, term asc), plus the highest local
        df among the UNSHIPPED slice terms (0 when the slice fits in ``c``).
        That remainder bound lets the driver run a threshold (Fagin TA) merge:
        any term no shard shipped has global df ≤ Σ per-shard remainder
        bounds, so the driver can prove exactness without a vocabulary-sized
        payload (ADVICE r2: complete() shipped the entire prefix slice)."""
        _tbl, sorted_terms, order, dfs = self._all_state()
        a = _bisect_terms(sorted_terms, lo)
        b = _bisect_terms(sorted_terms, hi)
        if b <= a:
            return [], 0
        local = dfs[order[a:b]].astype(np.int64, copy=False)
        n = b - a
        if n <= c:
            sel = np.lexsort((np.arange(n), -local))
            rest_max = 0
        else:
            part = np.argpartition(-local, c - 1)[:c]
            sel = part[np.lexsort((part, -local[part]))]
            rest = np.ones(n, dtype=bool)
            rest[part] = False
            rest_max = int(local[rest].max())
        return (
            [(sorted_terms[a + int(i)].as_py(), int(local[int(i)])) for i in sel],
            rest_max,
        )

    def meta_for_docs(
        self, doc_ids: list[int], lang_col: str | None, url_col: str | None
    ) -> list[tuple[int, str | None, str | None]]:
        """(doc_id, lang, url) for the requested ids present in this shard —
        the stored-field half of a multi-get; absent ids are simply skipped
        (docs are sharded by id range, so exactly one shard answers each)."""
        self._load_meta(lang_col, url_col)
        if self._meta is None:
            return []
        ids = np.asarray(sorted(set(int(i) for i in doc_ids)), dtype=np.int64)
        have = self._meta["doc_id"]
        pos = np.minimum(np.searchsorted(have, ids), len(have) - 1) if len(have) else None
        if pos is None:
            return []
        hit = have[pos] == ids
        out = []
        la, ua = self._meta["lang"], self._meta["url"]
        for i, p in zip(ids[hit].tolist(), pos[hit].tolist()):
            out.append(
                (
                    int(i),
                    la[int(p)].as_py() if la is not None else None,
                    ua[int(p)].as_py() if ua is not None else None,
                )
            )
        return out

    def term_postings_for_docs(
        self, terms: list[str], doc_ids: list[int]
    ) -> dict[str, list[tuple[int, int, int]]]:
        """Per-term (doc_id, tf, norm_id) restricted to ``doc_ids`` — the raw
        inputs of a Lucene ``Explanation``.  Block-skip decode touches only
        the posting blocks that can contain the requested docs, so explaining
        k hits costs O(k) block reads per term, not a full list decode."""
        want = np.asarray(sorted(doc_ids), dtype=np.int64)
        out: dict[str, list[tuple[int, int, int]]] = {}
        if len(want) == 0:
            return out
        for t in dict.fromkeys(terms):
            p = self.posting(t)
            if p is None:
                continue
            d, tf, nm = self._decode_for_candidates(p, want)
            if len(d) == 0:
                continue
            pos = np.minimum(np.searchsorted(d, want), len(d) - 1)
            hit = d[pos] == want
            if hit.any():
                out[t] = list(
                    zip(
                        want[hit].tolist(),
                        tf[pos[hit]].astype(int).tolist(),
                        nm[pos[hit]].astype(int).tolist(),
                    )
                )
        return out


def _union_exact_scores(
    posts: list[tuple[str, dict]],
    cand: np.ndarray,
    n_docs: int,
    avgdl: float,
    global_df: dict[str, int],
    decode_fn,
) -> np.ndarray:
    """Exact summed BM25 for ``cand`` over a union of posting lists,
    decoding only the blocks that can contain candidates."""
    scores = np.zeros(len(cand), dtype=np.float64)
    for t, p in posts:
        d, tf, nm = decode_fn(p, cand)
        if len(d) == 0:
            continue
        pos = np.searchsorted(d, cand)
        pos_c = np.minimum(pos, len(d) - 1)
        hit = d[pos_c] == cand
        if not hit.any():
            continue
        dl = id_to_fieldnorm(nm[pos_c[hit]])
        scores[hit] += bm25.term_score(tf[pos_c[hit]], dl, global_df[t], n_docs, avgdl)
    return scores


class ShardGroupSearcher:
    """One serving actor owning a CONTIGUOUS GROUP of shards — the tree
    fan-out tier for breadth-limited serving (SCALE.md LIMIT #2: at 100 TB a
    per-shard fan-out is ~57k RPCs per query; grouping K shards per actor
    divides driver fan-out and fan-in by K, and per-shard merges stay
    associative so results are identical).  Shard searchers build on a
    persistent intra-actor thread pool (segment parquet reads release the
    GIL); query methods run SERIALLY per shard inside the actor — the
    parallelism axis is ACROSS group actors, matching the
    one-process-per-core deployment.  Measured negative result (round 3,
    1M docs / 16 shards / K=4): running fanout on the thread pool left cold
    unchanged (2.3–2.9 s vs 2.5–2.7 s serial) and REGRESSED warm p50
    37 ms → 45–67 ms — warm scoring is GIL-bound numpy, so intra-actor
    threads only add contention.  Don't re-thread this path."""

    def __init__(
        self,
        shards: list[int],
        files_by_shard: dict[int, list[str]],
        docstore: str,
        num_buckets: int,
    ):
        from concurrent.futures import ThreadPoolExecutor

        self._shards = sorted(int(s) for s in shards)

        def build(s: int) -> ShardSearcher:
            return ShardSearcher(s, files_by_shard[s], docstore, num_buckets)

        self._pool = ThreadPoolExecutor(max_workers=min(8, max(1, len(self._shards))))
        built = list(self._pool.map(build, self._shards))
        self._searchers = dict(zip(self._shards, built))

    def fanout(self, method: str, /, *args, shards: list[int] | None = None, **kwargs) -> list:
        """Per-shard results in shard order — one wire message for the whole
        group; the driver flattens group replies in place of per-shard ones.
        ``shards`` restricts to a subset of this group (term routing)."""
        use = self._shards if shards is None else [s for s in self._shards if s in set(shards)]
        return [
            getattr(self._searchers[s], method)(*args, **kwargs) for s in use
        ]

    def warm_buckets(self, lang_col: str | None = None, url_col: str | None = None) -> None:
        def w(s: int) -> None:
            se = self._searchers[s]
            se.warm_buckets()
            if lang_col or url_col:
                se._load_meta(lang_col, url_col)

        list(self._pool.map(w, self._shards))


class IndexSearcher:
    """Driver-side query API over all shards (local or Ray-actor execution).

    ``shard_group_size`` (with ``remote=True``) serves shards through
    :class:`ShardGroupSearcher` actors — ceil(S/K) actors instead of S, each
    answering for its K shards in one message.  Identical results (the
    per-shard merge algebra is associative); fan-out breadth drops K×."""

    def __init__(
        self,
        index_dir: str,
        *,
        remote: bool = False,
        lang_col: str | None = "lang",
        url_col: str | None = "url",
        shard_group_size: int = 1,
    ):
        self.index_dir = index_dir
        self.manifest: IndexManifest = load_manifest(index_dir)
        self._files = self.manifest.shard_files(index_dir)
        # roll forward a doc-store compaction interrupted mid-swap (two
        # isdir checks when healthy — see index/compact.py)
        from ..index.compact import recover_docstore

        recover_docstore(index_dir)
        self._docstore = os.path.join(index_dir, DOCSTORE_DIR)
        self.lang_col = lang_col
        self.url_col = url_col
        self._remote = remote
        self._searchers: dict[int, object] = {}
        self._docstore_ds = None  # cached docstore row-group index (metadata scan is costly per query)
        self._kv = None  # KV doc store: None = not probed, False = absent/stale
        self._matcher: VocabMatcher | None = None  # local-mode cached union matcher
        # identical-query result cache (daemon result-cache analog,
        # reference fts_index_cache.py / <10ms repeated-query target)
        self._result_cache: dict[tuple, list[dict]] = {}
        self._result_cache_max = 256
        # per-branch hidden-doc folds, keyed (branch, visibility op count)
        self._vis_cache: dict[tuple[str, int], frozenset[int]] = {}
        # decoded doc-store row groups, LRU-bounded: Zipf workloads hit the
        # same hot documents' row groups over and over (block-cache analog
        # of Tantivy's store cache)
        self._rg_cache: dict[tuple[str, int], pa.Table] = {}
        self._rg_cache_max = 256
        if shard_group_size < 1:
            raise ValueError("shard_group_size must be >= 1")
        self._group_size = int(shard_group_size)
        self._group_actors_cache: list | None = None
        if remote:
            import ray

            self._actor_cls = ray.remote(num_cpus=1)(ShardSearcher)
            if self._group_size > 1:
                self._group_cls = ray.remote(num_cpus=1)(ShardGroupSearcher)
            # actor starvation is a silent hang: each serving actor reserves
            # one CPU, so more actors than cluster CPUs never schedules
            try:
                cpus = int(ray.cluster_resources().get("CPU", 0))
            except Exception:
                cpus = 0
            n_actors = -(-len(self._files) // max(self._group_size, 1))
            if cpus and n_actors > cpus:
                import warnings

                warnings.warn(
                    f"IndexSearcher(remote=True) plans {n_actors} serving "
                    f"actors (num_cpus=1 each) but the cluster has {cpus} "
                    "CPUs — actor creation will block; raise "
                    "shard_group_size to fit",
                    RuntimeWarning,
                    stacklevel=2,
                )

    def _searcher(self, shard: int):
        s = self._searchers.get(shard)
        if s is None:
            if self._remote:
                s = self._actor_cls.remote(shard, self._files[shard], self._docstore, self.manifest.num_buckets)
            else:
                s = ShardSearcher(shard, self._files[shard], self._docstore, self.manifest.num_buckets)
            self._searchers[shard] = s
        return s

    def _prefetch_searchers(self, shards: list[int]) -> None:
        """Build missing local shard searchers on a thread pool — segment
        parquet reads + vocab sorts release the GIL, so a 16-shard cold start
        costs ~1 shard's load time instead of 16."""
        missing = [s for s in shards if s not in self._searchers]
        if len(missing) > 1:
            from concurrent.futures import ThreadPoolExecutor

            def build(s: int) -> ShardSearcher:
                se = ShardSearcher(s, self._files[s], self._docstore, self.manifest.num_buckets)
                # preload doc metadata too — Arrow reads release the GIL
                se._load_meta(self.lang_col, self.url_col)
                return se

            with ThreadPoolExecutor(max_workers=min(16, len(missing))) as ex:
                built = list(ex.map(build, missing))
            for s, se in zip(missing, built):
                self._searchers[s] = se

    def _group_shards(self) -> list[list[int]]:
        shards = sorted(self._files)
        k = self._group_size
        return [shards[i : i + k] for i in range(0, len(shards), k)]

    def _group_actor_list(self) -> list:
        if self._group_actors_cache is None:
            self._group_actors_cache = [
                self._group_cls.remote(
                    g, {s: list(self._files[s]) for s in g}, self._docstore,
                    self.manifest.num_buckets,
                )
                for g in self._group_shards()
            ]
        return self._group_actors_cache

    def _fanout(self, method: str, /, *args, shards: list[int] | None = None, **kwargs) -> list:
        """Fan ``method`` out; ``shards`` restricts the set (term routing:
        a shard whose df is 0 for every query term cannot contribute — the
        df fan-out already knows which shards answered, so the expensive second
        fan-out skips the rest entirely)."""
        all_shards = sorted(self._files)
        shards = all_shards if shards is None else sorted(shards)
        if self._remote:
            import ray

            if self._group_size > 1:
                want = set(shards)
                refs = []
                for g, gshards in zip(self._group_actor_list(), self._group_shards()):
                    sub = [s for s in gshards if s in want]
                    if sub:
                        refs.append(g.fanout.remote(method, *args, shards=sub, **kwargs))
                return [r for sub_ in ray.get(refs) for r in sub_]
            refs = [getattr(self._searcher(s), method).remote(*args, **kwargs) for s in shards]
            return ray.get(refs)
        self._prefetch_searchers(shards)
        return [getattr(self._searcher(s), method)(*args, **kwargs) for s in shards]

    # ---- query assembly ----
    def warm(self) -> None:
        """Instantiate every shard searcher AND load all bucket segments —
        the daemon cache-warm step; optional, queries lazy-load otherwise."""
        shards = sorted(self._files)
        if self._remote:
            import ray

            if self._group_size > 1:
                ray.get([
                    g.warm_buckets.remote(self.lang_col, self.url_col)
                    for g in self._group_actor_list()
                ])
                return
            ray.get(
                [
                    self._searcher(s).warm_buckets.remote(self.lang_col, self.url_col)
                    for s in shards
                ]
            )
        else:
            from concurrent.futures import ThreadPoolExecutor

            self._prefetch_searchers(shards)
            with ThreadPoolExecutor(max_workers=min(16, max(1, len(shards)))) as ex:
                list(
                    ex.map(
                        lambda s: self._searcher(s).warm_buckets(
                            self.lang_col, self.url_col
                        ),
                        shards,
                    )
                )

    def matcher(self) -> VocabMatcher:
        """Local-mode union matcher, cached.  In LOCAL mode the process
        already holds every shard's segment table, so the deduplicated union
        vocabulary (Zipf: each term recurs in ~every shard) adds no
        asymptotic memory and makes one DP scan serve all shards — measured
        3.5× faster than 16 overlapping per-shard scans.  At web scale local
        mode is not the deployment path: ``remote=True`` keeps dictionaries
        inside shard actors and expands shard-locally in parallel."""
        if self._matcher is None:
            # Arrow-side union: concat the shards' (already sorted) term
            # dictionaries, unique + sort in C++, convert ONCE at the deduped
            # size (~|vocab|) instead of 16 per-shard Python materializations
            arrs = [
                a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                for a in self._fanout("terms_arrow")
            ]
            u = pc.unique(pa.concat_arrays(arrs))
            u = u.take(pc.array_sort_indices(u))
            self._matcher = VocabMatcher(u.to_pylist())
        return self._matcher

    def expand_terms(self, kind: str, pattern: str, distance: int = 0) -> list[str]:
        if self._remote:
            # actor mode (the scale path): expansion stays shard-local — the
            # term dictionary never ships to the driver; only matches union
            return sorted(
                {t for terms in self._fanout("expand", kind, pattern, distance) for t in terms}
            )
        if kind == "fuzzy":
            return sorted(self.matcher().fuzzy(pattern, distance))
        if kind == "prefix":
            return sorted(self.matcher().prefix(pattern))
        return sorted(self.matcher().regex(pattern))

    def suggest(self, word: str, max_distance: int = 2) -> dict | None:
        """Spell suggestion ("did you mean"): the vocabulary term closest to
        ``word`` by PLAIN Levenshtein distance (≤ ``max_distance``), ties
        broken by corpus df (desc) then term (asc) — the Lucene
        DirectSpellChecker policy shape.  Scale: candidates are computed
        shard-locally (remote mode) and only (term, distance) pairs plus one
        df fanout cross to the driver; never the dictionary."""
        w = word.lower()
        if self._remote:
            cands: dict[str, int] = {}
            for local in self._fanout("suggest_candidates", w, max_distance):
                for t, d in local:
                    cands[t] = int(d)
        else:
            cands = {t: d for t, d in self.matcher().within_distance_plain(w, max_distance)}
        if not cands:
            return None
        dfs = self._global_df(sorted(cands))
        best = min(cands, key=lambda t: (cands[t], -dfs[t], t))
        return {"term": best, "distance": cands[best], "df": dfs[best]}

    def search_autocorrect(
        self, query_text: str, *, limit: int = 10, max_distance: int = 2, **kwargs
    ) -> tuple[list[dict], dict[str, str]]:
        """Search with did-you-mean fallback (the ES suggest-on-zero-results
        pattern): any query word ABSENT from the vocabulary is replaced by
        its best spell suggestion (plain-Levenshtein ≤ max_distance, df-desc
        / term-asc ties) before the normal AND search runs.  Returns
        (results, corrections); words already in the vocabulary are never
        rewritten, and an uncorrectable word keeps AND-zero semantics."""
        self._require_plain_index("search_autocorrect")
        words = tokenize_query(query_text)
        if not words:
            return [], {}
        dfs = self._global_df(sorted(dict.fromkeys(words)))
        corrections: dict[str, str] = {}
        fixed: list[str] = []
        for w in words:
            if dfs[w] == 0:
                sug = self.suggest(w, max_distance=max_distance)
                if sug is not None:
                    corrections[w] = sug["term"]
                    fixed.append(sug["term"])
                    continue
            fixed.append(w)
        kwargs.setdefault("snippet_lines", 0)
        res = self.search(" ".join(fixed), limit=limit, **kwargs)
        return res, corrections

    def _build_groups(
        self, query_text: str, edit_distance: int, use_regex: bool,
        match_any: bool = False, prefix: bool = False,
    ) -> list[list[str]] | None:
        """None → a word matched no term anywhere (AND → zero results).

        ``match_any=True`` is the OR (Tantivy BooleanQuery should-clause /
        query-parser OR-default) form: every token lands in ONE union group,
        a document matches if it contains ANY token, and its score is the
        BM25 sum over the tokens it contains.  A word with no vocabulary
        match simply drops out (it cannot zero the whole query as in AND)."""
        if prefix:
            # PrefixQuery semantics: every whitespace word is a prefix, the
            # expansion is one OR group per word (AND across words, OR across
            # a word's expansions — exactly the fuzzy-group shape)
            groups = []
            for word in query_text.split():
                matched = self.expand_terms("prefix", word.lower())
                if not matched:
                    if match_any:
                        continue
                    return None
                groups.append(matched)
            if match_any and groups:
                return [sorted({t for g in groups for t in g})]
            return groups or None
        if use_regex:
            try:
                re.compile(query_text)
            except re.error as e:
                # reference wraps regex compile errors (tantivy_index_manager.py:502-505)
                raise ValueError(f"Invalid regex pattern '{query_text}': {e}") from e
            matched = self.expand_terms("regex", query_text)
            return [matched] if matched else None
        if edit_distance > 0:
            # Parity divergences vs the reference, both deliberate:
            # 1. We lowercase the query word before OSA expansion; the
            #    reference passes the RAW term to Tantivy's fuzzy_term_query
            #    (tantivy_index_manager.py:347-374), so an uppercase query
            #    there burns edit budget on case. Ours returns a superset of
            #    the reference's matches for cased input.
            # 2. A punctuated word ('foo.bar') splits into AND-of-tokens here;
            #    the reference's parse_query builds a position-based phrase
            #    query (adjacency). The DEFAULT index stores no positions, so
            #    AND is the documented default; indexes built with
            #    index_positions=True match the reference's adjacency via
            #    search(..., phrase=True).
            groups = []
            for word in query_text.split():
                matched = self.expand_terms("fuzzy", word.lower(), edit_distance)
                if not matched:
                    if match_any:
                        continue  # OR: an unmatched word drops, doesn't zero
                    return None
                groups.append(matched)
            if match_any and groups:
                return [sorted({t for g in groups for t in g})]
            return groups or None
        tokens = tokenize_query(query_text)
        if not tokens:
            return None
        if match_any:
            return [sorted(dict.fromkeys(tokens))]
        return [[t] for t in tokens]

    def _require_plain_index(self, method: str) -> None:
        """Every query path that analyzes user text into PLAIN terms must
        refuse a fields= index — its dictionary holds only field-prefixed
        keys, so a plain term would silently match nothing (the guard search()
        grew in round 3, applied at every tokenizing entry point)."""
        if self.manifest.fields:
            raise ValueError(
                f"{method} takes plain terms but this index was built with "
                "fields= — query it with search_multifield(query, weights)"
            )

    def _global_df(self, terms: list[str]) -> dict[str, int]:
        return self._global_df_routed(terms)[0]

    def _global_df_routed(self, terms: list[str]) -> tuple[dict[str, int], list[int]]:
        """(global df per term, ACTIVE shard list).  A shard reporting df=0
        for every requested term cannot produce a candidate (MUST/OR/SHOULD
        candidates all come from these postings), so the expensive search
        fan-out afterwards is term-ROUTED to the active subset — for tail
        queries at web scale that is a handful of shards, not 57k."""
        out: dict[str, int] = {t: 0 for t in terms}
        active: list[int] = []
        all_shards = sorted(self._files)
        for shard, local in zip(all_shards, self._fanout("df_of", terms)):
            if local:
                active.append(shard)
            for t, df in local.items():
                out[t] += df
        return out, active

    def _global_stats(self, terms: list[str]) -> dict[str, tuple[int, int]]:
        """term → (corpus df, corpus cf) by summing per-shard metadata."""
        out: dict[str, list[int]] = {t: [0, 0] for t in terms}
        for local in self._fanout("stats_of", terms):
            for t, (df, cf) in local.items():
                out[t][0] += df
                out[t][1] += cf
        return {t: (v[0], v[1]) for t, v in out.items()}

    def search_near(
        self,
        query_text: str,
        *,
        window: int = 5,
        limit: int = 10,
        languages: list[str] | None = None,
    ) -> list[dict]:
        """Unordered two-term proximity search (SpanNearQuery inOrder=false):
        both terms within ``window`` positions in either order, BM25-sum
        ranked.  ``limit=0`` returns every match."""
        self._require_plain_index("search_near")
        tokens = tokenize_query(query_text)
        if len(tokens) != 2:
            raise ValueError("near queries take exactly two terms")
        global_df = self._global_df(sorted(dict.fromkeys(tokens)))
        if any(v == 0 for v in global_df.values()):
            return []
        m = limit if limit > 0 else UNLIMITED_LIMIT
        locs = self._fanout(
            "search_near",
            tokens,
            int(window),
            self.manifest.num_docs,
            self.manifest.avgdl,
            global_df,
            m,
            languages,
            self.lang_col,
            self.url_col,
        )
        rows = [r for loc in locs for r in loc]
        rows.sort(key=lambda r: (-round(r[1], 9), r[0]))
        rows = rows[: limit or None]
        return [
            {"doc_id": int(d), "score": float(s), "language": lg, "path": u}
            for d, s, lg, u in rows
        ]

    def search_lm(
        self,
        query_text: str,
        *,
        mu: float = bm25.MU,
        limit: int = 10,
        languages: list[str] | None = None,
        snippet_lines: int = 0,
    ) -> list[dict]:
        """Ranked retrieval under the Dirichlet-smoothed query-likelihood
        language model (Zhai & Lafferty 2001; Lucene LMDirichletSimilarity up
        to a doc-independent constant — ranking identical) instead of BM25:
        the pluggable-Similarity surface.  AND semantics; dl is the same
        quantized fieldnorm; per-term collection frequency comes from segment
        metadata (one stats fanout), |C| from the manifest.  ``limit=0``
        returns every match (reference O1 semantics)."""
        self._require_plain_index("search_lm")
        if snippet_lines:
            raise ValueError("search_lm returns ranked ids; snippets unsupported")
        tokens = tokenize_query(query_text)
        if not tokens:
            return []
        terms = sorted(dict.fromkeys(tokens))
        stats = self._global_stats(terms)
        if any(stats[t][0] == 0 for t in terms):
            return []  # AND semantics with an unseen term
        cf_map = {t: s[1] for t, s in stats.items()}
        total = self.manifest.total_tokens
        m = limit if limit > 0 else UNLIMITED_LIMIT
        locs = self._fanout(
            "search_lm", terms, cf_map, total, mu, m, languages, self.lang_col, self.url_col
        )
        rows = [r for loc in locs for r in loc]
        rows.sort(key=lambda r: (-round(r[1], 9), r[0]))
        rows = rows[: limit or None]
        return [
            {"doc_id": int(d), "score": float(s), "language": lg, "path": u}
            for d, s, lg, u in rows
        ]

    def facets(
        self,
        query_text: str,
        *,
        edit_distance: int = 0,
        use_regex: bool = False,
        match_any: bool = False,
        exclude_terms: list[str] | None = None,
    ) -> dict[str, int]:
        """Language facet counts over ALL documents matching the query
        (FacetCollector analog): {lang: n_matching_docs}, exact, computed
        shard-locally — each shard ships only its small count map and the
        driver sums them.  Composes with fuzzy/regex/OR/MustNot exactly like
        :meth:`search`."""
        if use_regex and edit_distance > 0:
            raise ValueError(
                "Cannot combine regex matching with fuzzy matching (edit_distance > 0)."
            )
        groups = self._build_groups(query_text, edit_distance, use_regex, match_any)
        if groups is None:
            return {}
        not_terms = (
            sorted(dict.fromkeys(tokenize_query(" ".join(exclude_terms))))
            if exclude_terms else None
        )
        out: dict[str, int] = {}
        for local in self._fanout("facet_counts", groups, self.lang_col, not_terms):
            for lang, n in local.items():
                out[lang] = out.get(lang, 0) + n
        return out

    def facets_domain(self, query_text: str, *, match_any: bool = False) -> dict[str, int]:
        """Domain (url prefix) match counts over ALL docs matching the query
        — a terms aggregation on a stored field.  Exact, shard-local counting
        with an O(#domains × #shards) driver merge."""
        groups = self._build_groups(query_text, 0, False, match_any)
        if groups is None:
            return {}
        out: dict[str, int] = {}
        for local in self._fanout(
            "facet_domain_counts", groups, self.lang_col, self.url_col
        ):
            for k, n in local.items():
                out[k] = out.get(k, 0) + n
        return out

    def search_by_field(self, query_text: str, *, limit: int = 10) -> list[dict]:
        """Matching docs ordered by the quantized document-length fast field
        (dl DESC, doc_id ASC) instead of relevance — Tantivy
        ``TopDocs::order_by_u64_field``.  Each shard returns its top-limit
        (doc_id, dl) pairs from the norm bytes already in the postings; the
        driver merges limit × n_shards rows."""
        self._require_plain_index("search_by_field")
        groups = self._build_groups(query_text, 0, False, False)
        if groups is None:
            return []
        m = limit if limit > 0 else UNLIMITED_LIMIT
        per_shard = self._fanout("match_norms", groups, m)
        rows = [r for sh in per_shard for r in sh]
        if not rows:
            return []
        ids = np.array([r[0] for r in rows], dtype=np.int64)
        dls = np.array([r[1] for r in rows], dtype=np.int64)
        sel = np.lexsort((ids, -dls))[:m]
        return [{"doc_id": int(ids[i]), "dl": int(dls[i])} for i in sel]

    def vocab_range(self, lo: str, hi: str, *, limit: int = 50) -> list[dict]:
        """Term-dictionary range scan: the first ``limit`` distinct terms in
        [lo, hi) with exact GLOBAL df.  Each shard ships its first ``limit``
        local (term, df) pairs (the global head is always inside that union);
        the driver merge-sums local dfs — payload O(limit × shards), never
        vocabulary-sized."""
        agg: dict[str, int] = {}
        for sh in self._fanout("vocab_range", lo, hi, limit):
            for t, df in sh:
                agg[t] = agg.get(t, 0) + df
        terms = sorted(agg)[:limit]
        return [{"term": t, "df": agg[t]} for t in terms]

    def search_dnf(
        self, clauses: list[str], *, limit: int = 10
    ) -> list[dict]:
        """OR-of-ANDs boolean search (disjunctive normal form — the Lucene
        BooleanQuery SHOULD-of-MUST-subqueries shape, e.g.
        ``(a AND b) OR (c AND d)``): a doc matches if ANY clause's terms all
        appear, and scores the SUM of the BM25 scores of its satisfied
        clauses (Lucene's should-clause sum).  Each clause evaluates through
        the normal per-shard AND machinery with NO per-shard cut — clause-sum
        scoring needs every clause hit (a top-m truncation would corrupt the
        HEAD of the ranking, not the tail) — and ships no stored fields; the
        driver folds per-doc clause scores, so payload is Σ per-clause match
        counts, the same as running the clauses separately at limit=0."""
        self._require_plain_index("search_dnf")
        parsed: list[list[str]] = []
        for c in clauses:
            toks = sorted(dict.fromkeys(tokenize_query(c)))
            if toks:
                parsed.append(toks)
        if not parsed:
            return []
        all_terms = sorted({t for c in parsed for t in c})
        global_df = self._global_df(all_terms)
        agg: dict[int, float] = {}
        for toks in parsed:
            if any(global_df[t] == 0 for t in toks):
                continue  # an AND clause with a dead term matches nothing
            groups = [[t] for t in toks]
            per_shard = self._fanout(
                "search_groups", groups, self.manifest.num_docs,
                self.manifest.avgdl, global_df, 1 << 62,
                None, None, None,
            )
            for sh in per_shard:
                for doc_id, score, _lang, _url in sh:
                    agg[doc_id] = agg.get(doc_id, 0.0) + score
        if not agg:
            return []
        ids = np.fromiter(agg.keys(), dtype=np.int64, count=len(agg))
        scores = np.fromiter(agg.values(), dtype=np.float64, count=len(agg))
        sel = np.lexsort((ids, -scores))[: limit or None]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]

    def search_synonyms(
        self, query_text: str, synonyms: dict[str, list[str]], *, limit: int = 10
    ) -> list[dict]:
        """Query-time synonym expansion (Lucene SynonymQuery): each query
        word becomes an OR group of itself plus its synonyms — AND across
        words, OR within a group, score = BM25 sum over the group members a
        doc contains (the engine's existing AND-of-OR-groups machinery; the
        synonym map is a driver-side constant, nothing is re-indexed).
        Groups must be disjoint (a term in two groups would double-count)."""
        self._require_plain_index("search_synonyms")
        words = tokenize_query(query_text)
        if not words:
            return []
        groups: list[list[str]] = []
        seen: set[str] = set()
        for w in dict.fromkeys(words):
            alts: list[str] = [w]
            for s in synonyms.get(w, []):
                toks = tokenize_query(s)
                if len(toks) != 1:
                    raise ValueError(f"synonym must analyze to one term: {s!r}")
                alts.append(toks[0])
            g = sorted(dict.fromkeys(alts))
            if seen & set(g):
                raise ValueError(f"synonym groups must be disjoint: {seen & set(g)}")
            seen |= set(g)
            groups.append(g)
        all_terms = sorted(seen)
        global_df = self._global_df(all_terms)
        if any(all(global_df[t] == 0 for t in g) for g in groups):
            return []
        m = limit if limit > 0 else UNLIMITED_LIMIT
        per_shard = self._fanout(
            "search_groups", groups, self.manifest.num_docs, self.manifest.avgdl,
            global_df, m, None, None, None,  # no stored fields shipped
        )
        hits = [h for sh in per_shard for h in sh]
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        sel = np.lexsort((ids, -scores))[:m]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]

    def complete(self, prefix: str, *, limit: int = 10, oversample: int = 8) -> list[dict]:
        """Completion suggester (Lucene/ES suggest): terms starting with
        ``prefix`` ranked by exact global df desc, term asc — EXACT, with a
        bounded payload.  Threshold (Fagin TA) merge: each shard ships only
        its local df-ranked top-(limit × oversample) slice plus the max local
        df of what it withheld; surviving candidates get exact global df from
        a second ``_global_df`` fan-out; any term NO shard shipped has global
        df ≤ Σ per-shard withheld bounds, so when the limit-th candidate's
        exact df strictly beats that bound the head is provably exact.
        Otherwise the slice doubles and retries — worst case (degenerate df
        ties across the whole slice) degrades to the old full-slice scan, but
        never silently drops a high-df term.  limit=0 keeps the exhaustive
        full-slice behavior by construction (c grows until nothing is
        withheld)."""
        self._require_plain_index("complete")
        hi = prefix + chr(0x10FFFF)
        want = limit if limit > 0 else UNLIMITED_LIMIT
        c = max(want * max(oversample, 1), 16) if limit > 0 else UNLIMITED_LIMIT
        while True:
            local_df: dict[str, int] = {}
            threshold = 0
            for sh, rest_max in self._fanout("vocab_topdf", prefix, hi, c):
                for t, df in sh:
                    local_df[t] = local_df.get(t, 0) + df
                threshold += rest_max
            if not local_df:
                return []
            if threshold == 0:
                # nothing withheld anywhere: local sums ARE exact global dfs
                rows = sorted(local_df.items(), key=lambda kv: (-kv[1], kv[0]))
                return [{"term": t, "df": df} for t, df in rows[: limit or None]]
            # resolve exact global df for the bounded candidate union
            cand = sorted(local_df)
            exact = self._global_df(cand)
            rows = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
            if len(rows) >= want and rows[want - 1][1] > threshold:
                return [{"term": t, "df": df} for t, df in rows[:want]]
            c *= 2  # a withheld term could still rank — widen and retry

    def mget(self, doc_ids: list[int]) -> list[dict]:
        """Stored-field multi-get (Elasticsearch mget / Tantivy doc-address
        fetch): (doc_id, lang, url, text) for each existing id — metadata
        rides the shard meta fan-out, text comes from metadata-pruned
        docstore row-group point reads.  Missing ids are silently absent."""
        ids = sorted(set(int(i) for i in doc_ids))
        meta: dict[int, tuple[str | None, str | None]] = {}
        for sh in self._fanout("meta_for_docs", ids, self.lang_col, self.url_col):
            for d, lang, url in sh:
                meta[d] = (lang, url)
        texts = self._fetch_texts([d for d in ids if d in meta])
        return [
            {
                "doc_id": d,
                "lang": meta[d][0],
                "url": meta[d][1],
                "text": texts.get(d, ""),
            }
            for d in ids
            if d in meta
        ]

    def stats_agg(self, query_text: str, *, match_any: bool = False) -> dict:
        """Stats aggregation over ALL matches (Elasticsearch stats agg on the
        quantized-length fast field): count / min / max / avg of dl.  Each
        shard ships a constant-size (n, Σ, min, max) partial."""
        self._require_plain_index("stats_agg")
        groups = self._build_groups(query_text, 0, False, match_any)
        if groups is None:
            return {"n_docs": 0, "dl_min": 0, "dl_max": 0, "dl_avg": 0.0}
        n = s = 0
        mn, mx = None, None
        for pn, ps, pmn, pmx in self._fanout("match_dl_stats", groups):
            if pn == 0:
                continue
            n += pn
            s += ps
            mn = pmn if mn is None else min(mn, pmn)
            mx = pmx if mx is None else max(mx, pmx)
        return {
            "n_docs": n,
            "dl_min": mn or 0,
            "dl_max": mx or 0,
            "dl_avg": (s / n) if n else 0.0,
        }

    def search_collapse_domain(self, query_text: str, *, limit: int = 10) -> list[dict]:
        """Field collapsing (Elasticsearch ``collapse``): the best hit per
        domain, ranked by that best score — at most one result per site.
        Shards ship one row per local domain; the driver folds per-domain
        bests by the pinned order and cuts the top-``limit`` domains."""
        self._require_plain_index("search_collapse_domain")
        groups = self._build_groups(query_text, 0, False, False)
        if groups is None:
            return []
        all_terms = sorted({t for g in groups for t in g})
        global_df = self._global_df(all_terms)
        if any(all(global_df[t] == 0 for t in g) for g in groups):
            return []
        best: dict[str, tuple[float, int]] = {}
        for sh in self._fanout(
            "collapse_best",
            groups,
            self.manifest.num_docs,
            self.manifest.avgdl,
            global_df,
            self.lang_col,
            self.url_col,
        ):
            for dom, doc, score in sh:
                cur = best.get(dom)
                key = (-round(score, 9), doc)
                if cur is None or key < (-round(cur[0], 9), cur[1]):
                    best[dom] = (score, doc)
        rows = sorted(
            ((dom, doc, score) for dom, (score, doc) in best.items()),
            key=lambda r: (-round(r[2], 9), r[1]),
        )[: limit or None]
        return [{"domain": d, "doc_id": i, "score": s} for d, i, s in rows]

    def search_dismax(
        self, query_text: str, *, tie: float = 0.1, limit: int = 10
    ) -> list[dict]:
        """Disjunction-max ranking (Lucene DisMaxQuery): docs containing ANY
        query term, scored max-per-term BM25 + tie × (sum of the others).
        Same fan-out shape as :meth:`search` — per-shard top-m, driver heap
        merge."""
        self._require_plain_index("search_dismax")
        if not (0.0 <= tie <= 1.0):
            raise ValueError(f"tie_breaker must be in [0, 1], got {tie}")
        terms = sorted(dict.fromkeys(tokenize_query(query_text)))
        if not terms:
            return []
        global_df = self._global_df(terms)
        terms = [t for t in terms if global_df[t] > 0]
        if not terms:
            return []
        m = limit if limit > 0 else UNLIMITED_LIMIT
        per_shard = self._fanout(
            "search_dismax",
            terms,
            self.manifest.num_docs,
            self.manifest.avgdl,
            global_df,
            m,
            float(tie),
        )
        hits = [h for sh in per_shard for h in sh]
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        sel = np.lexsort((ids, -scores))[:m]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]

    def search_multifield(
        self,
        query_text: str,
        weights: dict[str, float],
        *,
        limit: int = 10,
        combine: str = "sum",
    ) -> list[dict]:
        """Native multi-field search over a ``fields=`` build (the Lucene
        MultiFieldQueryParser shape; replaces the round-2 driver-composed
        per-(field, term) limit=0 probes).  A term matches in ANY weighted
        field (OR across fields), ALL query terms must match somewhere (AND
        across terms); score = Σ_field w_f · BM25_f with per-field df, avgdl
        and quantized lengths.  The per-field keys ride the ordinary
        AND-of-OR-groups shard machinery: per-key ``avgdl_map`` overrides +
        field weights as boosts — no new scoring path, no driver-side
        composition, per-shard payload is top-m rows like every other query.
        Reference field schema: ``tantivy_index_manager.py:96-115``.

        ``combine="bm25f"`` switches to TRUE BM25F (Robertson–Zaragoza simple
        variant): per term, field frequencies fold BEFORE saturation —
        tf̃ = Σ_f w_f·tf_f/(1−b+b·dl_f/avgdl_f), score = Σ_t idf_any(t) ·
        tf̃/(k1+tf̃) — with idf over docs containing the term in ANY field
        (one extra union-df fan-out resolves it exactly)."""
        from ..index.build import field_key

        if combine not in ("sum", "bm25f"):
            raise ValueError(f"combine must be 'sum' or 'bm25f', got {combine!r}")
        flds = self.manifest.fields
        if not flds:
            raise ValueError("search_multifield requires an index built with fields=")
        if not weights:
            raise ValueError("weights must name at least one field")
        unknown = set(weights) - set(flds)
        if unknown:
            raise ValueError(f"unknown fields: {sorted(unknown)}")
        if any(w <= 0 for w in weights.values()):
            raise ValueError("field weights must be > 0")
        words = list(dict.fromkeys(tokenize_query(query_text)))
        if not words:
            return []
        fnames = sorted(weights)
        groups = [[field_key(f, w) for f in fnames] for w in words]
        global_df = self._global_df([k for g in groups for k in g])
        if any(all(global_df[k] == 0 for k in g) for g in groups):
            return []
        boosts: dict[str, float] = {}
        avgdl_map: dict[str, float] = {}
        for f in fnames:
            f_avgdl = self.manifest.field_avgdl(f)
            for w in words:
                k = field_key(f, w)
                boosts[k] = float(weights[f])
                avgdl_map[k] = f_avgdl
        m = limit if limit > 0 else UNLIMITED_LIMIT
        if combine == "bm25f":
            n = self.manifest.num_docs
            df_any = np.sum(self._fanout("union_df", groups), axis=0)
            group_idf = [float(bm25.idf(int(d), n)) for d in df_any]
            per_shard = self._fanout(
                "search_bm25f", groups, boosts, avgdl_map, group_idf, m,
                bm25.K1, bm25.B,
            )
            hits2 = [h for sh in per_shard for h in sh]
            if not hits2:
                return []
            ids = np.array([h[0] for h in hits2], dtype=np.int64)
            scores = np.array([h[1] for h in hits2], dtype=np.float64)
            sel = np.lexsort((ids, -scores))[:m]
            return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]
        per_shard = self._fanout(
            "search_groups",
            groups,
            self.manifest.num_docs,
            self.manifest.avgdl,
            global_df,
            m,
            boosts=boosts,
            avgdl_map=avgdl_map,
        )
        hits = [h for sh in per_shard for h in sh]
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        sel = np.lexsort((ids, -scores))[:m]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]

    def search_fields(
        self,
        must: list[tuple[str, str, float]],
        should: list[tuple[str, str, float]] | None = None,
        *,
        limit: int = 10,
    ) -> list[dict]:
        """Per-clause field-scoped search over a ``fields=`` build — the
        Lucene classic-QueryParser ``field:term`` shape (``title:spark^2
        body:merge``), where each clause names ITS OWN field, unlike
        :meth:`search_multifield` which applies one term set across every
        weighted field.  Reference front-end: the tantivy ``parse_query``
        field prefixes (``tantivy_index_manager.py:330-420``).

        Semantics (Lucene BooleanQuery over per-field term queries):

        - each ``must`` clause is required (its own AND group); ``should``
          clauses never gate matching but add their contribution — with NO
          must clauses the should clauses form one OR group (default-OR
          queries: candidates = union, score = sum of matched clauses);
        - clause score = weight · BM25_field(term) with that field's own
          df, avgdl and quantized norms (per-key ``avgdl_map``, the same
          machinery as :meth:`search_multifield` combine="sum");
        - a clause term that analyzes to several tokens expands to one
          clause per token (same field/weight/occurrence);
        - duplicate (field, term) clauses combine by summing weights —
          identical to Lucene's duplicate clauses each contributing, since
          the score is linear in the boost.

        Per-shard payload is top-``limit`` rows; nothing corpus-sized
        reaches the driver."""
        from ..index.build import FIELD_SEP, field_key

        flds = self.manifest.fields
        if not flds:
            raise ValueError("search_fields requires an index built with fields=")

        def expand(clauses: list[tuple[str, str, float]]) -> list[tuple[str, float]]:
            keys: list[tuple[str, float]] = []
            for f, term, w in clauses:
                if f not in flds:
                    raise ValueError(f"unknown field {f!r} (index fields: {sorted(flds)})")
                if w <= 0:
                    raise ValueError("field-clause weights must be > 0")
                for tok in tokenize_query(term):
                    keys.append((field_key(f, tok), float(w)))
            return keys

        must_keys = expand(must)
        should_keys = expand(should or [])
        if not must_keys and not should_keys:
            return []

        boosts: dict[str, float] = {}
        for k, w in must_keys + should_keys:
            boosts[k] = boosts.get(k, 0.0) + w
        avgdl_map = {
            k: self.manifest.field_avgdl(k.split(FIELD_SEP, 1)[0]) for k in boosts
        }
        global_df = self._global_df(list(boosts))

        if must_keys:
            # duplicate clauses already folded into the summed boost — one
            # group (and one decode) per distinct key, or the contribution
            # would double-count; a should key that is also a must key is
            # likewise already fully weighted in boosts
            mkeys = list(dict.fromkeys(k for k, _ in must_keys))
            groups = [[k] for k in mkeys]
            if any(global_df[g[0]] == 0 for g in groups):
                return []
            mset = set(mkeys)
            extra_should = [
                k for k in dict.fromkeys(k for k, _ in should_keys) if k not in mset
            ] or None
        else:
            keys = list(dict.fromkeys(k for k, _ in should_keys))
            if all(global_df[k] == 0 for k in keys):
                return []
            groups = [keys]
            extra_should = None

        m = limit if limit > 0 else UNLIMITED_LIMIT
        per_shard = self._fanout(
            "search_groups",
            groups,
            self.manifest.num_docs,
            self.manifest.avgdl,
            global_df,
            m,
            should_terms=extra_should,
            boosts=boosts,
            avgdl_map=avgdl_map,
        )
        hits = [h for sh in per_shard for h in sh]
        if not hits:
            return []
        ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        sel = np.lexsort((ids, -scores))[:m]
        return [{"doc_id": int(ids[i]), "score": float(scores[i])} for i in sel]

    def explain(self, query_text: str, *, limit: int = 10, **kwargs) -> list[dict]:
        """Score breakdown for the top-``limit`` hits (Lucene ``explain``):
        one row per (hit, matched term) with the raw scoring inputs (tf, the
        quantized dl) and the term's BM25 contribution.  Costs one normal
        search plus one block-skip postings probe per term over just the k
        winning doc ids."""
        kwargs.setdefault("snippet_lines", 0)  # explanations need no snippets
        hits = self.search(query_text, limit=limit, **kwargs)
        if not hits:
            return []
        terms = sorted(dict.fromkeys(tokenize_query(query_text)))
        global_df = self._global_df(terms)
        rank_of = {h["doc_id"]: i + 1 for i, h in enumerate(hits)}
        doc_ids = list(rank_of)
        n, avgdl = self.manifest.num_docs, self.manifest.avgdl
        rows: list[dict] = []
        for local in self._fanout("term_postings_for_docs", terms, doc_ids):
            for t, entries in local.items():
                e = np.array(entries, dtype=np.int64).reshape(-1, 3)
                dl = id_to_fieldnorm(e[:, 2])
                contrib = bm25.term_score(e[:, 1], dl, global_df[t], n, avgdl)
                for (doc_id, tf, _nm), d, c in zip(e.tolist(), dl.tolist(), contrib.tolist()):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "rank": rank_of[int(doc_id)],
                            "term": t,
                            "tf": int(tf),
                            "dl": int(d),
                            "contrib": float(c),
                        }
                    )
        rows.sort(key=lambda r: (r["rank"], r["term"]))
        return rows

    def more_like_this(
        self,
        doc_id: int,
        *,
        max_terms: int = 10,
        limit: int = 10,
        snippet_lines: int = 0,
    ) -> list[dict]:
        """Similar-document search (Lucene MoreLikeThis analog): point-read
        the source doc's stored text, rank its terms by tf·idf (idf from the
        CORPUS df, one metadata fanout), keep the top ``max_terms``
        (round-9 score, term-asc tiebreak — pinned for determinism), then
        run a BM25 OR query over them with the source doc excluded.

        Scale shape: one stored-field point read + one df lookup fanout +
        one normal top-k search — nothing corpus-sized on the driver."""
        self._require_plain_index("more_like_this")
        content = self._fetch_texts([doc_id]).get(doc_id)
        if not content:
            return []
        from collections import Counter

        tf = Counter(tokenize_query(content))
        if not tf:
            return []
        dfs = self._global_df(sorted(tf))
        n = self.manifest.num_docs
        scored = [
            (t, round(c * float(bm25.idf(dfs[t], n)), 9))
            for t, c in tf.items()
            if dfs[t] > 0
        ]
        scored.sort(key=lambda x: (-x[1], x[0]))
        terms = [t for t, _ in scored[:max_terms]]
        if not terms:
            return []
        fetch = limit + 1 if limit > 0 else 0  # the source doc may rank
        res = self.search(
            " ".join(terms), match_any=True, limit=fetch, snippet_lines=snippet_lines
        )
        res = [r for r in res if r["doc_id"] != doc_id]
        return res[:limit] if limit > 0 else res

    # ---- the reference-shaped search ----
    def _visibility_gen(self) -> int:
        from ..index.visibility import op_count

        return op_count(self.index_dir)

    def _hidden_for(self, branch: str) -> frozenset[int] | None:
        """Folded hidden-doc set for ``branch`` (reference hidden_branches
        must-not filter, smart_indexer.py:2388) — cached per op-log length,
        None when nothing is hidden."""
        from ..index.visibility import hidden_ids, op_count

        key = (branch, op_count(self.index_dir))
        got = self._vis_cache.get(key)
        if got is None:
            got = frozenset(int(x) for x in hidden_ids(self.index_dir, branch))
            while len(self._vis_cache) >= 64:
                try:
                    self._vis_cache.pop(next(iter(self._vis_cache)))
                except (KeyError, RuntimeError, StopIteration):
                    break
            self._vis_cache[key] = got
        return got or None

    def search(
        self,
        query_text: str,
        case_sensitive: bool = False,
        edit_distance: int = 0,
        snippet_lines: int = 5,
        limit: int = 10,
        languages: list[str] | None = None,
        path_filters: list[str] | None = None,
        exclude_paths: list[str] | None = None,
        exclude_languages: list[str] | None = None,
        use_regex: bool = False,
        phrase: bool = False,
        match_any: bool = False,
        exclude_terms: list[str] | None = None,
        offset: int = 0,
        prefix: bool = False,
        should_terms: list[str] | None = None,
        boosts: dict[str, float] | None = None,
        slop: int = 0,
        after: tuple[float, int] | None = None,
        branch: str | None = None,
        file_extensions: list[str] | None = None,
    ) -> list[dict]:
        """Cached entry point: identical repeated queries are served from the
        in-memory result cache (daemon result-cache analog)."""
        vis_gen = self._visibility_gen() if branch is not None else -1
        cache_key = (
            query_text, case_sensitive, edit_distance, snippet_lines, limit,
            tuple(languages or ()), tuple(path_filters or ()),
            tuple(exclude_paths or ()), tuple(exclude_languages or ()), use_regex,
            phrase, match_any, tuple(exclude_terms or ()), offset, prefix,
            tuple(should_terms or ()), tuple(sorted((boosts or {}).items())),
            slop, after, branch, vis_gen, tuple(file_extensions or ()),
        )
        cached = self._result_cache.get(cache_key)
        if cached is not None:
            return [dict(r) for r in cached]
        results = self._search_uncached(
            query_text, case_sensitive, edit_distance, snippet_lines, limit,
            languages, path_filters, exclude_paths, exclude_languages, use_regex,
            phrase, match_any, exclude_terms, offset, prefix, should_terms,
            boosts, slop, after, branch, file_extensions,
        )
        while len(self._result_cache) >= self._result_cache_max:
            try:
                self._result_cache.pop(next(iter(self._result_cache)))
            except (KeyError, RuntimeError, StopIteration):
                break  # concurrent evictor (threaded actor) got there first
        self._result_cache[cache_key] = [dict(r) for r in results]
        return results

    def _search_uncached(
        self,
        query_text: str,
        case_sensitive: bool = False,
        edit_distance: int = 0,
        snippet_lines: int = 5,
        limit: int = 10,
        languages: list[str] | None = None,
        path_filters: list[str] | None = None,
        exclude_paths: list[str] | None = None,
        exclude_languages: list[str] | None = None,
        use_regex: bool = False,
        phrase: bool = False,
        match_any: bool = False,
        exclude_terms: list[str] | None = None,
        offset: int = 0,
        prefix: bool = False,
        should_terms: list[str] | None = None,
        boosts: dict[str, float] | None = None,
        slop: int = 0,
        after: tuple[float, int] | None = None,
        branch: str | None = None,
        file_extensions: list[str] | None = None,
    ) -> list[dict]:
        if self.manifest.fields:
            # a multi-field dictionary holds only field-prefixed keys; a
            # plain term would silently match nothing — fail loudly instead
            raise ValueError(
                "this index was built with fields= — query it with "
                "search_multifield(query, weights)"
            )
        if after is not None:
            if phrase:
                raise ValueError("search_after is not supported with phrase queries")
            if offset:
                raise ValueError("search_after and offset are alternative paging modes; pass one")
            after = (float(after[0]), int(after[1]))
        if slop and not phrase:
            raise ValueError("slop requires phrase=True")
        if not (0 <= slop <= 8):
            raise ValueError(f"slop must be 0-8, got {slop}")
        if offset < 0:
            raise ValueError(f"offset must be >= 0, got {offset}")
        if prefix and (use_regex or edit_distance > 0 or phrase):
            raise ValueError("prefix queries cannot combine with regex, fuzzy or phrase matching")
        if use_regex and edit_distance > 0:
            raise ValueError(
                "Cannot combine regex matching with fuzzy matching (edit_distance > 0)."
            )
        if phrase and (use_regex or edit_distance > 0):
            raise ValueError("phrase queries cannot combine with regex or fuzzy matching")
        if phrase and match_any:
            raise ValueError("phrase queries are adjacency-AND; match_any does not apply")
        if phrase and exclude_terms:
            raise ValueError("exclude_terms is not supported with phrase queries")
        if phrase and should_terms:
            raise ValueError("should_terms is not supported with phrase queries")
        if boosts:
            if phrase:
                raise ValueError("boosts are not supported with phrase queries")
            if any(v <= 0 for v in boosts.values()):
                raise ValueError("boost weights must be > 0")
            # normalize boost keys through the analyzer (index terms are lowercase)
            norm_boosts = {}
            for key, v in boosts.items():
                toks = tokenize_query(key)
                if len(toks) != 1:
                    raise ValueError(f"boost key must analyze to one term: {key!r}")
                norm_boosts[toks[0]] = float(v)
            boosts = norm_boosts
        if not (0 <= edit_distance <= 3):
            raise ValueError(f"edit_distance must be 0-3, got {edit_distance}")
        languages = languages or None
        path_filters = path_filters or None
        if file_extensions:
            # reference passes [".py", ".js"]; bare "py" is normalized
            file_extensions = [
                e if e.startswith(".") else f".{e}" for e in file_extensions
            ]
            if any(len(e) < 2 for e in file_extensions):
                raise ValueError("file_extensions entries must be non-empty")
        else:
            file_extensions = None
        hidden = self._hidden_for(branch) if branch is not None else None

        groups = self._build_groups(
            query_text, edit_distance, use_regex, match_any, prefix=prefix
        )
        if groups is None:
            return []
        not_terms = (
            sorted(dict.fromkeys(tokenize_query(" ".join(exclude_terms))))
            if exclude_terms else None
        )

        all_terms = sorted({t for g in groups for t in g})
        # SHOULD clause: optional scoring terms; duplicates of MUST terms are
        # dropped (the IN-set SQL/scoring model counts a term once)
        should_tokens = None
        if should_terms:
            should_tokens = [
                t
                for t in sorted(dict.fromkeys(tokenize_query(" ".join(should_terms))))
                if t not in set(all_terms)
            ] or None
        global_df, active_shards = self._global_df_routed(
            all_terms + (should_tokens or [])
        )
        if any(all(global_df[t] == 0 for t in g) for g in groups):
            return []

        if limit == 0:
            search_limit = UNLIMITED_LIMIT
            snippet_lines = 0
        else:
            needs_increased = bool(
                path_filters or exclude_paths or exclude_languages or hidden
                or file_extensions
            )
            depth = limit + offset  # pagination: rank depth includes skipped rows
            search_limit = depth * 3 if needs_increased else depth

        include_pre = languages if (languages and not exclude_languages) else None
        if phrase:
            per_shard = self._fanout(
                "search_phrase",
                [t for g in groups for t in g],
                self.manifest.num_docs,
                self.manifest.avgdl,
                global_df,
                search_limit,
                include_pre,
                self.lang_col,
                self.url_col,
                slop,
                shards=active_shards,
            )
        else:
            per_shard = self._fanout(
                "search_groups",
                groups,
                self.manifest.num_docs,
                self.manifest.avgdl,
                global_df,
                search_limit,
                include_pre,
                self.lang_col,
                self.url_col,
                not_terms,
                should_tokens,
                boosts,
                after,
                shards=active_shards,
            )
        hits = [h for sh in per_shard for h in sh]
        if not hits:
            return []
        doc_ids = np.array([h[0] for h in hits], dtype=np.int64)
        scores = np.array([h[1] for h in hits], dtype=np.float64)
        order = np.lexsort((doc_ids, -scores))[:search_limit]

        compiled = None
        if use_regex:
            flags = 0 if case_sensitive else re.IGNORECASE
            try:
                compiled = re.compile(query_text, flags)
            except re.error as e:
                raise ValueError(f"Invalid regex pattern '{query_text}': {e}") from e

        # post-filter precedence loop (reference :642-678) + early break at limit
        selected: list[tuple[int, float, str | None, str | None]] = []
        for i in order:
            doc_id, score, lang, url = hits[i]
            if hidden is not None and doc_id in hidden:
                continue
            if exclude_languages and lang in exclude_languages:
                continue
            if languages and lang not in languages:
                continue
            if exclude_paths and url is not None and matches_any(url, exclude_paths):
                continue
            if path_filters and url is not None and not matches_any(url, path_filters):
                continue
            if file_extensions and (
                url is None or not any(url.endswith(e) for e in file_extensions)
            ):
                continue
            selected.append((doc_id, score, lang, url))
            if limit > 0 and len(selected) >= limit + offset:
                break
        selected = selected[offset:]
        if limit > 0:
            selected = selected[:limit]
        if not selected:
            return []

        texts = self._fetch_texts([d for d, *_ in selected])
        results = []
        for doc_id, score, lang, url in selected:
            content = texts.get(doc_id, "")
            if compiled is not None:
                m = compiled.search(content)
                if m:
                    match_text, match_start = m.group(0), m.start()
                else:
                    match_text, match_start = query_text, -1
            else:
                match_start, match_text = locate_literal(content, query_text, case_sensitive)
                if match_start == -1 and edit_distance > 0:
                    match_start, match_text = locate_fuzzy(content, query_text, case_sensitive)
            if match_start >= 0:
                snippet, line, column, snippet_start_line = extract_snippet(
                    content, match_start, len(match_text), snippet_lines
                )
            else:
                snippet, line, column, snippet_start_line = "", 1, 1, 1
            results.append(
                {
                    "path": url,
                    "doc_id": doc_id,
                    "line": line,
                    "column": column,
                    "match_text": match_text,
                    "snippet": snippet if snippet_lines > 0 else "",
                    "snippet_start_line": snippet_start_line,
                    "language": lang or "unknown",
                    "score": score,
                }
            )
        return results

    def _docstore_index(self):
        """One-time metadata scan of the doc store: for every (file, row
        group), its doc_id min/max — the point-read index for stored fields.
        Metadata-only (no data pages read)."""
        if self._docstore_ds is None:
            import glob

            entries = []  # (min_id, max_id, path, row_group)
            for path in sorted(
                glob.glob(os.path.join(self._docstore, "**", "*.parquet"), recursive=True)
            ):
                md = pq.ParquetFile(path).metadata
                idx = md.schema.to_arrow_schema().get_field_index("doc_id")
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.has_min_max:
                        entries.append((int(st.min), int(st.max), path, rg))
            entries.sort()
            self._docstore_ds = entries
        return self._docstore_ds

    def _fetch_texts(self, doc_ids: list[int]) -> dict[int, str]:
        """Stored-field point fetch for the final hit set.  When a
        fingerprint-matched KV doc store exists (``index/kvstore.py`` —
        sorted-key blocks + sparse index, built by ``build_kv_docstore``),
        reads go through it: one bisect + one block decompress per hit
        cluster, no parquet footer/row-group machinery.  Otherwise the
        row-group point-read path below answers (docstore written in doc_id
        order, so a top-10 fetch reads a handful of row groups — the analog
        of Tantivy's block-compressed doc store lookups)."""
        if self._kv is not False:
            if self._kv is None:
                from ..index.kvstore import KVDocStore

                self._kv = KVDocStore.open_if_valid(self.index_dir, self.manifest) or False
            if self._kv is not False:
                return self._kv.fetch(doc_ids)
        entries = self._docstore_index()
        text_col = self.manifest.text_col
        ids = sorted(set(int(i) for i in doc_ids))
        mins = np.array([e[0] for e in entries], dtype=np.int64)
        need: dict[tuple[str, int], list[int]] = {}
        for i in ids:
            # candidate row group: the last entry with min <= id (ranges can
            # overlap across files; scan back while max >= id)
            j = int(np.searchsorted(mins, i, side="right")) - 1
            while j >= 0 and entries[j][1] >= i:
                need.setdefault((entries[j][2], entries[j][3]), []).append(i)
                if entries[j][0] <= i:
                    break
                j -= 1
        out: dict[int, str] = {}
        by_file: dict[str, list[tuple[int, list[int]]]] = {}
        for (path, rg), sub in need.items():
            by_file.setdefault(path, []).append((rg, sub))
        for path, groups in by_file.items():
            rgs = sorted({rg for rg, _ in groups})
            # Ray actor pools run the UDF on an internal thread pool, so two
            # queries can be in here concurrently: every cache interaction
            # must be a single atomic dict op with the value HELD locally —
            # a check-then-pop recency refresh raced a neighbor's eviction
            # into a KeyError (seen in the bench's parallel-qps stage)
            tabs = []
            f = None
            for rg in rgs:
                t = self._rg_cache.pop((path, rg), None)
                if t is None:
                    if f is None:
                        f = pq.ParquetFile(path)
                    t = f.read_row_groups([rg], columns=["doc_id", text_col])
                while len(self._rg_cache) >= self._rg_cache_max:
                    try:
                        self._rg_cache.pop(next(iter(self._rg_cache)))
                    except (KeyError, RuntimeError, StopIteration):
                        break  # concurrent evictor got there first
                self._rg_cache[(path, rg)] = t  # re-insert = most recent
                tabs.append(t)
            tbl = pa.concat_tables(tabs)
            want = {i for _, sub in groups for i in sub}
            mask = pc.is_in(tbl["doc_id"], value_set=pa.array(list(want), type=pa.int64()))
            sel = tbl.filter(mask)
            out.update(zip(sel["doc_id"].to_pylist(), sel[text_col].to_pylist()))
        return out
