"""Index integrity verification (the FTS-index analog of the reference's
``cidx fix-config`` doctor — ``services/config_fixer.py``'s
ConfigurationValidator/CollectionAnalyzer applied to this engine's on-disk
layout — and the sibling of the repo's own ``scip verify`` store check).

``verify_index`` never repairs; it reports.  Checks are layered:

shallow (default — metadata only, no segment decode):
  manifest        loads, supported version, positive counts
  partitions      every (shard, bucket) cell present exactly once, no
                  incomplete shards, each segment file exists with the
                  byte size its partition manifest recorded
  totals          Σ partition total_tokens == manifest total_tokens;
                  per-field token totals sum consistently when multi-field
  docstore        Σ parquet row counts == num_docs; doc_id row-group stats
                  within [0, doc_id_upper] (parquet METADATA only — no row
                  is read, so this stays O(files) at any corpus size)

deep (``deep=True`` — full decode, optionally sampled):
  dictionary      term strings sorted ascending + unique per segment
  postings        per term: varbyte doc-id decode is strictly increasing,
                  within range, length == df; tf decode length == df and
                  Σtf == cf; norms byte length == df
  block-max       skip metadata consistent with the decoded list:
                  ceil(df/128) blocks, last_docs == the real block-final
                  doc ids, max_tfs == the real block maxima

Returns ``{"valid", "errors", "warnings", "checks"}``; the ``verify`` CLI
prints it and exits 1 when invalid (same contract as ``scip verify``).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from .codec import BLOCK_SIZE, decode_doc_ids, decode_tfs
from .manifest import (
    DOCSTORE_DIR,
    load_manifest,
)

__all__ = ["verify_index"]


def _docstore_files(root: str) -> list[str]:
    base = os.path.join(root, DOCSTORE_DIR)
    out = []
    for dirpath, _dirnames, filenames in os.walk(base):
        for f in sorted(filenames):
            if f.endswith(".parquet"):
                out.append(os.path.join(dirpath, f))
    return out


def _check_segment_deep(path: str, doc_id_upper: int, errors: list[str]) -> int:
    """Full decode of one segment file; returns the number of terms."""
    t = pq.read_table(path)
    terms = t.column("term").to_pylist()
    if terms != sorted(terms):
        errors.append(f"{path}: term dictionary not sorted")
    if len(set(terms)) != len(terms):
        errors.append(f"{path}: duplicate terms in dictionary")
    df_col = t.column("df").to_pylist()
    cf_col = t.column("cf").to_pylist()
    docs_col = t.column("docs_enc").to_pylist()
    tfs_col = t.column("tfs_enc").to_pylist()
    norms_col = t.column("norms").to_pylist()
    last_col = t.column("last_docs").to_pylist()
    maxtf_col = t.column("max_tfs").to_pylist()
    for i, term in enumerate(terms):
        df = df_col[i]
        if df <= 0:
            errors.append(f"{path}: term {term!r} has df={df}")
            continue
        try:
            docs = decode_doc_ids(docs_col[i], df)
            tfs = decode_tfs(tfs_col[i], df)
        except Exception as e:
            errors.append(f"{path}: term {term!r} postings decode failed: {e}")
            continue
        if len(docs) != df or len(tfs) != df:
            errors.append(f"{path}: term {term!r} decoded length != df")
            continue
        if df > 1 and not np.all(np.diff(docs) > 0):
            errors.append(f"{path}: term {term!r} doc ids not strictly increasing")
        if docs[-1] > doc_id_upper or docs[0] < 0:
            errors.append(
                f"{path}: term {term!r} doc id out of range"
                f" [{docs[0]}, {docs[-1]}] vs upper {doc_id_upper}"
            )
        if int(tfs.sum()) != cf_col[i]:
            errors.append(f"{path}: term {term!r} Σtf={int(tfs.sum())} != cf={cf_col[i]}")
        if len(norms_col[i]) != df:
            errors.append(f"{path}: term {term!r} norms length != df")
        n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
        last_docs = np.frombuffer(last_col[i], dtype=np.uint64)
        max_tfs = np.frombuffer(maxtf_col[i], dtype=np.uint32)
        if len(last_docs) != n_blocks or len(max_tfs) != n_blocks:
            errors.append(f"{path}: term {term!r} block metadata count != ceil(df/128)")
            continue
        starts = np.arange(0, df, BLOCK_SIZE)
        ends = np.minimum(starts + BLOCK_SIZE - 1, df - 1)
        if not np.array_equal(last_docs.astype(np.int64), docs[ends]):
            errors.append(f"{path}: term {term!r} last_docs != block-final doc ids")
        real_max = np.maximum.reduceat(tfs.astype(np.uint32), starts)
        if not np.array_equal(max_tfs, real_max):
            errors.append(f"{path}: term {term!r} max_tfs != block maxima")
    return len(terms)


def verify_index(
    index_dir: str,
    *,
    deep: bool = False,
    deep_sample: int | None = None,
) -> dict:
    """Validate an index root; see the module docstring for the check list.

    ``deep_sample=N`` decodes only every Nth partition (deterministic by
    (shard, bucket) order) so deep verification stays affordable on large
    indexes; ``None`` decodes everything.
    """
    errors: list[str] = []
    warnings: list[str] = []
    checks: dict[str, object] = {}

    try:
        m = load_manifest(index_dir)
    except Exception as e:
        return {
            "valid": False,
            "errors": [f"manifest unreadable: {e}"],
            "warnings": [],
            "checks": {},
        }
    if m.num_docs <= 0:
        errors.append(f"manifest num_docs={m.num_docs}")
    checks["num_docs"] = m.num_docs

    # -- partitions: full grid, unique, files exist with recorded sizes --
    seen: set[tuple[int, int]] = set()
    total_tokens = 0
    n_parts = 0
    sampled_paths: list[str] = []
    shard_terms: dict[int, int] = {}
    for i, p in enumerate(m.iter_partitions(index_dir)):
        n_parts += 1
        key = (p["shard"], p["bucket"])
        if key in seen:
            errors.append(f"duplicate partition manifest for {key}")
        seen.add(key)
        total_tokens += p["total_tokens"]
        shard_terms[int(p["shard"])] = shard_terms.get(int(p["shard"]), 0) + int(
            p.get("n_terms", 0)
        )
        path = os.path.join(index_dir, p["path"])
        if not os.path.exists(path):
            errors.append(f"missing segment file {p['path']}")
        else:
            size = os.path.getsize(path)
            if size != p["n_bytes"]:
                errors.append(
                    f"segment {p['path']}: size {size} != recorded {p['n_bytes']}"
                )
            if deep and (deep_sample is None or i % deep_sample == 0):
                sampled_paths.append(path)
    expected = {
        (s, b) for s in range(m.num_shards) for b in range(m.num_buckets)
    }
    # missing cells are adjudicated AFTER the docstore pass: a shard whose
    # doc range holds no documents writes NO partition manifests (delta /
    # id-headroom builds have such shards by design), but a missing cell in
    # a shard the docstore proves NON-empty is a lost partition — the
    # docstore row-group id stats are the cross-check (ADVICE r3: a
    # zero-token partition loss must not pass shallow verify)
    missing_cells = expected - seen
    extra_cells = seen - expected
    if extra_cells:
        errors.append(f"unexpected partition cells: {sorted(extra_cells)[:8]}")
    checks["partitions"] = n_parts
    if total_tokens != m.total_tokens:
        errors.append(
            f"Σ partition total_tokens {total_tokens} != manifest {m.total_tokens}"
        )

    # -- docstore: metadata-only row counts + doc_id range --
    ds_files = _docstore_files(index_dir)
    if not ds_files:
        errors.append("docstore has no parquet files")
    rows = 0
    id_min, id_max = None, None
    rg_spans: list[tuple[int, int]] = []
    for f in ds_files:
        try:
            md = pq.ParquetFile(f).metadata
        except Exception as e:
            errors.append(f"docstore file unreadable: {os.path.basename(f)}: {e}")
            continue
        rows += md.num_rows
        idx = None
        for c in range(len(md.schema)):
            if md.schema.column(c).name == m.id_col:
                idx = c
                break
        if idx is None:
            errors.append(f"docstore {os.path.basename(f)} lacks id column {m.id_col!r}")
            continue
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                warnings.append(
                    f"docstore {os.path.basename(f)} row group {rg}: no id stats"
                )
                continue
            id_min = st.min if id_min is None else min(id_min, st.min)
            id_max = st.max if id_max is None else max(id_max, st.max)
            rg_spans.append((int(st.min), int(st.max)))
    if rows != m.num_docs:
        errors.append(f"docstore rows {rows} != manifest num_docs {m.num_docs}")
    if id_max is not None and id_max > m.doc_id_upper:
        errors.append(f"docstore max doc_id {id_max} > manifest upper {m.doc_id_upper}")
    if id_min is not None and id_min < 0:
        errors.append(f"docstore min doc_id {id_min} < 0")
    checks["docstore_rows"] = rows

    # -- missing-cell adjudication (needs the docstore row-group spans) --
    if missing_cells:
        from .build import shard_doc_range

        lost: list[tuple[int, int]] = []
        empty: list[tuple[int, int]] = []
        for cell in sorted(missing_cells):
            shard = cell[0]
            lo, hi = shard_doc_range(shard, m.num_shards, m.doc_id_upper)
            # range-overlap vs row-group stats: docstore files are written
            # per doc-range shard, so a span intersecting [lo, hi) means the
            # shard holds documents
            has_docs = any(smin < hi and smax >= lo for smin, smax in rg_spans)
            # a non-empty shard CAN legitimately lack a bucket when its
            # vocabulary is tiny (fewer terms than buckets): with T terms
            # hashed over B buckets, P(bucket empty) ≈ e^(-T/B), so require
            # T ≥ 8·B (P < 4e-4 per bucket) before a missing bucket counts
            # as a lost partition rather than a small-vocab artifact
            vocab_rich = shard_terms.get(shard, 0) >= 8 * m.num_buckets
            whole_shard_gone = shard_terms.get(shard) is None
            if has_docs and (whole_shard_gone or vocab_rich):
                lost.append(cell)
            else:
                empty.append(cell)
        if lost:
            errors.append(
                f"partition manifests missing for NON-empty shards (lost "
                f"partition): {lost[:8]} ({len(lost)} total)"
            )
        if empty:
            warnings.append(
                f"partition cells with no manifest (empty shard — legitimate "
                f"in delta/headroom builds): {empty[:8]} ({len(empty)} total)"
            )

    # -- deep decode --
    if deep:
        n_terms = 0
        for path in sampled_paths:
            try:
                n_terms += _check_segment_deep(path, m.doc_id_upper, errors)
            except Exception as e:
                errors.append(f"{path}: segment unreadable: {e}")
        checks["deep_segments"] = len(sampled_paths)
        checks["deep_terms"] = n_terms

    return {
        "valid": not errors,
        "errors": errors,
        "warnings": warnings,
        "checks": checks,
    }
