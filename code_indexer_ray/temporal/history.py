"""Commit-history synthesis + the frozen change-row schema.

The reference walks real ``git log`` (``temporal_indexer.py:391-460``,
``--format=%H%x00%at%x00%an%x00%ae%x00%B%x00%P``) and indexes one document
per changed file per commit.  This sandbox has no git corpus, so the
history is DERIVED deterministically from the driver's ``documents`` table
in the data plane (one vectorized ``map_batches`` pass, same contract as
``pipelines/corpus.py``), and :func:`sql_changes_cte` reproduces the exact
synthesis in DuckDB so every temporal operator has an exact oracle twin.

Frozen synthesis spec (any change breaks the twins — bump both sides):

- versions per path: ``K = 2 + doc_id % 2`` (an ``added`` then 1-2
  ``modified`` edits); every ``doc_id % 13 == 5`` path gains a final
  ``deleted`` change (empty text).
- ``change_id = doc_id * 8 + v`` — globally unique, the index doc id.
- ``path = source || '/' || doc_id || '.txt'``.
- text at version v: v=0 → the document text; modified → text ``|| ' rev'
  || v`` (token count grows, and ``rev1``/``rev2`` are searchable markers);
  deleted → ``''``.
- ``day_idx = v * 3 + doc_id % 3`` — strictly increasing per path, so
  commit order == day order; days span 0..11.
- ``commit_day = 2025-03-01 + day_idx`` (date string), ``commit_ts =
  day_idx * 86400 + doc_id % 1000`` (int64 seconds since the repo epoch).
- ``author = AUTHORS[(doc_id + v) % 4]``, ``message = diff_type || ' ' ||
  path``.
- ``tkey = diff_type || '@' || commit_day`` — the composite stored filter
  key: a (diff-type, day) pre-limit filter is exactly the engine's
  include-languages filter over this column (small value set per query:
  |diff_types| × |days in range|), so temporal filtering needs no new
  engine machinery and stays exact BEFORE the limit cut.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

AUTHORS = ("alice", "bob", "carol", "dave")
DAY0 = np.datetime64("2025-03-01", "D")
MAX_VERSIONS = 8  # change_id stride; K never exceeds 4 (3 edits + delete)


def _day_str(day_idx: np.ndarray) -> list[str]:
    return np.datetime_as_string(DAY0 + day_idx.astype("timedelta64[D]"), unit="D").tolist()


def change_rows(batch: pa.Table) -> pa.Table:
    """map_batches kernel: documents rows → file-change rows (vectorized:
    one np.repeat fan-out per batch, no per-row Python loop on the text
    path)."""
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = 2 + (doc_ids % 2)  # modify-chain length per doc
    has_del = doc_ids % 13 == 5
    n_changes = k + has_del.astype(np.int64)

    idx = np.repeat(np.arange(len(doc_ids)), n_changes)  # batch row per change
    # version number within each doc: 0..n_changes-1
    starts = np.concatenate(([0], np.cumsum(n_changes)))[:-1]
    v = np.arange(int(n_changes.sum()), dtype=np.int64) - np.repeat(starts, n_changes)

    d = doc_ids[idx]
    is_del = v >= k[idx]  # the appended deletion change
    diff_type = np.where(v == 0, "added", np.where(is_del, "deleted", "modified"))
    day_idx = v * 3 + d % 3
    change_id = d * MAX_VERSIONS + v

    texts = batch["text"].to_pylist()
    out_text = [
        ""
        if dele
        else (texts[i] if vv == 0 else f"{texts[i]} rev{vv}")
        for i, vv, dele in zip(idx.tolist(), v.tolist(), is_del.tolist())
    ]
    sources = batch["source"].to_pylist()
    paths = [f"{sources[i]}/{doc}.txt" for i, doc in zip(idx.tolist(), d.tolist())]
    days = _day_str(day_idx)
    authors = [AUTHORS[a] for a in ((d + v) % 4).tolist()]
    dt_list = diff_type.tolist()
    return pa.table(
        {
            "change_id": pa.array(change_id, type=pa.int64()),
            "doc_id": pa.array(d, type=pa.int64()),
            "version": pa.array(v, type=pa.int64()),
            "path": pa.array(paths, type=pa.string()),
            "diff_type": pa.array(dt_list, type=pa.string()),
            "day_idx": pa.array(day_idx, type=pa.int64()),
            "commit_day": pa.array(days, type=pa.string()),
            "commit_ts": pa.array(day_idx * 86400 + d % 1000, type=pa.int64()),
            "author": pa.array(authors, type=pa.string()),
            "message": pa.array(
                [f"{t} {p}" for t, p in zip(dt_list, paths)], type=pa.string()
            ),
            "text": pa.array(out_text, type=pa.string()),
            "tkey": pa.array(
                [f"{t}@{dy}" for t, dy in zip(dt_list, days)], type=pa.string()
            ),
        }
    )


def sql_changes_cte(docs_table: str = "documents") -> str:
    """DuckDB CTE body named ``chg`` reproducing :func:`change_rows` exactly
    over the same documents table (the oracle side of every temporal twin)."""
    auth = "['alice','bob','carol','dave']"
    return (
        "vers AS (SELECT unnest(generate_series(0, 3)) AS v),\n"
        "chg AS (SELECT\n"
        "    d.doc_id * 8 + v.v AS change_id,\n"
        "    d.doc_id, v.v AS version,\n"
        "    d.source || '/' || d.doc_id || '.txt' AS path,\n"
        "    CASE WHEN v.v = 0 THEN 'added'\n"
        "         WHEN v.v >= 2 + d.doc_id % 2 THEN 'deleted'\n"
        "         ELSE 'modified' END AS diff_type,\n"
        "    (v.v * 3 + d.doc_id % 3)::BIGINT AS day_idx,\n"
        "    strftime(DATE '2025-03-01' + INTERVAL (v.v * 3 + d.doc_id % 3) DAY, '%Y-%m-%d') AS commit_day,\n"
        "    ((v.v * 3 + d.doc_id % 3) * 86400 + d.doc_id % 1000)::BIGINT AS commit_ts,\n"
        f"    {auth}[1 + (d.doc_id + v.v) % 4] AS author,\n"
        "    CASE WHEN v.v >= 2 + d.doc_id % 2 THEN ''\n"
        "         WHEN v.v = 0 THEN d.text\n"
        "         ELSE d.text || ' rev' || v.v END AS text\n"
        f"  FROM {docs_table} d, vers v\n"
        "  WHERE v.v < 2 + d.doc_id % 2 + CASE WHEN d.doc_id % 13 = 5 THEN 1 ELSE 0 END)"
    )
