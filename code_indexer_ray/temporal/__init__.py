"""Git-aware temporal indexing — the reference's ``services/temporal/``
surface (``temporal_indexer.py``: one doc per changed file per commit with
``commit_timestamp`` / ``diff_type`` / ``author_name`` payload fields;
``temporal_search_service.py:248-360``: date-range + diff-type + author
filtered search; ``temporal_diff_scanner.py``: per-commit changed-file
scan) recast Ray-Data-first.

Layout: the commit history is a plain Arrow table of file-change rows; the
index is TIME-BUCKETED — one sub-index per ``bucket_days`` window (the
Elasticsearch time-based-indices pattern), so a date-range query opens only
the buckets its range touches and the bucket list is the only driver-side
state (one row per window, never corpus-sized).
"""

from .history import (
    AUTHORS,
    DAY0,
    change_rows,
    sql_changes_cte,
)
from .index import append_changes, build_temporal_index
from .search import TemporalSearcher

__all__ = [
    "AUTHORS",
    "DAY0",
    "change_rows",
    "sql_changes_cte",
    "build_temporal_index",
    "append_changes",
    "TemporalSearcher",
]
