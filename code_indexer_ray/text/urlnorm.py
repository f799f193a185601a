"""URL canonicalization for webtext dedup keys (the C4 / Common-Crawl
pipeline normalizes URLs before URL-level dedup and blocklist filtering).

Deterministic, vectorized, RE2-only rule chain — pyarrow string kernels and
DuckDB ``regexp_replace``/``regexp_extract`` share RE2, so the SQL twin is
exact.  Rules, in FIXED order:

1. strip the fragment (``#...``),
2. strip ``utm_*`` tracking parameters (plus the ``?``→``&`` seam repair),
3. strip a trailing empty query (``?`` at end),
4. strip the scheme (``http://`` / ``https://``),
5. lowercase the host, drop a leading ``www.``,
6. strip trailing slashes from the path.

Stateless ``map_batches``; no shuffle, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_FRAGMENT = r"#.*$"
_UTM = r"[?&]utm_[A-Za-z]+=[^&#]*"
_SEAM = r"^([^?]*)&"          # first separator left as '&' after utm removal
_EMPTY_Q = r"\?$"
_SCHEME = r"^[Hh][Tt][Tt][Pp][Ss]?://"
_SPLIT = r"^(?P<host>[^/]*)(?P<rest>/.*)?$"
_WWW = r"^www\."
_TRAIL = r"/+$"


def canonicalize_batch(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Canonical key per URL (vectorized; see module docstring for rules)."""
    s = urls.combine_chunks() if isinstance(urls, pa.ChunkedArray) else urls
    s = pc.replace_substring_regex(s, _FRAGMENT, "")
    s = pc.replace_substring_regex(s, _UTM, "")
    s = pc.replace_substring_regex(s, _SEAM, r"\1?")
    s = pc.replace_substring_regex(s, _EMPTY_Q, "")
    s = pc.replace_substring_regex(s, _SCHEME, "")
    parts = pc.extract_regex(s, pattern=_SPLIT)
    host = pc.utf8_lower(pc.struct_field(parts, "host"))
    host = pc.replace_substring_regex(host, _WWW, "")
    rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
    rest = pc.replace_substring_regex(rest, _TRAIL, "")
    return pc.binary_join_element_wise(host, rest, "")


def sql_canonical_expr(col: str) -> str:
    """DuckDB expression computing the identical canonical key (same RE2
    patterns in the same order; submatch lowercasing via regexp_extract)."""
    s = col
    for pat, repl in ((_FRAGMENT, ""), (_UTM, ""), (_SEAM, r"\1?"), (_EMPTY_Q, ""), (_SCHEME, "")):
        # standard SQL single-quoted strings: backslashes (and the \1
        # backreference in the replacement) pass through literally
        p = pat.replace("'", "''")
        s = f"regexp_replace({s}, '{p}', '{repl}', 'g')"
    split = _SPLIT.replace("(?P<host>", "(").replace("(?P<rest>", "(")
    host = f"regexp_replace(lower(regexp_extract({s}, '{split}', 1)), '{_WWW}', '', 'g')"
    rest = f"regexp_replace(coalesce(regexp_extract({s}, '{split}', 2), ''), '{_TRAIL}', '', 'g')"
    return f"({host} || {rest})"
