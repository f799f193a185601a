"""Gitignore-style glob matching over paths/urls — query-side filter.

Behavioral port of the reference's ``PathPatternMatcher``
(``services/path_pattern_matcher.py:17-172``): separators normalized to
``/``, ``.``/``..`` resolved, ``*`` does not cross ``/``, ``**`` crosses
directories, and a pattern without ``/`` matches the basename at any depth
(gitignore semantics).  Patterns compile once and are cached; the data-plane
use translates the glob to a regex applied vectorized
(``pc.match_substring_regex``) when filtering whole columns.
"""

from __future__ import annotations

import re
from functools import lru_cache


def normalize_path(path: str) -> str:
    if not path:
        return ""
    p = path.replace("\\", "/")
    is_abs = p.startswith("/")
    parts: list[str] = []
    for part in p.split("/"):
        if part in ("", "."):
            continue
        if part == "..":
            if parts and parts[-1] != "..":
                parts.pop()
            else:
                parts.append(part)
        else:
            parts.append(part)
    out = "/".join(parts)
    if is_abs:
        out = "/" + out if out else "/"
    return out


@lru_cache(maxsize=1024)
def glob_to_regex(pattern: str) -> re.Pattern:
    """Translate a gitignore-style glob into an anchored regex."""
    i, n = 0, len(pattern)
    out = []
    while i < n:
        c = pattern[i]
        if c == "*":
            if pattern[i : i + 2] == "**":
                # '**/' or '**' crosses directory boundaries
                if pattern[i : i + 3] == "**/":
                    out.append("(?:[^/]+/)*")
                    i += 3
                else:
                    out.append(".*")
                    i += 2
            else:
                out.append("[^/]*")
                i += 1
        elif c == "?":
            out.append("[^/]")
            i += 1
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "!":
                j += 1
            if j < n and pattern[j] == "]":
                j += 1
            while j < n and pattern[j] != "]":
                j += 1
            if j >= n:
                out.append(re.escape(c))
                i += 1
            else:
                cls = pattern[i + 1 : j]
                if cls.startswith("!"):
                    cls = "^" + cls[1:]
                out.append(f"[{cls}]")
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return re.compile("".join(out) + r"\Z")


def matches_pattern(path: str, pattern: str) -> bool:
    norm = normalize_path(path)
    rx = glob_to_regex(pattern)
    if "/" not in pattern:
        # gitignore: a bare pattern matches the basename at any depth
        base = norm.rsplit("/", 1)[-1]
        return bool(rx.match(base)) or bool(rx.match(norm))
    return bool(rx.match(norm))


def matches_any(path: str, patterns) -> bool:
    return any(matches_pattern(path, p) for p in patterns)


def wildcard_to_regex(pattern: str) -> str:
    """Lucene/Tantivy WildcardQuery → anchored term regex: ``*`` matches any
    run, ``?`` one char, everything else literal.  The translated pattern
    feeds the existing regex term-expansion path (RE2 on both the engine and
    the DuckDB oracle side, so wildcard semantics are exact by construction)."""
    import re as _re

    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(_re.escape(ch))
    return "".join(out)
