"""Match location + snippet extraction — query-side, reference-exact semantics.

Reimplements (from observed behavior, not copied code) the reference's
result post-processing: literal/regex/fuzzy match location
(``tantivy_index_manager.py:680-752``, ``:782-858``) and char-offset →
(line, column) + ±N-line snippet extraction (``:860-911``).  These run on at
most the over-fetched hit set, so plain Python is fine here; the data plane
never calls them per document.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def locate_literal(content: str, query_text: str, case_sensitive: bool) -> tuple[int, str]:
    """Literal match with the reference's first-word fallback.

    Returns (match_start, match_text); match_start == -1 when not found.
    """
    match_text = query_text
    if case_sensitive:
        match_start = content.find(query_text)
    else:
        match_start = content.lower().find(query_text.lower())
    if match_start == -1:
        first_word = query_text.split()[0] if query_text.split() else ""
        if case_sensitive:
            match_start = content.find(first_word)
        else:
            match_start = content.lower().find(first_word.lower())
        if match_start != -1:
            match_text = first_word
    return match_start, match_text


def _best_window(search_content: str, content: str, needle: str) -> tuple[float, int, str]:
    """Best-ratio sliding window, result-identical to the naive double loop.

    Optimization (pure pruning, cannot change the winner): difflib's ratio is
    bounded above by 2·Σ_c min(count_needle[c], count_window[c]) / (|a|+|b|)
    (its own quick_ratio); the multiset intersection is maintained
    incrementally as the window slides, and the full SequenceMatcher runs only
    when the bound exceeds the current best.  Windows are visited in the same
    (size, position) order and ties keep the first best, exactly like the
    reference's loop.
    """
    from collections import Counter

    import numpy as np

    best_ratio, best_start, best_text = 0.0, -1, ""
    n = len(needle)
    N = len(search_content)
    min_w = max(1, int(n * 0.7))
    max_w = int(n * 1.3)
    need = Counter(needle)
    # only needle characters contribute to Σ min(need[c], win[c]) — all other
    # characters have need[c] = 0.  One prefix-sum per distinct needle char
    # (≤ |needle|) makes every window's bound a vectorized subtraction.
    arr = np.frombuffer(search_content.encode("utf-32-le"), dtype=np.uint32)
    prefix = {}
    for c in need:
        p = np.zeros(N + 1, dtype=np.int32)
        np.cumsum(arr == ord(c), out=p[1:])
        prefix[c] = p
    for w in range(min_w, max_w + 1):
        if N < w:
            continue
        denom = n + w
        common = np.zeros(N - w + 1, dtype=np.int32)
        for c, cnt_need in need.items():
            p = prefix[c]
            common += np.minimum(p[w:] - p[:-w], cnt_need)
        bounds = (2.0 / denom) * common
        # ascending positions, bound rechecked at evaluation time — identical
        # winner/ties to the sequential loop (best only ever increases)
        for i in np.flatnonzero(bounds > best_ratio):
            if bounds[i] <= best_ratio:
                continue
            ratio = SequenceMatcher(None, needle, search_content[i : i + w]).ratio()
            if ratio > best_ratio:
                best_ratio, best_start, best_text = ratio, int(i), content[i : i + w]
    return best_ratio, best_start, best_text


def locate_fuzzy(content: str, query_text: str, case_sensitive: bool = False) -> tuple[int, str]:
    """difflib sliding-window locator: windows 0.7–1.3× query length,
    similarity threshold 0.6, first-word fallback — the reference's
    ``_find_fuzzy_match`` contract."""
    search_content = content if case_sensitive else content.lower()
    search_query = query_text if case_sensitive else query_text.lower()
    words = search_query.split()
    if not words:
        return -1, ""
    ratio, start, text = _best_window(search_content, content, search_query)
    if ratio >= 0.6 and start >= 0:
        return start, text
    ratio2, start2, text2 = _best_window(search_content, content, words[0])
    # the reference carries the best ratio forward into the fallback scan
    if max(ratio, ratio2) >= 0.6:
        return (start2, text2) if ratio2 > ratio else (start, text)
    return -1, ""


def extract_snippet(
    content: str, match_start: int, match_len: int, snippet_lines: int
) -> tuple[str, int, int, int]:
    """(snippet, line, column, snippet_start_line); CHARACTER offsets, 1-based."""
    lines = content.split("\n")
    current_pos = 0
    line_number = 1
    column = 1
    for line_idx, line in enumerate(lines):
        line_len = len(line)
        if current_pos <= match_start < current_pos + line_len:
            line_number = line_idx + 1
            column = match_start - current_pos + 1
            break
        current_pos += line_len + 1
    if snippet_lines == 0:
        return "", line_number, column, line_number
    line_idx = line_number - 1
    start_line = max(0, line_idx - snippet_lines)
    end_line = min(len(lines), line_idx + snippet_lines + 1)
    snippet = "\n".join(lines[start_line:end_line])
    return snippet, line_number, column, start_line + 1
