"""Filter-conflict detection (query/filtercheck.py) — reference
services/filter_conflict_detector.py rule parity."""

from __future__ import annotations

import pytest

from code_indexer_ray.query.filtercheck import check_filters, detect_conflicts


def test_language_both_ways_is_error_case_insensitive():
    c = detect_conflicts(include_languages=["Python"], exclude_languages=["python"])
    assert [x.severity for x in c] == ["error"]
    assert c[0].affected_items == ["python"]


def test_exact_path_overlap_is_error():
    c = detect_conflicts(include_paths=["*/src/*"], exclude_paths=["*/src/*"])
    assert [x.severity for x in c] == ["error"]


def test_parent_child_paths():
    # exclusion MORE specific than inclusion = legitimate narrowing → clean
    assert detect_conflicts(
        include_paths=["*/src/*"], exclude_paths=["*/src/tests/*"]
    ) == []
    # exclusion LESS specific (swallows the inclusion) → warning
    c = detect_conflicts(include_paths=["*/src/tests/*"], exclude_paths=["*/src/*"])
    assert [x.severity for x in c] == ["warning"]


def test_over_exclusion_warning():
    c = detect_conflicts(exclude_languages=["a", "b", "c", "d", "e"])
    assert [x.severity for x in c] == ["warning"]
    # an include filter silences it
    assert detect_conflicts(
        include_languages=["rust"], exclude_languages=["a", "b", "c", "d", "e"]
    ) == []
    assert detect_conflicts(exclude_languages=["a", "b", "c", "d"]) == []


def test_check_filters_raises_on_error_returns_warnings():
    with pytest.raises(ValueError, match="both included and excluded"):
        check_filters(include_languages=["go"], exclude_languages=["go"])
    w = check_filters(exclude_languages=["a", "b", "c", "d", "e"])
    assert len(w) == 1 and w[0].severity == "warning"
    assert check_filters(include_languages=["go"]) == []
