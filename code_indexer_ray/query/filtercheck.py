"""Filter-conflict detection — reference
``services/filter_conflict_detector.py`` (same rules, same severities):

1. a language in BOTH include and exclude (case-insensitive) → error;
2. a path pattern in BOTH include and exclude (exact) → error;
3. include/exclude path patterns that overlap as substrings (after
   normalizing separators and stripping ``*``), where the exclusion is NOT
   more specific (more ``/`` components within the inclusion) → warning —
   a more-specific exclusion is the legitimate narrowing idiom;
4. ≥5 exclude-languages with no include filter → warning.

Pure driver-side validation (<ms); ``detect_conflicts`` returns the
conflict list, ``check_filters`` raises on errors (the CLI/HTTP guard).
"""

from __future__ import annotations

from dataclasses import dataclass, field

EXCESSIVE_EXCLUSION_THRESHOLD = 5


@dataclass
class FilterConflict:
    severity: str  # "error" | "warning"
    message: str
    affected_items: list[str] = field(default_factory=list)


def _norm(p: str) -> str:
    return p.replace("\\", "/").strip("*")


def _is_overlap(p1: str, p2: str) -> bool:
    a, b = _norm(p1), _norm(p2)
    return a in b or b in a


def _is_more_specific(p1: str, p2: str) -> bool:
    a, b = _norm(p1), _norm(p2)
    if b in a:
        return a.count("/") > b.count("/")
    return False


def detect_conflicts(
    include_languages: list[str] | None = None,
    exclude_languages: list[str] | None = None,
    include_paths: list[str] | None = None,
    exclude_paths: list[str] | None = None,
) -> list[FilterConflict]:
    inc_l = include_languages or []
    exc_l = exclude_languages or []
    inc_p = include_paths or []
    exc_p = exclude_paths or []
    out: list[FilterConflict] = []

    for lang in sorted({x.lower() for x in inc_l} & {x.lower() for x in exc_l}):
        out.append(
            FilterConflict(
                "error",
                f"Language '{lang}' is both included and excluded. "
                f"Exclusion will override inclusion, resulting in no {lang} files.",
                [lang],
            )
        )

    for path in sorted(set(inc_p) & set(exc_p)):
        out.append(
            FilterConflict(
                "error",
                f"Path pattern '{path}' is both included and excluded. "
                "This will exclude all matching files.",
                [path],
            )
        )

    for ip in inc_p:
        for ep in exc_p:
            if ip != ep and _is_overlap(ip, ep) and not _is_more_specific(ep, ip):
                out.append(
                    FilterConflict(
                        "warning",
                        f"Path inclusion '{ip}' may conflict with exclusion "
                        f"'{ep}'. Verify this produces expected results.",
                        [ip, ep],
                    )
                )

    if not inc_l and len(exc_l) >= EXCESSIVE_EXCLUSION_THRESHOLD:
        out.append(
            FilterConflict(
                "warning",
                f"Excluding {len(exc_l)} languages without any inclusion "
                "filters may result in unexpected results. Consider using "
                "include languages to specify what you want instead.",
                list(exc_l),
            )
        )
    return out


def check_filters(**kw) -> list[FilterConflict]:
    """Validate filters; raise ``ValueError`` listing every error-severity
    conflict (warnings are returned for the caller to surface)."""
    conflicts = detect_conflicts(**kw)
    errors = [c for c in conflicts if c.severity == "error"]
    if errors:
        raise ValueError("; ".join(c.message for c in errors))
    return [c for c in conflicts if c.severity == "warning"]
