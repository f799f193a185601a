"""Language ↔ file-extension mapping with user overrides (M4/M5 in SURVEY §2).

Behavioral twin of the reference's ``services/language_mapper.py:29-233`` +
``utils/yaml_utils.py:10-60`` (friendly-name → extensions, case-insensitive,
direct-extension pass-through, unknown pass-through, YAML override file) —
re-expressed for batch pipelines: the forward map answers query-side language
filters, the reverse map is a vectorized ``map_batches`` kernel that labels
rows by path extension.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: language → extensions, in priority order (first language listed for an
#: extension wins the reverse lookup).  Same table as the reference's
#: DEFAULT_LANGUAGE_MAPPINGS (yaml_utils.py:10-60).
DEFAULT_LANGUAGE_MAPPINGS: dict[str, tuple[str, ...]] = {
    "python": ("py", "pyw", "pyi"),
    "javascript": ("js", "jsx"),
    "typescript": ("ts", "tsx"),
    "java": ("java",),
    "csharp": ("cs",),
    "c": ("c", "h"),
    "cpp": ("cpp", "cc", "cxx", "c++"),
    "c++": ("cpp", "cc", "cxx", "c++"),  # alias
    "go": ("go",),
    "rust": ("rs",),
    "php": ("php",),
    "ruby": ("rb",),
    "swift": ("swift",),
    "kotlin": ("kt", "kts"),
    "scala": ("scala",),
    "dart": ("dart",),
    "html": ("html", "htm"),
    "css": ("css",),
    "vue": ("vue",),
    "markdown": ("md", "markdown"),
    "xml": ("xml",),
    "latex": ("tex", "latex"),
    "rst": ("rst",),
    "json": ("json",),
    "yaml": ("yaml", "yml"),
    "toml": ("toml",),
    "ini": ("ini",),
    "sql": ("sql",),
    "shell": ("sh", "bash"),
    "bash": ("sh", "bash"),  # alias
    "powershell": ("ps1", "psm1", "psd1"),
    "batch": ("bat", "cmd"),
    "dockerfile": ("dockerfile",),
    "makefile": ("makefile", "mk"),
}

#: extensionless well-known filenames → language (reference maps these by name)
SPECIAL_FILENAMES: dict[str, str] = {"dockerfile": "dockerfile", "makefile": "makefile"}


class LanguageMapper:
    """Friendly-name ↔ extension mapper with optional user overrides.

    ``overrides`` (dict ``{language: [ext, ...]}``) or ``yaml_path`` (a YAML
    file with the same shape — the reference's ``language-mappings.yaml``)
    replace/extend the defaults; later definitions win reverse-lookup
    priority over earlier ones only for extensions they newly claim.
    """

    def __init__(self, overrides: dict[str, list[str]] | None = None, yaml_path: str | None = None):
        mapping: dict[str, tuple[str, ...]] = dict(DEFAULT_LANGUAGE_MAPPINGS)
        if yaml_path and os.path.exists(yaml_path):
            import yaml

            with open(yaml_path) as f:
                loaded = yaml.safe_load(f) or {}
            for k, v in loaded.items():
                mapping[str(k).lower()] = tuple(str(e).lower() for e in v)
        if overrides:
            for k, v in overrides.items():
                mapping[str(k).lower()] = tuple(str(e).lower() for e in v)
        self._map = mapping
        # reverse: first claimant wins (stable priority = definition order)
        rev: dict[str, str] = {}
        for lang, exts in mapping.items():
            for e in exts:
                rev.setdefault(e, lang)
        self._rev = rev

    def get_extensions(self, language: str) -> set[str]:
        """python → {py, pyw, pyi}; direct ext → itself; unknown → itself."""
        key = language.lower()
        if key in self._map:
            return set(self._map[key])
        return {key}  # pass-through (reference language_mapper.py:178)

    def language_of_ext(self, ext: str) -> str:
        """py → python; unknown extension passes through unchanged."""
        key = ext.lower()
        return self._rev.get(key, key)

    def expand_languages(self, languages: list[str]) -> set[str]:
        """Query-filter expansion: names + all their extensions (the engine
        accepts a row if its lang/ext value falls in this set)."""
        out: set[str] = set()
        for lang in languages:
            out.add(lang.lower())
            out |= self.get_extensions(lang)
        return out


_EXT_RE = r"\.(?P<ext>[A-Za-z0-9+]+)$"


def detect_language_batch(
    batch: pa.Table,
    *,
    path_col: str = "path",
    out_col: str = "language",
    mapper: LanguageMapper | None = None,
) -> pa.Table:
    """Vectorized path → language labeling (``map_batches`` kernel).

    Extension extracted with one RE2 pass, mapped through the (tiny) reverse
    table on the batch's *unique* extensions; extensionless well-known names
    (Dockerfile, Makefile) resolve by basename.  Unknown extensions pass
    through lowercased; no extension → ``"unknown"``.
    """
    m = mapper or LanguageMapper()
    paths = batch[path_col]
    if isinstance(paths, pa.ChunkedArray):
        paths = paths.combine_chunks()
    ext = pc.struct_field(pc.extract_regex(paths, pattern=_EXT_RE), "ext")
    ext_low = pc.utf8_lower(pc.if_else(pc.is_valid(ext), ext, pa.scalar("", type=pa.string())))
    # basename for the special extensionless files
    base = pc.utf8_lower(pc.replace_substring_regex(paths, pattern=r"^.*/", replacement=""))

    dic = pc.dictionary_encode(ext_low)
    codes = dic.indices.to_numpy(zero_copy_only=False)
    uniq = dic.dictionary.to_pylist()
    lut = np.array(
        [m.language_of_ext(e) if e else "unknown" for e in uniq], dtype=object
    )
    langs = lut[codes]

    base_np = np.asarray(base.to_pylist(), dtype=object)
    for name, lang in SPECIAL_FILENAMES.items():
        langs = np.where(base_np == name, lang, langs)
    return batch.append_column(out_col, pa.array(langs.tolist(), type=pa.string()))
