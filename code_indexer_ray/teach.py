"""AI-platform instruction installer — the ``teach-ai`` tier.

Reference parity: ``src/code_indexer/teach_ai_templates.py`` (template
loading + clean-overwrite skills install) and the ``teach-ai`` command in
``src/code_indexer/cli.py:5928`` (platform flags, project/global scope,
show-only preview, and the smart section-replacement update that preserves
the rest of an existing CLAUDE.md).

Differences from the reference, on purpose:

* Templates are embedded module constants describing THIS engine's CLI
  (``python -m code_indexer_ray ...``), not files shipped next to the
  package — no packaging-data lookup, and the content documents the Ray
  engine rather than the reference's container stack.
* Path resolution is a pure function (``target_path_for``) taking explicit
  ``cwd``/``home`` roots so the whole flow is testable without touching the
  real home directory.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

# --------------------------------------------------------------------------
# Templates.  The awareness section MUST start with the "## SEMANTIC SEARCH"
# heading — the smart updater finds and replaces exactly that section
# (reference cli.py:6253 section_pattern).
# --------------------------------------------------------------------------

AWARENESS_TEMPLATE = """\
## SEMANTIC SEARCH — CIDX-RAY FIRST

When a cidx-ray index exists for this checkout, prefer it over raw
grep/find for code exploration: it answers concept queries, exact-term
queries, symbol-graph questions and git-history questions from one set of
prebuilt Ray Data indexes.

Check for indexes first:

```bash
python -m code_indexer_ray stats --index .cidx/index        # FTS manifest
python -m code_indexer_ray scip status --store .cidx/scip   # symbol store
```

If they are missing, build them:

```bash
python -m code_indexer_ray ingest-tree --root . --out .cidx/index
python -m code_indexer_ray scip generate --root . --out .cidx/scip
```

### Capability map

| Need | Command |
|------|---------|
| Concept / natural-language search | `python -m code_indexer_ray search --index .cidx/index "QUERY" --semantic` |
| Exact identifiers (BM25 FTS) | `python -m code_indexer_ray search --index .cidx/index "name"` |
| Regex over the corpus | `python -m code_indexer_ray search --index .cidx/index "pat.*tern" --regex` |
| Where is a symbol defined | `python -m code_indexer_ray scip definition SYMBOL --store .cidx/scip` |
| All usages of a symbol | `python -m code_indexer_ray scip references SYMBOL --store .cidx/scip` |
| What a symbol calls / is called by | `python -m code_indexer_ray scip dependencies|dependents SYMBOL --store .cidx/scip` |
| Execution path A→B | `python -m code_indexer_ray scip callchain FROM TO --store .cidx/scip` |
| When was X added / changed | `python -m code_indexer_ray temporal search "X" --index .cidx/temporal` |
| File content at a past date | `python -m code_indexer_ray temporal file-at PATH DAY --index .cidx/temporal` |

Useful flags: `--limit N` (start small), `--lang X`, `--source GLOB`,
`--json` (machine-readable output).

For repeated queries in one session, start the warm daemon once —
`python -m code_indexer_ray daemon start --index .cidx/index` — and reuse
it; warm queries answer in milliseconds.

Full command reference: `~/.claude/skills/cidx-ray/SKILL.md`.
"""

_SKILL_MAIN = """\
# cidx-ray — distributed code index (Ray Data engine)

One CLI (`python -m code_indexer_ray`) over four index families built with
Ray Data: BM25 full-text, semantic/ANN vectors, SCIP symbol graphs, and a
temporal (git-history) index.

## Build

```bash
python -m code_indexer_ray ingest-tree --root REPO --out IDX   # discover + index a checkout
python -m code_indexer_ray sync --root REPO --index IDX        # incremental re-index
python -m code_indexer_ray scip generate --root REPO --out SCIP
python -m code_indexer_ray temporal build --changes CHANGES.parquet --out TIDX
```

## Query

```bash
python -m code_indexer_ray search --index IDX "tokens" --limit 10
python -m code_indexer_ray search --index IDX '"exact phrase"'
python -m code_indexer_ray search --index IDX "prefix.*" --regex
python -m code_indexer_ray search --index IDX "concept" --semantic   # vector + RRF hybrid
python -m code_indexer_ray suggest --index IDX "tokn"                # spelling / completion
```

Results carry path, score, line numbers and highlighted snippets; add
`--json` for machine parsing.

## Health

```bash
python -m code_indexer_ray verify --index IDX    # checksum + posting integrity
python -m code_indexer_ray doctor --index IDX    # diagnose + optionally --fix
python -m code_indexer_ray validate --root REPO --index IDX --recover
```

Detailed references: `reference/fts-search.md`, `reference/semantic-search.md`,
`reference/scip-intelligence.md`, `reference/temporal-search.md`.
"""

_SKILL_FTS = """\
# FTS search (BM25)

`python -m code_indexer_ray search --index IDX QUERY` runs BM25 top-k over
the sharded inverted index.

* Boolean: `foo AND bar`, `foo OR bar`, `NOT foo`, `+must -exclude`.
* Phrases: `'"error handler"'` (positions index), `--slop N` for near.
* Fuzzy: `--fuzzy` (edit-distance expansion), regex: `--regex`.
* Filters: `--lang python`, `--source 'src/**/*.py'`, `--ext .py`.
* `--limit 0` means the engine default (100000 cap), not zero rows.
* Facets: `--facet lang` aggregates counts before the limit.

Batch mode: `search --batch queries.txt` answers one query per line over a
single warm engine. The daemon (`daemon start/stop/status`) keeps the
engine resident between CLI calls.
"""

_SKILL_SEMANTIC = """\
# Semantic search

`search --semantic` embeds the query, probes the sharded ANN store (HNSW /
IVF), and fuses with BM25 via reciprocal-rank fusion.

* `--k N` nearest neighbours; `--semantic-only` skips the BM25 leg.
* Stores are built by `ingest-tree` when an embedding provider is
  configured; `ann status --store S` prints shard + recall metadata.
* Exact-mode twins (`--exact`) exist for verification; they are
  brute-force and small-corpus only.
"""

_SKILL_SCIP = """\
# SCIP symbol intelligence

`python -m code_indexer_ray scip ...` answers call-graph questions from a
persisted, hash-partitioned symbol store.

* `definition SYMBOL` — defining occurrence(s) with file:line.
* `references SYMBOL` — every usage (replaces grep-for-usages).
* `dependencies SYMBOL` / `dependents SYMBOL` — outbound / inbound edges.
* `impact SYMBOL` — transitive dependents (change blast radius).
* `callchain FROM TO` — concrete call paths.
* `multi` subcommand fans any of these across several repos' stores.

Symbols use fuzzy suffix matching: `Foo.bar`, `bar`, or the full SCIP
moniker all resolve.
"""

_SKILL_TEMPORAL = """\
# Temporal (git-history) search

`python -m code_indexer_ray temporal ...` queries a time-bucketed index of
commit changes.

* `search "X" --from DAY --to DAY` — BM25 over change docs in a range.
* `file-at PATH DAY` — file content as of end-of-day.
* `at-commit PATH CHANGE_ID` — content at an exact change.
* `history PATH` — the full change timeline of one path.
* `watch` — follow a live checkout and fold new commits in.
"""

SKILL_FILES: dict[str, str] = {
    "SKILL.md": _SKILL_MAIN,
    "reference/fts-search.md": _SKILL_FTS,
    "reference/semantic-search.md": _SKILL_SEMANTIC,
    "reference/scip-intelligence.md": _SKILL_SCIP,
    "reference/temporal-search.md": _SKILL_TEMPORAL,
}

PLATFORMS = ("claude", "codex", "gemini", "opencode", "q", "junie")

#: platforms whose conventions have no global config dir (reference
#: cli.py:6144 — gemini + junie refuse --global).
PROJECT_ONLY_PLATFORMS = frozenset({"gemini", "junie"})


def load_awareness_template(platform: str) -> str:
    """Awareness section for *platform*.

    One template serves all platforms (reference keeps the parameter for
    API compatibility and ignores it too); unknown names still get the
    template so previews never fail.
    """
    return AWARENESS_TEMPLATE


def install_skills(target_dir: str) -> list[str]:
    """Write the bundled skill files under *target_dir* (clean overwrite).

    Mirrors reference ``teach_ai_templates.install_skills``: an existing
    directory is removed first so deleted upstream files do not linger.
    Returns the installed paths relative to *target_dir*, sorted.
    """
    target = Path(target_dir)
    if target.exists():
        shutil.rmtree(target)
    installed: list[str] = []
    for rel, content in SKILL_FILES.items():
        dest = target / rel
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_text(content)
        installed.append(rel)
    return sorted(installed)


def target_path_for(
    platform: str, scope: str, cwd: str | Path, home: str | Path
) -> tuple[Path, str]:
    """(file path, human scope description) for a platform+scope combo.

    Encodes the reference's per-platform file conventions
    (cli.py:6165-6231).  Raises ``ValueError`` for unknown platforms/scopes
    and for ``--global`` on a project-only platform.
    """
    cwd, home = Path(cwd), Path(home)
    if platform not in PLATFORMS:
        raise ValueError(f"unknown platform: {platform}")
    if scope not in ("project", "global"):
        raise ValueError(f"unknown scope: {scope}")
    if scope == "global" and platform in PROJECT_ONLY_PLATFORMS:
        raise ValueError(
            f"{platform} only supports project-level instructions (--project)"
        )
    if scope == "project":
        table = {
            "claude": (cwd / "CLAUDE.md", "project root"),
            "codex": (cwd / "CODEX.md", "project root"),
            "gemini": (cwd / ".gemini" / "styleguide.md", ".gemini/"),
            "opencode": (cwd / "AGENTS.md", "project root"),
            "q": (cwd / ".amazonq" / "rules" / "cidx.md", ".amazonq/rules/"),
            "junie": (cwd / ".junie" / "guidelines.md", ".junie/"),
        }
    else:
        table = {
            "claude": (home / ".claude" / "CLAUDE.md", "~/.claude/"),
            "codex": (home / ".codex" / "instructions.md", "~/.codex/"),
            "opencode": (
                home / ".config" / "opencode" / "AGENTS.md",
                "~/.config/opencode/",
            ),
            "q": (home / ".aws" / "amazonq" / "Q.md", "~/.aws/amazonq/"),
        }
    return table[platform]


_SECTION_PATTERN = re.compile(
    r"(^##\s*(?:\d+\.\s*)?SEMANTIC SEARCH.*?)(?=^##\s|\Z)",
    re.MULTILINE | re.DOTALL | re.IGNORECASE,
)


def update_awareness(target_path: str | Path, awareness: str) -> str:
    """Install/refresh the awareness section in *target_path*.

    Smart update semantics (reference cli.py:6245-6309): a fresh file gets
    the template verbatim; an existing file keeps all of its other content
    — an existing ``## SEMANTIC SEARCH`` section (numbered or not, any
    case) is replaced in place, otherwise the section is appended after a
    ``---`` rule.  Returns ``"installed"`` / ``"updated"`` / ``"added"``.
    """
    target = Path(target_path)
    if not target.exists():
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_text(awareness)
        return "installed"
    existing = target.read_text()
    m = _SECTION_PATTERN.search(existing)
    if m:
        merged = (
            existing[: m.start()]
            + awareness.strip()
            + "\n\n"
            + existing[m.end() :].lstrip()
        )
        action = "updated"
    else:
        merged = existing.rstrip() + "\n\n---\n\n" + awareness
        action = "added"
    target.write_text(merged)
    return action


def teach(
    platform: str,
    scope: str | None = None,
    *,
    show_only: bool = False,
    skills_only: bool = False,
    cwd: str | Path | None = None,
    home: str | Path | None = None,
) -> dict:
    """Drive the full teach-ai flow; returns a result dict for the CLI.

    Two-tier update like the reference: skills always land under
    ``<home>/.claude/skills/cidx-ray/`` (skills are Claude-host files
    regardless of awareness platform), then the awareness file for the
    chosen platform+scope is created or smart-updated.
    """
    cwd = Path(cwd) if cwd is not None else Path.cwd()
    home = Path(home) if home is not None else Path.home()
    skills_dir = home / ".claude" / "skills" / "cidx-ray"
    if skills_only:
        return {
            "action": "skills_only",
            "skills_dir": str(skills_dir),
            "skills": install_skills(str(skills_dir)),
        }
    awareness = load_awareness_template(platform)
    if show_only:
        return {
            "action": "show_only",
            "awareness": awareness,
            "skills": sorted(SKILL_FILES),
        }
    if scope is None:
        raise ValueError("scope required: project or global")
    target, scope_desc = target_path_for(platform, scope, cwd, home)
    installed = install_skills(str(skills_dir))
    action = update_awareness(target, awareness)
    return {
        "action": action,
        "target": str(target),
        "scope_desc": scope_desc,
        "skills_dir": str(skills_dir),
        "skills": installed,
    }
