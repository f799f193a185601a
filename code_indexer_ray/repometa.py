"""Repository meta-description tier — the discovery layer that lets agents
find the right repo before searching inside it.

Reference parity: ``global_repos/repo_analyzer.py`` (static extraction
path — the Claude-CLI path is a product integration, out of scope for a
data engine), ``global_repos/description_generator.py`` (markdown + YAML
frontmatter description files), and ``global_repos/meta_description_hook.py``
(generate on register).  The description corpus is plain (path, text) rows,
so the normal ingest pipeline indexes it and omni/semantic search answers
"which repo handles billing?" questions.

Everything here is static analysis: README first-paragraph summary,
manifest- and extension-based technology detection, section-bullet feature
and use-case extraction, name-keyword purpose inference — deterministic,
no model, no network.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

#: manifest file → technology (checked at the checkout root)
_MANIFEST_TECH = (
    ("pyproject.toml", "python"),
    ("setup.py", "python"),
    ("requirements.txt", "python"),
    ("package.json", "javascript"),
    ("tsconfig.json", "typescript"),
    ("Cargo.toml", "rust"),
    ("go.mod", "go"),
    ("pom.xml", "java"),
    ("build.gradle", "java"),
    ("Gemfile", "ruby"),
    ("composer.json", "php"),
    ("CMakeLists.txt", "c++"),
    ("Dockerfile", "docker"),
)

#: extension → technology (majority vote over the tree walk)
_EXT_TECH = {
    ".py": "python", ".js": "javascript", ".ts": "typescript",
    ".rs": "rust", ".go": "go", ".java": "java", ".rb": "ruby",
    ".php": "php", ".c": "c", ".h": "c", ".cc": "c++", ".cpp": "c++",
    ".cs": "c#", ".kt": "kotlin", ".swift": "swift", ".scala": "scala",
}

_PURPOSE_KEYWORDS = (
    ("api", "api"), ("service", "service"), ("library", "library"),
    ("lib", "library"), ("cli", "cli-tool"), ("web", "web-application"),
    ("auth", "authentication"),
)

_README_NAMES = ("README.md", "README.rst", "README.txt", "README")


@dataclass
class RepoInfo:
    name: str
    summary: str = ""
    technologies: list[str] = field(default_factory=list)
    features: list[str] = field(default_factory=list)
    use_cases: list[str] = field(default_factory=list)
    purpose: str = "general-purpose"


def _find_readme(root: str) -> str | None:
    for name in _README_NAMES:
        p = os.path.join(root, name)
        if os.path.isfile(p):
            return p
    return None


def _readme_text(root: str) -> str:
    p = _find_readme(root)
    if p is None:
        return ""
    try:
        with open(p, encoding="utf-8", errors="replace") as f:
            return f.read()
    except OSError:
        return ""


def _extract_summary(root: str, name: str) -> str:
    """First meaningful paragraph after the README title (reference
    ``_extract_summary``: collect lines until > 50 chars); fallback to the
    repo name."""
    content = _readme_text(root)
    lines_out: list[str] = []
    seen_title = not content.lstrip().startswith("#")
    for line in content.split("\n"):
        line = line.strip()
        if line.startswith("#"):
            seen_title = True
            continue
        if seen_title and line:
            lines_out.append(line)
            if len(" ".join(lines_out)) > 50:
                break
        elif seen_title and lines_out:
            break  # paragraph ended
    return " ".join(lines_out) if lines_out else f"A {name} repository"


def _extract_section_bullets(content: str, section_names: tuple[str, ...],
                             limit: int = 8) -> list[str]:
    """Bullet lines under the first matching ``## <section>`` heading."""
    out: list[str] = []
    in_section = False
    for line in content.split("\n"):
        stripped = line.strip()
        if stripped.startswith("#"):
            title = stripped.lstrip("#").strip().lower()
            in_section = any(s in title for s in section_names)
            continue
        if in_section and re.match(r"^[-*+]\s+", stripped):
            out.append(re.sub(r"^[-*+]\s+", "", stripped))
            if len(out) >= limit:
                break
    return out


def _detect_technologies(root: str, max_files: int = 5000) -> list[str]:
    """Manifest files first (unambiguous), then an extension majority walk
    (bounded; vendor/VCS dirs pruned).  Order: manifests in table order,
    then extensions by descending count."""
    techs: list[str] = []
    for fname, tech in _MANIFEST_TECH:
        if os.path.exists(os.path.join(root, fname)) and tech not in techs:
            techs.append(tech)
    counts: dict[str, int] = {}
    seen = 0
    prune = {".git", "node_modules", "vendor", "__pycache__", ".venv", "dist", "build"}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d not in prune]
        for f in filenames:
            tech = _EXT_TECH.get(os.path.splitext(f)[1].lower())
            if tech:
                counts[tech] = counts.get(tech, 0) + 1
            seen += 1
            if seen >= max_files:
                break
        if seen >= max_files:
            break
    for tech, _n in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0])):
        if tech not in techs:
            techs.append(tech)
    return techs


def _infer_purpose(name: str) -> str:
    low = name.lower()
    for kw, purpose in _PURPOSE_KEYWORDS:
        if kw in low:
            return purpose
    return "general-purpose"


def analyze_repo(root: str, name: str | None = None) -> RepoInfo:
    """Static repository analysis (reference ``_extract_info_static``)."""
    name = name or os.path.basename(os.path.abspath(root))
    content = _readme_text(root)
    return RepoInfo(
        name=name,
        summary=_extract_summary(root, name),
        technologies=_detect_technologies(root),
        features=_extract_section_bullets(content, ("feature",)),
        use_cases=_extract_section_bullets(content, ("use case", "usage", "use-case")),
        purpose=_infer_purpose(name),
    )


def _yaml_list(items: list[str]) -> str:
    return "[" + ", ".join(f'"{i}"' for i in items) + "]"


def write_description(meta_dir: str, info: RepoInfo, *, repo_url: str = "",
                      generated_unix: int = 0) -> str:
    """Markdown description file with YAML frontmatter (reference
    ``description_generator.create_description``) — the searchable unit of
    the cidx-meta corpus.  Returns the file path."""
    os.makedirs(meta_dir, exist_ok=True)
    path = os.path.join(meta_dir, f"{info.name}.md")
    lines = [
        "---",
        f'repo_name: "{info.name}"',
        f'repo_url: "{repo_url}"',
        f"technologies: {_yaml_list(info.technologies)}",
        f'purpose: "{info.purpose}"',
        f"generated_unix: {generated_unix}",
        "---",
        "",
        f"# {info.name}",
        "",
        info.summary,
        "",
    ]
    if info.features:
        lines += ["## Features", ""] + [f"- {f}" for f in info.features] + [""]
    if info.use_cases:
        lines += ["## Use cases", ""] + [f"- {u}" for u in info.use_cases] + [""]
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("\n".join(lines))
    os.replace(tmp, path)
    return path


def describe_tree(tree_root: str, meta_dir: str, *, name: str | None = None,
                  repo_url: str = "", generated_unix: int = 0) -> str:
    """Analyze + write in one call (the register-time meta hook)."""
    info = analyze_repo(tree_root, name)
    return write_description(
        meta_dir, info, repo_url=repo_url, generated_unix=generated_unix
    )
