"""teach-ai tier tests (reference teach_ai_templates.py + cli.py:5928).

Ray-free: pure file IO against tmp_path, driven both through the library
(`teach.teach`) and the CLI fast path.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from code_indexer_ray import teach
from code_indexer_ray.cli import main as cli_main


def test_install_skills_clean_overwrite(tmp_path):
    target = tmp_path / "skills" / "cidx-ray"
    # pre-existing stale file must be removed (reference clean-overwrite)
    target.mkdir(parents=True)
    (target / "stale.md").write_text("old")
    installed = teach.install_skills(str(target))
    assert installed == sorted(teach.SKILL_FILES)
    assert not (target / "stale.md").exists()
    assert (target / "SKILL.md").read_text() == teach.SKILL_FILES["SKILL.md"]
    assert (target / "reference" / "scip-intelligence.md").exists()


@pytest.mark.parametrize(
    "platform,scope,rel",
    [
        ("claude", "project", "CLAUDE.md"),
        ("codex", "project", "CODEX.md"),
        ("gemini", "project", ".gemini/styleguide.md"),
        ("opencode", "project", "AGENTS.md"),
        ("q", "project", ".amazonq/rules/cidx.md"),
        ("junie", "project", ".junie/guidelines.md"),
        ("claude", "global", ".claude/CLAUDE.md"),
        ("codex", "global", ".codex/instructions.md"),
        ("opencode", "global", ".config/opencode/AGENTS.md"),
        ("q", "global", ".aws/amazonq/Q.md"),
    ],
)
def test_target_path_conventions(tmp_path, platform, scope, rel):
    root = tmp_path / ("proj" if scope == "project" else "home")
    path, _desc = teach.target_path_for(platform, scope, tmp_path / "proj", tmp_path / "home")
    assert path == root / rel


def test_project_only_platforms_refuse_global(tmp_path):
    for platform in ("gemini", "junie"):
        with pytest.raises(ValueError, match="project-level"):
            teach.target_path_for(platform, "global", tmp_path, tmp_path)


def test_fresh_install_writes_template(tmp_path):
    res = teach.teach("claude", "project", cwd=tmp_path / "proj", home=tmp_path / "home")
    assert res["action"] == "installed"
    content = Path(res["target"]).read_text()
    assert content == teach.AWARENESS_TEMPLATE
    assert content.startswith("## SEMANTIC SEARCH")
    # skills landed under the claude host dir regardless of platform
    assert (tmp_path / "home" / ".claude" / "skills" / "cidx-ray" / "SKILL.md").exists()


def test_smart_update_replaces_section_preserving_rest(tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    existing = (
        "# My project\n\nintro prose\n\n"
        "## 1. SEMANTIC SEARCH - CIDX MANDATORY\n\nOLD SECTION BODY\nmore old\n\n"
        "## Build\n\nmake all\n"
    )
    (proj / "CLAUDE.md").write_text(existing)
    res = teach.teach("claude", "project", cwd=proj, home=tmp_path / "home")
    assert res["action"] == "updated"
    merged = (proj / "CLAUDE.md").read_text()
    assert "OLD SECTION BODY" not in merged
    assert merged.startswith("# My project\n\nintro prose\n\n")
    assert "## Build\n\nmake all" in merged
    assert teach.AWARENESS_TEMPLATE.strip() in merged
    # exactly one semantic-search section afterwards
    assert merged.lower().count("## semantic search") == 1


def test_smart_update_appends_when_no_section(tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    (proj / "CLAUDE.md").write_text("# Notes\n\nno cidx here\n")
    res = teach.teach("claude", "project", cwd=proj, home=tmp_path / "home")
    assert res["action"] == "added"
    merged = (proj / "CLAUDE.md").read_text()
    assert merged.startswith("# Notes\n\nno cidx here\n\n---\n\n")
    assert teach.AWARENESS_TEMPLATE in merged


def test_update_is_idempotent(tmp_path):
    proj = tmp_path / "proj"
    proj.mkdir()
    teach.teach("claude", "project", cwd=proj, home=tmp_path / "home")
    first = (proj / "CLAUDE.md").read_text()
    res = teach.teach("claude", "project", cwd=proj, home=tmp_path / "home")
    assert res["action"] == "updated"
    assert (proj / "CLAUDE.md").read_text().strip() == first.strip()


def test_show_only_and_skills_only_modes(tmp_path):
    res = teach.teach("codex", show_only=True, cwd=tmp_path, home=tmp_path)
    assert res["action"] == "show_only"
    assert res["awareness"] == teach.AWARENESS_TEMPLATE
    assert tuple(res["skills"]) == tuple(sorted(teach.SKILL_FILES))
    # show_only must not write anything
    assert list(tmp_path.iterdir()) == []

    res = teach.teach("claude", skills_only=True, cwd=tmp_path, home=tmp_path)
    assert res["action"] == "skills_only"
    assert (tmp_path / ".claude" / "skills" / "cidx-ray" / "SKILL.md").exists()


def test_scope_required_without_show_only(tmp_path):
    with pytest.raises(ValueError, match="scope required"):
        teach.teach("claude", cwd=tmp_path, home=tmp_path)


def test_cli_flag_validation(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("HOME", str(tmp_path / "home"))
    monkeypatch.chdir(tmp_path)
    # no platform
    assert cli_main(["teach-ai", "--project"]) == 1
    # two platforms
    assert cli_main(["teach-ai", "--claude", "--codex", "--project"]) == 1
    # no scope
    assert cli_main(["teach-ai", "--claude"]) == 1
    # two scopes
    assert cli_main(["teach-ai", "--claude", "--project", "--global"]) == 1
    # gemini global refused with a message, not a traceback
    assert cli_main(["teach-ai", "--gemini", "--global"]) == 1
    assert "project-level" in capsys.readouterr().err


def test_cli_end_to_end_install_and_preview(tmp_path, monkeypatch, capsys):
    home = tmp_path / "home"
    proj = tmp_path / "proj"
    proj.mkdir()
    monkeypatch.setenv("HOME", str(home))
    monkeypatch.chdir(proj)
    assert cli_main(["teach-ai", "--claude", "--project"]) == 0
    out = capsys.readouterr().out
    assert "claude instructions installed" in out
    assert (proj / "CLAUDE.md").exists()
    assert (home / ".claude" / "skills" / "cidx-ray" / "SKILL.md").exists()

    assert cli_main(["teach-ai", "--claude", "--show-only"]) == 0
    out = capsys.readouterr().out
    assert "## SEMANTIC SEARCH" in out and "skills files:" in out
