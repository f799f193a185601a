"""Repo meta-description tier (`repometa.py` — reference repo_analyzer
static path + description_generator), including the end-to-end
"describe -> ingest -> search the meta corpus" flow."""

from __future__ import annotations

import json

import pytest

from code_indexer_ray.repometa import (
    RepoInfo,
    analyze_repo,
    describe_tree,
    write_description,
)

README = """# billing-api

A payments and invoicing service for the acme platform, handling
subscription lifecycles.

## Features

- recurring invoices
- proration on plan change
- webhook notifications

## Usage

- deploy behind the gateway
- point DATABASE_URL at postgres
"""


@pytest.fixture()
def checkout(tmp_path):
    root = tmp_path / "billing-api"
    (root / "src").mkdir(parents=True)
    (root / "README.md").write_text(README)
    (root / "pyproject.toml").write_text("[project]\nname='billing'\n")
    for i in range(5):
        (root / "src" / f"m{i}.py").write_text("x = 1\n")
    (root / "src" / "helper.js").write_text("let x = 1\n")
    (root / "node_modules").mkdir()
    (root / "node_modules" / "dep.js").write_text("ignored\n")
    return str(root)


def test_analyze_repo_static(checkout):
    info = analyze_repo(checkout)
    assert info.name == "billing-api"
    assert info.summary.startswith("A payments and invoicing service")
    # manifest first, then extension majority; node_modules pruned
    assert info.technologies[0] == "python"
    assert "javascript" in info.technologies
    assert info.features == [
        "recurring invoices", "proration on plan change", "webhook notifications",
    ]
    assert info.use_cases == [
        "deploy behind the gateway", "point DATABASE_URL at postgres",
    ]
    assert info.purpose == "api"  # name keyword


def test_analyze_no_readme(tmp_path):
    root = tmp_path / "mylib"
    root.mkdir()
    (root / "a.go").write_text("package a\n")
    info = analyze_repo(str(root))
    assert info.summary == "A mylib repository"
    assert info.technologies == ["go"]
    assert info.purpose == "library"


def test_write_description_frontmatter(tmp_path, checkout):
    meta = str(tmp_path / "meta")
    path = describe_tree(checkout, meta, repo_url="http://git/acme", generated_unix=1234)
    text = open(path).read()
    assert text.startswith("---\n")
    assert 'repo_name: "billing-api"' in text
    assert 'repo_url: "http://git/acme"' in text
    assert '"python"' in text and "generated_unix: 1234" in text
    assert "## Features" in text and "- recurring invoices" in text
    # idempotent overwrite
    path2 = describe_tree(checkout, meta, generated_unix=1235)
    assert path2 == path and "generated_unix: 1235" in open(path).read()


def test_meta_corpus_searchable(ray_session, tmp_path, checkout):
    """End-to-end discovery: description corpus -> ingest -> BM25 finds the
    right repo for a concept query (the cidx-meta promise)."""
    from code_indexer_ray.index.build import build_index
    from code_indexer_ray.pipelines.tree import ingest_tree
    from code_indexer_ray.query.engine import IndexSearcher

    meta = str(tmp_path / "meta")
    describe_tree(checkout, meta)
    write_description(
        meta,
        RepoInfo(
            name="frontend-web",
            summary="A browser dashboard for monitoring fleets.",
            technologies=["typescript"],
            purpose="web-application",
        ),
    )
    corpus = str(tmp_path / "meta_corpus")
    ingest_tree(meta, corpus)
    idx = str(tmp_path / "meta_idx")
    build_index(corpus, idx, store_cols=("lang", "url"), num_shards=1,
                num_buckets=1, resume=False)
    s = IndexSearcher(idx, lang_col="lang", url_col="url")
    hits = s.search("payments invoicing", limit=2, snippet_lines=0)
    assert hits and "billing-api" in hits[0]["path"]


def test_cli_describe(tmp_path, checkout, capsys):
    from code_indexer_ray.cli import main as cli_main

    meta = str(tmp_path / "meta_cli")
    rc = cli_main(["repos", "describe", "--tree", checkout, "--meta-dir", meta])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and out["description"].endswith("billing-api.md")
