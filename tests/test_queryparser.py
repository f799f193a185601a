"""Query-string parser: grammar → kwargs, error cases, engine equivalence."""

from __future__ import annotations

import pytest

from code_indexer_ray.query.parser import parse_query, search_query_string

SF = "/root/testdata/sf0.01"


# --- pure grammar (no Ray) -------------------------------------------------


def test_default_operator_is_or():
    assert parse_query("spark merge") == {"query_text": "spark merge", "match_any": True}


def test_explicit_and():
    assert parse_query("spark AND merge") == {"query_text": "spark merge"}


def test_plus_makes_bare_terms_should():
    k = parse_query("+spark batch")
    assert k == {"query_text": "spark", "should_terms": ["batch"]}


def test_must_not_and_boost():
    k = parse_query("+spark +merge batch^2 -window")
    assert k["query_text"] == "spark merge"
    assert k["should_terms"] == ["batch"]
    assert k["exclude_terms"] == ["window"]
    assert k["boosts"] == {"batch": 2.0}


def test_fields_and_negated_fields():
    k = parse_query("spark lang:en -lang:de path:src1/* -path:tmp/*")
    assert k["languages"] == ["en"]
    assert k["exclude_languages"] == ["de"]
    assert k["path_filters"] == ["src1/*"]
    assert k["exclude_paths"] == ["tmp/*"]
    assert k["query_text"] == "spark"


def test_phrase_and_slop():
    assert parse_query('"big scan"') == {"query_text": "big scan", "phrase": True, "slop": 0}
    assert parse_query('"big scan"~2')["slop"] == 2


def test_fuzzy_suffix():
    assert parse_query("sparc~")["edit_distance"] == 1
    assert parse_query("sparc~2")["edit_distance"] == 2


def test_prefix_vs_general_wildcard():
    assert parse_query("spar*") == {"query_text": "spar", "prefix": True, "match_any": True}
    k = parse_query("s?ark")
    assert k["use_regex"] and k["query_text"] == "s.ark"


@pytest.mark.parametrize(
    "bad",
    [
        "+a AND b OR c",         # mixed operators allow plain terms only
        "a AND b^2 OR c",        # no boosts inside DNF clauses
        "a AND b OR lang:en",    # no fields inside DNF clauses
        "a AND OR b",            # empty clause around OR
        "-window",               # pure negation
        '"a b" spark',           # phrase + terms
        "sparc~1 merge~2",       # mixed fuzzy budgets
        "spar* merge",           # wildcard + plain term
        "sparc~ spar*",          # fuzzy + wildcard
        "size:10",               # unknown field
        "+",                     # dangling operator
    ],
)
def test_unsupported_raises(bad):
    with pytest.raises(ValueError):
        parse_query(bad)


# --- engine equivalence ----------------------------------------------------


def _ids(rows):
    return [(r["doc_id"], round(r["score"], 9)) for r in rows]


def test_parsed_equals_direct_calls(ray_session):
    from code_indexer_ray.pipelines.driver_api import searcher_for

    s = searcher_for(SF)
    cases = [
        ("spark AND merge", dict(query_text="spark merge")),
        ("spark merge", dict(query_text="spark merge", match_any=True)),
        ("+spark -merge", dict(query_text="spark", exclude_terms=["merge"])),
        ("spark lang:en", dict(query_text="spark", languages=["en"])),
        ("sparc~1", dict(query_text="sparc", edit_distance=1)),
        ("spar*", dict(query_text="spar", prefix=True, match_any=True)),
        (
            "+spark +merge batch^2",
            dict(query_text="spark merge", should_terms=["batch"], boosts={"batch": 2.0}),
        ),
    ]
    for qs, kwargs in cases:
        got = search_query_string(s, qs, limit=10, snippet_lines=0)
        want = s.search(limit=10, snippet_lines=0, **kwargs)
        assert _ids(got) == _ids(want), qs


def test_parsed_phrase_equals_direct(ray_session):
    from code_indexer_ray.pipelines.driver_api import phrase_searcher_for

    s = phrase_searcher_for(SF)
    got = search_query_string(s, '"spark merge"', limit=0, snippet_lines=0)
    want = s.search("spark merge", phrase=True, limit=0, snippet_lines=0)
    assert _ids(got) == _ids(want) and len(got) > 0


def test_mixed_and_or_compiles_to_dnf():
    assert parse_query("a AND b OR c AND d") == {"dnf_clauses": ["a b", "c d"]}
    assert parse_query("a OR b AND c") == {"dnf_clauses": ["a", "b c"]}


def test_mixed_query_executes_dnf_end_to_end(ray_session):
    from code_indexer_ray.pipelines.driver_api import searcher_for

    s = searcher_for(SF)
    got = search_query_string(s, "spark AND merge OR window AND sort", limit=0, snippet_lines=0)
    want = s.search_dnf(["spark merge", "window sort"], limit=0)
    assert got == want and len(got) > 0
    with pytest.raises(ValueError):
        search_query_string(s, "spark AND merge OR window AND sort", snippet_lines=3)


class TestWildcardOccurrenceMix:
    """ADVICE r2: bare wildcard terms must not silently become exact
    should_terms when MUST wildcards are present."""

    def test_must_plus_bare_prefix_raises(self):
        with pytest.raises(ValueError, match="MUST.*bare|bare.*MUST"):
            parse_query("+spar* merg*")

    def test_must_plus_bare_glob_raises(self):
        with pytest.raises(ValueError, match="MUST.*bare|bare.*MUST"):
            parse_query("+s?ark mer?e")

    def test_boosted_wildcard_raises(self):
        with pytest.raises(ValueError, match="boost.*wildcard"):
            parse_query("spar*^2 merg*")

    def test_all_must_wildcards_still_work(self):
        kw = parse_query("+spar* +merg*")
        assert kw["prefix"] is True
        assert kw["query_text"] == "spar merg"

    def test_all_bare_wildcards_still_work(self):
        kw = parse_query("spar* merg*")
        assert kw["prefix"] is True and kw["match_any"] is True


# --- field-scoped clauses (fields= index) -----------------------------------


FIELDS = {"title", "body"}


def test_fielded_parse_or_default():
    assert parse_query("title:spark^2 body:merge", fields=FIELDS) == {
        "fielded_must": [],
        "fielded_should": [("title", "spark", 2.0), ("body", "merge", 1.0)],
    }


def test_fielded_parse_and():
    assert parse_query("title:spark AND body:merge", fields=FIELDS) == {
        "fielded_must": [("title", "spark", 1.0), ("body", "merge", 1.0)],
        "fielded_should": [],
    }


def test_fielded_parse_must_mix():
    assert parse_query("+title:spark body:merge^3", fields=FIELDS) == {
        "fielded_must": [("title", "spark", 1.0)],
        "fielded_should": [("body", "merge", 3.0)],
    }


@pytest.mark.parametrize(
    "bad",
    [
        "title:spark merge",        # fielded + unfielded scoring term
        "-title:spark body:merge",  # fielded MUST_NOT
        "title:spar* body:merge",   # wildcard inside a fielded clause
        "title:sparc~ body:merge",  # fuzzy inside a fielded clause
        "title:spark lang:en",      # fielded + facet filter
        "caption:spark",            # not an index field
        "title:a AND b OR c",       # fielded inside mixed AND/OR
        'title:spark "a b"',        # fielded + phrase
        "title:",                   # empty fielded term
    ],
)
def test_fielded_unsupported(bad):
    with pytest.raises(ValueError):
        parse_query(bad, fields=FIELDS)


def test_fielded_requires_fields_arg():
    # without the index's field names, a generic prefix stays an error —
    # plain-index behavior is unchanged
    with pytest.raises(ValueError, match="unknown field"):
        parse_query("title:spark", fields=None)
