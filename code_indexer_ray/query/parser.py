"""Lucene-classic-QueryParser-style query strings compiled onto the engine.

Grammar (the subset the sharded engine executes exactly; anything it cannot
express raises ``ValueError`` instead of silently degrading):

    spark merge               bare terms — default operator OR (Lucene default)
    spark AND merge           explicit AND → every term required
    +spark batch              '+' = MUST; remaining bare terms become SHOULD
    -window                   '-' = MUST_NOT (hard filter, no score)
    term^2.5                  query-time boost (multiplicative weight)
    "big scan"                phrase (requires an index_positions=True build)
    "big scan"~2              phrase with a total-gap slop budget
    spark~  /  spark~2        fuzzy (OSA edit distance 1 / 2)
    spar*                     trailing-star prefix (FST-range path)
    s?ark / s*k               general wildcard (glob → anchored RE2)
    lang:en   -lang:de        language facet include / exclude
    path:src1/*  -path:x/*    stored-path glob include / exclude
    title:spark^2 body:merge  per-field term clauses (``fields=`` index only;
                              pass the index's field names via ``fields=``)

Reference analog: the tantivy ``parse_query`` front-end builds term / fuzzy /
phrase queries from the user string (``tantivy_index_manager.py:330-420``);
the grammar itself follows the public Lucene classic QueryParser syntax.

Engine-mapping constraints (documented, tested):
- ``AND`` and ``OR`` keywords cannot be mixed (no nested boolean precedence).
- fuzzy applies one edit budget to the whole query, so every scoring term
  must carry the same ``~N`` (per-term mixed budgets are unsupported).
- wildcard / prefix / fuzzy / phrase are whole-query modes: they cannot be
  combined with each other or with plain scoring terms.
- pure negation (only '-' clauses) has no candidate generator → error.
"""

from __future__ import annotations

import re

_TOKEN = re.compile(r'"[^"]*"(?:~\d+)?|\S+')
_BOOST = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")
_FUZZY = re.compile(r"^(.+?)~(\d?)$")
_PHRASE = re.compile(r'^"([^"]*)"(?:~(\d+))?$')

MUST, SHOULD, MUST_NOT = "+", "", "-"


def parse_query(q: str, fields: set[str] | None = None) -> dict:
    """Compile a query string into ``IndexSearcher.search`` kwargs.

    ``fields`` is the set of index field names (a ``fields=`` build) that
    ``field:term`` clauses may reference; with the default ``None`` any
    generic field prefix raises, preserving plain-index behavior."""
    raw = _TOKEN.findall(q)
    if not raw:
        return {"query_text": ""}

    terms: list[tuple[str, str]] = []  # (occur, term)
    boosts: dict[str, float] = {}
    langs_in: list[str] = []
    langs_ex: list[str] = []
    paths_in: list[str] = []
    paths_ex: list[str] = []
    fielded: list[tuple[str, str, str, float]] = []  # (occur, field, term, weight)
    phrase: tuple[str, int] | None = None
    fuzzy_d: set[int] = set()
    saw_and = saw_or = saw_plus = False

    for tok in raw:
        if tok == "AND":
            saw_and = True
            continue
        if tok == "OR":
            saw_or = True
            continue
        occur = SHOULD
        if tok[0] in "+-":
            occur = MUST if tok[0] == "+" else MUST_NOT
            tok = tok[1:]
            if not tok:
                raise ValueError("dangling +/- operator")
            saw_plus = saw_plus or occur == MUST

        m = _PHRASE.match(tok)
        if m:
            if occur != SHOULD and occur != MUST:
                raise ValueError("negated phrases are unsupported")
            if phrase is not None:
                raise ValueError("at most one phrase clause is supported")
            phrase = (m.group(1), int(m.group(2) or 0))
            continue

        if ":" in tok:
            field, val = tok.split(":", 1)
            if field == "lang":
                (langs_ex if occur == MUST_NOT else langs_in).append(val)
                continue
            if field == "path":
                (paths_ex if occur == MUST_NOT else paths_in).append(val)
                continue
            if fields is not None and field in fields:
                if occur == MUST_NOT:
                    raise ValueError("fielded MUST_NOT clauses are unsupported")
                weight = 1.0
                m = _BOOST.match(val)
                if m:
                    val, weight = m.group(1), float(m.group(2))
                if not val:
                    raise ValueError(f"empty term in fielded clause {field!r}")
                if _has_wildcard(val) or "~" in val or '"' in val:
                    raise ValueError(
                        "fielded clauses take plain terms only "
                        "(no fuzzy/wildcard/phrase)"
                    )
                fielded.append((occur, field, val, weight))
                continue
            known = "lang, path" if fields is None else ", ".join(
                sorted({"lang", "path"} | fields)
            )
            raise ValueError(f"unknown field {field!r} (supported: {known})")

        boost_val = None
        m = _BOOST.match(tok)
        if m:
            tok = m.group(1)
            if occur == MUST_NOT:
                raise ValueError("boosting a MUST_NOT clause has no effect")
            boost_val = float(m.group(2))

        m = _FUZZY.match(tok)
        if m and not _has_wildcard(tok):
            tok = m.group(1)
            fuzzy_d.add(int(m.group(2) or 1))

        if boost_val is not None:
            boosts[tok] = boost_val
        terms.append((occur, tok))

    if saw_and and saw_or:
        # mixed operators: AND binds tighter, OR separates clauses → the
        # disjunctive-normal-form route (engine.search_dnf).  Only plain
        # terms are expressible inside a DNF clause — anything decorated
        # keeps the explicit error below.
        if (
            phrase is not None or boosts or fuzzy_d or saw_plus or fielded
            or langs_in or langs_ex or paths_in or paths_ex
            or any(o == MUST_NOT for o, _ in terms)
            or any(_has_wildcard(t) for _, t in terms)
        ):
            raise ValueError(
                "mixed AND/OR supports plain terms only "
                "(no +/-/fields/boost/fuzzy/wildcard/phrase)"
            )
        ops = ("AND", "OR")
        for a, b in zip(raw, raw[1:]):
            if a in ops and b in ops:
                raise ValueError(f"adjacent operators {a} {b}")
        if raw[0] in ops or raw[-1] in ops:
            raise ValueError("query cannot start or end with AND/OR")
        clauses: list[list[str]] = [[]]
        for tok in raw:
            if tok == "OR":
                clauses.append([])
            elif tok != "AND":
                clauses[-1].append(tok)
        if any(not c for c in clauses):
            raise ValueError("empty clause around OR")
        return {"dnf_clauses": [" ".join(c) for c in clauses]}

    if fielded:
        # field-scoped clauses execute through IndexSearcher.search_fields;
        # the routes cannot mix (a plain term has no field on a fields= index
        # query, and lang/path metadata filters are not wired through the
        # grouped fan-out) — raise instead of silently degrading.
        if (
            terms or phrase is not None or boosts or fuzzy_d
            or langs_in or langs_ex or paths_in or paths_ex
        ):
            raise ValueError(
                "field:term clauses cannot combine with unfielded terms, "
                "phrases, fuzzy or lang/path filters"
            )
        # Lucene occurrence defaulting, same policy as unfielded terms:
        # explicit AND → every clause required; any '+' → marked clauses
        # required, bare optional; otherwise default operator OR.
        clauses_f = [(f, t, w) for _, f, t, w in fielded]
        if saw_and:
            return {"fielded_must": clauses_f, "fielded_should": []}
        if saw_plus:
            return {
                "fielded_must": [(f, t, w) for o, f, t, w in fielded if o == MUST],
                "fielded_should": [(f, t, w) for o, f, t, w in fielded if o == SHOULD],
            }
        return {"fielded_must": [], "fielded_should": clauses_f}

    must = [t for o, t in terms if o == MUST]
    bare = [t for o, t in terms if o == SHOULD]
    nots = [t for o, t in terms if o == MUST_NOT]

    # Lucene occurrence defaulting: with any '+' present (or explicit AND),
    # bare terms stay optional / become required respectively; otherwise the
    # default operator is OR.
    if saw_and:
        must, bare = must + bare, []

    kwargs: dict = {}
    if langs_in:
        kwargs["languages"] = langs_in
    if langs_ex:
        kwargs["exclude_languages"] = langs_ex
    if paths_in:
        kwargs["path_filters"] = paths_in
    if paths_ex:
        kwargs["exclude_paths"] = paths_ex

    if phrase is not None:
        if must or bare or nots or boosts or fuzzy_d:
            raise ValueError("a phrase clause cannot combine with other term clauses")
        kwargs.update(query_text=phrase[0], phrase=True, slop=phrase[1])
        return kwargs

    scoring = must + bare
    if not scoring:
        if nots:
            raise ValueError("pure negation has no candidate generator")
        return {**kwargs, "query_text": ""}

    wild = [t for t in scoring if _has_wildcard(t)]
    if fuzzy_d:
        if wild:
            raise ValueError("fuzzy and wildcard clauses cannot combine")
        if len(fuzzy_d) > 1:
            raise ValueError("all fuzzy terms must share one edit budget")
        kwargs["edit_distance"] = fuzzy_d.pop()
    if wild:
        if len(scoring) != len(wild):
            raise ValueError("wildcard queries cannot mix with plain scoring terms")
        if must and bare:
            # should_terms are exact analyzed tokens in the engine; a
            # stripped prefix ('merg*' → 'merg') or glob-translated regex
            # ('mer?e' → 'mer.e') routed there would silently score the
            # wrong term instead of the documented whole-query-mode error.
            raise ValueError(
                "wildcard queries cannot mix MUST (+) and bare optional terms"
            )
        if any(_has_wildcard(k) for k in boosts):
            raise ValueError("boosting a wildcard clause is unsupported")
        if all(t.endswith("*") and not _has_wildcard(t[:-1]) for t in scoring):
            kwargs["prefix"] = True
            scoring = [t[:-1] for t in scoring]
            must = [t[:-1] for t in must]
            bare = [t[:-1] for t in bare]
        else:
            kwargs["use_regex"] = True
            scoring = [_glob_to_regex(t) for t in scoring]
            must = [_glob_to_regex(t) for t in must]
            bare = [_glob_to_regex(t) for t in bare]

    if must and bare:
        kwargs.update(query_text=" ".join(must), should_terms=bare)
    elif must:
        kwargs["query_text"] = " ".join(must)
    else:  # default operator OR
        kwargs.update(query_text=" ".join(bare), match_any=True)
    if nots:
        kwargs["exclude_terms"] = nots
    if boosts:
        kwargs["boosts"] = boosts
    return kwargs


def _has_wildcard(t: str) -> bool:
    return "*" in t or "?" in t


def _glob_to_regex(glob: str) -> str:
    out = []
    for ch in glob:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "".join(out)


def _branch_filtered(searcher, branch: str | None, limit: int, run) -> list[dict]:
    """Branch-visibility for routes whose engines don't take ``branch``:
    the engine's own over-fetch semantics applied here — fetch 3× limit
    (everything when limit=0), drop hidden docs, cut at limit."""
    if branch is None:
        return run(limit)
    hidden = searcher._hidden_for(branch)
    if not hidden:
        return run(limit)
    rows = run(limit * 3 if limit else 0)
    kept = [r for r in rows if r["doc_id"] not in hidden]
    return kept[:limit] if limit else kept


def search_query_string(searcher, q: str, **extra) -> list[dict]:
    """Parse ``q`` and execute it on an :class:`IndexSearcher`.  Mixed
    AND/OR strings compile to the DNF route (``search_dnf``) and
    ``field:term`` clauses to ``search_fields`` — both accept only ``limit``
    (and ``branch``) from the extra kwargs (their rows carry no snippets, so
    a disabled ``snippet_lines`` is tolerated and a requested one raises)."""
    idx_fields = searcher.manifest.fields
    kwargs = parse_query(q, fields=set(idx_fields) if idx_fields else None)
    f_must = kwargs.pop("fielded_must", None)
    f_should = kwargs.pop("fielded_should", None)
    if f_must is not None:
        extra = dict(extra)
        snip = extra.pop("snippet_lines", 0)
        if snip:
            raise ValueError("field:term queries do not produce snippets")
        branch = extra.pop("branch", None)
        bad = set(extra) - {"limit"}
        if bad:
            raise ValueError(f"field:term queries support only limit, got {sorted(bad)}")
        limit = int(extra.get("limit", 10))
        return _branch_filtered(
            searcher, branch, limit,
            lambda lim: searcher.search_fields(f_must, f_should or None, limit=lim),
        )
    dnf = kwargs.pop("dnf_clauses", None)
    if dnf is not None:
        # DNF rows carry only (doc_id, score) — snippets are unavailable, so
        # a disabled snippet_lines is tolerated (the repo-wide calling
        # convention always passes snippet_lines=0) and a requested one raises
        extra = dict(extra)
        snip = extra.pop("snippet_lines", 0)
        if snip:
            raise ValueError("DNF (mixed AND/OR) queries do not produce snippets")
        branch = extra.pop("branch", None)
        bad = set(extra) - {"limit"}
        if bad:
            raise ValueError(f"DNF queries support only limit, got {sorted(bad)}")
        limit = int(extra.get("limit", 10))
        return _branch_filtered(
            searcher, branch, limit, lambda lim: searcher.search_dnf(dnf, limit=lim)
        )
    return searcher.search(**kwargs, **extra)
