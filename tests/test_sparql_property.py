"""Property tests for the SPARQL front end (parser only — no Ray).

The subset contract says anything outside the grammar raises a TYPED
error (`SparqlSyntaxError` / `SparqlUnsupportedError`) instead of
crashing or silently misparsing. Fuzz both arbitrary text and
grammar-adjacent token soup: the parser must never escape with an
IndexError/KeyError/AttributeError.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ontograph_ray.store.sparql import (
    SparqlSyntaxError,
    SparqlUnsupportedError,
    _parse_update,
    parse,
)

_TYPED = (SparqlSyntaxError, SparqlUnsupportedError)

_words = st.sampled_from(
    [
        "SELECT", "WHERE", "DISTINCT", "PREFIX", "FILTER", "OPTIONAL",
        "UNION", "ORDER", "GROUP", "BY", "LIMIT", "AS", "COUNT", "MIN",
        "MAX", "INSERT", "DELETE", "DATA", "GRAPH", "a", "regex",
        "?s", "?p", "?o", "?x", "*", "{", "}", "(", ")", ".", ",",
        "=", "!=", "7", "<urn:x>", "<https://e.org/p>", '"lit"',
        '"l"@en', '"3"^^<urn:dt>', "pfx:", "pfx:name",
        # round-2 grammar extensions: path modifiers / negsets,
        # ORDER direction, HAVING, numeric filters, AVG / DISTINCT
        # aggregates — the fuzzer must keep the typed-error contract
        # over these tokens too
        "SUM", "AVG", "HAVING", "ASC", "DESC", "VALUES", "MINUS",
        "EXISTS", "NOT", "OFFSET", "+", "?", "!", "^", "/", "|",
        "<", ">", "<=", ">=", "-", "0", "60",
        # round-5 decimal-lane tokens: decimal constants (valid and
        # over-precise), BIND/FILTER division
        "0.5", "1.2345678", "BIND",
    ]
)
_soup = st.lists(_words, min_size=0, max_size=25).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_parse_select_token_soup_raises_typed_or_parses(q):
    try:
        parse(q)
    except _TYPED:
        pass


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_parse_update_token_soup_raises_typed_or_parses(q):
    try:
        _parse_update(q)
    except _TYPED:
        pass


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_parse_arbitrary_text_never_crashes(q):
    for fn in (parse, _parse_update):
        try:
            fn(q)
        except _TYPED:
            pass


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["?s", "?x", "<urn:a>"]),
            st.sampled_from(["?p", "a", "<urn:p>"]),
            st.sampled_from(["?o", '"v"', '"v"@en', "<urn:b>"]),
        ),
        min_size=1,
        max_size=4,
    )
)
def test_valid_bgps_parse_and_keep_patterns(pats):
    q = "SELECT * WHERE { " + " . ".join(" ".join(p) for p in pats) + " . }"
    try:
        parsed = parse(q)
    except SparqlUnsupportedError:
        return  # e.g. disconnected BGP / cartesian refusal happens later
    assert len(parsed.patterns) == len(pats)
    # ground 'a' expands to rdf:type in the predicate slot
    for (s, p, o), got in zip(pats, parsed.patterns):
        if p == "a":
            assert got[1].startswith("<http://www.w3.org/")
