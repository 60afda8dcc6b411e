"""Term-serialization conformance suite.

Ports the reference's term truth tables 1:1 (reference:
triple_test.go:9-211) and pins the vectorized Arrow codec to the scalar
implementation over an adversarial fuzz corpus.
"""

import itertools
import random

import pyarrow as pa
import pytest

from ontograph_ray import terms, triples

T = "https://www.ontograph.com/test"


def test_new_resource_term():
    assert terms.new_resource_term(T) == f"<{T}>"
    assert terms.new_resource_term(T + "#a") == f"<{T}#a>"


def test_new_literal_term():
    assert terms.new_literal_term("Lorem ipsum") == '"Lorem ipsum"'
    assert terms.new_literal_term("Lorem ipsum", "en") == '"Lorem ipsum"@en'
    assert (
        terms.new_literal_term("Lorem ipsum", "", "http://www.w3.org/2001/XMLSchema#int")
        == '"Lorem ipsum"^^<http://www.w3.org/2001/XMLSchema#int>'
    )
    # lang then datatype when both present (reference order)
    assert (
        terms.new_literal_term("x", "en", "http://d")
        == '"x"@en^^<http://d>'
    )


IS_RESOURCE_CASES = [
    (f"<{T}>", True),
    (f"<{T}#a>", True),
    ('"some literal"', False),
    ('"some literal"@de', False),
    (f'"some literal"^^<{T}#literal>', False),
    (T, False),
    (f"<{T}", False),
    (f"{T}>", False),
    ("<>", False),
    ("", False),
]


@pytest.mark.parametrize("term,expected", IS_RESOURCE_CASES)
def test_is_resource(term, expected):
    assert terms.is_resource(term) is expected


IS_LITERAL_CASES = [
    ('"some literal"', True),
    ('"some literal"@de', True),
    (f'"some literal"^^<{T}#literal>', True),
    (f"<{T}>", False),
    (f"<{T}#a>", False),
    ("some literal", False),
    ('"some literal', False),
    ('some literal"', False),
    ('"some literal"de', False),
    (f'"some literal"^<{T}#literal>', False),
    ('""', False),
    ("", False),
]


@pytest.mark.parametrize("term,expected", IS_LITERAL_CASES)
def test_is_literal(term, expected):
    assert terms.is_literal(term) is expected


VALUE_CASES = [
    (f"<{T}>", T),
    (f"<{T}#a>", f"{T}#a"),
    ('"some literal"', "some literal"),
    ('"some literal"@de', "some literal"),
    (f'"some literal"^^<{T}#literal>', "some literal"),
    ("some literal", ""),
    ('"some literal', ""),
    ('some literal"', ""),
    ('"some literal"de', ""),
    (f'"some literal"^<{T}#literal>', ""),
    (T, ""),
    (f"<{T}", ""),
    (f"{T}>", ""),
    ("<>", ""),
    ('""', ""),
    ("", ""),
]


@pytest.mark.parametrize("term,expected", VALUE_CASES)
def test_value(term, expected):
    assert terms.term_value(term) == expected


LANGUAGE_CASES = [
    ('"some literal"', ""),
    ('"some literal"@de', "de"),
    (f'"some literal"^^<{T}#literal>', ""),
    ('@de"some literal"', ""),
    ('de@"some literal"', ""),
    ("<>@de", ""),
    ('""', ""),
    ("", ""),
]


@pytest.mark.parametrize("term,expected", LANGUAGE_CASES)
def test_language(term, expected):
    assert terms.term_language(term) == expected


DATATYPE_CASES = [
    ('"some literal"', ""),
    ('"some literal"@de', ""),
    (f'"some literal"^^<{T}#literal>', f"{T}#literal"),
    ('^^de"some literal"', ""),
    ('de^^"some literal"', ""),
    (f'"some literal"^^{T}#literal', ""),
    ("<>^^de", ""),
    ('""', ""),
    ("", ""),
]


@pytest.mark.parametrize("term,expected", DATATYPE_CASES)
def test_datatype(term, expected):
    assert terms.term_datatype(term) == expected


def test_new_triple_valid():
    t = triples.new_triple(f"<{T}>", f"<{T}#rel>", f"<{T}#a>")
    assert terms.term_value(t.subject) == T
    assert terms.term_value(t.object) == f"{T}#a"
    t = triples.new_triple(f"<{T}>", f"<{T}#rel>", '"some literal"@en')
    assert terms.term_value(t.object) == "some literal"
    assert terms.term_language(t.object) == "en"
    t = triples.new_triple(f"<{T}>", f"<{T}#rel>", f'"some literal"^^<{T}#literal>')
    assert terms.term_datatype(t.object) == f"{T}#literal"


@pytest.mark.parametrize(
    "s,p,o",
    [
        ('"some literal"', f"<{T}#rel>", f"<{T}#a>"),
        (f"<{T}>", '"some literal"', f"<{T}#a>"),
        (f"{T}>", f"<{T}#rel>", f"<{T}#a>"),
        (f"<{T}>", f"<{T}#rel", f"<{T}#a>"),
        (f"<{T}>", f"<{T}#rel>", f"{T}#a>"),
    ],
)
def test_new_triple_invalid(s, p, o):
    with pytest.raises(triples.InvalidTripleError):
        triples.new_triple(s, p, o)


# ---------------------------------------------------------------------------
# Vectorized == scalar over all truth tables + adversarial fuzz corpus
# ---------------------------------------------------------------------------

ALL_TABLE_TERMS = sorted(
    {c[0] for c in itertools.chain(IS_RESOURCE_CASES, IS_LITERAL_CASES, VALUE_CASES,
                                   LANGUAGE_CASES, DATATYPE_CASES)}
)


def _fuzz_corpus(n=4000, seed=1234):
    rng = random.Random(seed)
    alphabet = ['<', '>', '"', '@', '^', '^^', 'a', 'b', '#', '', 'de', 'http://x/y',
                '"@', '"^^', 'é', ' ']
    corpus = []
    for _ in range(n):
        k = rng.randint(0, 8)
        corpus.append("".join(rng.choice(alphabet) for _ in range(k)))
    return corpus


@pytest.mark.parametrize(
    "vec_fn,scalar_fn",
    [
        (terms.v_is_resource, terms.is_resource),
        (terms.v_is_literal, terms.is_literal),
        (terms.v_value, terms.term_value),
        (terms.v_language, terms.term_language),
        (terms.v_datatype, terms.term_datatype),
    ],
)
def test_vectorized_matches_scalar(vec_fn, scalar_fn):
    corpus = ALL_TABLE_TERMS + _fuzz_corpus()
    got = vec_fn(pa.array(corpus, type=pa.string())).to_pylist()
    want = [scalar_fn(s) for s in corpus]
    mismatches = [
        (s, g, w) for s, g, w in zip(corpus, got, want) if g != w
    ]
    assert not mismatches, f"first mismatches: {mismatches[:10]}"


def test_vectorized_encode():
    uris = ["http://a", "http://b#c"]
    assert terms.v_new_resource_term(uris).to_pylist() == ["<http://a>", "<http://b#c>"]
    got = terms.v_new_literal_term(
        ["x", "y", "z"], ["", "de", ""], ["", "", "http://d"]
    ).to_pylist()
    assert got == ['"x"', '"y"@de', '"z"^^<http://d>']
    # scalar parity
    assert got == [
        terms.new_literal_term("x"),
        terms.new_literal_term("y", "de"),
        terms.new_literal_term("z", "", "http://d"),
    ]


def test_v_valid_mask():
    tbl = triples.triples_to_table(
        [
            (f"<{T}>", f"<{T}#rel>", '"lit"'),
            ('"bad"', f"<{T}#rel>", '"lit"'),
            (f"<{T}>", "nope", '"lit"'),
            (f"<{T}>", f"<{T}#rel>", "bad"),
        ]
    )
    assert triples.v_valid_mask(tbl).to_pylist() == [True, False, False, False]
