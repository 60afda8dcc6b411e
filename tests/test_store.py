"""GraphStore conformance corpus — the reference's 7-triple fixture and
Describe blocks (reference: memory_store_test.go:19-401 ≡
blazegraph_store_test.go), run against the eager MemoryGraphStore.
The Dataset backend runs the same fixture in test_store_dataset.py.
"""

import pytest

from ontograph_ray import terms
from ontograph_ray.store import (
    MemoryGraphStore,
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_ray.triples import Triple, new_triple

G = "https://www.ontograph.com/test-fixture"


def fixture_triples(g: str = G) -> list[Triple]:
    r = terms.new_resource_term
    lit = terms.new_literal_term
    return [
        new_triple(r(g), r(f"{g}#rel-1"), r(f"{g}#a")),
        new_triple(r(g), r(f"{g}#rel-1"), r(f"{g}#b")),
        new_triple(r(g), r(f"{g}#rel-1"), r(f"{g}#c")),
        new_triple(r(f"{g}#a"), r(f"{g}#rel-2"), r(f"{g}#b")),
        new_triple(r(f"{g}#c"), r(f"{g}#rel-3"), lit("lit1")),
        new_triple(r(f"{g}#c"), r(f"{g}#rel-4"), lit("lit2", "de")),
        new_triple(r(f"{g}#c"), r(f"{g}#rel-5"), lit("lit3", "", f"{g}#datatype")),
    ]


@pytest.fixture
def store():
    s = MemoryGraphStore(G)
    s.add_triples(fixture_triples())
    return s


TT = fixture_triples()


def test_get_uri(store):
    assert store.get_uri() == G


class TestGetFirstMatch:
    def test_exactly_one_match(self, store):
        t = store.get_first_match("", f"<{G}#rel-3>", '"lit1"')
        assert t == TT[4]

    def test_multiple_matches_returns_one(self, store):
        t = store.get_first_match(f"<{G}>", f"<{G}#rel-1>", "")
        assert t in TT[0:3]

    def test_no_match_returns_none(self, store):
        assert store.get_first_match("", f"<{G}#rel-42>", "") is None


class TestGetAllMatches:
    def test_matches(self, store):
        trps = store.get_all_matches("", f"<{G}#rel-1>", "")
        assert sorted(trps) == sorted(TT[0:3])

    def test_no_match(self, store):
        assert store.get_all_matches("", f"<{G}#rel-1>", '"lit1"') == []

    def test_all_wildcard(self, store):
        assert sorted(store.get_all_matches("", "", "")) == sorted(TT)


class TestDeleteAllMatches:
    def test_multiple_matches(self, store):
        store.delete_all_matches("", "", f"<{G}#b>")
        trps = store.get_all_triples()
        assert TT[0] in trps and TT[2] in trps
        assert TT[1] not in trps and TT[3] not in trps
        assert all(t in trps for t in TT[4:7])

    def test_no_match_unchanged(self, store):
        store.delete_all_matches(f"<{G}#42>", "", "")
        assert sorted(store.get_all_triples()) == sorted(TT)


def test_get_all_triples(store):
    assert sorted(store.get_all_triples()) == sorted(TT)


class TestAddTriple:
    def test_new(self, store):
        t = new_triple(f"<{G}#a>", f"<{G}#rel-2>", f"<{G}#c>")
        store.add_triple(t)
        assert t in store.get_all_triples()

    def test_existing_checked_errors(self, store):
        with pytest.raises(TripleAlreadyExistsError):
            store.add_triple(TT[3])
        assert sorted(store.get_all_triples()) == sorted(TT)

    def test_existing_unchecked_ok(self, store):
        store.add_triple_unchecked(TT[3])
        assert sorted(store.get_all_triples()) == sorted(TT)


class TestAddTriples:
    def _new(self):
        return [
            new_triple(f"<{G}#a>", f"<{G}#rel-2>", f"<{G}#d>"),
            new_triple(f"<{G}#d>", f"<{G}#rel-2>", f"<{G}#e>"),
            new_triple(f"<{G}#a>", f"<{G}#rel-6>", '"lit"@en'),
        ]

    def test_none_exist(self, store):
        new = self._new()
        store.add_triples(new)
        trps = store.get_all_triples()
        assert all(t in trps for t in new)

    def test_some_exist_checked_rolls_back(self, store):
        new = self._new()
        new[1] = TT[3]  # conflict in the middle
        with pytest.raises(TripleAlreadyExistsError):
            store.add_triples(new)
        # all-or-nothing: store unchanged
        assert sorted(store.get_all_triples()) == sorted(TT)

    def test_some_exist_unchecked_adds_rest(self, store):
        new = self._new()
        new[1] = TT[3]
        store.add_triples_unchecked(new)
        trps = store.get_all_triples()
        assert new[0] in trps and new[2] in trps
        # existing triple not duplicated
        assert (
            len(store.get_all_matches(TT[3].subject, TT[3].predicate, TT[3].object))
            == 1
        )


class TestDeleteTriple:
    def test_existing(self, store):
        store.delete_triple(TT[2])
        assert TT[2] not in store.get_all_triples()

    def test_missing_checked_errors(self, store):
        t = new_triple(f"<{G}>", f"<{G}#rel-42>", f"<{G}#c>")
        with pytest.raises(TripleDoesNotExistError):
            store.delete_triple(t)
        assert sorted(store.get_all_triples()) == sorted(TT)

    def test_missing_unchecked_ok(self, store):
        t = new_triple(f"<{G}>", f"<{G}#rel-42>", f"<{G}#c>")
        store.delete_triple_unchecked(t)
        assert sorted(store.get_all_triples()) == sorted(TT)


class TestDeleteTriples:
    def test_all_exist(self, store):
        store.delete_triples([TT[3], TT[0], TT[4]])
        trps = store.get_all_triples()
        assert TT[3] not in trps and TT[0] not in trps and TT[4] not in trps

    def test_some_missing_checked_rolls_back(self, store):
        missing = new_triple(f"<{G}#c>", f"<{G}#rel-42>", '"lit1"')
        with pytest.raises(TripleDoesNotExistError):
            store.delete_triples([TT[3], TT[0], missing])
        assert sorted(store.get_all_triples()) == sorted(TT)

    def test_some_missing_unchecked_deletes_rest(self, store):
        missing = new_triple(f"<{G}#c>", f"<{G}#rel-42>", '"lit1"')
        store.delete_triples_unchecked([TT[3], TT[0], missing])
        trps = store.get_all_triples()
        assert TT[3] not in trps and TT[0] not in trps


def test_drop(store):
    store.drop()
    assert store.get_uri() == ""
    assert store.size() == 0


class TestTurtleRoundTrip:
    def test_plain(self, store):
        ttl = store.serialize_to_turtle(pretty=False)
        loaded = MemoryGraphStore.parse_from_turtle(ttl)
        assert sorted(loaded.get_all_triples()) == sorted(TT)

    def test_pretty(self, store):
        ttl = store.serialize_to_turtle(pretty=True)
        assert "@prefix rdf:" in ttl and f"@base <{G}>" in ttl
        loaded = MemoryGraphStore.parse_from_turtle(ttl)
        assert sorted(loaded.get_all_triples()) == sorted(TT)

    def test_base_uri_inference_prefers_ontology_triple(self):
        import ontograph_ray.constants as C

        s = MemoryGraphStore("http://g")
        s.add_triple_unchecked(
            new_triple("<http://other>", f"<{G}#rel>", '"x"')
        )
        s.add_triple_unchecked(
            new_triple(
                "<http://g>",
                terms.new_resource_term(C.RDF_TYPE),
                terms.new_resource_term(C.OWL_ONTOLOGY),
            )
        )
        loaded = MemoryGraphStore.parse_from_turtle(s.serialize_to_turtle())
        assert loaded.get_uri() == "http://g"

    def test_empty_errors(self):
        from ontograph_ray.store.turtle import TurtleParseError

        with pytest.raises(TurtleParseError):
            MemoryGraphStore.parse_from_turtle("")


def test_size(store):
    assert store.size() == len(TT)
