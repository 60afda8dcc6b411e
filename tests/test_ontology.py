"""Ontology layer conformance — mirrors the reference suite
(reference: ontology_graph_test.go:41-629): metadata upserts, resource
round-trips per kind, ownership rejection, and GetIndividuals filter
semantics."""

import pytest

from ontograph_ray import constants as C
from ontograph_ray import literals as L
from ontograph_ray.ontology import (
    OntologyAlreadyExistsError,
    OntologyClass,
    OntologyDataProperty,
    OntologyDatatype,
    OntologyGraph,
    OntologyIndividual,
    OntologyNotFoundError,
    OntologyObjectProperty,
    ResourceDoesNotBelongToGraphError,
    ResourceNotFoundError,
    TripleFilter,
)
from ontograph_ray.store import MemoryGraphStore

URI = "https://www.ontograph.com/test-ontology"


@pytest.fixture
def ont():
    return OntologyGraph.init(MemoryGraphStore(URI))


def _sorted_ind(i: OntologyIndividual):
    return (
        i.uri,
        sorted(i.types),
        sorted(i.same_individual_as),
        {k: sorted(v) for k, v in i.object_properties.items()},
        {k: sorted(lit.term for lit in v) for k, v in i.data_properties.items()},
        i.label,
        i.comment,
    )


def check_individuals(a: OntologyIndividual, b: OntologyIndividual):
    assert _sorted_ind(a) == _sorted_ind(b)


class TestInitLoad:
    def test_init_twice_errors(self):
        store = MemoryGraphStore(URI)
        OntologyGraph.init(store)
        with pytest.raises(OntologyAlreadyExistsError):
            OntologyGraph.init(store)

    def test_load_missing_errors(self):
        with pytest.raises(OntologyNotFoundError):
            OntologyGraph.load(MemoryGraphStore(URI))

    def test_load_after_init(self):
        store = MemoryGraphStore(URI)
        OntologyGraph.init(store)
        ont = OntologyGraph.load(store)
        assert ont.get_uri() == URI


class TestMetadata:
    def test_version_upsert(self, ont):
        assert ont.get_version() == ""
        ont.set_version("1.0.0")
        assert ont.get_version() == "1.0.0"
        ont.set_version("2.0.0")  # old version removed
        assert ont.get_version() == "2.0.0"
        assert (
            len(
                ont.graph.get_all_matches(
                    f"<{URI}>", f"<{C.OWL_VERSION_INFO}>", ""
                )
            )
            == 1
        )

    def test_imports(self, ont):
        assert ont.get_imports() == []
        ont.add_import("http://other.org/onto1")
        ont.add_import("http://other.org/onto2")
        assert sorted(ont.get_imports()) == [
            "http://other.org/onto1",
            "http://other.org/onto2",
        ]
        from ontograph_ray.store import TripleAlreadyExistsError

        with pytest.raises(TripleAlreadyExistsError):
            ont.add_import("http://other.org/onto1")

    def test_label_upsert_and_remove(self, ont):
        ont.set_label("a label", "")
        ont.set_label("ein Titel", "de")
        assert ont.get_label("") == "a label"
        assert ont.get_label("de") == "ein Titel"
        ont.set_label("neuer Titel", "de")  # overwrite
        assert ont.get_label("de") == "neuer Titel"
        # reload sees persisted labels
        ont2 = OntologyGraph.load(ont.graph)
        assert ont2.get_label("de") == "neuer Titel"
        ont.set_label("", "de")  # empty removes
        assert ont.get_label("de") == ""

    def test_comment_upsert(self, ont):
        ont.set_comment("some comment", "")
        ont.set_comment("ein Kommentar", "de")
        assert ont.get_comment("de") == "ein Kommentar"
        ont.set_comment("", "")
        assert ont.get_comment("") == ""


class TestResourceRoundTrips:
    def test_class(self, ont):
        cls = OntologyClass(
            uri=URI + "#class",
            equivalent_to=["http://abc.com#eq1", "http://abc.com#eq2"],
            sub_class_of=["http://abc.com#parent"],
            disjoint_with=["http://abc.com#dis"],
            label={"": "a label", "de": "ein Titel", "en": "a label"},
            comment={"": "some comment", "de": "ein Kommentar"},
        )
        ont.upsert_resource(cls)
        got = ont.get_class(cls.uri)
        assert got.uri == cls.uri
        assert sorted(got.equivalent_to) == sorted(cls.equivalent_to)
        assert got.sub_class_of == cls.sub_class_of
        assert got.disjoint_with == cls.disjoint_with
        assert got.label == cls.label and got.comment == cls.comment

    def test_object_property_all_flags(self, ont):
        prop = OntologyObjectProperty(
            uri=URI + "#prop",
            equivalent_to=["http://abc.com#eq"],
            sub_property_of=["http://abc.com#sup"],
            inverse_of=["http://abc.com#inv"],
            domains=["http://abc.com#dom"],
            ranges=["http://abc.com#rng"],
            disjoint_with=["http://abc.com#dis"],
            is_functional=True,
            is_inverse_functional=True,
            is_transitive=True,
            is_symmetric=True,
            is_asymmetric=True,
            is_reflexive=True,
            is_irreflexive=True,
            label={"de": "ein Titel"},
            comment={"en": "a comment"},
        )
        ont.upsert_resource(prop)
        got = ont.get_object_property(prop.uri)
        assert got == prop

    def test_data_property(self, ont):
        prop = OntologyDataProperty(
            uri=URI + "#dataprop",
            domains=["http://abc.com#dom"],
            ranges=[C.XSD_STRING],
            is_functional=True,
            label={"": "lbl"},
        )
        ont.upsert_resource(prop)
        got = ont.get_data_property(prop.uri)
        assert got == prop

    def test_datatype(self, ont):
        dt = OntologyDatatype(uri=URI + "#dt", label={"": "lbl"}, comment={"de": "k"})
        ont.upsert_resource(dt)
        assert ont.get_datatype(dt.uri) == dt

    def test_individual_roundtrip(self, ont):
        ind = OntologyIndividual(
            uri=URI + "#indiv",
            types=["http://abc.com#type1", "http://abc.com#type2", "http://abc.com#type3"],
            same_individual_as=["http://abc.com#indiv2"],
            label={"": "a label", "de": "ein title", "en": "a label"},
            comment={"": "some comment", "de": "ein kommentar"},
        )
        ind.add_object_property("http://abc.com#prop1", "http://abc.com#indiv3")
        ind.add_object_property("http://abc.com#prop1", "http://abc.com#indiv4")
        ind.add_object_property("http://abc.com#prop3", "http://abc.com#indiv4")
        ind.add_data_property("http://abc.com#dataprop1", L.xsd_string("Some string literal"))
        ind.add_data_property("http://abc.com#dataprop2", L.xsd_integer(42))
        ont.upsert_resource(ind)
        got = ont.get_individual(ind.uri)
        check_individuals(got, ind)

    def test_upsert_replaces(self, ont):
        cls = OntologyClass(uri=URI + "#c", label={"": "v1"})
        ont.upsert_resource(cls)
        cls2 = OntologyClass(uri=URI + "#c", label={"": "v2"})
        ont.upsert_resource(cls2)
        got = ont.get_class(cls.uri)
        assert got.label == {"": "v2"}

    def test_ownership_rejection(self, ont):
        ind = OntologyIndividual(uri=URI + "x#indiv")
        with pytest.raises(ResourceDoesNotBelongToGraphError):
            ont.upsert_resource(ind)
        with pytest.raises(ResourceNotFoundError):
            ont.get_individual(ind.uri)

    def test_delete_resource_cascades(self, ont):
        a = OntologyIndividual(uri=URI + "#a")
        b = OntologyIndividual(uri=URI + "#b")
        b.add_object_property(URI + "#rel", URI + "#a")
        ont.upsert_resource(a)
        ont.upsert_resource(b)
        ont.delete_resource(a.uri)
        with pytest.raises(ResourceNotFoundError):
            ont.get_individual(a.uri)
        # reference to a removed from b as well (object-side cascade)
        got_b = ont.get_individual(b.uri)
        assert got_b.object_properties == {}


@pytest.fixture
def filter_corpus(ont):
    """The reference's 4-individual filter corpus
    (ontology_graph_test.go:444-492)."""
    i1 = OntologyIndividual(uri=URI + "#indiv1", types=["http://abc.com#type1"])
    i2 = OntologyIndividual(uri=URI + "#indiv2", types=["http://abc.com#type2"])
    i3 = OntologyIndividual(
        uri=URI + "#indiv3",
        types=["http://abc.com#type1", "http://abc.com#type2", "http://abc.com#type3"],
    )
    i4 = OntologyIndividual(
        uri=URI + "#indiv4", types=["http://abc.com#type2", "http://abc.com#type3"]
    )
    i1.add_object_property("http://abc.com#prop1", "http://abc.com#indiv2")
    i1.add_object_property("http://abc.com#prop1", "http://abc.com#indiv3")
    i2.add_object_property("http://abc.com#prop2", "http://abc.com#indiv1")
    i1.add_data_property("http://abc.com#dataprop1", L.xsd_string("Some string literal"))
    i3.add_data_property("http://abc.com#dataprop2", L.xsd_integer(42))
    for i in (i1, i2, i3, i4):
        ont.upsert_resource(i)
    return ont, (i1, i2, i3, i4)


class TestGetIndividuals:
    def test_no_filter_returns_all(self, filter_corpus):
        ont, (i1, i2, i3, i4) = filter_corpus
        got = {i.uri: i for i in ont.get_individuals(None)}
        for want in (i1, i2, i3, i4):
            check_individuals(got[want.uri], want)

    def test_single_class(self, filter_corpus):
        ont, (i1, _, i3, _) = filter_corpus
        f = TripleFilter().or_with_class("http://abc.com#type1")
        got = ont.get_individuals(f)
        assert sorted(i.uri for i in got) == sorted([i1.uri, i3.uri])

    def test_and_classes(self, filter_corpus):
        ont, (_, _, i3, i4) = filter_corpus
        f = (
            TripleFilter()
            .and_with_class("http://abc.com#type2")
            .and_with_class("http://abc.com#type3")
        )
        got = ont.get_individuals(f)
        assert sorted(i.uri for i in got) == sorted([i3.uri, i4.uri])

    def test_or_classes(self, filter_corpus):
        ont, (i1, _, i3, i4) = filter_corpus
        f = (
            TripleFilter()
            .or_with_class("http://abc.com#type1")
            .or_with_class("http://abc.com#type3")
        )
        got = ont.get_individuals(f)
        assert sorted(i.uri for i in got) == sorted([i1.uri, i3.uri, i4.uri])

    def test_object_property(self, filter_corpus):
        ont, (_, i2, _, _) = filter_corpus
        f = TripleFilter().and_with_object_property(
            "http://abc.com#prop2", "http://abc.com#indiv1"
        )
        got = ont.get_individuals(f)
        assert [i.uri for i in got] == [i2.uri]

    def test_data_property(self, filter_corpus):
        ont, (_, _, i3, _) = filter_corpus
        f = TripleFilter().and_with_data_property(
            "http://abc.com#dataprop2", L.xsd_integer(42)
        )
        got = ont.get_individuals(f)
        assert [i.uri for i in got] == [i3.uri]

    def test_mixed_chain(self, filter_corpus):
        ont, (_, i2, i3, _) = filter_corpus
        f = (
            TripleFilter()
            .and_with_class("http://abc.com#type2")
            .and_with_object_property("http://abc.com#prop2", "http://abc.com#indiv1")
            .or_with_class("http://abc.com#type3")
            .and_with_data_property("http://abc.com#dataprop2", L.xsd_integer(42))
        )
        got = ont.get_individuals(f)
        assert sorted(i.uri for i in got) == sorted([i2.uri, i3.uri])
