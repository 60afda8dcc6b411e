"""OWL resource structs — views over triples.

Each struct is a typed view of all triples sharing a subject:
``to_triples()`` flattens struct → rows (the engine's ``flat_map``
direction; reference: ontology_class.go:19-70,
ontology_object_prop.go:29-157, ontology_data_prop.go:22-100,
ontology_datatype.go:16-45, ontology_individual.go:34-101), and
``pivot_*`` rebuilds struct ← rows (the groupby-pivot direction;
reference predicate-dispatch loops: ontology_graph.go:290-514).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .. import constants as C
from ..literals import GenericLiteral
from ..terms import (
    is_literal,
    is_resource,
    new_literal_term,
    new_resource_term,
    term_language,
    term_value,
)
from ..triples import Triple


class ResourceNotFoundError(LookupError):
    """Requested URI is not a resource of the asked kind
    (reference: ErrResourceNotFound, ontology_graph.go:728)."""


class ResourceDoesNotBelongToGraphError(ValueError):
    """Resource URI prefix does not match the graph URI
    (reference: ErrResourceDoesNotBelongToGraph, ontology_graph.go:731)."""


def _label_comment_triples(subj: str, label: dict, comment: dict) -> list[Triple]:
    out = []
    for lang, text in (label or {}).items():
        out.append(Triple(subj, new_resource_term(C.RDFS_LABEL), new_literal_term(text, lang, "")))
    for lang, text in (comment or {}).items():
        out.append(Triple(subj, new_resource_term(C.RDFS_COMMENT), new_literal_term(text, lang, "")))
    return out


@dataclass
class OntologyClass:
    uri: str = ""
    equivalent_to: list[str] = field(default_factory=list)
    sub_class_of: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        subj = new_resource_term(self.uri)
        trps = [Triple(subj, new_resource_term(C.RDF_TYPE), new_resource_term(C.OWL_CLASS))]
        trps += [
            Triple(subj, new_resource_term(C.OWL_EQUIVALENT_CLASS), new_resource_term(u))
            for u in self.equivalent_to
        ]
        trps += [
            Triple(subj, new_resource_term(C.RDFS_SUB_CLASS_OF), new_resource_term(u))
            for u in self.sub_class_of
        ]
        trps += [
            Triple(subj, new_resource_term(C.OWL_DISJOINT_WITH), new_resource_term(u))
            for u in self.disjoint_with
        ]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyObjectProperty:
    uri: str = ""
    equivalent_to: list[str] = field(default_factory=list)
    sub_property_of: list[str] = field(default_factory=list)
    inverse_of: list[str] = field(default_factory=list)
    domains: list[str] = field(default_factory=list)
    ranges: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    is_functional: bool = False
    is_inverse_functional: bool = False
    is_transitive: bool = False
    is_symmetric: bool = False
    is_asymmetric: bool = False
    is_reflexive: bool = False
    is_irreflexive: bool = False
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        subj = new_resource_term(self.uri)
        r = new_resource_term
        trps = [Triple(subj, r(C.RDF_TYPE), r(C.OWL_OBJECT_PROPERTY))]
        trps += [Triple(subj, r(C.OWL_EQUIVALENT_PROPERTY), r(u)) for u in self.equivalent_to]
        trps += [Triple(subj, r(C.RDFS_SUB_PROPERTY_OF), r(u)) for u in self.sub_property_of]
        trps += [Triple(subj, r(C.OWL_INVERSE_OF), r(u)) for u in self.inverse_of]
        trps += [Triple(subj, r(C.RDFS_DOMAIN), r(u)) for u in self.domains]
        trps += [Triple(subj, r(C.RDFS_RANGE), r(u)) for u in self.ranges]
        trps += [Triple(subj, r(C.OWL_PROPERTY_DISJOINT_WITH), r(u)) for u in self.disjoint_with]
        flags = [
            (self.is_functional, C.OWL_FUNCTIONAL_PROPERTY),
            (self.is_inverse_functional, C.OWL_INVERSE_FUNCTIONAL_PROPERTY),
            (self.is_transitive, C.OWL_TRANSITIVE_PROPERTY),
            (self.is_symmetric, C.OWL_SYMMETRIC_PROPERTY),
            (self.is_asymmetric, C.OWL_ASYMMETRIC_PROPERTY),
            (self.is_reflexive, C.OWL_REFLEXIVE_PROPERTY),
            (self.is_irreflexive, C.OWL_IRREFLEXIVE_PROPERTY),
        ]
        trps += [Triple(subj, r(C.RDF_TYPE), r(uri)) for on, uri in flags if on]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyDataProperty:
    uri: str = ""
    equivalent_to: list[str] = field(default_factory=list)
    sub_property_of: list[str] = field(default_factory=list)
    domains: list[str] = field(default_factory=list)
    ranges: list[str] = field(default_factory=list)
    disjoint_with: list[str] = field(default_factory=list)
    is_functional: bool = False
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        subj = new_resource_term(self.uri)
        r = new_resource_term
        trps = [Triple(subj, r(C.RDF_TYPE), r(C.OWL_DATATYPE_PROPERTY))]
        trps += [Triple(subj, r(C.OWL_EQUIVALENT_PROPERTY), r(u)) for u in self.equivalent_to]
        trps += [Triple(subj, r(C.RDFS_SUB_PROPERTY_OF), r(u)) for u in self.sub_property_of]
        trps += [Triple(subj, r(C.RDFS_DOMAIN), r(u)) for u in self.domains]
        trps += [Triple(subj, r(C.RDFS_RANGE), r(u)) for u in self.ranges]
        trps += [Triple(subj, r(C.OWL_PROPERTY_DISJOINT_WITH), r(u)) for u in self.disjoint_with]
        if self.is_functional:
            trps.append(Triple(subj, r(C.RDF_TYPE), r(C.OWL_FUNCTIONAL_PROPERTY)))
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyDatatype:
    uri: str = ""
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def to_triples(self) -> list[Triple]:
        subj = new_resource_term(self.uri)
        trps = [
            Triple(subj, new_resource_term(C.RDF_TYPE), new_resource_term(C.RDFS_DATATYPE))
        ]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


@dataclass
class OntologyIndividual:
    uri: str = ""
    types: list[str] = field(default_factory=list)
    same_individual_as: list[str] = field(default_factory=list)
    object_properties: dict[str, list[str]] = field(default_factory=dict)
    data_properties: dict[str, list[GenericLiteral]] = field(default_factory=dict)
    label: dict[str, str] = field(default_factory=dict)
    comment: dict[str, str] = field(default_factory=dict)

    def get_uri(self) -> str:
        return self.uri

    def add_object_property(self, prop: str, target: str) -> None:
        self.object_properties.setdefault(prop, []).append(target)

    def add_data_property(self, prop: str, literal: GenericLiteral) -> None:
        self.data_properties.setdefault(prop, []).append(literal)

    def to_triples(self) -> list[Triple]:
        subj = new_resource_term(self.uri)
        r = new_resource_term
        trps = [Triple(subj, r(C.RDF_TYPE), r(C.OWL_NAMED_INDIVIDUAL))]
        trps += [Triple(subj, r(C.RDF_TYPE), r(u)) for u in self.types]
        trps += [Triple(subj, r(C.OWL_SAME_AS), r(u)) for u in self.same_individual_as]
        for prop, targets in self.object_properties.items():
            trps += [Triple(subj, r(prop), r(u)) for u in targets]
        for prop, lits in self.data_properties.items():
            trps += [Triple(subj, r(prop), lit.term) for lit in lits]
        trps += _label_comment_triples(subj, self.label, self.comment)
        return trps


OntologyResource = (
    OntologyClass
    | OntologyObjectProperty
    | OntologyDataProperty
    | OntologyDatatype
    | OntologyIndividual
)


# ---------------------------------------------------------------------------
# Pivots: (predicate, object) rows for one subject → struct
# (the per-group body of groupby("subject").map_groups(pivot))
# ---------------------------------------------------------------------------

_R = new_resource_term


def pivot_class(uri: str, pairs: list[tuple[str, str]]) -> OntologyClass:
    cls = OntologyClass(uri="")
    for p, o in pairs:
        if p == _R(C.RDF_TYPE) and o == _R(C.OWL_CLASS):
            cls.uri = uri
        elif p == _R(C.OWL_EQUIVALENT_CLASS):
            cls.equivalent_to.append(term_value(o))
        elif p == _R(C.RDFS_SUB_CLASS_OF):
            cls.sub_class_of.append(term_value(o))
        elif p == _R(C.OWL_DISJOINT_WITH):
            cls.disjoint_with.append(term_value(o))
        elif p == _R(C.RDFS_LABEL):
            cls.label[term_language(o)] = term_value(o)
        elif p == _R(C.RDFS_COMMENT):
            cls.comment[term_language(o)] = term_value(o)
    if cls.uri == "":
        raise ResourceNotFoundError(uri)
    return cls


_OBJ_FLAG_URIS = {
    C.OWL_FUNCTIONAL_PROPERTY: "is_functional",
    C.OWL_INVERSE_FUNCTIONAL_PROPERTY: "is_inverse_functional",
    C.OWL_TRANSITIVE_PROPERTY: "is_transitive",
    C.OWL_SYMMETRIC_PROPERTY: "is_symmetric",
    C.OWL_ASYMMETRIC_PROPERTY: "is_asymmetric",
    C.OWL_REFLEXIVE_PROPERTY: "is_reflexive",
    C.OWL_IRREFLEXIVE_PROPERTY: "is_irreflexive",
}


def pivot_object_property(uri: str, pairs: list[tuple[str, str]]) -> OntologyObjectProperty:
    prop = OntologyObjectProperty(uri="")
    for p, o in pairs:
        if p == _R(C.RDF_TYPE) and o == _R(C.OWL_OBJECT_PROPERTY):
            prop.uri = uri
        elif p == _R(C.OWL_EQUIVALENT_PROPERTY):
            prop.equivalent_to.append(term_value(o))
        elif p == _R(C.RDFS_SUB_PROPERTY_OF):
            prop.sub_property_of.append(term_value(o))
        elif p == _R(C.OWL_INVERSE_OF):
            prop.inverse_of.append(term_value(o))
        elif p == _R(C.RDFS_DOMAIN):
            prop.domains.append(term_value(o))
        elif p == _R(C.RDFS_RANGE):
            prop.ranges.append(term_value(o))
        elif p == _R(C.OWL_PROPERTY_DISJOINT_WITH):
            prop.disjoint_with.append(term_value(o))
        elif p == _R(C.RDF_TYPE) and term_value(o) in _OBJ_FLAG_URIS:
            setattr(prop, _OBJ_FLAG_URIS[term_value(o)], True)
        elif p == _R(C.RDFS_LABEL):
            prop.label[term_language(o)] = term_value(o)
        elif p == _R(C.RDFS_COMMENT):
            prop.comment[term_language(o)] = term_value(o)
    if prop.uri == "":
        raise ResourceNotFoundError(uri)
    return prop


def pivot_data_property(uri: str, pairs: list[tuple[str, str]]) -> OntologyDataProperty:
    prop = OntologyDataProperty(uri="")
    for p, o in pairs:
        if p == _R(C.RDF_TYPE) and o == _R(C.OWL_DATATYPE_PROPERTY):
            prop.uri = uri
        elif p == _R(C.OWL_EQUIVALENT_PROPERTY):
            prop.equivalent_to.append(term_value(o))
        elif p == _R(C.RDFS_SUB_PROPERTY_OF):
            prop.sub_property_of.append(term_value(o))
        elif p == _R(C.RDFS_DOMAIN):
            prop.domains.append(term_value(o))
        elif p == _R(C.RDFS_RANGE):
            prop.ranges.append(term_value(o))
        elif p == _R(C.OWL_PROPERTY_DISJOINT_WITH):
            prop.disjoint_with.append(term_value(o))
        elif p == _R(C.RDF_TYPE) and o == _R(C.OWL_FUNCTIONAL_PROPERTY):
            prop.is_functional = True
        elif p == _R(C.RDFS_LABEL):
            prop.label[term_language(o)] = term_value(o)
        elif p == _R(C.RDFS_COMMENT):
            prop.comment[term_language(o)] = term_value(o)
    if prop.uri == "":
        raise ResourceNotFoundError(uri)
    return prop


def pivot_datatype(uri: str, pairs: list[tuple[str, str]]) -> OntologyDatatype:
    dt = OntologyDatatype(uri="")
    for p, o in pairs:
        if p == _R(C.RDF_TYPE) and o == _R(C.RDFS_DATATYPE):
            dt.uri = uri
        elif p == _R(C.RDFS_LABEL):
            dt.label[term_language(o)] = term_value(o)
        elif p == _R(C.RDFS_COMMENT):
            dt.comment[term_language(o)] = term_value(o)
    if dt.uri == "":
        raise ResourceNotFoundError(uri)
    return dt


def pivot_individual(uri: str, pairs: list[tuple[str, str]]) -> OntologyIndividual:
    """Predicate-dispatch pivot for individuals: rdf:type owl:NamedIndividual
    is the existence marker; other rdf:type → types; owl:sameAs →
    same_individual_as; any other predicate lands in object or data
    properties by object shape (reference: ontology_graph.go:488-508)."""
    ind = OntologyIndividual(uri="")
    for p, o in pairs:
        if p == _R(C.RDF_TYPE) and o == _R(C.OWL_NAMED_INDIVIDUAL):
            ind.uri = uri
        elif p == _R(C.RDF_TYPE):
            ind.types.append(term_value(o))
        elif p == _R(C.OWL_SAME_AS):
            ind.same_individual_as.append(term_value(o))
        elif p == _R(C.RDFS_LABEL):
            ind.label[term_language(o)] = term_value(o)
        elif p == _R(C.RDFS_COMMENT):
            ind.comment[term_language(o)] = term_value(o)
        else:
            prop = term_value(p)
            if is_resource(o):
                ind.object_properties.setdefault(prop, []).append(term_value(o))
            elif is_literal(o):
                ind.data_properties.setdefault(prop, []).append(GenericLiteral(o))
    if ind.uri == "":
        raise ResourceNotFoundError(uri)
    return ind
