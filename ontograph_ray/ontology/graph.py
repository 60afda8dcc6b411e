"""OntologyGraph — the query layer over a GraphStore.

Higher-level OWL view of a named triple graph: ontology bootstrap
triple, version/imports/label/comment metadata upserts, resource
upsert/delete/get pivots, and filtered individual retrieval (reference:
ontology_graph.go:19-611). Works against any backend satisfying the
GraphStore protocol; the distributed plan for bulk individual
retrieval lives in ontology/query.py.
"""

from __future__ import annotations

from .. import constants as C
from ..literals import GenericLiteral
from ..terms import new_literal_term, new_resource_term, term_language, term_value
from ..triples import Triple
from .resources import (
    OntologyClass,
    OntologyDataProperty,
    OntologyDatatype,
    OntologyIndividual,
    OntologyObjectProperty,
    OntologyResource,
    ResourceDoesNotBelongToGraphError,
    ResourceNotFoundError,
    pivot_class,
    pivot_data_property,
    pivot_datatype,
    pivot_individual,
    pivot_object_property,
)


class OntologyAlreadyExistsError(ValueError):
    """reference: ErrOntologyAlreadyExists, ontology_graph.go:725"""


class OntologyNotFoundError(LookupError):
    """reference: ErrOntologyNotFound, ontology_graph.go:722"""


_R = new_resource_term


class OntologyGraph:
    def __init__(self, graph):
        self.graph = graph
        self._label: dict[str, str] = {}
        self._comment: dict[str, str] = {}

    # -- constructors (init vs load; existence is itself a triple) ---------

    @classmethod
    def init(cls, graph) -> "OntologyGraph":
        """Create: assert ``<g> rdf:type owl:Ontology`` absent, add it
        (reference: ontology_graph.go:19-48)."""
        marker = cls._marker(graph)
        if graph.get_first_match(*marker) is not None:
            raise OntologyAlreadyExistsError(graph.get_uri())
        graph.add_triple_unchecked(Triple(*marker))
        return cls(graph)

    @classmethod
    def load(cls, graph) -> "OntologyGraph":
        """Open existing; caches label/comment maps by language
        (reference: ontology_graph.go:53-99)."""
        marker = cls._marker(graph)
        if graph.get_first_match(*marker) is None:
            raise OntologyNotFoundError(graph.get_uri())
        ont = cls(graph)
        for t in graph.get_all_matches(_R(graph.get_uri()), _R(C.RDFS_LABEL), ""):
            ont._label[term_language(t.object)] = term_value(t.object)
        for t in graph.get_all_matches(_R(graph.get_uri()), _R(C.RDFS_COMMENT), ""):
            ont._comment[term_language(t.object)] = term_value(t.object)
        return ont

    @staticmethod
    def _marker(graph) -> tuple[str, str, str]:
        return (_R(graph.get_uri()), _R(C.RDF_TYPE), _R(C.OWL_ONTOLOGY))

    def get_uri(self) -> str:
        return self.graph.get_uri()

    # -- metadata ----------------------------------------------------------

    def get_version(self) -> str:
        t = self.graph.get_first_match(_R(self.get_uri()), _R(C.OWL_VERSION_INFO), "")
        return term_value(t.object) if t else ""

    def set_version(self, version: str) -> None:
        """Delete-then-insert upsert (reference: ontology_graph.go:124-141)."""
        self.graph.delete_all_matches(_R(self.get_uri()), _R(C.OWL_VERSION_INFO), "")
        self.graph.add_triple_unchecked(
            Triple(_R(self.get_uri()), _R(C.OWL_VERSION_INFO), new_literal_term(version))
        )

    def get_imports(self) -> list[str]:
        return [
            term_value(t.object)
            for t in self.graph.get_all_matches(_R(self.get_uri()), _R(C.OWL_IMPORTS), "")
        ]

    def add_import(self, uri: str) -> None:
        """Checked add — duplicate import raises
        (reference: ontology_graph.go:163-170)."""
        self.graph.add_triple(
            Triple(_R(self.get_uri()), _R(C.OWL_IMPORTS), _R(uri))
        )

    def set_label(self, label: str, lang: str = "") -> None:
        """Per-language upsert; empty label deletes
        (reference: ontology_graph.go:175-201)."""
        if lang in self._label:
            self.graph.delete_triple_unchecked(
                Triple(
                    _R(self.get_uri()),
                    _R(C.RDFS_LABEL),
                    new_literal_term(self._label[lang], lang, ""),
                )
            )
            del self._label[lang]
        if label == "":
            return
        self.graph.add_triple_unchecked(
            Triple(_R(self.get_uri()), _R(C.RDFS_LABEL), new_literal_term(label, lang, ""))
        )
        self._label[lang] = label

    def get_label(self, lang: str = "") -> str:
        return self._label.get(lang, "")

    def set_comment(self, comment: str, lang: str = "") -> None:
        if lang in self._comment:
            self.graph.delete_triple_unchecked(
                Triple(
                    _R(self.get_uri()),
                    _R(C.RDFS_COMMENT),
                    new_literal_term(self._comment[lang], lang, ""),
                )
            )
            del self._comment[lang]
        if comment == "":
            return
        self.graph.add_triple_unchecked(
            Triple(_R(self.get_uri()), _R(C.RDFS_COMMENT), new_literal_term(comment, lang, ""))
        )
        self._comment[lang] = comment

    def get_comment(self, lang: str = "") -> str:
        return self._comment.get(lang, "")

    # -- resource CRUD -----------------------------------------------------

    def upsert_resource(self, resource: OntologyResource) -> None:
        """Ownership check (URI prefix before last '#' must equal the
        graph URI), then delete-and-reinsert
        (reference: ontology_graph.go:267-276)."""
        uri = resource.get_uri()
        if uri[: uri.rfind("#")] != self.get_uri():
            raise ResourceDoesNotBelongToGraphError(uri)
        self.delete_resource(uri)
        self.graph.add_triples_unchecked(resource.to_triples())

    def delete_resource(self, uri: str) -> None:
        """Cascade: remove all triples with the URI as subject and as
        object (reference: ontology_graph.go:279-287)."""
        self.graph.delete_all_matches(_R(uri), "", "")
        self.graph.delete_all_matches("", "", _R(uri))

    # -- pivots (single-resource get) --------------------------------------

    def _pairs(self, uri: str) -> list[tuple[str, str]]:
        return [
            (t.predicate, t.object)
            for t in self.graph.get_all_matches(_R(uri), "", "")
        ]

    def get_class(self, uri: str) -> OntologyClass:
        return pivot_class(uri, self._pairs(uri))

    def get_object_property(self, uri: str) -> OntologyObjectProperty:
        return pivot_object_property(uri, self._pairs(uri))

    def get_data_property(self, uri: str) -> OntologyDataProperty:
        return pivot_data_property(uri, self._pairs(uri))

    def get_datatype(self, uri: str) -> OntologyDatatype:
        return pivot_datatype(uri, self._pairs(uri))

    def get_individual(self, uri: str) -> OntologyIndividual:
        return pivot_individual(uri, self._pairs(uri))

    # -- filtered retrieval (O14) ------------------------------------------

    def get_individuals(self, filters: "TripleFilter | None" = None) -> list[OntologyIndividual]:
        """OR-of-AND filtered retrieval (reference:
        ontology_graph.go:532-611). Set-based: each filter triple
        resolves to its matching subject set; AND-groups intersect,
        OR unions (order-preserving first-seen like the reference)."""
        candidates: list[str] = []
        if not filters:
            for t in self.graph.get_all_matches(
                "", _R(C.RDF_TYPE), _R(C.OWL_NAMED_INDIVIDUAL)
            ):
                candidates.append(term_value(t.subject))
        else:
            seen = set()
            for and_group in filters:
                pool: list[str] | None = None
                for ft in and_group:
                    matches = self.graph.get_all_matches(ft.subject, ft.predicate, ft.object)
                    subjects = [term_value(t.subject) for t in matches]
                    if pool is None:
                        pool = subjects
                    else:
                        want = set(subjects)
                        pool = [s for s in pool if s in want]
                    if not pool:
                        break
                for cand in pool or []:
                    if cand not in seen:
                        seen.add(cand)
                        candidates.append(cand)
        return [self.get_individual(uri) for uri in candidates]


class TripleFilter(list):
    """OR-of-AND filter: outer list OR, inner lists AND (reference:
    ontology_graph.go:621-715). ``and_*`` appends to the last OR-group,
    ``or_*`` opens a new group. Chainable and immutable-by-return."""

    def _with_new_group(self, t: Triple) -> "TripleFilter":
        out = TripleFilter(list(self))
        out.append([t])
        return out

    def _with_and(self, t: Triple) -> "TripleFilter":
        out = TripleFilter([list(g) for g in self])
        if not out:
            out.append([])
        out[-1].append(t)
        return out

    @staticmethod
    def _class_triple(class_uri: str) -> Triple:
        return Triple("", _R(C.RDF_TYPE), _R(class_uri))

    def or_with_class(self, class_uri: str) -> "TripleFilter":
        return self._with_new_group(self._class_triple(class_uri))

    def and_with_class(self, class_uri: str) -> "TripleFilter":
        return self._with_and(self._class_triple(class_uri))

    def or_with_object_property(self, prop_uri: str, object_uri: str) -> "TripleFilter":
        return self._with_new_group(Triple("", _R(prop_uri), _R(object_uri)))

    def and_with_object_property(self, prop_uri: str, object_uri: str) -> "TripleFilter":
        return self._with_and(Triple("", _R(prop_uri), _R(object_uri)))

    def or_with_data_property(self, prop_uri: str, literal: GenericLiteral) -> "TripleFilter":
        return self._with_new_group(Triple("", _R(prop_uri), literal.term))

    def and_with_data_property(self, prop_uri: str, literal: GenericLiteral) -> "TripleFilter":
        return self._with_and(Triple("", _R(prop_uri), literal.term))
