"""In-memory GraphStore over an ordered triple set + Arrow snapshots.

The small-graph backend with the reference's exact conformance
semantics: set insertion (no duplicate (s,p,o)), checked add/delete
conflicts, all-or-nothing batch operations (reference rolls back with
compensating writes, memory_store.go:137-157/193-213 — here batches are
validated first and applied atomically, same observable behavior),
wildcard pattern matching, Turtle round-trip.

Scales only to driver-sized graphs (ontology/schema graphs, metadata);
the bulk path is DatasetGraphStore.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from .. import triples as tr
from ..triples import Triple
from .base import TripleAlreadyExistsError, TripleDoesNotExistError
from . import turtle


class MemoryGraphStore:
    def __init__(self, uri: str):
        self._uri = uri
        # dict keys = ordered set of (s, p, o)
        self._triples: dict[tuple[str, str, str], None] = {}
        self._table_cache: pa.Table | None = None

    # -- constructors ------------------------------------------------------

    @classmethod
    def parse_from_turtle(cls, text: str) -> "MemoryGraphStore":
        """Parse Turtle/N-Triples text; base URI inferred from the
        ``? rdf:type owl:Ontology`` subject, else the first triple's
        subject; error when empty (reference: memory_store.go:32-60)."""
        parsed, uri = turtle.parse_turtle_with_base(text)
        store = cls(uri)
        store.add_triples_unchecked(parsed)
        return store

    @classmethod
    def from_table(cls, uri: str, table: pa.Table) -> "MemoryGraphStore":
        store = cls(uri)
        store.add_triples_unchecked(tr.table_to_triples(table))
        return store

    # -- core --------------------------------------------------------------

    def get_uri(self) -> str:
        return self._uri

    def to_table(self) -> pa.Table:
        """Arrow snapshot of the graph (cached until next mutation)."""
        if self._table_cache is None:
            self._table_cache = tr.triples_to_table(
                Triple(*k) for k in self._triples
            )
        return self._table_cache

    def _invalidate(self) -> None:
        self._table_cache = None

    def get_first_match(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> Optional[Triple]:
        # Any-match semantics are conformant (memory_store_test.go:64-69);
        # we return the first in insertion order like the reference.
        for s, p, o in self._triples:
            if (
                (subject == "" or s == subject)
                and (predicate == "" or p == predicate)
                and (object == "" or o == object)
            ):
                return Triple(s, p, o)
        return None

    def get_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> list[Triple]:
        if subject == "" and predicate == "" and object == "":
            return [Triple(*k) for k in self._triples]
        table = self.to_table()
        mask = tr.pattern_mask(table, subject, predicate, object)
        return tr.table_to_triples(table.filter(mask))

    def delete_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> None:
        self.delete_triples_unchecked(self.get_all_matches(subject, predicate, object))

    def get_all_triples(self) -> list[Triple]:
        return self.get_all_matches()

    def contains(self, triple: Triple) -> bool:
        return triple.as_tuple() in self._triples

    def add_triple(self, triple: Triple) -> None:
        key = triple.as_tuple()
        if key in self._triples:
            raise TripleAlreadyExistsError(f"Triple already exists: {key}")
        self._triples[key] = None
        self._invalidate()

    def add_triples(self, triples: Sequence[Triple]) -> None:
        """All-or-nothing batch add: conflicts (against the store or
        within the batch) abort without mutation."""
        seen: set[tuple[str, str, str]] = set()
        for t in triples:
            key = t.as_tuple()
            if key in self._triples or key in seen:
                raise TripleAlreadyExistsError(f"Triple already exists: {key}")
            seen.add(key)
        for t in triples:
            self._triples[t.as_tuple()] = None
        if triples:
            self._invalidate()

    def add_triple_unchecked(self, triple: Triple) -> None:
        key = triple.as_tuple()
        if key not in self._triples:
            self._triples[key] = None
            self._invalidate()

    def add_triples_unchecked(self, triples: Sequence[Triple]) -> None:
        for t in triples:
            self._triples[t.as_tuple()] = None
        if triples:
            self._invalidate()

    def delete_triple(self, triple: Triple) -> None:
        key = triple.as_tuple()
        if key not in self._triples:
            raise TripleDoesNotExistError(f"Triple does not exist: {key}")
        del self._triples[key]
        self._invalidate()

    def delete_triples(self, triples: Sequence[Triple]) -> None:
        """All-or-nothing batch delete: every triple must exist."""
        remaining = set(self._triples)
        for t in triples:
            key = t.as_tuple()
            if key not in remaining:
                raise TripleDoesNotExistError(f"Triple does not exist: {key}")
            remaining.discard(key)
        for t in triples:
            self._triples.pop(t.as_tuple(), None)
        if triples:
            self._invalidate()

    def delete_triple_unchecked(self, triple: Triple) -> None:
        self._triples.pop(triple.as_tuple(), None)
        self._invalidate()

    def delete_triples_unchecked(self, triples: Sequence[Triple]) -> None:
        for t in triples:
            self._triples.pop(t.as_tuple(), None)
        if triples:
            self._invalidate()

    def drop(self) -> None:
        """Clear the store and render it unusable
        (reference: memory_store.go:235-239)."""
        self._uri = ""
        self._triples = {}
        self._invalidate()

    def serialize_to_turtle(self, pretty: bool = False) -> str:
        return turtle.serialize(
            self.get_all_triples(), self._uri, pretty=pretty,
            imports=self._import_uris() if pretty else None,
        )

    def _import_uris(self) -> list[str]:
        from .. import constants as C
        from .. import terms

        return [
            terms.term_value(t.object)
            for t in self.get_all_matches(
                terms.new_resource_term(self._uri),
                terms.new_resource_term(C.OWL_IMPORTS),
                "",
            )
        ]

    def size(self) -> int:
        return len(self._triples)
