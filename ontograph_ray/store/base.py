"""GraphStore contract + shared errors.

The engine keeps the reference's 16-method store surface
(reference: graph_store.go:9-50) as a Python protocol with two
implementations: an eager Arrow-table MemoryGraphStore with exact
checked/rollback semantics for small graphs, and a lazy Ray-Dataset
DatasetGraphStore for bulk, distributed operation.
"""

from __future__ import annotations

from typing import Optional, Protocol, Sequence, runtime_checkable

from ..triples import Triple


class TripleAlreadyExistsError(ValueError):
    """Conflict on checked add (reference: ErrTripleAlreadyExists,
    graph_store.go:57)."""


class TripleDoesNotExistError(ValueError):
    """Conflict on checked delete (reference: ErrTripleDoesNotExist,
    graph_store.go:60)."""


@runtime_checkable
class GraphStore(Protocol):
    """Named graph holding a set of triples; wildcard convention: empty
    string matches anything, per position (graph_store.go:13-19)."""

    def get_uri(self) -> str: ...

    def get_first_match(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> Optional[Triple]: ...

    def get_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> list[Triple]: ...

    def delete_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> None: ...

    def get_all_triples(self) -> list[Triple]: ...

    def add_triple(self, triple: Triple) -> None: ...

    def add_triples(self, triples: Sequence[Triple]) -> None: ...

    def add_triple_unchecked(self, triple: Triple) -> None: ...

    def add_triples_unchecked(self, triples: Sequence[Triple]) -> None: ...

    def delete_triple(self, triple: Triple) -> None: ...

    def delete_triples(self, triples: Sequence[Triple]) -> None: ...

    def delete_triple_unchecked(self, triple: Triple) -> None: ...

    def delete_triples_unchecked(self, triples: Sequence[Triple]) -> None: ...

    def drop(self) -> None: ...

    def serialize_to_turtle(self, pretty: bool = False) -> str: ...

    def size(self) -> int: ...
