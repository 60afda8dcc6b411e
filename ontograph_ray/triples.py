"""Triple model: a 3-column Arrow relation of NTriples term strings.

The canonical schema of the whole engine — every graph is a Dataset /
Table with exactly these columns (reference models a triple as a 3-field
struct, triple.go:95-99; validation semantics NewTriple
triple.go:102-120).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from . import terms

SUBJECT = "subject"
PREDICATE = "predicate"
OBJECT = "object"
COLUMNS = [SUBJECT, PREDICATE, OBJECT]

TRIPLE_SCHEMA = pa.schema(
    [(SUBJECT, pa.string()), (PREDICATE, pa.string()), (OBJECT, pa.string())]
)


class InvalidTripleError(ValueError):
    """Raised when a term does not satisfy triple position constraints
    (reference: NewTriple error cases, triple.go:104-112)."""


@dataclass(frozen=True, order=True)
class Triple:
    """One (subject, predicate, object) row; terms in NTriples syntax."""

    subject: str
    predicate: str
    object: str

    def as_tuple(self) -> tuple[str, str, str]:
        return (self.subject, self.predicate, self.object)


def new_triple(subject: str, predicate: str, object_: str) -> Triple:
    """Validated constructor: subject/predicate must be resources, object
    resource-or-literal (reference: triple.go:102-120)."""
    if not terms.is_resource(subject):
        raise InvalidTripleError(f"Subject '{subject}' is not a resource")
    if not terms.is_resource(predicate):
        raise InvalidTripleError(f"Predicate '{predicate}' is not a resource")
    if not terms.is_resource(object_) and not terms.is_literal(object_):
        raise InvalidTripleError(f"Object '{object_}' is not a resource or literal")
    return Triple(subject, predicate, object_)


def triples_to_table(triples: Iterable[Triple | tuple[str, str, str]]) -> pa.Table:
    subs, preds, objs = [], [], []
    for t in triples:
        if isinstance(t, Triple):
            s, p, o = t.as_tuple()
        else:
            s, p, o = t
        subs.append(s)
        preds.append(p)
        objs.append(o)
    return pa.table(
        {SUBJECT: subs, PREDICATE: preds, OBJECT: objs}, schema=TRIPLE_SCHEMA
    )


def table_to_triples(table: pa.Table) -> list[Triple]:
    return [
        Triple(s, p, o)
        for s, p, o in zip(
            table[SUBJECT].to_pylist(),
            table[PREDICATE].to_pylist(),
            table[OBJECT].to_pylist(),
        )
    ]


def v_valid_mask(table: pa.Table) -> pa.ChunkedArray:
    """Vectorized NewTriple validation → bool mask per row."""
    ok_s = terms.v_is_resource(table[SUBJECT])
    ok_p = terms.v_is_resource(table[PREDICATE])
    obj = table[OBJECT]
    ok_o = pc.or_(terms.v_is_resource(obj), terms.v_is_literal(obj))
    return pc.and_(pc.and_(ok_s, ok_p), ok_o)


def empty_table() -> pa.Table:
    return TRIPLE_SCHEMA.empty_table()


def pattern_mask(
    table: pa.Table, subject: str = "", predicate: str = "", object_: str = ""
) -> pa.ChunkedArray | None:
    """Wildcard-pattern match mask; empty string = match-anything per
    position (reference convention, graph_store.go:13-19). Returns None
    when the pattern is all-wildcard (i.e. matches every row)."""
    mask = None
    for col, want in ((SUBJECT, subject), (PREDICATE, predicate), (OBJECT, object_)):
        if want == "":
            continue
        m = pc.equal(table[col], want)
        mask = m if mask is None else pc.and_(mask, m)
    return mask


def sort_key(table: pa.Table) -> Sequence[tuple[str, str]]:
    return [(SUBJECT, "ascending"), (PREDICATE, "ascending"), (OBJECT, "ascending")]
