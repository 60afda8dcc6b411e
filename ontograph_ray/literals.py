"""Typed-literal codecs: XSD typed values ⇄ NTriples literal terms.

Mirrors the reference's GenericLiteral + per-XSD-type codec set
(reference: ontology_literal.go:12-178), completing the symmetric set the
reference leaves unfinished (its `ToXSDInteger` is referenced in docs but
never implemented; we provide it). Encodings kept identical:

- integer: base-10 (strconv.Itoa, ontology_literal.go:79)
- decimal: fixed 6-decimal ``%f`` formatting (ontology_literal.go:90)
- boolean: ``true`` / ``false`` (ontology_literal.go:115)
- dateTime: RFC3339 (ontology_literal.go:161)

Vectorized encode/decode for the hot path lives here too; the scalar
class mirrors the reference API for the conformance tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

from . import constants as C
from . import terms


class LiteralTypeMismatchError(ValueError):
    """Raised when converting a generic literal to a specific XSD type it
    does not carry (reference: ErrLiteralTypeMismatch,
    ontology_literal.go:49)."""


@dataclass(frozen=True)
class GenericLiteral:
    """A literal term plus its parsed datatype URI
    (reference: ontology_literal.go:12-25)."""

    term: str

    @property
    def datatype(self) -> str:
        return terms.term_datatype(self.term)

    @property
    def value(self) -> str:
        return terms.term_value(self.term)

    @property
    def language(self) -> str:
        return terms.term_language(self.term)

    def __str__(self) -> str:
        return self.term

    # -- decode (To*) ------------------------------------------------------

    def _require(self, datatype_uri: str) -> None:
        if self.datatype != datatype_uri:
            raise LiteralTypeMismatchError(
                f"literal {self.term!r} is not of type {datatype_uri}"
            )

    def to_string(self) -> str:
        self._require(C.XSD_STRING)
        return self.value

    def to_integer(self) -> int:
        self._require(C.XSD_INTEGER)
        return int(self.value)

    def to_decimal(self) -> float:
        self._require(C.XSD_DECIMAL)
        return float(self.value)

    def to_boolean(self) -> bool:
        self._require(C.XSD_BOOLEAN)
        v = self.value
        # Go strconv.ParseBool accepts 1/t/T/TRUE/true/True and 0/f/F/...
        if v in ("1", "t", "T", "TRUE", "true", "True"):
            return True
        if v in ("0", "f", "F", "FALSE", "false", "False"):
            return False
        raise ValueError(f"invalid boolean literal value {v!r}")

    def to_any_uri(self) -> str:
        self._require(C.XSD_ANY_URI)
        return self.value

    def to_datetime(self) -> datetime:
        self._require(C.XSD_DATETIME)
        return datetime.fromisoformat(self.value.replace("Z", "+00:00"))


# -- encode (From* / .Generic() equivalents) --------------------------------


def xsd_string(value: str) -> GenericLiteral:
    return GenericLiteral(terms.new_literal_term(value, "", C.XSD_STRING))


def xsd_integer(value: int) -> GenericLiteral:
    return GenericLiteral(terms.new_literal_term(str(int(value)), "", C.XSD_INTEGER))


def xsd_decimal(value: float) -> GenericLiteral:
    # Reference uses Go fmt.Sprintf("%f") → fixed 6 decimals ("42.000000").
    return GenericLiteral(terms.new_literal_term(f"{float(value):f}", "", C.XSD_DECIMAL))


def xsd_boolean(value: bool) -> GenericLiteral:
    return GenericLiteral(
        terms.new_literal_term("true" if value else "false", "", C.XSD_BOOLEAN)
    )


def xsd_any_uri(value: str) -> GenericLiteral:
    return GenericLiteral(terms.new_literal_term(value, "", C.XSD_ANY_URI))


def xsd_datetime(value: datetime) -> GenericLiteral:
    if value.tzinfo is None:
        value = value.replace(tzinfo=timezone.utc)
    text = value.isoformat(timespec="seconds").replace("+00:00", "Z")
    return GenericLiteral(terms.new_literal_term(text, "", C.XSD_DATETIME))


# ---------------------------------------------------------------------------
# Vectorized codecs (Arrow columns → encoded literal term columns and back)
# ---------------------------------------------------------------------------


def v_encode_integer(values) -> pa.Array:
    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    return terms.v_new_literal_term(pc.cast(arr, pa.string()), None, C.XSD_INTEGER)


def v_encode_string(values) -> pa.Array:
    return terms.v_new_literal_term(values, None, C.XSD_STRING)


def v_encode_decimal(values) -> pa.Array:
    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    # Match Go %f: fixed-point, 6 decimals.
    import numpy as np

    np_vals = arr.to_numpy(zero_copy_only=False)
    text = pa.array(np.char.mod("%f", np_vals.astype(np.float64)))
    return terms.v_new_literal_term(text, None, C.XSD_DECIMAL)


def v_encode_boolean(values) -> pa.Array:
    arr = values if isinstance(values, (pa.Array, pa.ChunkedArray)) else pa.array(values)
    text = pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
    return terms.v_new_literal_term(text, None, C.XSD_BOOLEAN)


def v_decode(terms_col) -> pa.StructArray:
    """Decode a literal-term column into a struct column
    (value, language, datatype) for vectorized predicates."""
    value = terms.v_value(terms_col)
    language = terms.v_language(terms_col)
    datatype = terms.v_datatype(terms_col)

    def _chunkless(a):
        return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

    return pa.StructArray.from_arrays(
        [_chunkless(value), _chunkless(language), _chunkless(datatype)],
        names=["value", "language", "datatype"],
    )
