"""Typed-literal codec tests (the suite the reference admits is missing;
encodings anchored to reference: ontology_literal.go:55-178)."""

from datetime import datetime, timezone

import pyarrow as pa
import pytest

from ontograph_ray import constants as C
from ontograph_ray import literals as L


def test_string_roundtrip():
    lit = L.xsd_string("hello")
    assert lit.term == f'"hello"^^<{C.XSD_STRING}>'
    assert lit.to_string() == "hello"


def test_integer_roundtrip():
    lit = L.xsd_integer(42)
    assert lit.term == f'"42"^^<{C.XSD_INTEGER}>'
    assert lit.to_integer() == 42
    assert L.xsd_integer(-7).to_integer() == -7


def test_decimal_fixed_six_decimals():
    # Go %f formatting: 42.0 → "42.000000" (ontology_literal.go:90)
    lit = L.xsd_decimal(42.0)
    assert lit.term == f'"42.000000"^^<{C.XSD_DECIMAL}>'
    assert lit.to_decimal() == 42.0
    assert L.xsd_decimal(-1.5).value == "-1.500000"


def test_boolean_roundtrip():
    assert L.xsd_boolean(True).term == f'"true"^^<{C.XSD_BOOLEAN}>'
    assert L.xsd_boolean(False).to_boolean() is False
    assert L.GenericLiteral(f'"1"^^<{C.XSD_BOOLEAN}>').to_boolean() is True


def test_any_uri_roundtrip():
    lit = L.xsd_any_uri("http://example.org/x")
    assert lit.to_any_uri() == "http://example.org/x"
    assert lit.datatype == C.XSD_ANY_URI


def test_datetime_rfc3339():
    dt = datetime(2020, 5, 17, 12, 30, 1, tzinfo=timezone.utc)
    lit = L.xsd_datetime(dt)
    assert lit.value == "2020-05-17T12:30:01Z"
    assert lit.to_datetime() == dt


def test_type_mismatch():
    lit = L.xsd_integer(1)
    with pytest.raises(L.LiteralTypeMismatchError):
        lit.to_string()
    with pytest.raises(L.LiteralTypeMismatchError):
        L.xsd_string("x").to_integer()
    with pytest.raises(L.LiteralTypeMismatchError):
        L.xsd_boolean(True).to_decimal()


def test_plain_literal_has_no_datatype():
    lit = L.GenericLiteral('"plain"')
    assert lit.datatype == ""
    with pytest.raises(L.LiteralTypeMismatchError):
        lit.to_string()


def test_vectorized_encoders_match_scalar():
    assert L.v_encode_integer([1, -2, 30]).to_pylist() == [
        L.xsd_integer(1).term,
        L.xsd_integer(-2).term,
        L.xsd_integer(30).term,
    ]
    assert L.v_encode_decimal([42.0, -1.5]).to_pylist() == [
        L.xsd_decimal(42.0).term,
        L.xsd_decimal(-1.5).term,
    ]
    assert L.v_encode_boolean([True, False]).to_pylist() == [
        L.xsd_boolean(True).term,
        L.xsd_boolean(False).term,
    ]
    assert L.v_encode_string(["a"]).to_pylist() == [L.xsd_string("a").term]


def test_v_decode_struct():
    col = pa.array(
        ['"v"', '"v"@de', f'"5"^^<{C.XSD_INTEGER}>', "<http://r>"]
    )
    st = L.v_decode(col)
    assert st.field("value").to_pylist() == ["v", "v", "5", "http://r"]
    assert st.field("language").to_pylist() == ["", "de", "", ""]
    assert st.field("datatype").to_pylist() == ["", "", C.XSD_INTEGER, ""]
