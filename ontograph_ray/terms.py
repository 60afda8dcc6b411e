"""NTriples term codec — scalar and vectorized (Arrow) implementations.

A *term* is a plain string in NTriples surface syntax, the universal
scalar of the engine (reference: triple.go:13). Three shapes:

- resource: ``<uri>``
- plain / language-tagged literal: ``"value"`` / ``"value"@lang``
- typed literal: ``"value"^^<datatypeURI>``

The scalar functions mirror the reference byte-for-byte, including its
malformed-input contract ("" for every accessor on invalid terms; see
the truth table in reference: triple_test.go:78-146). The vectorized
functions are pyarrow.compute re-expressions of the same semantics and
are the hot-path codec used by `map_batches` stages; a property test
pins vectorized == scalar.

Semantics anchors (reference): NewResourceTerm triple.go:16-18,
NewLiteralTerm triple.go:21-30, IsResource triple.go:38-41, IsLiteral
triple.go:44-47, Value triple.go:50-68, Language triple.go:71-78,
Datatype triple.go:81-88.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# Scalar API (driver-side / small-graph convenience; exact reference parity)
# ---------------------------------------------------------------------------


def new_resource_term(uri: str) -> str:
    """Wrap a URI into a resource term: ``<uri>``."""
    return f"<{uri}>"


def new_literal_term(value: str, language: str = "", datatype: str = "") -> str:
    """Encode a literal term ``"value"`` + optional ``@lang`` + optional
    ``^^<datatype>``; language is appended before datatype when both are
    given (reference order, triple.go:23-28)."""
    t = f'"{value}"'
    if language:
        t += f"@{language}"
    if datatype:
        t += f"^^<{datatype}>"
    return t


def is_resource(term: str) -> bool:
    return len(term) > 2 and term[0] == "<" and term[-1] == ">"


def is_literal(term: str) -> bool:
    return (
        len(term) > 2
        and term[0] == '"'
        and (term[-1] == '"' or '"@' in term or '"^^' in term)
    )


def term_value(term: str) -> str:
    """Extract the URI or lexical value; "" on malformed input.

    Branch order matters and matches the reference exactly:
    resource → quoted → lang-literal → typed-literal → "".
    """
    s = term
    if len(s) > 2:
        if s[0] == "<" and s[-1] == ">":
            return s[1:-1]
        if s[0] == '"' and s[-1] == '"':
            return s[1:-1]
        if s[0] == '"' and '"@' in s:
            at = s.rfind("@")
            return s[1 : max(at - 1, 0)]
        if s[0] == '"' and '"^^' in s:
            at = s.rfind("^^")
            return s[1 : max(at - 1, 0)]
    return ""


def term_language(term: str) -> str:
    s = term
    if len(s) > 2 and s[0] == '"' and '"@' in s:
        return s[s.rfind("@") + 1 :]
    return ""


def term_datatype(term: str) -> str:
    s = term
    if len(s) > 2 and s[0] == '"' and '"^^' in s:
        return term_value(s[s.rfind("^^") + 2 :])
    return ""


def split_literal(term: str) -> tuple[str, str, str]:
    """Decode a literal term into (value, language, datatype)."""
    return term_value(term), term_language(term), term_datatype(term)


# ---------------------------------------------------------------------------
# Vectorized API — pyarrow string/regex kernels, zero Python per-row work
# ---------------------------------------------------------------------------

# Tail fragment matching any string that does NOT contain the substring
# "^^" (used to anchor on the LAST occurrence, the regex analogue of the
# reference's LastIndex("^^")).
_NO_CARETCARET = r"(?:\^?[^\^])*\^?"

_RE_RES_VALUE = r"(?s)^<(?P<v>.*)>$"
_RE_QUOTED_VALUE = r'(?s)^"(?P<v>.*)"$'
# value for "v"@lang shape: strip leading quote, the char before the last
# '@', the '@' and the trailing language tag (Go s[1:LastIndex(s,"@")-1]).
_RE_LANG_VALUE = r'(?s)^"(?P<v>.*).@[^@]*$'
# value for "v"^^<dt> shape: same with the last "^^" as anchor.
_RE_DT_VALUE = r'(?s)^"(?P<v>.*).\^\^' + _NO_CARETCARET + r"$"
# language: everything after the last '@'.
_RE_LANGUAGE = r"(?s)@(?P<v>[^@]*)$"
# datatype tail: everything after the last "^^" (greedy prefix pushes the
# match to the final occurrence, mirroring LastIndex).
_RE_DT_TAIL = r"(?s)^.*\^\^(?P<v>" + _NO_CARETCARET + r")$"


def _as_array(arr) -> pa.ChunkedArray | pa.Array:
    if isinstance(arr, (pa.Array, pa.ChunkedArray)):
        return arr
    return pa.array(arr, type=pa.string())


def _extract(arr, pattern: str):
    """extract_regex capture group 'v' with "" for non-matches/nulls."""
    st = pc.extract_regex(arr, pattern)
    return pc.fill_null(pc.struct_field(st, "v"), "")


def _masked(mask, values, otherwise):
    return pc.if_else(mask, values, otherwise)


def v_new_resource_term(uris) -> pa.Array:
    """Vectorized NewResourceTerm: uri → ``<uri>``."""
    uris = _as_array(uris)
    return pc.binary_join_element_wise(
        pa.scalar("<"), uris, pa.scalar(">"), ""
    )


def v_new_literal_term(values, languages=None, datatypes=None) -> pa.Array:
    """Vectorized NewLiteralTerm. `languages` / `datatypes` may be None,
    a scalar string applied to all rows, or an array; empty string means
    "absent" (reference wildcard convention)."""
    values = _as_array(values)
    n = len(values)

    def norm(x):
        if x is None:
            return pa.nulls(n, pa.string())
        if isinstance(x, str):
            return pa.array([x] * n, type=pa.string())
        return _as_array(x)

    langs = pc.fill_null(norm(languages), "")
    dts = pc.fill_null(norm(datatypes), "")
    quoted = pc.binary_join_element_wise(pa.scalar('"'), values, pa.scalar('"'), "")
    lang_sfx = pc.if_else(
        pc.equal(langs, ""),
        pa.scalar(""),
        pc.binary_join_element_wise(pa.scalar("@"), langs, ""),
    )
    dt_sfx = pc.if_else(
        pc.equal(dts, ""),
        pa.scalar(""),
        pc.binary_join_element_wise(pa.scalar("^^<"), dts, pa.scalar(">"), ""),
    )
    return pc.binary_join_element_wise(quoted, lang_sfx, dt_sfx, "")


def _shape_masks(s):
    """Common shape predicates over a term column."""
    n = pc.binary_length(s)
    long_enough = pc.greater(n, 2)
    starts_lt = pc.starts_with(s, pattern="<")
    ends_gt = pc.ends_with(s, pattern=">")
    starts_q = pc.starts_with(s, pattern='"')
    ends_q = pc.ends_with(s, pattern='"')
    has_at = pc.match_substring(s, '"@')
    has_dt = pc.match_substring(s, '"^^')
    return long_enough, starts_lt, ends_gt, starts_q, ends_q, has_at, has_dt


def v_is_resource(terms) -> pa.Array:
    s = _as_array(terms)
    long_enough, starts_lt, ends_gt, *_ = _shape_masks(s)
    return pc.fill_null(pc.and_(pc.and_(long_enough, starts_lt), ends_gt), False)


def v_is_literal(terms) -> pa.Array:
    s = _as_array(terms)
    long_enough, _, _, starts_q, ends_q, has_at, has_dt = _shape_masks(s)
    lit = pc.or_(pc.or_(ends_q, has_at), has_dt)
    return pc.fill_null(pc.and_(pc.and_(long_enough, starts_q), lit), False)


def v_value(terms) -> pa.Array:
    """Vectorized Term.Value with the reference's exact branch order and
    ""-on-malformed contract (triple.go:50-68, triple_test.go:92-106)."""
    s = _as_array(terms)
    long_enough, starts_lt, ends_gt, starts_q, ends_q, has_at, has_dt = _shape_masks(s)
    empty = pa.scalar("")

    out = empty
    # Branches applied innermost-last ⇒ build in reverse priority order.
    m_dt = pc.and_(pc.and_(long_enough, starts_q), has_dt)
    out = _masked(m_dt, _extract(s, _RE_DT_VALUE), out)
    m_lang = pc.and_(pc.and_(long_enough, starts_q), has_at)
    out = _masked(m_lang, _extract(s, _RE_LANG_VALUE), out)
    m_quoted = pc.and_(pc.and_(long_enough, starts_q), ends_q)
    out = _masked(m_quoted, _extract(s, _RE_QUOTED_VALUE), out)
    m_res = pc.and_(pc.and_(long_enough, starts_lt), ends_gt)
    out = _masked(m_res, _extract(s, _RE_RES_VALUE), out)
    return pc.fill_null(out, "")


def v_language(terms) -> pa.Array:
    s = _as_array(terms)
    long_enough, _, _, starts_q, _, has_at, _ = _shape_masks(s)
    mask = pc.and_(pc.and_(long_enough, starts_q), has_at)
    return pc.fill_null(_masked(mask, _extract(s, _RE_LANGUAGE), pa.scalar("")), "")


def v_datatype(terms) -> pa.Array:
    s = _as_array(terms)
    long_enough, _, _, starts_q, _, _, has_dt = _shape_masks(s)
    mask = pc.and_(pc.and_(long_enough, starts_q), has_dt)
    tail = _extract(s, _RE_DT_TAIL)
    # Reference delegates through Term(tail).Value() (triple.go:85) — the
    # datatype is the *value* of the tail term (strips <>; "" if invalid).
    return pc.fill_null(_masked(mask, v_value(tail), pa.scalar("")), "")
