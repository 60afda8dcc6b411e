"""Turtle / N-Triples (de)serialization.

Serializer emits one N-Triples line per triple (``<s> <p> <o> .``) —
valid Turtle, and exactly the per-triple TTL the reference renders for
its SPARQL payloads (blazegraph_store.go:165,187). Pretty mode
reproduces the reference's prefix-compaction algorithm
(memory_store.go:242-299): base prefix map {'', rdf, rdfs, owl, xsd} +
one prefix per ``owl:imports`` target, regex rewrite of ``<prefix...>``
to ``abbr:...``, doubled newlines, ``@prefix``/``@base`` header.

The parser reads the Turtle subset the engine (and common tools) emit:
``@prefix`` / ``@base`` directives (and SPARQL-style PREFIX/BASE),
full IRIs, prefixed names, the ``a`` keyword, plain/lang/typed literals
(datatype as IRI or prefixed name), ``;`` and ``,`` continuations, and
comments. Line-oriented N-Triples input parses embarrassingly parallel;
this module is also used per-file inside ``map_batches`` by the Dataset
reader (reference parse semantics: memory_store.go:32-60).
"""

from __future__ import annotations

import re

from .. import constants as C
from .. import terms
from ..triples import Triple


def format_ntriples_line(subject: str, predicate: str, object_: str) -> str:
    return f"{subject} {predicate} {object_} ."


def serialize(
    triples: list[Triple],
    graph_uri: str,
    pretty: bool = False,
    imports: list[str] | None = None,
) -> str:
    lines = [format_ntriples_line(t.subject, t.predicate, t.object) for t in triples]
    content = "\n".join(lines)
    if lines:
        content += "\n"
    if not pretty:
        return content

    # Base prefix map (reference: memory_store.go:249-255)
    prefix_map: dict[str, str] = {"": graph_uri + "#", **C.BASE_PREFIXES}
    for import_uri in imports or []:
        abbr = import_uri[import_uri.rfind("/") + 1 :]
        prefix_map[abbr] = import_uri + "#"

    prefix_block = ""
    for abbr in prefix_map:
        prefix = prefix_map[abbr]
        prefix_block += f"@prefix {abbr}: <{prefix}> .\n"
        content = re.sub(
            rf"\<{re.escape(prefix)}(.+?)\>", rf"{abbr}:\1", content
        )
    content = content.replace(" .", " .\n\n")
    return f"{prefix_block}@base <{graph_uri}> .\n\n{content}"


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
      (?P<iri><[^>]*>)
    | (?P<literal>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^(?:<[^>]*>|[A-Za-z_][\w.-]*:[\w.#%-]*|:[\w.#%-]*))?)
    | (?P<punct>[;,.\[\]])
    | (?P<a>\ba\b)
    | (?P<pname>(?:[A-Za-z_][\w.-]*)?:[^\s;,.\]]*)
    | (?P<comment>\#[^\n]*)
    """,
    re.X,
)

_DIRECTIVE_PREFIX = re.compile(
    r"@prefix\s+([A-Za-z_][\w.-]*)?:\s*<([^>]*)>\s*\.|PREFIX\s+([A-Za-z_][\w.-]*)?:\s*<([^>]*)>",
    re.I,
)
_DIRECTIVE_BASE = re.compile(r"@base\s+<([^>]*)>\s*\.|BASE\s+<([^>]*)>", re.I)


class TurtleParseError(ValueError):
    pass


def _strip_directives(text: str) -> tuple[str, dict[str, str], str]:
    prefixes: dict[str, str] = {}
    base = ""
    out_lines = []
    for line in text.splitlines():
        stripped = line.strip()
        m = _DIRECTIVE_PREFIX.match(stripped)
        if m and stripped.lower().startswith(("@prefix", "prefix")):
            abbr = m.group(1) or m.group(3) or ""
            uri = m.group(2) if m.group(2) is not None else m.group(4)
            prefixes[abbr] = uri
            continue
        m = _DIRECTIVE_BASE.match(stripped)
        if m and stripped.lower().startswith(("@base", "base")):
            base = m.group(1) or m.group(2) or ""
            continue
        out_lines.append(line)
    return "\n".join(out_lines), prefixes, base


def _expand_pname(pname: str, prefixes: dict[str, str], base: str) -> str:
    abbr, _, local = pname.partition(":")
    if abbr in prefixes:
        return terms.new_resource_term(prefixes[abbr] + local)
    raise TurtleParseError(f"Unknown prefix in {pname!r}")


def _resolve_iri(iri_token: str, base: str) -> str:
    inner = iri_token[1:-1]
    if inner == "" and base:
        return terms.new_resource_term(base)
    if base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", inner):
        # relative IRI against @base
        sep = "" if (base.endswith(("#", "/")) or inner.startswith("#")) else "/"
        return terms.new_resource_term(base + sep + inner)
    return terms.new_resource_term(inner)


def _normalize_literal(tok: str, prefixes: dict[str, str], base: str) -> str:
    """Convert a parsed Turtle literal token to the engine's term syntax
    (expanding a prefixed datatype name to a full IRI)."""
    m = re.match(r'^("(?:[^"\\]|\\.)*")(?:@([A-Za-z0-9-]+)|\^\^(.+))?$', tok, re.S)
    if not m:
        raise TurtleParseError(f"Bad literal token {tok!r}")
    quoted, lang, dt = m.groups()
    value = _unescape(quoted[1:-1])
    if lang:
        return terms.new_literal_term(value, lang, "")
    if dt:
        if dt.startswith("<"):
            return terms.new_literal_term(value, "", dt[1:-1])
        return terms.new_literal_term(
            value, "", terms.term_value(_expand_pname(dt, prefixes, base))
        )
    return terms.new_literal_term(value, "", "")


def _unescape(s: str) -> str:
    if "\\" not in s:
        return s
    return (
        s.replace("\\\\", "\x00")
        .replace('\\"', '"')
        .replace("\\n", "\n")
        .replace("\\r", "\r")
        .replace("\\t", "\t")
        .replace("\x00", "\\")
    )


def parse_turtle(text: str) -> list[Triple]:
    """Parse Turtle text into a list of triples (terms in NTriples
    surface syntax)."""
    body, prefixes, base = _strip_directives(text)
    triples: list[Triple] = []
    # Statement state machine over tokens: subject → predicate → object,
    # with ';' (keep subject) and ',' (keep subject+predicate).
    subject: str | None = None
    predicate: str | None = None
    expecting = "subject"

    for m in _TOKEN.finditer(body):
        kind = m.lastgroup
        tok = m.group(0)
        if kind == "comment":
            continue
        if kind == "punct":
            if tok == ".":
                subject = predicate = None
                expecting = "subject"
            elif tok == ";":
                predicate = None
                expecting = "predicate"
            elif tok == ",":
                expecting = "object"
            continue
        if kind == "a" and expecting == "predicate":
            predicate = terms.new_resource_term(C.RDF_TYPE)
            expecting = "object"
            continue

        if kind == "iri":
            term = _resolve_iri(tok, base)
        elif kind == "pname":
            term = _expand_pname(tok, prefixes, base)
        elif kind == "literal":
            term = _normalize_literal(tok, prefixes, base)
        elif kind == "a":
            # bare 'a' outside predicate position — treat as pname error
            raise TurtleParseError("Unexpected 'a' token")
        else:  # pragma: no cover
            continue

        if expecting == "subject":
            subject = term
            expecting = "predicate"
        elif expecting == "predicate":
            predicate = term
            expecting = "object"
        else:
            assert subject is not None and predicate is not None
            triples.append(Triple(subject, predicate, term))
            expecting = "object_done"
    return triples


def parse_turtle_with_base(text: str) -> tuple[list[Triple], str]:
    """Parse + base-URI inference: prefer the subject of
    ``? rdf:type owl:Ontology``, else the first triple's subject; error
    when no triples (reference: memory_store.go:40-51)."""
    triples = parse_turtle(text)
    rdf_type = terms.new_resource_term(C.RDF_TYPE)
    owl_ont = terms.new_resource_term(C.OWL_ONTOLOGY)
    for t in triples:
        if t.predicate == rdf_type and t.object == owl_ont:
            return triples, terms.term_value(t.subject)
    if not triples:
        raise TurtleParseError("No triple found in reader data")
    return triples, terms.term_value(triples[0].subject)
