"""HTTP SPARQL backend tests: an in-process localhost server (one
MemoryGraphStore per (namespace, graph)) speaks the SPARQL-protocol
subset HttpGraphStore emits, and the client must pass the same
conformance corpus shapes as the other backends plus the endpoint
admin surface (E1-E8). No external network — ThreadingHTTPServer on
127.0.0.1."""

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ontograph_ray import terms
from ontograph_ray.store.base import (
    TripleAlreadyExistsError,
    TripleDoesNotExistError,
)
from ontograph_ray.store.http import (
    HttpGraphStore,
    SparqlHttpEndpoint,
    SparqlHttpError,
)
from ontograph_ray.store.memory import MemoryGraphStore
from ontograph_ray.triples import Triple, new_triple

r, l = terms.new_resource_term, terms.new_literal_term

_TERM = r'(<[^<>\s]*>|"(?:[^"\\]|\\.)*"(?:@[A-Za-z-]+|\^\^<[^<>\s]*>)?|\?[A-Za-z]\w*)'
_PAT3 = re.compile(rf"{_TERM}\s+{_TERM}\s+{_TERM}\s*\.?")
_GRAPH = re.compile(r"GRAPH\s+<([^<>\s]*)>\s*\{(.*)\}\s*\}?\s*$", re.S)


class _State:
    def __init__(self):
        self.namespaces: dict[str, dict[str, MemoryGraphStore]] = {}


def _term_to_binding(t: str) -> dict:
    if terms.is_resource(t):
        return {"type": "uri", "value": terms.term_value(t)}
    lang, dt = terms.term_language(t), terms.term_datatype(t)
    b = {"type": "literal", "value": terms.term_value(t)}
    if lang:
        b["xml:lang"] = lang
    if dt:
        b["type"] = "typed-literal"
        b["datatype"] = dt
    return b


def _graph_of(state: _State, ns: str, uri: str) -> MemoryGraphStore:
    g = state.namespaces[ns].get(uri)
    if g is None:
        g = state.namespaces[ns][uri] = MemoryGraphStore(uri)
    return g


def _pattern_args(body: str) -> tuple[str, str, str]:
    m = _PAT3.search(body)
    s, p, o = m.group(1), m.group(2), m.group(3)
    return tuple("" if x.startswith("?") else x for x in (s, p, o))


def _handle_query(state: _State, ns: str, q: str):
    gm = _GRAPH.search(q)
    if q.lstrip().upper().startswith("ASK"):
        uri, body = gm.group(1), gm.group(2)
        g = _graph_of(state, ns, uri)
        s, p, o = _pattern_args(body)
        if (s, p, o) == ("", "", ""):
            return {"boolean": g.size() > 0}
        return {"boolean": g.get_first_match(s, p, o) is not None}
    if "SELECT DISTINCT ?g" in q:
        names = sorted(
            uri for uri, g in state.namespaces[ns].items() if g.size() > 0
        )
        return {
            "head": {"vars": ["g"]},
            "results": {
                "bindings": [{"g": {"type": "uri", "value": n}} for n in names]
            },
        }
    if "COUNT(*)" in q:
        uri = gm.group(1)
        n = _graph_of(state, ns, uri).size()
        return {
            "head": {"vars": ["n"]},
            "results": {
                "bindings": [
                    {
                        "n": {
                            "type": "typed-literal",
                            "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                            "value": str(n),
                        }
                    }
                ]
            },
        }
    if q.lstrip().upper().startswith("CONSTRUCT"):
        uri = gm.group(1)
        g = _graph_of(state, ns, uri)
        return "\n".join(
            f"{t.subject} {t.predicate} {t.object} ." for t in g.get_all_triples()
        )
    # SELECT ?s ?p ?o over one pattern
    uri, body = gm.group(1), gm.group(2)
    g = _graph_of(state, ns, uri)
    s, p, o = _pattern_args(body)
    rows = []
    for t in g.get_all_matches(s, p, o):
        b = {}
        if not s:
            b["s"] = _term_to_binding(t.subject)
        if not p:
            b["p"] = _term_to_binding(t.predicate)
        if not o:
            b["o"] = _term_to_binding(t.object)
        rows.append(b)
    return {"head": {"vars": ["s", "p", "o"]}, "results": {"bindings": rows}}


def _handle_update(state: _State, ns: str, u: str) -> None:
    up = u.lstrip()
    head = up.split(None, 2)[0].upper()
    if head == "DROP":
        uri = re.search(r"DROP\s+GRAPH\s+<([^<>\s]*)>", up).group(1)
        state.namespaces[ns].pop(uri, None)
        return
    gm = _GRAPH.search(up)
    uri, body = gm.group(1), gm.group(2)
    g = _graph_of(state, ns, uri)
    if up.upper().startswith("DELETE WHERE"):
        s, p, o = _pattern_args(body)
        g.delete_all_matches(s, p, o)
        return
    triples = [
        new_triple(m.group(1), m.group(2), m.group(3))
        for m in _PAT3.finditer(body)
    ]
    if up.upper().startswith("INSERT DATA"):
        g.add_triples_unchecked(triples)
    elif up.upper().startswith("DELETE DATA"):
        g.delete_triples_unchecked(triples)
    else:
        raise ValueError(f"unsupported update: {up[:40]!r}")


def _make_handler(state: _State):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, body: bytes = b"", ctype: str = "text/plain"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/status":
                return self._send(200, b"ok")
            if self.path == "/namespace":
                return self._send(
                    200, json.dumps(sorted(state.namespaces)).encode(),
                    "application/json",
                )
            return self._send(404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            raw = self.rfile.read(length).decode()
            if self.path == "/namespace":
                state.namespaces.setdefault(raw.strip(), {})
                return self._send(201)
            m = re.match(r"^/namespace/([^/]+)/sparql$", self.path)
            if not m:
                return self._send(404)
            ns = urllib.parse.unquote(m.group(1))
            if ns not in state.namespaces:
                return self._send(404, b"no such namespace")
            form = urllib.parse.parse_qs(raw)
            try:
                if "update" in form:
                    _handle_update(state, ns, form["update"][0])
                    return self._send(200)
                res = _handle_query(state, ns, form["query"][0])
            except Exception as e:  # malformed query → 400, like a real endpoint
                return self._send(400, str(e).encode())
            if isinstance(res, str):
                return self._send(200, res.encode(), "text/turtle")
            return self._send(
                200, json.dumps(res).encode(), "application/sparql-results+json"
            )

        def do_DELETE(self):
            m = re.match(r"^/namespace/([^/]+)$", self.path)
            if not m:
                return self._send(404)
            ns = urllib.parse.unquote(m.group(1))
            if ns in state.namespaces:
                del state.namespaces[ns]
                return self._send(200)
            return self._send(404)

    return Handler


@pytest.fixture(scope="module")
def endpoint():
    state = _State()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield SparqlHttpEndpoint(f"http://127.0.0.1:{server.server_address[1]}")
    server.shutdown()


FIX = [
    ("urn:s1", "urn:p1", r("urn:o1")),
    ("urn:s1", "urn:p2", l("plain")),
    ("urn:s2", "urn:p1", l("bonjour", "fr")),
    (
        "urn:s2",
        "urn:p2",
        l("5", "", "http://www.w3.org/2001/XMLSchema#integer"),
    ),
]


def _fixture_triples() -> list[Triple]:
    return [new_triple(r(s), r(p), o) for s, p, o in FIX]


class TestEndpointAdmin:
    def test_online_and_namespace_crud(self, endpoint):
        assert endpoint.is_online()
        assert not endpoint.namespace_exists("kb")
        endpoint.create_namespace("kb")
        assert endpoint.namespace_exists("kb")
        assert "kb" in endpoint.get_namespaces()
        endpoint.drop_namespace("kb")
        assert not endpoint.namespace_exists("kb")
        endpoint.drop_namespace("kb")  # idempotent (E5)

    def test_offline_endpoint(self):
        dead = SparqlHttpEndpoint("http://127.0.0.1:9", timeout=0.2)
        assert not dead.is_online()


class TestHttpGraphStore:
    @pytest.fixture()
    def store(self, endpoint):
        endpoint.create_namespace("test")
        s = HttpGraphStore(endpoint, "test", "urn:graph:http")
        s.drop()
        s.add_triples_unchecked(_fixture_triples())
        return s

    def test_matches_and_size(self, store):
        assert store.size() == 4
        assert len(store.get_all_triples()) == 4
        got = store.get_all_matches(predicate=r("urn:p1"))
        assert {t.object for t in got} == {r("urn:o1"), l("bonjour", "fr")}
        # bound positions echoed back, lang and datatype survive the
        # JSON round-trip
        got = store.get_all_matches(subject=r("urn:s2"))
        assert {t.object for t in got} == {
            l("bonjour", "fr"),
            l("5", "", "http://www.w3.org/2001/XMLSchema#integer"),
        }
        first = store.get_first_match(object=l("plain"))
        assert first is not None and first.subject == r("urn:s1")
        assert store.get_first_match(subject=r("urn:nope")) is None

    def test_checked_add_delete(self, store):
        t = _fixture_triples()[0]
        with pytest.raises(TripleAlreadyExistsError):
            store.add_triple(t)
        fresh = new_triple(r("urn:s3"), r("urn:p1"), l("x"))
        store.add_triple(fresh)
        assert store.size() == 5
        store.delete_triple(fresh)
        with pytest.raises(TripleDoesNotExistError):
            store.delete_triple(fresh)
        assert store.size() == 4

    def test_batch_all_or_nothing(self, store):
        fresh = new_triple(r("urn:s4"), r("urn:p1"), l("y"))
        dup = _fixture_triples()[1]
        with pytest.raises(TripleAlreadyExistsError):
            store.add_triples([fresh, dup])
        assert store.size() == 4  # nothing added
        with pytest.raises(TripleDoesNotExistError):
            store.delete_triples([_fixture_triples()[0], fresh])
        assert store.size() == 4  # nothing deleted

    def test_unchecked_dedup_and_delete_matches(self, store):
        store.add_triples_unchecked(_fixture_triples())  # idempotent set
        assert store.size() == 4
        store.delete_all_matches(predicate=r("urn:p2"))
        assert store.size() == 2

    def test_turtle_roundtrip_and_drop(self, store):
        ttl = store.serialize_to_turtle()
        mem = MemoryGraphStore.parse_from_turtle(
            "# base: <urn:graph:http>\n" + ttl
        )
        assert {t.as_tuple() for t in mem.get_all_triples()} == {
            t.as_tuple() for t in store.get_all_triples()
        }
        store.drop()
        assert store.size() == 0
        store.drop()  # empty drop is a no-op, no error

    def test_graph_listing(self, endpoint, store):
        assert "urn:graph:http" in endpoint.get_graphs("test")

    def test_bad_query_is_typed_error(self, endpoint, store):
        with pytest.raises(SparqlHttpError):
            endpoint.do_sparql_json_query("test", "NOT SPARQL AT ALL")
