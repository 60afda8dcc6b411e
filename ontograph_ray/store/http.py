"""HTTP SPARQL endpoint client + GraphStore backend (E1-E8 over HTTP).

The reference's second store backend speaks the SPARQL 1.1 protocol to
a remote endpoint (Blazegraph): a generic POST surface for query /
update plus a namespace-admin REST surface
(blazegraph_endpoint.go:20-244), and a GraphStore implementation that
compiles every operator to SPARQL text (blazegraph_store.go:20-411).
This module is that seam for the engine: ``SparqlHttpEndpoint``
mirrors the endpoint operators E1-E8, ``HttpGraphStore`` implements
the full 16-method GraphStore protocol by generating the same query
shapes the reference generates (cited per method). Everything is
stdlib ``urllib`` — no client library, no network beyond the
configured base URL (tests run an in-process localhost server).

Scale note: this backend is the *small-graph / metadata* path — the
same role the reference gives it (per-triple HTTP round-trips;
"suitable for larger ontologies that might not fit into memory",
blazegraph_store.go:12). Bulk distributed work stays on
DatasetGraphStore; an OntologyGraph can sit on either since both
satisfy the GraphStore protocol.
"""

from __future__ import annotations

import json
import re
import urllib.error
import urllib.parse
import urllib.request
from typing import Optional, Sequence

from ..triples import Triple, new_triple
from .base import TripleAlreadyExistsError, TripleDoesNotExistError
from .turtle import parse_turtle, serialize


class SparqlHttpError(RuntimeError):
    """Non-2xx response from the endpoint."""


def _binding_to_term(b: dict) -> str:
    """SPARQL-JSON binding → engine-encoded term — the engine's mirror
    of the reference's binding2Term (blazegraph_store.go:434-445):
    uri / literal(+lang) / typed-literal; anything else (bnode) is
    unsupported there too and raises here."""
    t = b.get("type")
    if t == "uri":
        return f"<{b['value']}>"
    if t in ("literal", "typed-literal"):
        if b.get("xml:lang"):
            return f"\"{b['value']}\"@{b['xml:lang']}"
        if b.get("datatype"):
            return f"\"{b['value']}\"^^<{b['datatype']}>"
        return f"\"{b['value']}\""
    raise SparqlHttpError(f"unsupported binding type {t!r}")


class SparqlHttpEndpoint:
    """Endpoint handle (E1, blazegraph_endpoint.go:20-36). URL layout:

    - ``GET  {base}/status``                      → online probe (E2, :39-52)
    - ``GET  {base}/namespace``                   → JSON name list (E3, :55-81)
    - ``POST {base}/namespace``  body=name        → create (E4, :85-117)
    - ``DELETE {base}/namespace/{name}``          → drop, idempotent (E5, :121-138)
    - ``POST {base}/namespace/{name}/sparql``     → query/update (E8, :176-244)
    """

    def __init__(self, base_url: str, timeout: float = 10.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    # -- low-level ----------------------------------------------------------
    def _request(
        self,
        method: str,
        path: str,
        body: bytes | None = None,
        headers: dict | None = None,
    ) -> tuple[int, bytes]:
        req = urllib.request.Request(
            self.base + path, data=body, method=method, headers=headers or {}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx still has a body
            return e.code, e.read()
        except urllib.error.URLError as e:
            raise SparqlHttpError(f"endpoint unreachable: {e}") from e

    # -- E2 -------------------------------------------------------------
    def is_online(self) -> bool:
        try:
            status, _ = self._request("GET", "/status")
        except SparqlHttpError:
            return False
        return status == 200

    # -- E3 -------------------------------------------------------------
    def get_namespaces(self) -> list[str]:
        status, body = self._request("GET", "/namespace")
        if status != 200:
            raise SparqlHttpError(f"namespace list failed: {status}")
        return sorted(json.loads(body))

    # -- E4 -------------------------------------------------------------
    def create_namespace(self, name: str) -> None:
        status, body = self._request(
            "POST", "/namespace", body=name.encode(),
            headers={"Content-Type": "text/plain"},
        )
        if status not in (200, 201):
            raise SparqlHttpError(f"create namespace failed: {status} {body!r}")

    # -- E5 (idempotent, like the reference's DELETE) --------------------
    def drop_namespace(self, name: str) -> None:
        status, _ = self._request(
            "DELETE", f"/namespace/{urllib.parse.quote(name)}"
        )
        if status not in (200, 404):
            raise SparqlHttpError(f"drop namespace failed: {status}")

    # -- E6 (list + scan, blazegraph_endpoint.go:141-155) ----------------
    def namespace_exists(self, name: str) -> bool:
        return name in self.get_namespaces()

    # -- E7 (SELECT DISTINCT ?g, blazegraph_endpoint.go:158-173) ---------
    def get_graphs(self, namespace: str) -> list[str]:
        rs = self.do_sparql_json_query(
            namespace, "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ?p ?o } }"
        )
        return sorted(
            b["g"]["value"] for b in rs["results"]["bindings"]
        )

    # -- E8 ---------------------------------------------------------------
    def do_sparql_json_query(self, namespace: str, query: str) -> dict:
        status, body = self._request(
            "POST",
            f"/namespace/{urllib.parse.quote(namespace)}/sparql",
            body=urllib.parse.urlencode({"query": query}).encode(),
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": "application/sparql-results+json",
            },
        )
        if status != 200:
            raise SparqlHttpError(f"query failed: {status} {body!r}")
        return json.loads(body)

    def do_sparql_turtle_query(self, namespace: str, query: str) -> str:
        status, body = self._request(
            "POST",
            f"/namespace/{urllib.parse.quote(namespace)}/sparql",
            body=urllib.parse.urlencode({"query": query}).encode(),
            headers={
                "Content-Type": "application/x-www-form-urlencoded",
                "Accept": "text/turtle",
            },
        )
        if status != 200:
            raise SparqlHttpError(f"query failed: {status} {body!r}")
        return body.decode()

    def do_sparql_update(self, namespace: str, update: str) -> None:
        status, body = self._request(
            "POST",
            f"/namespace/{urllib.parse.quote(namespace)}/sparql",
            body=urllib.parse.urlencode({"update": update}).encode(),
            headers={"Content-Type": "application/x-www-form-urlencoded"},
        )
        if status != 200:
            raise SparqlHttpError(f"update failed: {status} {body!r}")


def _pos(term: str, var: str) -> str:
    """Pattern slot: empty wildcard → SPARQL variable, else the ground
    term inline (graph_store.go:13-19 wildcard convention)."""
    return var if term == "" else term


class HttpGraphStore:
    """GraphStore over a SPARQL HTTP endpoint — the engine's mirror of
    the reference's BlazegraphStore (blazegraph_store.go), one SPARQL
    form per operator. Checked batch add/delete is validate-then-commit
    (observably identical to the reference's add-then-rollback loops,
    blazegraph_store.go:140-160/222-242, without the non-atomic
    compensation window)."""

    def __init__(self, endpoint: SparqlHttpEndpoint, namespace: str, uri: str):
        self.endpoint = endpoint
        self.namespace = namespace
        self.uri = uri

    # -- G1 ---------------------------------------------------------------
    def get_uri(self) -> str:
        return self.uri

    def _ttl(self, triples: Sequence[Triple]) -> str:
        # the exact per-triple TTL the reference renders into INSERT/
        # DELETE DATA payloads (blazegraph_store.go:165,187)
        return "\n".join(f"{t.subject} {t.predicate} {t.object} ." for t in triples)

    def _ask(self, body: str) -> bool:
        rs = self.endpoint.do_sparql_json_query(
            self.namespace, f"ASK {{ GRAPH <{self.uri}> {{ {body} }} }}"
        )
        return bool(rs["boolean"])

    def contains(self, triple: Triple) -> bool:
        # ground-triple ASK probe (blazegraph_store.go:419)
        return self._ask(f"{triple.subject} {triple.predicate} {triple.object} .")

    # -- G2/G3 (SELECT over the wildcard pattern; bound positions are
    # echoed back, not re-parsed — blazegraph_store.go:38-86) -------------
    def get_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> list[Triple]:
        q = (
            "SELECT ?s ?p ?o WHERE { GRAPH <%s> { %s %s %s } }"
            % (self.uri, _pos(subject, "?s"), _pos(predicate, "?p"), _pos(object, "?o"))
        )
        rs = self.endpoint.do_sparql_json_query(self.namespace, q)
        out = []
        for b in rs["results"]["bindings"]:
            s = subject or _binding_to_term(b["s"])
            p = predicate or _binding_to_term(b["p"])
            o = object or _binding_to_term(b["o"])
            out.append(new_triple(s, p, o))
        return out

    def get_first_match(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> Optional[Triple]:
        # delegates to get_all_matches, takes [0] (blazegraph_store.go:25-35)
        matches = self.get_all_matches(subject, predicate, object)
        return matches[0] if matches else None

    # -- G4 (DELETE WHERE, blazegraph_store.go:104) -----------------------
    def delete_all_matches(
        self, subject: str = "", predicate: str = "", object: str = ""
    ) -> None:
        self.endpoint.do_sparql_update(
            self.namespace,
            "DELETE WHERE { GRAPH <%s> { %s %s %s } }"
            % (self.uri, _pos(subject, "?s"), _pos(predicate, "?p"), _pos(object, "?o")),
        )

    # -- G5 ---------------------------------------------------------------
    def get_all_triples(self) -> list[Triple]:
        return self.get_all_matches("", "", "")

    # -- G6 (ASK precheck + INSERT DATA, blazegraph_store.go:126-137) ------
    def add_triple(self, triple: Triple) -> None:
        if self.contains(triple):
            raise TripleAlreadyExistsError(str(triple))
        self.add_triples_unchecked([triple])

    # -- G7 (all-or-nothing batch add) --------------------------------------
    def add_triples(self, triples: Sequence[Triple]) -> None:
        for t in triples:
            if self.contains(t):
                raise TripleAlreadyExistsError(str(t))
        self.add_triples_unchecked(triples)

    # -- G8/G9 (single INSERT DATA with concatenated TTL — the reference's
    # only batched network op, blazegraph_store.go:183-204) ----------------
    def add_triple_unchecked(self, triple: Triple) -> None:
        self.add_triples_unchecked([triple])

    def add_triples_unchecked(self, triples: Sequence[Triple]) -> None:
        if not triples:
            return
        self.endpoint.do_sparql_update(
            self.namespace,
            f"INSERT DATA {{ GRAPH <{self.uri}> {{\n{self._ttl(triples)}\n}} }}",
        )

    # -- G10/G11 ------------------------------------------------------------
    def delete_triple(self, triple: Triple) -> None:
        if not self.contains(triple):
            raise TripleDoesNotExistError(str(triple))
        self.delete_triples_unchecked([triple])

    def delete_triples(self, triples: Sequence[Triple]) -> None:
        for t in triples:
            if not self.contains(t):
                raise TripleDoesNotExistError(str(t))
        self.delete_triples_unchecked(triples)

    # -- G12/G13 (DELETE DATA, blazegraph_store.go:245-286) -----------------
    def delete_triple_unchecked(self, triple: Triple) -> None:
        self.delete_triples_unchecked([triple])

    def delete_triples_unchecked(self, triples: Sequence[Triple]) -> None:
        if not triples:
            return
        self.endpoint.do_sparql_update(
            self.namespace,
            f"DELETE DATA {{ GRAPH <{self.uri}> {{\n{self._ttl(triples)}\n}} }}",
        )

    # -- G14 (ASK-nonempty then DROP GRAPH, blazegraph_store.go:289-324) ----
    def drop(self) -> None:
        if self._ask("?s ?p ?o ."):
            self.endpoint.do_sparql_update(
                self.namespace, f"DROP GRAPH <{self.uri}>"
            )

    # -- G15 (CONSTRUCT + client-side prettify, blazegraph_store.go:327-393;
    # the reference prettifies on the client too) ---------------------------
    def serialize_to_turtle(self, pretty: bool = False) -> str:
        ttl = self.endpoint.do_sparql_turtle_query(
            self.namespace,
            f"CONSTRUCT {{ ?s ?p ?o }} WHERE {{ GRAPH <{self.uri}> {{ ?s ?p ?o }} }}",
        )
        triples = parse_turtle(ttl)
        return serialize(triples, self.uri, pretty=pretty)

    # -- G16 (SELECT (COUNT(*) AS ?n), blazegraph_store.go:396-411) ---------
    def size(self) -> int:
        rs = self.endpoint.do_sparql_json_query(
            self.namespace,
            f"SELECT (COUNT(*) AS ?n) WHERE {{ GRAPH <{self.uri}> {{ ?s ?p ?o }} }}",
        )
        return int(rs["results"]["bindings"][0]["n"]["value"])
