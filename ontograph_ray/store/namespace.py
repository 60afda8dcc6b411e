"""Namespace / graph management over the filesystem (or object store).

The engine's equivalent of the reference's Blazegraph admin surface
(reference: blazegraph_endpoint.go:20-173, E1-E8 in SURVEY.md §2.3): a
*namespace* is an output prefix directory; a *graph* is one partitioned
triple table under it, registered in a small JSON manifest.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

_MANIFEST = "_namespace.json"


@dataclass
class Namespace:
    root: str
    name: str

    @property
    def path(self) -> str:
        return os.path.join(self.root, self.name)

    def graph_path(self, graph_uri: str) -> str:
        safe = graph_uri.replace("://", "_").replace("/", "_").replace("#", "_")
        return os.path.join(self.path, "graphs", safe)


class NamespaceManager:
    """Create/list/drop namespaces and enumerate their graphs."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def is_online(self) -> bool:
        """Storage reachability probe (E2)."""
        return os.path.isdir(self.root) and os.access(self.root, os.W_OK)

    def get_namespaces(self) -> list[str]:
        """List namespace names (E3)."""
        out = []
        for entry in sorted(os.listdir(self.root)):
            if os.path.isfile(os.path.join(self.root, entry, _MANIFEST)):
                out.append(entry)
        return out

    def create_namespace(self, name: str) -> Namespace:
        """Create prefix + manifest (E4). Idempotent error parity with
        the reference: creating an existing namespace errors."""
        ns = Namespace(self.root, name)
        if self.namespace_exists(name):
            raise FileExistsError(f"namespace {name!r} already exists")
        os.makedirs(os.path.join(ns.path, "graphs"), exist_ok=True)
        with open(os.path.join(ns.path, _MANIFEST), "w") as f:
            json.dump({"name": name, "graphs": {}}, f)
        return ns

    def drop_namespace(self, name: str) -> None:
        """Recursive delete; idempotent (E5)."""
        path = os.path.join(self.root, name)
        if os.path.isdir(path):
            shutil.rmtree(path)

    def namespace_exists(self, name: str) -> bool:
        return name in self.get_namespaces()

    def get_graphs(self, name: str) -> list[str]:
        """List graph URIs registered in the namespace (E7)."""
        manifest = os.path.join(self.root, name, _MANIFEST)
        if not os.path.isfile(manifest):
            return []
        with open(manifest) as f:
            return sorted(json.load(f).get("graphs", {}).keys())

    def register_graph(self, name: str, graph_uri: str) -> str:
        """Register a graph in the namespace manifest; returns its
        output directory."""
        manifest = os.path.join(self.root, name, _MANIFEST)
        with open(manifest) as f:
            data = json.load(f)
        ns = Namespace(self.root, name)
        gp = ns.graph_path(graph_uri)
        data["graphs"][graph_uri] = os.path.relpath(gp, ns.path)
        with open(manifest, "w") as f:
            json.dump(data, f)
        os.makedirs(gp, exist_ok=True)
        return gp

    def unregister_graph(self, name: str, graph_uri: str) -> None:
        """Drop a graph: delete its partitions and manifest entry (G14
        at namespace level)."""
        manifest = os.path.join(self.root, name, _MANIFEST)
        with open(manifest) as f:
            data = json.load(f)
        rel = data["graphs"].pop(graph_uri, None)
        with open(manifest, "w") as f:
            json.dump(data, f)
        if rel:
            full = os.path.join(self.root, name, rel)
            if os.path.isdir(full):
                shutil.rmtree(full)
