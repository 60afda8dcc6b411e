"""Durable versioned graph storage: staged writes + atomic manifest swap.

This is the scale path for the reference's all-or-nothing batch write
semantics (G7/G11; reference memory_store.go:137-157 add-with-rollback,
193-213 delete-with-restore, 235-239 drop). The reference achieves
atomicity with an in-memory compensation loop; at 100 TB the equivalent
is *validate-then-commit with copy-on-write versions*:

    <root>/
        _MANIFEST.json        # {"current": N, "versions": {...}} — the
                              # ONLY mutable file; swapped atomically
        v=000001/part-*.parquet
        v=000002/part-*.parquet
        _TOMBSTONE.json       # written by drop(); makes load() fail

Commit protocol (crash-safe at every step):
1. validate the batch against the CURRENT version (checked semantics
   delegated to DatasetGraphStore.add_triples_checked /
   delete_triples_checked — distributed, no driver materialization);
2. write the post-op graph to ``v=<N+1>.tmp/`` with write_parquet
   (partitioned output — a failed run leaves only a .tmp dir that is
   ignored by readers and cleaned by the next commit);
3. rename ``v=<N+1>.tmp`` → ``v=<N+1>`` (atomic on POSIX);
4. write ``_MANIFEST.json.tmp`` and ``os.replace`` it over
   ``_MANIFEST.json`` — the single atomic instant at which the new
   version becomes visible. A crash before (4) leaves the store at
   version N, untouched — exactly the "store is unchanged on any
   conflict OR any failure" contract.

Old versions remain readable (time travel / audit) until ``gc()``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Sequence

import pyarrow as pa
import ray.data

from .. import triples as tr
from ..triples import Triple
from .dataset import DatasetGraphStore

_MANIFEST = "_MANIFEST.json"
_TOMBSTONE = "_TOMBSTONE.json"


class StoreDroppedError(RuntimeError):
    """The graph was dropped (G14); all further access fails."""


class VersionedGraphStorage:
    def __init__(self, root: str, graph_uri: str):
        self.root = root
        self.graph_uri = graph_uri
        os.makedirs(root, exist_ok=True)

    # -- manifest ----------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.root, _MANIFEST)

    def _read_manifest(self) -> dict:
        self._check_not_dropped()
        path = self._manifest_path()
        if not os.path.isfile(path):
            return {"graph_uri": self.graph_uri, "current": 0, "versions": {}}
        with open(path) as f:
            return json.load(f)

    def _swap_manifest(self, manifest: dict) -> None:
        """The atomic commit point: os.replace of a fully-written temp
        file. Readers see either the old or the new manifest, never a
        partial one."""
        path = self._manifest_path()
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _check_not_dropped(self) -> None:
        if os.path.isfile(os.path.join(self.root, _TOMBSTONE)):
            raise StoreDroppedError(
                f"graph {self.graph_uri!r} was dropped (tombstone present)"
            )

    # -- versions ----------------------------------------------------------

    def current_version(self) -> int:
        return int(self._read_manifest().get("current", 0))

    def versions(self) -> dict[str, dict]:
        return self._read_manifest().get("versions", {})

    def _version_dir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version:06d}")

    # -- load --------------------------------------------------------------

    def load(self, version: int | None = None) -> DatasetGraphStore:
        """Open the current (or a pinned historical) version lazily."""
        man = self._read_manifest()
        v = int(version if version is not None else man.get("current", 0))
        if v == 0:
            return DatasetGraphStore.from_triples(self.graph_uri, [])
        if str(v) not in man.get("versions", {}):
            raise KeyError(f"version {v} not in manifest")
        ds = ray.data.read_parquet(self._version_dir(v))
        return DatasetGraphStore(self.graph_uri, ds)

    # -- commit ------------------------------------------------------------

    def commit(self, store: DatasetGraphStore, op: str = "commit") -> int:
        """Stage the store's triples as the next version and swap the
        manifest. Returns the new version number."""
        man = self._read_manifest()
        new_v = int(man.get("current", 0)) + 1
        final_dir = self._version_dir(new_v)
        tmp_dir = final_dir + ".tmp"
        for stale in (tmp_dir, final_dir):
            if os.path.isdir(stale):
                shutil.rmtree(stale)  # leftover from a crashed commit
        os.makedirs(tmp_dir)
        store.dataset.write_parquet(tmp_dir)
        # row count from Parquet footers only — no second full read
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(os.path.join(tmp_dir, f)).metadata.num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        os.replace(tmp_dir, final_dir)
        man["graph_uri"] = self.graph_uri
        man["current"] = new_v
        man.setdefault("versions", {})[str(new_v)] = {
            "rows": rows,
            "op": op,
            "committed_at": time.time(),
        }
        self._swap_manifest(man)
        return new_v

    # -- checked batch ops (durable G7/G11) --------------------------------

    def add_triples_checked(
        self, new: "ray.data.Dataset | pa.Table | Sequence[Triple]"
    ) -> int:
        """Durable all-or-nothing batch add: validate against the
        current version (raises TripleAlreadyExistsError on any
        conflict — manifest untouched), then commit the union as a new
        version. The store only ever advances by whole, validated
        batches."""
        store = self.load()
        updated = store.add_triples_checked(new)  # raises on conflict
        return self.commit(updated, op="add_triples_checked")

    def delete_triples_checked(
        self, remove: "pa.Table | Sequence[Triple]"
    ) -> int:
        """Durable all-or-nothing batch delete (TripleDoesNotExistError
        on any missing triple; manifest untouched on failure)."""
        store = self.load()
        updated = store.delete_triples_checked(remove)
        return self.commit(updated, op="delete_triples_checked")

    def add_triples_unchecked(
        self, new: "ray.data.Dataset | pa.Table | Sequence[Triple]"
    ) -> int:
        store = self.load()
        return self.commit(store.add_triples_unchecked(new), op="add_unchecked")

    # -- drop + gc ---------------------------------------------------------

    def drop(self) -> None:
        """G14 durable drop: delete all version partitions, remove the
        manifest, and write a tombstone so the store is unusable until
        explicitly re-created (reference memory_store.go:235-239 renders
        the dropped store's pointer nil). Idempotent."""
        for entry in os.listdir(self.root):
            full = os.path.join(self.root, entry)
            if entry.startswith("v=") and os.path.isdir(full):
                shutil.rmtree(full)
        man = self._manifest_path()
        if os.path.isfile(man):
            os.remove(man)
        with open(os.path.join(self.root, _TOMBSTONE), "w") as f:
            json.dump(
                {"graph_uri": self.graph_uri, "dropped_at": time.time()}, f
            )

    def compact(self, target_rows_per_file: int = 1_000_000) -> int:
        """Rewrite the CURRENT version into right-sized Parquet files —
        the small-file fix: a long history of little checked batches
        leaves each version with one file per input block, and readers
        then pay per-file open/footer cost. One distributed read →
        ``repartition(ceil(rows/target))`` → the standard staged
        commit (``op="compact"``, manifest swap; old versions stay
        readable until :meth:`gc`). Content-identical by construction;
        the commit's footer-derived row count is asserted against the
        previous version's so silent loss is impossible."""
        import math

        self._check_not_dropped()
        man = self._read_manifest()
        cur = int(man.get("current", 0))
        if cur == 0:
            raise RuntimeError("nothing to compact (no committed version)")
        prev_rows = int(man["versions"][str(cur)]["rows"])
        ds = ray.data.read_parquet(self._version_dir(cur))
        n_files = max(1, math.ceil(prev_rows / target_rows_per_file))
        new_v = self.commit(
            DatasetGraphStore(self.graph_uri, ds.repartition(n_files)),
            op="compact",
        )
        new_rows = int(self._read_manifest()["versions"][str(new_v)]["rows"])
        if new_rows != prev_rows:
            raise RuntimeError(
                f"compaction row drift: {prev_rows} -> {new_rows}"
            )
        return new_v

    def gc(self, keep: int = 1) -> list[int]:
        """Delete all but the newest ``keep`` versions' partitions.
        Returns the version numbers removed."""
        man = self._read_manifest()
        versions = sorted(int(v) for v in man.get("versions", {}))
        victims = versions[:-keep] if keep else versions
        for v in victims:
            vdir = self._version_dir(v)
            if os.path.isdir(vdir):
                shutil.rmtree(vdir)
            man["versions"].pop(str(v), None)
        self._swap_manifest(man)
        return victims
