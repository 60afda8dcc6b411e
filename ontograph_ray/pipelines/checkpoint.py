"""Per-stage checkpointing with lineage + counters.

Layout (resumable batch-pipeline contract):

    <run_dir>/stage=<name>/
        part-*.parquet       (the stage's output partitions)
        _MANIFEST.json       (row count, config hash, lineage, counters)

A stage writes to ``stage=<name>.tmp/`` and atomically renames on
success, so a partial write is never mistaken for a finished stage. On
re-run, a stage whose manifest exists and whose config hash matches is
loaded back with ``read_parquet`` and NOT recomputed — the resume
semantics the north rule asks for ("any stage resumes without
recompute"). Counters (rows in/out, custom metrics) live in the
manifest for lineage auditing.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable

import ray.data


def _config_hash(config) -> str:
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


class CheckpointedRun:
    def __init__(self, run_dir: str | None):
        self.run_dir = run_dir
        self.counters: dict[str, dict] = {}
        if run_dir:
            os.makedirs(run_dir, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.run_dir, f"stage={name}")

    def manifest(self, name: str) -> dict | None:
        path = os.path.join(self._stage_dir(name), "_MANIFEST.json")
        if os.path.isfile(path):
            with open(path) as f:
                return json.load(f)
        return None

    def stage(
        self,
        name: str,
        fn: Callable[[], ray.data.Dataset],
        config: dict | None = None,
        inputs: list[str] | None = None,
    ) -> ray.data.Dataset:
        """Run (or resume) a stage. ``fn`` builds the stage's output
        Dataset; it is only invoked when no valid checkpoint exists."""
        config = config or {}
        chash = _config_hash(config)
        if not self.run_dir:
            ds = fn()
            self.counters[name] = {"rows": None, "resumed": False}
            return ds

        stage_dir = self._stage_dir(name)
        man = self.manifest(name)
        if man and man.get("config_hash") == chash:
            self.counters[name] = {**man.get("counters", {}), "resumed": True}
            return ray.data.read_parquet(stage_dir)

        tmp_dir = stage_dir + ".tmp"
        if os.path.isdir(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)
        t0 = time.time()
        ds = fn()
        ds.write_parquet(tmp_dir)
        # row count from Parquet footers — metadata only, no second
        # full read of the stage output.
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(os.path.join(tmp_dir, f)).metadata.num_rows
            for f in os.listdir(tmp_dir)
            if f.endswith(".parquet")
        )
        manifest = {
            "stage": name,
            "config_hash": chash,
            "config": config,
            "lineage": {"inputs": inputs or [], "engine": "ontograph_ray"},
            "counters": {"rows": rows, "wall_sec": round(time.time() - t0, 3)},
            "completed_at": time.time(),
        }
        with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        if os.path.isdir(stage_dir):
            shutil.rmtree(stage_dir)
        os.replace(tmp_dir, stage_dir)
        self.counters[name] = {**manifest["counters"], "resumed": False}
        return ray.data.read_parquet(stage_dir)
