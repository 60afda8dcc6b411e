"""Profile the KG pipeline at a given CPU count.

Usage: python scripts/profile_kg.py <num_cpus> <amplify> [sf_dir] [--durable]

Streaming mode (default): times the build (plan assembly + pinned
stages + driver small branch) and the consume (final fused plan →
count) separately. ``--durable``: runs the checkpointed path instead,
where every stage is written to Parquet and its wall time recorded in
the manifest counters — the per-stage breakdown.

Owns its Ray session. Mirrors bench.py's DataContext settings so
numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    durable = "--durable" in sys.argv
    num_cpus = int(args[0]) if args else 8
    amplify = int(args[1]) if len(args) > 1 else 800
    sf_dir = args[2] if len(args) > 2 else "/root/testdata/sf0.1"

    import ray
    from ray.data import DataContext

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = max(32, 1024 // max(1, num_cpus)) * 1024 * 1024
    ctx.op_resource_reservation_enabled = False

    from ontograph_ray.pipelines import kg

    # warmup (worker import cost)
    kg.build_kg("/root/testdata/sf0.001", amplify=1).triples.count()

    ckpt = None
    if durable:
        import shutil
        import tempfile

        ckpt = tempfile.mkdtemp(prefix="kg_profile_ckpt_")

    t0 = time.time()
    res = kg.build_kg(
        sf_dir, amplify=amplify, checkpoint_dir=ckpt,
        dedup_buckets=max(16, num_cpus * 2),
    )
    t_build = round(time.time() - t0, 2)
    t0 = time.time()
    n = res.triples.count()
    t_consume = round(time.time() - t0, 2)
    total = t_build + t_consume

    out = {
        "num_cpus": num_cpus, "amplify": amplify, "durable": durable,
        "triples": n, "build_sec": t_build, "consume_sec": t_consume,
        "total_sec": round(total, 2),
        "triples_per_sec": round(n / total, 1),
    }
    if durable:
        out["stage_counters"] = res.stats.get("counters", {})
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
