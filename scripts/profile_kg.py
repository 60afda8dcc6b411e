"""Per-phase wall-time profile of the KG pipeline at a given CPU count.

Usage: python scripts/profile_kg.py <num_cpus> <amplify> [sf_dir]

Times each materialization cut separately (extract, partials,
distincts+components, final triples) so the scaling bottleneck at low
CPU counts is attributable to a phase, not the whole run. Owns its Ray
session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    import ray
    from ray.data import DataContext

    ray.init(
        address="local", num_cpus=num_cpus, include_dashboard=False,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = max(32, 1024 // max(1, num_cpus)) * 1024 * 1024

    import pyarrow.compute as pc

    from ontograph_ray.pipelines import kg
    from ontograph_ray.pipelines.pages import extract_text_batch, read_pages
    from ontograph_ray.store.dataset import dedup, distinct_on

    # warmup (worker import cost)
    kg.build_kg("/root/testdata/sf0.001", amplify=1).triples.count()

    phases = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 2)
        print(f"  {name}: {phases[name]}s", file=sys.stderr)
        return out

    t_all = time.time()
    extracted = timed(
        "p12_extract",
        lambda: read_pages(sf_dir, amplify=amplify)
        .map_batches(extract_text_batch, batch_format="pyarrow")
        .materialize(),
    )
    partials = timed(
        "p345_partials",
        lambda: kg.ent_rel_partials_stage(extracted).materialize(),
    )

    def _of_kind(kind, cols):
        def filt(b):
            return b.filter(pc.equal(b["kind"], kind)).select(cols)

        return partials.map_batches(filt, batch_format="pyarrow")

    entities_d = timed(
        "p6a_entities_distinct",
        lambda: distinct_on(_of_kind("e", ["surface", "lang"]), ["surface", "lang"], 8).materialize(),
    )
    rels_d = timed(
        "p6b_rels_distinct",
        lambda: distinct_on(_of_kind("r", ["src", "dst"]), ["src", "dst"], 16).materialize(),
    )

    def components_fn():
        import pyarrow as pa

        def ent_edges(batch):
            import pyarrow.compute as pc2

            alias = pc2.binary_join_element_wise(
                pa.scalar(f"{kg.ONTO}#ent_"), batch["surface"], pa.scalar("__"), batch["lang"], ""
            )
            canon = pc2.binary_join_element_wise(pa.scalar(f"{kg.ONTO}#ent_"), batch["surface"], "")
            return pa.table({"src": alias, "dst": canon})

        from ontograph_ray.pipelines.canonicalize import connected_components

        edges = entities_d.map_batches(ent_edges, batch_format="pyarrow")
        comps = connected_components(edges, num_buckets=16)
        return {
            r["node"]: r["component"] for r in comps.take_all() if r["node"] != r["component"]
        }

    comp_map = timed("p6c_components", components_fn)
    comp_ref = ray.put(comp_map)

    def rw(ds):
        return ds.map_batches(
            kg._rewrite_batch, fn_kwargs={"comp_ref": comp_ref},
            batch_format="pyarrow", batch_size=65536,
        )

    def final_fn():
        m = kg.mentions_distinct_stage(extracted).map_batches(
            kg.mention_link_triples_batch, batch_format="pyarrow"
        )
        e = entities_d.map_batches(kg.entity_triples_batch, batch_format="pyarrow")
        p = extracted.map_batches(kg.page_triples_batch, batch_format="pyarrow")
        r = rels_d.map_batches(kg.relation_triples_batch, batch_format="pyarrow")
        small = dedup(rw(e.union(r)), num_buckets=16).materialize()
        big = rw(m).union(p)
        return big.union(small)

    final = timed("p7_final_build", final_fn)
    t0 = time.time()
    n = final.count()
    phases["p7_count_consume"] = round(time.time() - t0, 2)
    print(f"  p7_count_consume: {phases['p7_count_consume']}s", file=sys.stderr)
    total = round(time.time() - t_all, 2)

    last = final.stats()
    print(json.dumps({
        "num_cpus": num_cpus, "amplify": amplify, "triples": n,
        "total_sec": total, "phases": phases,
        "triples_per_sec": round(n / total, 1),
    }))
    with open(f"/tmp/kg_stats_{num_cpus}_{amplify}.txt", "w") as f:
        f.write(last)
    ray.shutdown()


if __name__ == "__main__":
    main()
