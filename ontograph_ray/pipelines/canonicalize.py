"""P6 — canonicalization: distributed union-find over owl:sameAs edges.

Connected components by iterative min-label propagation, expressed as
hash-bucketed groupby-aggregate shuffles (no driver-side graph, no
per-node tasks):

    labels₀(node)   = node
    labelsᵢ₊₁(node) = min(labelsᵢ(node), min over neighbors labelsᵢ)

Each iteration is two bucketed exchanges: (1) co-group the doubled
edge list with the label table on the source endpoint (they share one
unified schema and one bucket column, so the exchange is a single
groupby) and emit (neighbor, label) messages; (2) group messages by
node and take the min.

Skew handling for head entities (a hub with millions of sameAs edges)
is two complementary mechanisms:

- **fan-in** (hub as message *receiver*): a per-bucket combiner
  pre-mins messages per (node, is_self) *before* the phase-2 shuffle,
  so a hot node receives at most one row per phase-1 bucket instead of
  its full fan-in.
- **fan-out** (hub as edge *source*, ``salt > 1``): all of a hub's
  edges share ``key = hub`` and would hash to ONE phase-1 bucket,
  making that task a straggler. Salting spreads them: the edge bucket
  becomes ``hash(key, hash(nbr) % salt)`` — deterministic per edge, so
  the global edge dedup still co-locates identical (key, nbr) pairs —
  and each node's label row is replicated to all ``salt`` salted
  buckets before the phase-1 union (a cheap per-batch map; the label
  side is one row per node). Phase 2 stays keyed on the unsalted node
  hash, so labels remain globally unique. ``salt=1`` is the unsalted
  plan. The output is bucket-invariant: tests pin salted == unsalted
  == driver union-find.

Convergence is detected with a changed-count aggregate; min-label
propagation needs O(component diameter) iterations ≤ max_iters.

SameAs semantics anchor: owl:sameAs edges of individuals (reference:
constants.go:24, ontology_individual.go:7); the reference never
computes closures — this operator is the scale path the north rule
adds.
"""

from __future__ import annotations

import pandas as pd

import ray
import ray.data


def union_find(pairs) -> dict[str, str]:
    """Driver-side min-label union-find over an iterable of (a, b)
    string edge pairs → {node: component representative} for every
    node, where the representative is the lexicographic min of the
    component (same contract as connected_components). For edge sets
    known to fit driver memory only."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    nodes: set[str] = set()
    for k, n in pairs:
        nodes.add(k)
        nodes.add(n)
        a, b = find(k), find(n)
        if a != b:
            # min label wins so the representative is deterministic
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


def _local_components(edges2: ray.data.Dataset) -> ray.data.Dataset:
    """Driver-side union-find over the deduped doubled edge list —
    the small-graph cutover of connected_components (same output
    contract: Dataset(node, component), component = min label)."""
    comp = union_find(
        (row["key"], row["nbr"])
        for row in edges2.select_columns(["key", "nbr"]).iter_rows()
    )
    out = pd.DataFrame({"node": sorted(comp)})
    out["component"] = [comp[n] for n in out["node"]]
    return ray.data.from_pandas(out)


def _bucket_of(series: pd.Series, num_buckets: int) -> pd.Series:
    return (pd.util.hash_pandas_object(series, index=False) % num_buckets).astype(
        "int64"
    )


_COLS = ["kind", "node", "label", "key", "nbr", "__bucket"]
_SALT_SEP = "\x1f"


def _as_arrow(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Normalize block type so heterogeneous inputs can union."""
    import pyarrow as pa

    def ident(t: pa.Table) -> pa.Table:
        return t

    return ds.map_batches(ident, batch_format="pyarrow")


def connected_components(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    num_buckets: int = 64,
    small_threshold: int = 200_000,
    salt: int = 1,
) -> ray.data.Dataset:
    """Edges (src,dst string columns) → Dataset(node, component) where
    component is the lexicographic min node label of the component.

    Adaptive physical plan: after the global edge dedup, if the
    DISTINCT edge count is ≤ ``small_threshold`` the component labels
    are computed with a driver-side union-find over the (already
    shuffled-small) edge set — identical output, none of the
    per-iteration shuffle latency. Above the threshold the iterative
    min-label-propagation loop below is the scale path (this is the
    standard size cutover: a graph whose deduped edges fit the driver
    needs no distributed fixpoint). Tests pin both paths
    (small_threshold=0 forces the distributed loop).

    ``salt > 1`` spreads each node's *outgoing* edges over ``salt``
    salted buckets and replicates label rows to match (module
    docstring, "fan-out") — use for graphs with head entities whose
    degree rivals a whole bucket's fair share. Output is identical for
    any salt; the cost is a ×salt replication of the (one-row-per-node)
    label side of each phase-1 exchange."""
    salt = max(1, int(salt))

    def _edge_bucket(key: pd.Series, nbr: pd.Series) -> pd.Series:
        if salt == 1:
            return _bucket_of(key, num_buckets)
        s = pd.util.hash_pandas_object(nbr, index=False) % salt
        return _bucket_of(key + _SALT_SEP + s.astype(str), num_buckets)

    def _replicate_labels(df: pd.DataFrame) -> pd.DataFrame:
        """Re-bucket label rows for phase 1: one replica per salt value
        so every salted edge bucket holds its source labels. Colliding
        replicas (two salts of one node hashing to the same bucket) are
        harmless — phase 1 only needs ≥1 label row per bucket."""
        if salt == 1:
            return df
        reps = []
        for s in range(salt):
            r = df.copy()
            r["__bucket"] = _bucket_of(r["node"] + _SALT_SEP + str(s), num_buckets)
            reps.append(r)
        return pd.concat(reps, ignore_index=True)

    def doubled(df: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"key": df[src].astype(str), "nbr": df[dst].astype(str)})
        rev = pd.DataFrame({"key": df[dst].astype(str), "nbr": df[src].astype(str)})
        out = pd.concat([fwd, rev], ignore_index=True).drop_duplicates()
        out["kind"] = "edge"
        out["node"] = ""
        out["label"] = ""
        out["__bucket"] = _edge_bucket(out["key"], out["nbr"])
        return out[_COLS]

    # Global edge dedup before iterating: per-batch drop_duplicates is
    # only a combiner; the bucketed exchange + per-bucket distinct makes
    # it global, so a heavily duplicated edge list (e.g. one sameAs edge
    # re-emitted per mention) is shuffled ONCE here instead of once per
    # propagation iteration.
    edges2 = _as_arrow(
        edges.map_batches(doubled, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda df: df.drop_duplicates(subset=["key", "nbr"]),
            batch_format="pandas",
        )
    ).materialize()

    if edges2.count() <= small_threshold:
        return _local_components(edges2)

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = pd.concat(
            [df[src].astype(str), df[dst].astype(str)], ignore_index=True
        ).drop_duplicates()
        out = pd.DataFrame({"node": nodes, "label": nodes})
        out["kind"] = "lab"
        out["key"] = ""
        out["nbr"] = ""
        out["__bucket"] = _bucket_of(out["node"], num_buckets)
        return out[_COLS]

    labels = _as_arrow(
        edges.map_batches(init_labels, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda df: df.drop_duplicates(subset=["node"]), batch_format="pandas"
        )
    ).materialize()

    for _ in range(max_iters):
        lab_side = (
            labels
            if salt == 1
            else _as_arrow(
                labels.map_batches(_replicate_labels, batch_format="pandas")
            )
        )
        both = lab_side.union(edges2)

        # Phase 1: per bucket, join edges with source labels; emit
        # (node=nbr, label) messages plus tagged self rows; pre-min as
        # the anti-skew combiner.
        def propagate(df: pd.DataFrame) -> pd.DataFrame:
            lab = df.loc[df["kind"] == "lab", ["node", "label"]]
            edg = df.loc[df["kind"] == "edge", ["key", "nbr"]]
            msgs = edg.merge(lab, left_on="key", right_on="node")[["nbr", "label"]]
            msgs.columns = ["node", "label"]
            msgs["is_self"] = 0
            self_rows = lab.copy()
            self_rows["is_self"] = 1
            out = pd.concat([msgs, self_rows], ignore_index=True)
            out = out.groupby(["node", "is_self"], sort=False, as_index=False)[
                "label"
            ].min()
            out["__bucket"] = _bucket_of(out["node"], num_buckets)
            return out

        msgs = both.groupby("__bucket").map_groups(propagate, batch_format="pandas")

        # Phase 2: min per node; changed = new label < old (self) label.
        def reduce_node(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("node", sort=False)
            new = g["label"].min()
            old = df[df["is_self"] == 1].set_index("node")["label"]
            old = old[~old.index.duplicated()]
            out = new.reset_index()
            changed = (new < old.reindex(new.index)).fillna(True)
            out["kind"] = "lab"
            out["key"] = ""
            out["nbr"] = ""
            out["__changed"] = changed.to_numpy(dtype="int64")
            out["__bucket"] = _bucket_of(out["node"], num_buckets)
            return out[_COLS + ["__changed"]]

        new_labels = _as_arrow(
            msgs.groupby("__bucket").map_groups(reduce_node, batch_format="pandas")
        ).materialize()

        changed = new_labels.sum("__changed") or 0
        labels = new_labels.drop_columns(["__changed"]).materialize()
        if not changed:
            break

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": df["node"], "component": df["label"]})

    return labels.map_batches(finish, batch_format="pandas")
