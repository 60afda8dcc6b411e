"""The flagship pipeline: web pages → RDF triple store (P1-P7).

Ray-Data-native knowledge-graph construction per the engine's north
rule, composing the reference's term/graph semantics
(NewResourceTerm/NewLiteralTerm encoding triple.go:16-30, owl:sameAs
model constants.go:24 + ontology_individual.go:7, set-semantics
dedup memory_store.go:125-134) into a streaming plan:

  P1 read      read_parquet(documents) → synthesized page table
  P2 extract   stateless map_batches; byte-identical text per url;
               drops the wide html column immediately
  P3 mentions  actor-pool map_batches holding the compiled gazetteer
  P4 relations adjacent-mention co-occurrence pairs (vectorized)
  P5 link      mention surface → ontology-term dictionary (broadcast
               via ray.put, loaded once per actor)
  P6 canon     distributed union-find over owl:sameAs edges
               (canonicalize.connected_components)
  P7 material  flat_map to (s,p,o) → global exact dedup →
               partitioned N-Triples/Parquet

Determinism: the gazetteer, alias scheme and relation rule are pure
functions of the input, so the emitted triple set has an exact
ground truth (the DuckDB oracle in __ray_entry__.py reproduces it).

Entity/alias model: a surface form mentioned in language L yields the
alias individual  <ONTO#ent_{surface}__{L}>  with an owl:sameAs edge
to the canonical  <ONTO#ent_{surface}>; canonicalization rewrites all
alias URIs to their component representative (the lexicographic min,
which is the canonical URI by construction).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import constants as C
from ..store.dataset import dedup, distinct_on, write_ntriples
from .canonicalize import connected_components, union_find
from .checkpoint import CheckpointedRun
from .pages import extract_text_batch, read_pages

ONTO = "https://kg.example.org/onto"

# Deterministic gazetteer: the document corpus vocabulary minus
# stopwords. At real scale this is the ontology-term dictionary built
# from OntologyClass/ObjectProperty labels (reference structs,
# ontology_class.go:4-11) and broadcast once via ray.put.
STOPWORDS = ("the", "a")
GAZETTEER = (
    "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "value", "vector", "window",
)

# Max distinct entity+relation rows the driver finishes locally; past
# this the distributed small-branch plan (bucketed dedup + broadcast
# rewrite + connected_components) takes over.
DRIVER_SMALL_MAX = 2_000_000

MENTIONS_PROP = f"{ONTO}#mentions"
COOCCURS_PROP = f"{ONTO}#cooccursWith"
IN_LANGUAGE_PROP = f"{ONTO}#inLanguage"
PAGE_CLASS = f"{ONTO}#Page"


def auto_concurrency() -> tuple[int, int]:
    """Actor-pool size scaled to the cluster: (1, #CPUs). A fixed cap
    would pin these stages' parallelism regardless of cluster size —
    the classic non-scaling mistake the two-cluster-size criterion
    catches."""
    return (1, max(4, int(ray.cluster_resources().get("CPU", 8))))


def canonical_uri(surface: str) -> str:
    return f"{ONTO}#ent_{surface}"


def alias_uri(surface: str, lang: str) -> str:
    return f"{ONTO}#ent_{surface}__{lang}"


def _tokenize(text_col):
    """Vectorized whitespace tokenizer: text column → (flat token
    array, per-token parent row index, per-token position-in-doc).
    Pure Arrow/numpy — no Python loop over rows or tokens."""
    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    toks = pc.split_pattern(text_col, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    parents = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    pos = np.arange(len(flat), dtype=np.int64) - starts[parents]
    return flat, parents, pos


class MentionDetector:
    """P3+P5 actor stage: tokenizer + gazetteer lookup, state compiled
    once per actor in __init__ (gazetteer value-set Arrow array),
    applied per batch with is_in/take kernels — no per-row Python.

    Emits one row per gazetteer token occurrence:
    (url, lang, pos, surface, alias) — alias is the language-local
    entity URI the linker scored for this mention."""

    def __init__(self, gazetteer_ref=None):
        gaz = ray.get(gazetteer_ref) if gazetteer_ref is not None else GAZETTEER
        self.gaz_arr = pa.array(sorted(set(gaz)), pa.string())

    def hits(self, batch: pa.Table):
        """One tokenize + gazetteer-select pass → (surfaces, parent row
        indices, positions). The shared kernel for every detect-shaped
        stage; callers build only the columns they actually keep —
        building alias/url URI strings for hits that a downstream
        distinct immediately collapses is pure allocator traffic, and
        at 32-way concurrency allocator/memory bandwidth (not CPU) is
        what these stages contend on."""
        flat, parents, pos = _tokenize(batch["text"])
        mask = pc.is_in(flat, value_set=self.gaz_arr).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(mask)
        sel_arr = pa.array(sel, pa.int64())
        return pc.take(flat, sel_arr), parents[sel], pos[sel]

    def __call__(self, batch: pa.Table) -> pa.Table:
        surfaces_arr, par, pos_sel = self.hits(batch)
        par_arr = pa.array(par, pa.int64())
        langs_arr = pc.take(batch["lang"], par_arr)
        alias = pc.binary_join_element_wise(
            pa.scalar(f"{ONTO}#ent_"), surfaces_arr, pa.scalar("__"), langs_arr, ""
        )
        return pa.table(
            {
                "url": pc.take(batch["url"], par_arr),
                "lang": langs_arr,
                "pos": pa.array(pos_sel, pa.int64()),
                "surface": surfaces_arr,
                "alias": alias,
            }
        )


# Per-worker-process cache of constructed stage objects keyed by the
# broadcast ObjectRef — tasks get actor-like "load state once per
# worker" behavior without actor-pool startup/queueing overhead.
_STAGE_CACHE: dict = {}


def _cached_stage(cls, ref):
    key = (cls.__name__, ref.hex() if hasattr(ref, "hex") else id(ref))
    inst = _STAGE_CACHE.get(key)
    if inst is None:
        inst = _STAGE_CACHE[key] = cls(ref)
    return inst


def _mentions_batch(batch: pa.Table, gaz_ref=None) -> pa.Table:
    return _cached_stage(MentionDetector, gaz_ref)(batch)


def _mentions_distinct_batch(batch: pa.Table, gaz_ref=None) -> pa.Table:
    """Fused mention-detect + per-page distinct in ONE UDF. The
    distinct MUST happen inside the same call that sees the whole
    page: page rows are atomic in the input batch, but any separate
    downstream pass would see dynamically re-split blocks, where one
    page's mention rows can straddle a block boundary and batch-local
    distinct silently under-deduplicates (caught as a varying triple
    count between benchmark runs)."""
    det = _cached_stage(MentionDetector, gaz_ref)
    surf, par, _ = det.hits(batch)
    par_arr = pa.array(par, pa.int64())
    m = pa.table(
        {
            "url": pc.take(batch["url"], par_arr),
            "lang": pc.take(batch["lang"], par_arr),
            "surface": surf,
        }
    )
    if m.num_rows == 0:
        return m
    return m.group_by(["url", "lang", "surface"], use_threads=False).aggregate([])


def _ent_rel_partials_batch(batch: pa.Table, gaz_ref=None) -> pa.Table:
    """ONE detect pass emitting both cross-page distinct partials as
    kind-tagged rows: kind='e' → per-batch distinct (surface, lang)
    entities; kind='r' → per-batch distinct (src, dst) relation pairs.
    Sharing the pass halves the corpus tokenization work the entity
    and relation stages would otherwise each redo; the outputs are
    tiny (bounded by the distinct sets, not the corpus)."""
    det = _cached_stage(MentionDetector, gaz_ref)
    surf, par, _ = det.hits(batch)
    par_arr = pa.array(par, pa.int64())
    lang = pc.take(batch["lang"], par_arr)
    ents = (
        pa.table({"surface": surf, "lang": lang})
        .group_by(["surface", "lang"], use_threads=False)
        .aggregate([])
    )
    # relations: adjacent same-page pairs with differing surfaces,
    # made distinct on the SURFACE key first — the alias-URI strings
    # are only built for the (tiny) distinct set, not per occurrence
    m = len(surf)
    if m >= 2:
        same_parent = par[1:] == par[:-1]
        differs = pc.not_equal(surf.slice(0, m - 1), surf.slice(1, m - 1)).to_numpy(
            zero_copy_only=False
        )
        keep = np.flatnonzero(same_parent & differs)
    else:
        keep = np.empty(0, dtype=np.int64)
    if len(keep):
        keep_arr = pa.array(keep, pa.int64())
        keep1_arr = pa.array(keep + 1, pa.int64())
        rel_surf = pa.table(
            {
                "src_s": pc.take(surf, keep_arr),
                "dst_s": pc.take(surf, keep1_arr),
                "lang": pc.take(lang, keep_arr),
            }
        ).group_by(["src_s", "dst_s", "lang"], use_threads=False).aggregate([])
        ent = pa.scalar(f"{ONTO}#ent_")
        sep = pa.scalar("__")
        rels = pa.table(
            {
                "src": pc.binary_join_element_wise(
                    ent, rel_surf["src_s"].combine_chunks(), sep,
                    rel_surf["lang"].combine_chunks(), ""
                ),
                "dst": pc.binary_join_element_wise(
                    ent, rel_surf["dst_s"].combine_chunks(), sep,
                    rel_surf["lang"].combine_chunks(), ""
                ),
            }
        )
        rels = rels.group_by(["src", "dst"], use_threads=False).aggregate([])
    else:
        rels = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
    n_e, n_r = ents.num_rows, rels.num_rows
    return pa.table(
        {
            "kind": pa.array(["e"] * n_e + ["r"] * n_r, pa.string()),
            "surface": pa.concat_arrays(
                [ents["surface"].combine_chunks(), pa.nulls(n_r, pa.string())]
            ),
            "lang": pa.concat_arrays(
                [ents["lang"].combine_chunks(), pa.nulls(n_r, pa.string())]
            ),
            "src": pa.concat_arrays(
                [pa.nulls(n_e, pa.string()), rels["src"].combine_chunks()]
            ),
            "dst": pa.concat_arrays(
                [pa.nulls(n_e, pa.string()), rels["dst"].combine_chunks()]
            ),
        }
    )


def ent_rel_partials_stage(pages: ray.data.Dataset) -> ray.data.Dataset:
    gaz_ref = ray.put(list(GAZETTEER))
    return pages.map_batches(
        _ent_rel_partials_batch,
        fn_kwargs={"gaz_ref": gaz_ref},
        batch_format="pyarrow",
        batch_size=None,
    )


def mentions_distinct_stage(pages: ray.data.Dataset) -> ray.data.Dataset:
    """P3+P5 with the (url, lang, surface) distinct fused in — globally
    distinct output with NO exchange (url functionally determines its
    page's batch)."""
    gaz_ref = ray.put(list(GAZETTEER))
    return pages.map_batches(
        _mentions_distinct_batch,
        fn_kwargs={"gaz_ref": gaz_ref},
        batch_format="pyarrow",
        batch_size=None,
    )


def _relations_batch(batch: pa.Table, gaz_ref=None) -> pa.Table:
    return _cached_stage(RelationExtractor, gaz_ref)(batch)


def mentions_stage(
    pages: ray.data.Dataset, concurrency=None, use_actors: bool = False
) -> ray.data.Dataset:
    """P3+P5. Default physical form is a TASK pool with per-worker
    cached state: the gazetteer is a tiny broadcast (ray.put) and Ray
    Data actor pools cost several seconds of startup/queueing that
    tasks don't. ``use_actors=True`` selects the actor-pool form — the
    right shape when the per-actor state is heavy (a real NER model)."""
    gaz_ref = ray.put(list(GAZETTEER))
    if use_actors:
        return pages.map_batches(
            MentionDetector,
            fn_constructor_args=(gaz_ref,),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=concurrency or auto_concurrency(),
        )
    return pages.map_batches(
        _mentions_batch,
        fn_kwargs={"gaz_ref": gaz_ref},
        batch_format="pyarrow",
        batch_size=None,
    )


class RelationExtractor:
    """P4 actor stage over extracted pages: adjacent-gazetteer-mention
    co-occurrence pairs. Runs per page (pages are never split across
    batches, so no boundary pairs are lost), emitting
    (src_alias, dst_alias) for consecutive mentions with different
    surface forms. Vectorized: gazetteer hits are selected with is_in,
    then adjacent-pair masks are numpy comparisons over the selected
    token stream (same-parent ∧ different-surface)."""

    def __init__(self, gazetteer_ref=None):
        gaz = ray.get(gazetteer_ref) if gazetteer_ref is not None else GAZETTEER
        self.gaz_arr = pa.array(sorted(set(gaz)), pa.string())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flat, parents, _ = _tokenize(batch["text"])
        mask = pc.is_in(flat, value_set=self.gaz_arr).to_numpy(zero_copy_only=False)
        sel = np.flatnonzero(mask)
        empty = pa.table(
            {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
        )
        if len(sel) < 2:
            return empty
        surf = pc.take(flat, pa.array(sel, pa.int64()))
        par = parents[sel]
        same_parent = par[1:] == par[:-1]
        m = len(surf)
        differs = pc.not_equal(surf.slice(0, m - 1), surf.slice(1, m - 1)).to_numpy(
            zero_copy_only=False
        )
        keep = np.flatnonzero(same_parent & differs)
        if len(keep) == 0:
            return empty
        src_surf = pc.take(surf, pa.array(keep, pa.int64()))
        dst_surf = pc.take(surf, pa.array(keep + 1, pa.int64()))
        lang = pc.take(batch["lang"], pa.array(par[keep], pa.int64()))
        ent = pa.scalar(f"{ONTO}#ent_")
        sep = pa.scalar("__")
        return pa.table(
            {
                "src": pc.binary_join_element_wise(ent, src_surf, sep, lang, ""),
                "dst": pc.binary_join_element_wise(ent, dst_surf, sep, lang, ""),
            }
        )


def relations_stage(
    extracted: ray.data.Dataset, concurrency=None, use_actors: bool = False
) -> ray.data.Dataset:
    """P4 — same task-pool-with-cached-state default as
    mentions_stage (see there for the actor/task tradeoff)."""
    gaz_ref = ray.put(list(GAZETTEER))
    if use_actors:
        return extracted.map_batches(
            RelationExtractor,
            fn_constructor_args=(gaz_ref,),
            batch_format="pyarrow",
            batch_size=8192,
            concurrency=concurrency or auto_concurrency(),
        )
    return extracted.map_batches(
        _relations_batch,
        fn_kwargs={"gaz_ref": gaz_ref},
        batch_format="pyarrow",
        batch_size=None,
    )


def _const_dict(value: str, n: int) -> pa.DictionaryArray:
    """Constant column as a 1-entry dictionary: 4 bytes/row instead of
    len(value) — predicates are the worst repeated-string offenders."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value], pa.string())
    )


def _decorated_url_dict(url_col) -> pa.DictionaryArray:
    """``<url>`` subject column built by dictionary-encoding the url
    column FIRST and decorating only the (distinct) dictionary values —
    a page's url repeats once per mention, so the angle-bracket strings
    are built ~|mentions-per-page|× fewer times and the block carries
    int32 indices instead of ~40-byte strings."""
    enc = pc.dictionary_encode(
        url_col.combine_chunks() if isinstance(url_col, pa.ChunkedArray) else url_col
    )
    vals = pc.binary_join_element_wise(
        pa.scalar("<"), enc.dictionary, pa.scalar(">"), ""
    )
    return pa.DictionaryArray.from_arrays(enc.indices, vals)


def _dict_encode_col(col) -> pa.DictionaryArray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        return col
    return pc.dictionary_encode(col)


def decode_triples_batch(batch: pa.Table) -> pa.Table:
    """Inverse boundary: dictionary-encoded triple columns back to
    plain strings (for sinks/consumers that need flat string columns —
    N-Triples lines, driver-oracle comparison, dedup exchanges)."""
    for i, name in enumerate(batch.schema.names):
        if pa.types.is_dictionary(batch.schema.field(i).type):
            batch = batch.set_column(
                i, name, pc.cast(batch.column(i), pa.string())
            )
    return batch


def encode_triples_batch(batch: pa.Table) -> pa.Table:
    """Dictionary-encode every plain string column (schema homogenizer:
    the small entity/relation branch must match the encoded big
    branches so the final union has ONE schema)."""
    for i, name in enumerate(batch.schema.names):
        if pa.types.is_string(batch.schema.field(i).type):
            batch = batch.set_column(
                i, name, _dict_encode_col(batch.column(i))
            )
    return batch


def mention_link_triples_batch(batch: pa.Table, encode: bool = False) -> pa.Table:
    """Distinct (url, lang, surface) mentions → `page mentions alias`
    triples (one row each — the sameAs/type triples are emitted once
    per distinct entity by entity_triples_batch, not per mention).

    ``encode=True`` emits dictionary-encoded columns — same logical
    table, ~8-10× fewer bytes per block. At 32-way concurrency these
    blocks are what saturates DRAM bandwidth (identical work costs ~2×
    CPU at 32 vs 8 workers; BASELINE.md), so shrinking the physical
    representation is the single-box scaling lever. The indices are
    per-block, so any downstream exchange ships the small dictionary
    with each block — no global coordination needed."""
    alias_res = pc.binary_join_element_wise(
        pa.scalar(f"<{ONTO}#ent_"), batch["surface"], pa.scalar("__"), batch["lang"], pa.scalar(">"), ""
    )
    if encode:
        return pa.table(
            {
                "subject": _decorated_url_dict(batch["url"]),
                "predicate": _const_dict(f"<{MENTIONS_PROP}>", batch.num_rows),
                "object": _dict_encode_col(alias_res),
            }
        )
    url_res = pc.binary_join_element_wise(pa.scalar("<"), batch["url"], pa.scalar(">"), "")
    pred = pa.array([f"<{MENTIONS_PROP}>"] * batch.num_rows, pa.string())
    return pa.table({"subject": url_res, "predicate": pred, "object": alias_res})


def entity_triples_batch(batch: pa.Table) -> pa.Table:
    """Distinct (surface, lang) entities → the per-entity triples:
    alias owl:sameAs canonical (the canonicalization edge) and alias
    rdf:type owl:NamedIndividual."""
    alias_res = pc.binary_join_element_wise(
        pa.scalar(f"<{ONTO}#ent_"), batch["surface"], pa.scalar("__"), batch["lang"], pa.scalar(">"), ""
    )
    canon_res = pc.binary_join_element_wise(
        pa.scalar(f"<{ONTO}#ent_"), batch["surface"], pa.scalar(">"), ""
    )
    n = batch.num_rows

    def const(s):
        return pa.array([s] * n, pa.string())

    return pa.concat_tables(
        [
            pa.table({"subject": alias_res, "predicate": const(f"<{C.OWL_SAME_AS}>"), "object": canon_res}),
            pa.table({"subject": alias_res, "predicate": const(f"<{C.RDF_TYPE}>"), "object": const(f"<{C.OWL_NAMED_INDIVIDUAL}>")}),
        ]
    )


def page_triples_batch(batch: pa.Table, encode: bool = False) -> pa.Table:
    """Per-page metadata triples (from the extracted page table).
    ``encode=True``: dictionary-encoded columns (see
    mention_link_triples_batch)."""
    n = batch.num_rows
    if encode:
        subj = _decorated_url_dict(batch["url"])
        lang_lit = _dict_encode_col(
            pc.binary_join_element_wise(pa.scalar('"'), batch["lang"], pa.scalar('"'), "")
        )
        return pa.concat_tables(
            [
                pa.table(
                    {
                        "subject": subj,
                        "predicate": _const_dict(f"<{C.RDF_TYPE}>", n),
                        "object": _const_dict(f"<{PAGE_CLASS}>", n),
                    }
                ),
                pa.table(
                    {
                        "subject": subj,
                        "predicate": _const_dict(f"<{IN_LANGUAGE_PROP}>", n),
                        "object": lang_lit,
                    }
                ),
            ]
        )
    url_res = pc.binary_join_element_wise(pa.scalar("<"), batch["url"], pa.scalar(">"), "")

    def const(s):
        return pa.array([s] * n, pa.string())

    lang_lit = pc.binary_join_element_wise(pa.scalar('"'), batch["lang"], pa.scalar('"'), "")
    return pa.concat_tables(
        [
            pa.table({"subject": url_res, "predicate": const(f"<{C.RDF_TYPE}>"), "object": const(f"<{PAGE_CLASS}>")}),
            pa.table({"subject": url_res, "predicate": const(f"<{IN_LANGUAGE_PROP}>"), "object": lang_lit}),
        ]
    )


def relation_triples_batch(batch: pa.Table) -> pa.Table:
    src = pc.binary_join_element_wise(pa.scalar("<"), batch["src"], pa.scalar(">"), "")
    dst = pc.binary_join_element_wise(pa.scalar("<"), batch["dst"], pa.scalar(">"), "")
    pred = pa.array([f"<{COOCCURS_PROP}>"] * batch.num_rows, pa.string())
    return pa.table({"subject": src, "predicate": pred, "object": dst})


# Per-worker-process cache of decoded component maps, keyed by the
# broadcast ObjectRef hex — the map is deserialized once per worker,
# not once per batch, without paying actor-pool startup.
_REWRITE_CACHE: dict = {}


def _rewrite_batch(batch: pa.Table, comp_ref=None) -> pa.Table:
    """P6 apply-stage: map URIs (in <…> term syntax) through the
    component representative table. owl:sameAs rows are left unrewritten
    — they stay as alias→canonical provenance edges instead of
    collapsing into self-loops. The component map is broadcast via
    ray.put (fetched from the local object store and cached per
    worker); the per-batch rewrite is a pure Arrow index_in/take/
    if_else — no Python per row. Partitioning assumption: the
    component map (≈ #distinct alias entities, NOT #pages) fits in
    worker memory; beyond that, swap for the bucketed-join rewrite."""
    if batch.num_rows == 0:
        return batch
    key = comp_ref.hex() if hasattr(comp_ref, "hex") else id(comp_ref)
    cached = _REWRITE_CACHE.get(key)
    if cached is None:
        comp: dict[str, str] = ray.get(comp_ref) if hasattr(comp_ref, "hex") else comp_ref
        cached = (
            pa.array([f"<{k}>" for k in comp], pa.string()),
            pa.array([f"<{v}>" for v in comp.values()], pa.string()),
        )
        _REWRITE_CACHE[key] = cached
    keys, vals = cached

    pred = batch["predicate"]
    if isinstance(pred, pa.ChunkedArray):
        pred = pred.combine_chunks()
    sameas = f"<{C.OWL_SAME_AS}>"
    if pa.types.is_dictionary(pred.type):
        # Dictionary-encoded predicate: test the (tiny) dictionary, not
        # the rows. Conservative: a sameAs entry in the dictionary counts
        # as "sameAs rows present" even if unreferenced.
        has_keep = pc.any(pc.equal(pred.dictionary, sameas)).as_py()
        keep = (
            pc.take(pc.equal(pred.dictionary, sameas), pred.indices)
            if has_keep
            else None
        )
    else:
        keep = pc.equal(pred, sameas)
        has_keep = pc.any(keep).as_py() is True

    for col in ("subject", "object"):
        orig = batch[col]
        if isinstance(orig, pa.ChunkedArray):
            orig = orig.combine_chunks()
        i = batch.schema.get_field_index(col)
        if pa.types.is_dictionary(orig.type):
            if not has_keep:
                # Dictionary-level rewrite: index_in/take/if_else over
                # the ~10²-value dictionary instead of the ~10⁵-row
                # column — the whole point of the encoded triple path.
                # (Duplicate post-rewrite dictionary values are legal
                # Arrow; nothing downstream assumes dictionary
                # uniqueness.)
                d = orig.dictionary
                idx = pc.index_in(d, value_set=keys)
                new_d = pc.if_else(pc.is_valid(idx), pc.take(vals, idx), d)
                # re-unify: the rewrite can map two aliases to the same
                # canonical, and duplicate dictionary values break
                # pandas Categorical consumers. dictionary_encode over
                # the (tiny) dictionary gives unique values + an
                # old→new position map; remapping rows is one int take.
                uniq = pc.dictionary_encode(new_d)
                batch = batch.set_column(
                    i,
                    col,
                    pa.DictionaryArray.from_arrays(
                        pc.take(uniq.indices, orig.indices), uniq.dictionary
                    ),
                )
                continue
            # sameAs rows present → the rewrite is row-conditional;
            # decode and fall through to the row-level path.
            orig = pc.cast(orig, pa.string())
        idx = pc.index_in(orig, value_set=keys)
        taken = pc.take(vals, idx)
        cond = pc.and_(pc.is_valid(idx), pc.invert(keep)) if has_keep else pc.is_valid(idx)
        batch = batch.set_column(i, col, pc.if_else(cond, taken, orig))
    return batch


def kg_oracle_sql() -> str:
    """ANSI SQL (DuckDB) reproducing the pipeline's exact final triple
    set from the ``documents`` view — the correctness ground truth for
    the whole P1-P7 plan (verified exact-equal in tests)."""
    gaz_list = ", ".join(f"'{g}'" for g in GAZETTEER)
    urlp = "https://docs.example.org/page/"
    return f"""
WITH toks AS (
  SELECT doc_id, lang, list_filter(string_split(text, ' '), x -> x IN ({gaz_list})) AS l
  FROM documents
),
mention AS (SELECT DISTINCT doc_id, lang, unnest(l) AS surface FROM toks),
pairs AS (
  SELECT DISTINCT p[1] AS s1, p[2] AS s2
  FROM (SELECT unnest(list_zip(list_slice(l, 1, len(l)-1), list_slice(l, 2, len(l)))) AS p
        FROM toks WHERE len(l) >= 2) WHERE p[1] != p[2]
)
SELECT '<' || '{urlp}' || doc_id || '>' AS subject,
       '<{C.RDF_TYPE}>' AS predicate,
       '<{PAGE_CLASS}>' AS object FROM documents
UNION ALL
SELECT '<' || '{urlp}' || doc_id || '>', '<{IN_LANGUAGE_PROP}>', '"' || lang || '"' FROM documents
UNION ALL
SELECT DISTINCT '<' || '{urlp}' || doc_id || '>', '<{MENTIONS_PROP}>', '<{ONTO}#ent_' || surface || '>' FROM mention
UNION ALL
SELECT DISTINCT '<{ONTO}#ent_' || surface || '__' || lang || '>',
       '<{C.OWL_SAME_AS}>', '<{ONTO}#ent_' || surface || '>' FROM mention
UNION ALL
SELECT DISTINCT '<{ONTO}#ent_' || surface || '>',
       '<{C.RDF_TYPE}>', '<{C.OWL_NAMED_INDIVIDUAL}>' FROM mention
UNION ALL
SELECT DISTINCT '<{ONTO}#ent_' || s1 || '>', '<{COOCCURS_PROP}>', '<{ONTO}#ent_' || s2 || '>' FROM pairs
"""


@dataclass
class KGPipelineResult:
    triples: ray.data.Dataset
    stats: dict = field(default_factory=dict)


def build_kg(
    sf_dir: str,
    out_dir: str | None = None,
    checkpoint_dir: str | None = None,
    concurrency=None,
    dedup_buckets: int = 64,
    skip_sameas_rewrite: bool = False,
    amplify: int = 1,
    unique_urls: bool = True,
    encode_triples: bool = True,
) -> KGPipelineResult:
    """Run the full P1-P7 pipeline over ``{sf_dir}/documents.parquet``.

    Returns the deduplicated triple Dataset (lazy until consumed) and
    per-stage counters. When ``out_dir`` is set, writes partitioned
    N-Triples + Parquet. When ``checkpoint_dir`` is set, stages resume
    from their manifests without recompute.

    ``unique_urls`` is the dedup-pushdown boundary contract: the
    mention/page triple branches skip the global (s,p,o) exchange on
    the guarantee that every url appears in exactly ONE input row.
    ``read_pages`` synthesizes such a table (amplify replicas get
    distinct urls), so the default holds here; crawl-shaped input
    (WARC/Common-Crawl via sources.warc, where re-crawled urls recur
    across files) must pass ``unique_urls=False``, which routes those
    branches through the full exact dedup and keeps the G17 set
    semantics at the cost of the wide exchange. Checkpointed runs
    verify the claim (a url-distinct count over the extracted stage —
    one narrow-column exchange a durable run can afford) and fail fast
    on a violation instead of silently emitting duplicate triples.

    ``encode_triples`` (default on) emits the triple columns
    dictionary-encoded on the dedup-pushdown fast path: constant
    predicates become 1-entry dictionaries, each page url is decorated
    once instead of once per mention, and the sameAs rewrite runs over
    per-block dictionaries (~10² values) instead of rows (~10⁵). Same
    logical table, ~8-10× fewer bytes per block — the single-box
    32-way scaling lever (BASELINE.md's DRAM-bandwidth diagnosis).
    Consumers that need flat strings decode at their boundary with
    ``decode_triples_batch``. The full-dedup paths
    (``skip_sameas_rewrite`` / ``unique_urls=False``) stay plain —
    they pay a global (s,p,o) exchange anyway and the dedup kernels
    key on plain strings.
    """
    t0 = time.time()
    concurrency = concurrency or auto_concurrency()
    run = CheckpointedRun(checkpoint_dir)
    stats: dict = {}

    # NOTE for session owners: the final plan unions three map
    # branches, and Ray Data's per-operator resource reservation carves
    # the budget across ALL operators in the DAG, starving the one hot
    # branch once a union widens the DAG — measured 4× wall-time at 8
    # CPUs / amplify 1600 (152s with reservation vs 38s without).
    # Every branch here is a bounded streaming map (no OOM-risk
    # all-to-all behind the union), so sessions running this pipeline
    # should set DataContext.op_resource_reservation_enabled = False.
    # The library itself does NOT mutate the session-global context
    # (that would silently change executor policy for every unrelated
    # Dataset the caller runs afterward); bench.py, scripts/ and the
    # test fixture — the session owners — each set it.

    # Without a checkpoint dir, stages that fan out to several
    # consumers are pinned in the object store (materialize) instead of
    # being recomputed per consumer; with one, CheckpointedRun already
    # persists each stage as Parquet (the durable variant of the same
    # cut point — the scale path).
    def pin(ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds if checkpoint_dir else ds.materialize()

    def extracted_fn():
        pages = read_pages(sf_dir, amplify=amplify)
        return pages.map_batches(extract_text_batch, batch_format="pyarrow")

    extracted = pin(
        run.stage(
            "extract", extracted_fn, config={"sf_dir": sf_dir, "amplify": amplify, "v": "1"},
            inputs=[f"{sf_dir}/documents.parquet"],
        )
    )

    if unique_urls and checkpoint_dir:
        # Durable runs verify the pushdown contract instead of trusting
        # it: distinct-url count must equal the page count.
        n_pages = extracted.count()
        n_urls = distinct_on(
            extracted.select_columns(["url"]), ["url"], min(16, dedup_buckets)
        ).count()
        if n_urls != n_pages:
            raise ValueError(
                f"build_kg(unique_urls=True) but {n_pages - n_urls} duplicate "
                "url row(s) found; pass unique_urls=False for crawl-shaped "
                "input so mention/page triples take the full dedup path"
            )

    # The distinct mention table (url, lang, surface): the distinct is
    # FUSED into the detection UDF (mentions_distinct_stage) so it runs
    # on whole pages before any dynamic block re-splitting, and `url`
    # is unique per page — so batch-local distinct IS globally
    # distinct, with NO exchange. The streaming path deliberately does
    # NOT pin this table: it is the pipeline's largest intermediate
    # (~#pages × #entities-per-page rows), and measured at amplify 1600
    # pushing it through the object store costs MORE than re-running
    # the (vectorized, hits()-based) detect pass fused into the
    # consumer chain — 49s to materialize vs ~7s to recompute at 32
    # CPUs. With a checkpoint dir it IS persisted (durable Parquet),
    # trading that cost for resumability.
    if checkpoint_dir:
        mentions_d = run.stage(
            "mentions_distinct",
            lambda: mentions_distinct_stage(extracted),
            config={"gazetteer": GAZETTEER, "v": "3"},
            inputs=["stage=extract"],
        )
    else:
        mentions_d = mentions_distinct_stage(extracted)

    # ONE shared detect pass produces the per-batch distinct partials
    # for BOTH cross-page keys (entities, relation pairs), kind-tagged
    # so a SINGLE bucketed global distinct covers both (their column
    # sets are disjoint, so the composite-key distinct is per-kind
    # distinct). The exchange carries the tiny partials, not the
    # corpus.
    partials = run.stage(
        "ent_rel_partials",
        lambda: ent_rel_partials_stage(extracted),
        config={"gazetteer": GAZETTEER, "v": "2"},
        inputs=["stage=extract"],
    )

    er_cols = ["kind", "surface", "lang", "src", "dst"]
    er_dist = run.stage(
        "ent_rel_distinct",
        lambda: distinct_on(partials, er_cols, min(16, dedup_buckets)),
        config={"v": "4"},
        inputs=["stage=ent_rel_partials"],
    )

    # The distinct entity/relation sets are bounded by the gazetteer
    # (|dict|×|langs| entities, |dict|²×|langs| relation pairs) — the
    # same "dictionary fits in memory" assumption the broadcast rewrite
    # already makes — so the whole small branch (entity + relation
    # triples, union-find, rewrite, dedup) finishes ON THE DRIVER: four
    # distributed stages' worth of fixed executor latency collapse into
    # microseconds of local pandas. DRIVER_SMALL_MAX guards the
    # assumption: past it, the distributed branch below takes over.
    if not checkpoint_dir:
        er_dist = er_dist.materialize()
    n_er = er_dist.count()
    use_driver_small = n_er <= DRIVER_SMALL_MAX
    # streaming mode has no manifest counters; fill in the row counts
    # that are free (metadata of already-materialized stages) so the
    # lineage story holds on both paths
    if not checkpoint_dir:
        run.counters["extract"]["rows"] = extracted.count()
        run.counters["ent_rel_distinct"]["rows"] = n_er

    def _er_kind(kind: str, cols: list[str]) -> ray.data.Dataset:
        def filt(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["kind"], kind)).select(cols)

        return er_dist.map_batches(filt, batch_format="pyarrow")

    if use_driver_small:
        er_tbl = pa.Table.from_pylist(er_dist.take_all())
        if er_tbl.num_rows:
            ents_tbl = er_tbl.filter(pc.equal(er_tbl["kind"], "e")).select(
                ["surface", "lang"]
            )
            rels_tbl = er_tbl.filter(pc.equal(er_tbl["kind"], "r")).select(
                ["src", "dst"]
            )
        else:
            ents_tbl = pa.table(
                {"surface": pa.array([], pa.string()), "lang": pa.array([], pa.string())}
            )
            rels_tbl = pa.table(
                {"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}
            )

    # P6: union-find over the owl:sameAs edge set (alias → canonical
    # per distinct entity). The edge list is the distinct entity set —
    # driver-sized here; `connected_components` remains the scale path
    # and is exercised by kg_sameas_components / its tests.
    def final_fn():
        enc = encode_triples and unique_urls and not skip_sameas_rewrite
        m_triples = mentions_d.map_batches(
            mention_link_triples_batch,
            fn_kwargs={"encode": enc},
            batch_format="pyarrow",
        )
        p_triples = extracted.map_batches(
            page_triples_batch, fn_kwargs={"encode": enc}, batch_format="pyarrow"
        )

        if skip_sameas_rewrite:
            if use_driver_small:
                e_triples = ray.data.from_arrow(entity_triples_batch(ents_tbl))
                r_triples = ray.data.from_arrow(relation_triples_batch(rels_tbl))
            else:
                e_triples = _er_kind("e", ["surface", "lang"]).map_batches(
                    entity_triples_batch, batch_format="pyarrow"
                )
                r_triples = _er_kind("r", ["src", "dst"]).map_batches(
                    relation_triples_batch, batch_format="pyarrow"
                )
            raw = m_triples.union(e_triples).union(p_triples).union(r_triples)
            return dedup(raw, num_buckets=dedup_buckets)

        if use_driver_small:
            comp = union_find(
                (alias_uri(s, l), canonical_uri(s))
                for s, l in zip(
                    ents_tbl["surface"].to_pylist(), ents_tbl["lang"].to_pylist()
                )
            )
            comp_map = {n: c for n, c in comp.items() if n != c}
        else:
            def ent_edges(batch: pa.Table) -> pa.Table:
                alias = pc.binary_join_element_wise(
                    pa.scalar(f"{ONTO}#ent_"), batch["surface"], pa.scalar("__"), batch["lang"], ""
                )
                canon = pc.binary_join_element_wise(
                    pa.scalar(f"{ONTO}#ent_"), batch["surface"], ""
                )
                return pa.table({"src": alias, "dst": canon})

            edges = _er_kind("e", ["surface", "lang"]).map_batches(
                ent_edges, batch_format="pyarrow"
            )
            components = connected_components(edges, num_buckets=min(16, dedup_buckets))
            comp_map = {
                r["node"]: r["component"]
                for r in components.take_all()
                if r["node"] != r["component"]
            }
        stats["components_rewritten"] = len(comp_map)
        comp_ref = ray.put(comp_map)

        def rw(ds: ray.data.Dataset) -> ray.data.Dataset:
            # task pool (no actor startup): the broadcast map is
            # fetched from the object store and cached per worker.
            return ds.map_batches(
                _rewrite_batch,
                fn_kwargs={"comp_ref": comp_ref},
                batch_format="pyarrow",
                batch_size=65536,
            )

        # P7 with *dedup pushdown*: the big triple parts are distinct
        # BY CONSTRUCTION (mention-link triples come from the global
        # (url,lang,surface) distinct with one functional lang per url;
        # page triples have unique subjects; the parts use disjoint
        # predicates), so they skip the global (s,p,o) exchange
        # entirely — G17 set semantics hold without shuffling the 99%
        # that cannot contain duplicates. Only entity/relation triples
        # can collapse when the rewrite merges per-language aliases;
        # that small remainder gets the exact dedup. Page triples skip
        # the rewrite too — no entity URI ever appears in them.
        big = rw(m_triples).union(p_triples)
        if not unique_urls:
            # Crawl-shaped input: duplicate urls break the
            # distinct-by-construction argument above, so the big
            # branches pay the exact dedup after all. (The parts stay
            # mutually disjoint — predicates differ — so one exchange
            # over their union suffices.)
            big = dedup(big, num_buckets=dedup_buckets)

        if use_driver_small:
            # the driver-side small branch: build, rewrite, dedup the
            # entity/relation triples locally (tiny), ship as one block
            sdf = pa.concat_tables(
                [entity_triples_batch(ents_tbl), relation_triples_batch(rels_tbl)]
            ).to_pandas()
            mapping = {f"<{k}>": f"<{v}>" for k, v in comp_map.items()}
            movable = sdf["predicate"] != f"<{C.OWL_SAME_AS}>"
            for col in ("subject", "object"):
                moved = sdf.loc[movable, col].map(mapping)
                sdf.loc[movable, col] = moved.fillna(sdf.loc[movable, col])
            sdf = sdf.drop_duplicates()
            small = ray.data.from_arrow(
                pa.Table.from_pandas(sdf, preserve_index=False)
            )
        else:
            e_triples = _er_kind("e", ["surface", "lang"]).map_batches(
                entity_triples_batch, batch_format="pyarrow"
            )
            r_triples = _er_kind("r", ["src", "dst"]).map_batches(
                relation_triples_batch, batch_format="pyarrow"
            )
            small = dedup(
                rw(e_triples.union(r_triples)), num_buckets=min(16, dedup_buckets)
            )
            if not checkpoint_dir:
                # Materialize the deduped remainder before the final
                # union: a union mixing a streaming map branch with an
                # all-to-all (the dedup's sort) starves the executor at
                # scale — observed as a >10-minute stall at amplify
                # 1600 where the branches run in <1 minute separately.
                small = small.materialize()
        if enc:
            # homogenize: the union must carry ONE schema (the big
            # branches are dictionary-encoded)
            small = small.map_batches(encode_triples_batch, batch_format="pyarrow")
        return big.union(small)

    final = run.stage(
        "triples", final_fn,
        config={
            "v": "5",
            "skip_rewrite": skip_sameas_rewrite,
            "unique_urls": unique_urls,
            "enc": encode_triples,
        },
        inputs=["stage=mentions_distinct", "stage=ent_rel_distinct", "stage=extract"],
    )

    if out_dir:
        final = final.materialize()
        write_ntriples(final, f"{out_dir}/ntriples")
        final.write_parquet(f"{out_dir}/parquet")

    stats["counters"] = run.counters
    stats["wall_sec"] = round(time.time() - t0, 3)
    return KGPipelineResult(triples=final, stats=stats)
