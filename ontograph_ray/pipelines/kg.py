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

import re
import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .. import constants as C
from ..terms import new_literal_term, new_resource_term
from ..store.dataset import dedup, write_ntriples
from .canonicalize import connected_components
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

MENTIONS_PROP = f"{ONTO}#mentions"
COOCCURS_PROP = f"{ONTO}#cooccursWith"
IN_LANGUAGE_PROP = f"{ONTO}#inLanguage"
PAGE_CLASS = f"{ONTO}#Page"


def canonical_uri(surface: str) -> str:
    return f"{ONTO}#ent_{surface}"


def alias_uri(surface: str, lang: str) -> str:
    return f"{ONTO}#ent_{surface}__{lang}"


class MentionDetector:
    """P3+P5 actor stage: tokenizer + gazetteer lookup, state compiled
    once per actor in __init__ (regex + dict), applied per batch.

    Emits one row per gazetteer token occurrence:
    (url, lang, pos, surface, alias) — alias is the language-local
    entity URI the linker scored for this mention."""

    def __init__(self, gazetteer_ref=None):
        self.gazetteer = frozenset(
            ray.get(gazetteer_ref) if gazetteer_ref is not None else GAZETTEER
        )
        self.token_re = re.compile(r"[^\s]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, langs, positions, surfaces = [], [], [], []
        url_col = batch["url"].to_pylist()
        lang_col = batch["lang"].to_pylist()
        text_col = batch["text"].to_pylist()
        gaz = self.gazetteer
        for url, lang, text in zip(url_col, lang_col, text_col):
            pos = 0
            for tok in text.split(" "):
                if tok in gaz:
                    urls.append(url)
                    langs.append(lang)
                    positions.append(pos)
                    surfaces.append(tok)
                pos += 1
        surfaces_arr = pa.array(surfaces, pa.string())
        langs_arr = pa.array(langs, pa.string())
        alias = pc.binary_join_element_wise(
            pa.scalar(f"{ONTO}#ent_"), surfaces_arr, pa.scalar("__"), langs_arr, ""
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lang": langs_arr,
                "pos": pa.array(positions, pa.int64()),
                "surface": surfaces_arr,
                "alias": alias,
            }
        )


def mentions_stage(pages: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    gaz_ref = ray.put(list(GAZETTEER))
    return pages.map_batches(
        MentionDetector,
        fn_constructor_args=(gaz_ref,),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


class RelationExtractor:
    """P4 actor stage over extracted pages: adjacent-gazetteer-mention
    co-occurrence pairs. Runs per page (pages are never split across
    batches, so no boundary pairs are lost), emitting
    (src_alias, dst_alias) for consecutive mentions with different
    surface forms. State (gazetteer set) compiled once per actor."""

    def __init__(self, gazetteer_ref=None):
        self.gazetteer = frozenset(
            ray.get(gazetteer_ref) if gazetteer_ref is not None else GAZETTEER
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs, dsts = [], []
        gaz = self.gazetteer
        for lang, text in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
            prev = None
            for tok in text.split(" "):
                if tok not in gaz:
                    continue
                if prev is not None and prev != tok:
                    srcs.append(f"{ONTO}#ent_{prev}__{lang}")
                    dsts.append(f"{ONTO}#ent_{tok}__{lang}")
                prev = tok
        return pa.table(
            {"src": pa.array(srcs, pa.string()), "dst": pa.array(dsts, pa.string())}
        )


def relations_stage(extracted: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    gaz_ref = ray.put(list(GAZETTEER))
    return extracted.map_batches(
        RelationExtractor,
        fn_constructor_args=(gaz_ref,),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


def mention_triples_batch(batch: pa.Table) -> pa.Table:
    """Flatten mention rows into raw (pre-canonicalization) triples."""
    url_res = pc.binary_join_element_wise(pa.scalar("<"), batch["url"], pa.scalar(">"), "")
    alias_res = pc.binary_join_element_wise(pa.scalar("<"), batch["alias"], pa.scalar(">"), "")
    canon = pc.binary_join_element_wise(
        pa.scalar(f"<{ONTO}#ent_"), batch["surface"], pa.scalar(">"), ""
    )
    n = batch.num_rows

    def const(s):
        return pa.array([s] * n, pa.string())

    parts = [
        # page mentions alias
        pa.table({"subject": url_res, "predicate": const(f"<{MENTIONS_PROP}>"), "object": alias_res}),
        # alias sameAs canonical (the canonicalization edge)
        pa.table({"subject": alias_res, "predicate": const(f"<{C.OWL_SAME_AS}>"), "object": canon}),
        # alias is a NamedIndividual
        pa.table({"subject": alias_res, "predicate": const(f"<{C.RDF_TYPE}>"), "object": const(f"<{C.OWL_NAMED_INDIVIDUAL}>")}),
    ]
    return pa.concat_tables(parts)


def page_triples_batch(batch: pa.Table) -> pa.Table:
    """Per-page metadata triples (from the extracted page table)."""
    url_res = pc.binary_join_element_wise(pa.scalar("<"), batch["url"], pa.scalar(">"), "")
    n = batch.num_rows

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


class _RewriteWithComponents:
    """P6 apply-stage: map URIs (in <…> term syntax) through the
    component representative table. owl:sameAs rows are left unrewritten
    — they stay as alias→canonical provenance edges instead of
    collapsing into self-loops. The component map is broadcast via
    ray.put and fetched once per actor. Partitioning assumption: the
    component map (≈ #distinct alias entities, NOT #pages) fits in
    worker memory; beyond that, swap for the bucketed-join rewrite."""

    def __init__(self, comp_ref):
        comp: dict[str, str] = ray.get(comp_ref)
        self.mapping = {f"<{k}>": f"<{v}>" for k, v in comp.items()}
        self.same_as = f"<{C.OWL_SAME_AS}>"

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        keep = df["predicate"] == self.same_as
        for col in ("subject", "object"):
            rewritten = df[col].map(self.mapping).fillna(df[col])
            df[col] = df[col].where(keep, rewritten)
        return df


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
    concurrency=(1, 8),
    dedup_buckets: int = 64,
    skip_sameas_rewrite: bool = False,
) -> KGPipelineResult:
    """Run the full P1-P7 pipeline over ``{sf_dir}/documents.parquet``.

    Returns the deduplicated triple Dataset (lazy until consumed) and
    per-stage counters. When ``out_dir`` is set, writes partitioned
    N-Triples + Parquet. When ``checkpoint_dir`` is set, stages resume
    from their manifests without recompute.
    """
    t0 = time.time()
    run = CheckpointedRun(checkpoint_dir)
    stats: dict = {}

    def extracted_fn():
        pages = read_pages(sf_dir)
        return pages.map_batches(extract_text_batch, batch_format="pyarrow")

    extracted = run.stage(
        "extract", extracted_fn, config={"sf_dir": sf_dir, "v": "1"},
        inputs=[f"{sf_dir}/documents.parquet"],
    )

    mentions = run.stage(
        "mentions",
        lambda: mentions_stage(extracted, concurrency),
        config={"gazetteer": GAZETTEER, "v": "1"},
        inputs=["stage=extract"],
    )

    def triples_fn():
        m_triples = mentions.map_batches(mention_triples_batch, batch_format="pyarrow")
        p_triples = extracted.map_batches(page_triples_batch, batch_format="pyarrow")
        rels = relations_stage(extracted, concurrency)
        r_triples = rels.map_batches(relation_triples_batch, batch_format="pyarrow")
        return m_triples.union(p_triples).union(r_triples)

    raw_triples = run.stage(
        "raw_triples", triples_fn, config={"v": "1"}, inputs=["stage=mentions"]
    )

    # P6: union-find over sameAs edges, then rewrite URIs to their
    # component representative.
    def canonical_fn():
        same_as_pred = f"<{C.OWL_SAME_AS}>"

        def sameas_edges(batch: pa.Table) -> pa.Table:
            from ..terms import v_value

            mask = pc.equal(batch["predicate"], same_as_pred)
            hit = batch.filter(mask)
            return pa.table(
                {"src": v_value(hit["subject"]), "dst": v_value(hit["object"])}
            )

        edges = raw_triples.map_batches(sameas_edges, batch_format="pyarrow")
        components = connected_components(edges, num_buckets=dedup_buckets)
        comp_map = {
            r["node"]: r["component"]
            for r in components.take_all()
            if r["node"] != r["component"]
        }
        stats["components_rewritten"] = len(comp_map)
        comp_ref = ray.put(comp_map)
        return raw_triples.map_batches(
            _RewriteWithComponents,
            fn_constructor_args=(comp_ref,),
            batch_format="pandas",
            concurrency=concurrency,
        )

    canonical = (
        raw_triples
        if skip_sameas_rewrite
        else run.stage("canonical", canonical_fn, config={"v": "1"}, inputs=["stage=raw_triples"])
    )

    # P7: global exact dedup (set semantics, G17) → sinks
    final = dedup(canonical, num_buckets=dedup_buckets)

    if out_dir:
        final = final.materialize()
        write_ntriples(final, f"{out_dir}/ntriples")
        final.write_parquet(f"{out_dir}/parquet")

    stats["counters"] = run.counters
    stats["wall_sec"] = round(time.time() - t0, 3)
    return KGPipelineResult(triples=final, stats=stats)
