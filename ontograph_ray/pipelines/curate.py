"""Training-data curation pipeline: the composed counterpart of the
KG pipeline for corpus preparation at 100 TB scale.

    read documents (columns pruned)
      → vectorized per-doc features (tokens, punct, chars — ONE pass)
      → quality filter (deterministic integer predicates)
      → exact dedup on text (hash-bucketed, keep min doc_id)
      → optional MinHash-LSH near-dup removal (stages.dedup)

Every stage is a streaming map or one bucketed exchange; the corpus is
never materialized whole. The exact path (filter + dedup) is fully
SQL-expressible, so the driver oracle pins it end-to-end; the near-dup
tail is pinned by the pytest ground-truth invariants instead
(tests/test_stages.py::TestRegistryInvariants discipline).

Quality predicates use integer arithmetic only (token count ≥
MIN_TOKENS, 10·punct_chars ≤ PUNCT_PERMILLE_10·chars) so the Ray and
SQL sides agree bit-for-bit — no float-ratio drift.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.dedup import exact_dedup, minhash_dedup

MIN_TOKENS = 5
# punctuation budget: punct_chars/chars ≤ 0.3, kept integral as
# 10·punct ≤ 3·chars
PUNCT_NUM = 10
PUNCT_DEN = 3

_PUNCT_RE = r"[^\w\s]"


def features_batch(batch: pa.Table) -> pa.Table:
    """One vectorized pass: token/punct/char counts per document."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
    punct = pc.count_substring_regex(text, _PUNCT_RE)
    chars = pc.utf8_length(text)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "text": text,
            "lang": batch["lang"],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "punct_chars": pc.cast(punct, pa.int64()),
            "n_chars": pc.cast(chars, pa.int64()),
        }
    )


def quality_filter_batch(batch: pa.Table) -> pa.Table:
    keep = pc.and_(
        pc.greater_equal(batch["n_tokens"], MIN_TOKENS),
        pc.less_equal(
            pc.multiply(batch["punct_chars"], PUNCT_NUM),
            pc.multiply(batch["n_chars"], PUNCT_DEN),
        ),
    )
    return batch.filter(keep)


def curate(
    sf_dir: str,
    near_dup: bool = True,
    minhash_threshold: float = 0.85,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Full curation plan over ``{sf_dir}/documents.parquet``; returns
    the surviving documents with their feature columns."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    feats = docs.map_batches(features_batch, batch_format="pyarrow").map_batches(
        quality_filter_batch, batch_format="pyarrow"
    )
    deduped = exact_dedup(feats, key="text", id_col="doc_id", num_buckets=num_buckets)
    if near_dup:
        # texts are already distinct after exact_dedup — skip
        # minhash_dedup's exact-collapse (an identity exchange here)
        deduped = minhash_dedup(
            deduped,
            threshold=minhash_threshold,
            num_buckets=num_buckets,
            collapse_exact=False,
        )
    return deduped


def curate_oracle_sql() -> str:
    """DuckDB ground truth for the EXACT path (near_dup=False):
    features → quality filter → min-doc_id-per-text dedup."""
    return rf"""
WITH feats AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[^\w\s]')) AS punct_chars,
         length(text) AS n_chars
  FROM documents
),
filt AS (
  SELECT * FROM feats
  WHERE n_tokens >= {MIN_TOKENS}
    AND punct_chars * {PUNCT_NUM} <= n_chars * {PUNCT_DEN}
),
winners AS (SELECT min(doc_id) AS doc_id FROM filt GROUP BY text)
SELECT f.doc_id, f.lang, f.n_tokens, f.punct_chars, f.n_chars
FROM filt f JOIN winners w ON f.doc_id = w.doc_id"""
