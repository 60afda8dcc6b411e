"""Gopher-style repetition statistics for corpus quality filtering.

The repetition signals used by the Gopher/MassiveText quality rules
(Rae et al. 2021, arXiv:2112.11446 §A1.1): documents dominated by a
few repeated n-grams or with a low unique-token fraction are
boilerplate/spam and get dropped before training. This stage emits the
raw INTEGER counts per document (the filtering thresholds are a policy
choice layered on top; integer counts also keep the DuckDB oracle
bit-exact — the repo's `text_quality_counts` convention):

    n_tokens            whitespace tokens
    n_unique_tokens     distinct tokens
    n_2grams            token-bigram windows (n_tokens - 1, min 0)
    top_2gram_count     occurrences of the most frequent bigram
    dup_2gram_count     occurrences belonging to bigrams seen > once

Scale shape: one streaming ``map_batches``, no shuffle — every count
is per-document, so each batch is independent. The kernel is
Arrow-native: one tokenize, bigrams from two shifted slices of the
flattened token array (the decontam trick), and C++
``Table.group_by`` for the within-doc counting; the only Python loop
is over the handful of aggregate columns.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def repetition_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n_docs = len(text)
    toks = pc.split_pattern(text, " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    # distinct tokens per doc: group by (doc, token), then count rows per doc
    tok_tbl = pa.table({"d": pa.array(doc_idx), "t": flat})
    dist = tok_tbl.group_by(["d", "t"], use_threads=False).aggregate([])
    uniq_per_doc = (
        dist.group_by(["d"], use_threads=False)
        .aggregate([("t", "count")])
    )
    n_unique = np.zeros(n_docs, dtype=np.int64)
    n_unique[uniq_per_doc["d"].to_numpy()] = uniq_per_doc["t_count"].to_numpy()

    # bigrams: two shifted slices, windows straddling a doc masked out
    total = len(flat)
    n_2grams = np.maximum(counts - 1, 0)
    top_cnt = np.zeros(n_docs, dtype=np.int64)
    dup_cnt = np.zeros(n_docs, dtype=np.int64)
    if total >= 2:
        n_wins = total - 1
        grams = pc.binary_join_element_wise(
            flat.slice(0, n_wins), flat.slice(1, n_wins), " "
        )
        valid = doc_idx[:n_wins] == doc_idx[1:]
        ng_tbl = pa.table(
            {"d": pa.array(doc_idx[:n_wins]), "g": grams}
        ).filter(pa.array(valid))
        gc = ng_tbl.group_by(["d", "g"], use_threads=False).aggregate(
            [("g", "count")]
        )
        d = gc["d"].to_numpy()
        c = gc["g_count"].to_numpy().astype(np.int64)
        np.maximum.at(top_cnt, d, c)
        dup = np.where(c > 1, c, 0)
        np.add.at(dup_cnt, d, dup)

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, pa.int64()),
            "n_unique_tokens": pa.array(n_unique, pa.int64()),
            "n_2grams": pa.array(n_2grams, pa.int64()),
            "top_2gram_count": pa.array(top_cnt, pa.int64()),
            "dup_2gram_count": pa.array(dup_cnt, pa.int64()),
        }
    )


def repetition_stats(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Per-document repetition counts (see module doc for columns)."""
    return docs.map_batches(repetition_batch, batch_format="pyarrow")
