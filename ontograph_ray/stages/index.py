"""Sharded inverted-index construction — the retrieval-structure build.

Turns a document corpus into term → posting-list rows, the structure
behind corpus search, decontamination lookups and TF-IDF/BM25 scoring.
Unlike :mod:`vocab` (corpus statistics, small result), the index is
corpus-sized output, so the build must stream and the posting list of
a hyper-frequent term must not become one giant row/block:

1. per-block combiner: one vectorized ``split_pattern`` + Arrow
   ``group_by`` collapses each block to distinct ``(term, doc_id, tf)``
   triples (a document lives in exactly one row, so block-local
   per-(term, doc_id) counts are globally exact).
2. ONE bucketed exchange on the term key (``bucketed_group_map``) —
   every row of a term is co-located, so per-term document frequency
   and ordered posting ranks are exact in-bucket.
3. in-bucket SHARDING: postings are emitted in chunks of
   ``shard_size`` doc ids (``shard_no = rank // shard_size``), so a
   boilerplate term with 10⁹ documents becomes many bounded rows, not
   one block-busting list. ``max_df`` optionally drops terms more
   frequent than a cap (the classic stopword guard) INSIDE the bucket,
   before any posting string is built.

Postings and per-doc term frequencies are comma-joined strings (sorted
by doc id, aligned), which keeps the output hashable by the driver's
value gate and loadable by any engine without Arrow list support.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _term_doc_partial(batch: pa.Table) -> pa.Table:
    """Block combiner: (doc_id, text) → distinct (term, doc_id, tf)."""
    txt = pc.fill_null(batch["text"].combine_chunks(), "")
    toks = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    g = (
        pa.table(
            {
                "term": flat,
                "doc_id": pa.array(np.repeat(doc_ids, lens.astype(np.int64))),
            }
        )
        .group_by(["term", "doc_id"], use_threads=False)
        .aggregate([("term", "count")])
    )
    return pa.table(
        {
            "term": g["term"],
            "doc_id": pc.cast(g["doc_id"], pa.int64()),
            "tf": pc.cast(g["term_count"], pa.int64()),
        }
    )


def inverted_index(
    docs: ray.data.Dataset,
    shard_size: int = 8192,
    max_df: int | None = None,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """Build the sharded inverted index (module doc).

    Output rows: ``(term, shard_no, df, postings, tfs)`` — ``df`` is
    the term's GLOBAL document frequency (repeated on each shard row),
    ``postings``/``tfs`` are aligned comma-joined doc-id / term-count
    strings in ascending doc-id order, ≤ ``shard_size`` entries each.
    """
    from ..store.dataset import bucketed_group_map

    pairs = docs.map_batches(_term_doc_partial, batch_format="pyarrow")

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "term": pd.Series(dtype="object"),
                    "shard_no": pd.Series(dtype="int64"),
                    "df": pd.Series(dtype="int64"),
                    "postings": pd.Series(dtype="object"),
                    "tfs": pd.Series(dtype="object"),
                }
            )
        df = df.sort_values(["term", "doc_id"], kind="stable")
        grp = df.groupby("term", sort=False)
        df["df"] = grp["doc_id"].transform("size").astype("int64")
        if max_df is not None:
            df = df[df["df"] <= max_df]
            if not len(df):
                return per_bucket(df.iloc[0:0])
            grp = df.groupby("term", sort=False)
        df["shard_no"] = (grp.cumcount() // shard_size).astype("int64")
        df["doc_str"] = df["doc_id"].astype(str)
        df["tf_str"] = df["tf"].astype(str)
        out = (
            df.groupby(["term", "shard_no", "df"], sort=False)
            .agg(postings=("doc_str", ",".join), tfs=("tf_str", ",".join))
            .reset_index()
        )
        return out[["term", "shard_no", "df", "postings", "tfs"]]

    return bucketed_group_map(
        pairs, ["term"], per_bucket, num_buckets=num_buckets
    )
