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


def tfidf_topk(
    docs: ray.data.Dataset,
    query_terms: list[str],
    k: int = 20,
    scale: int = 1_000_000,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """Integer-scaled TF-IDF retrieval: rank documents for a small set
    of query terms. Same fixed-point discipline as the engine's integer
    PageRank — ``weight(t) = (N · scale) // df(t)`` (inverse document
    frequency, integer division), ``score(doc) = Σ tf(doc, t) ·
    weight(t)`` — so the result is bit-deterministic at any
    partitioning and has an exact SQL twin (no ``ln`` whose libm
    rounding could differ between engines).

    Scale shape: the query terms are a broadcast-small set, so the
    corpus is never exchanged — one vectorized ``is_in`` filter per
    block keeps only query-term tokens (the per-block combiner), one
    tiny bucketed aggregate computes each term's global df, and the
    per-document score sum + global top-k run on the filtered rows
    only (bounded by query selectivity, not corpus size). Ties break
    (score DESC, doc_id ASC); exactly ``k`` rows or fewer are
    returned. The top-k merge happens on the driver over per-block
    partial top-ks — O(k × blocks) rows, never the corpus.
    """
    n_docs = docs.count()
    terms = pa.array(sorted(set(query_terms)), pa.string())

    def filter_pairs(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch["text"].combine_chunks(), "")
        toks = pc.split_pattern(txt, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        tab = pa.table(
            {
                "term": flat,
                "doc_id": pa.array(np.repeat(doc_ids, lens.astype(np.int64))),
            }
        ).filter(pc.is_in(flat, value_set=terms))
        g = tab.group_by(["term", "doc_id"], use_threads=False).aggregate(
            [("term", "count")]
        )
        return pa.table(
            {
                "term": g["term"],
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "tf": pc.cast(g["term_count"], pa.int64()),
            }
        )

    pairs = docs.map_batches(filter_pairs, batch_format="pyarrow").materialize()

    # global df per query term (tiny: ≤ |terms| rows after the agg)
    from ..store.dataset import bucketed_group_map

    df_rows = bucketed_group_map(
        pairs.select_columns(["term", "doc_id"]),
        ["term"],
        lambda d: d.groupby("term", sort=False)["doc_id"]
        .size()
        .rename("df")
        .reset_index(),
        num_buckets=min(num_buckets, 8),
    ).take_all()
    weights = {
        r["term"]: (n_docs * scale) // int(r["df"]) for r in df_rows
    }

    def score_block(d: pd.DataFrame) -> pd.DataFrame:
        d = d.copy()
        d["score"] = (
            d["tf"] * d["term"].map(weights).astype("int64")
        ).astype("int64")
        out = d.groupby("doc_id", sort=False)["score"].sum().reset_index()
        # per-block partial top-k (a doc's rows are co-located here)
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    partials = bucketed_group_map(
        pairs, ["doc_id"], score_block, num_buckets=num_buckets
    ).take_all()
    merged = (
        pd.DataFrame(partials, columns=["doc_id", "score"])
        .sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    merged["doc_id"] = merged["doc_id"].astype("int64")
    merged["score"] = merged["score"].astype("int64")
    return merged


def bm25_topk(
    docs: ray.data.Dataset,
    query_terms: list[str],
    k: int = 20,
    k1: "tuple[int, int]" = (6, 5),   # 1.2
    b: "tuple[int, int]" = (3, 4),    # 0.75
    scale: int = 1_000_000,
    num_buckets: int = 32,
) -> pd.DataFrame:
    """BM25-shaped retrieval with EXACT integer arithmetic: per term,

        score = idf_fp · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))

    with k1, b as exact rationals and dl/avgdl kept rational
    (dl·N / total_tokens) — the whole quotient is evaluated as ONE
    arbitrary-precision integer division after clearing denominators,
    so the ranking is bit-deterministic and carries an exact HUGEINT
    SQL twin. idf_fp = (N·scale) // df, the engine's linear
    fixed-point idf (a log idf would hostage the oracle to libm
    rounding — same substitution tfidf_topk documents); BM25's actual
    contributions here are the tf SATURATION and LENGTH normalization,
    which survive exactly.

    Scale shape: identical to tfidf_topk (query terms broadcast-small,
    one is_in combiner per block, tiny df aggregate) plus dl riding on
    each (term, doc, tf) row and two corpus scalars (N, total tokens).
    Python-int scoring touches only the query-selectivity-bounded
    rows."""
    a, c = k1
    p, q = b
    n_docs = docs.count()
    terms = pa.array(sorted(set(query_terms)), pa.string())

    def filter_pairs(batch: pa.Table) -> pa.Table:
        txt = pc.fill_null(batch["text"].combine_chunks(), "")
        toks = pc.split_pattern(txt, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].combine_chunks().to_numpy(
            zero_copy_only=False
        )
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        dls = np.repeat(lens.astype(np.int64), lens.astype(np.int64))
        tab = pa.table(
            {
                "term": flat,
                "doc_id": pa.array(np.repeat(doc_ids, lens.astype(np.int64))),
                "dl": pa.array(dls, pa.int64()),
            }
        ).filter(pc.is_in(flat, value_set=terms))
        g = tab.group_by(["term", "doc_id", "dl"], use_threads=False).aggregate(
            [("term", "count")]
        )
        return pa.table(
            {
                "term": g["term"],
                "doc_id": pc.cast(g["doc_id"], pa.int64()),
                "dl": g["dl"],
                "tf": pc.cast(g["term_count"], pa.int64()),
            }
        )

    def count_tokens(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.fill_null(batch["text"].combine_chunks(), ""), " ")
        s = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
        return pa.table({"t": pa.array([s], pa.int64())})

    total_tokens = sum(
        r["t"] for r in docs.map_batches(count_tokens, batch_format="pyarrow").take_all()
    )

    pairs = docs.map_batches(filter_pairs, batch_format="pyarrow").materialize()

    from ..store.dataset import bucketed_group_map

    df_rows = bucketed_group_map(
        pairs.select_columns(["term", "doc_id"]),
        ["term"],
        lambda d: d.groupby("term", sort=False)["doc_id"]
        .size()
        .rename("df")
        .reset_index(),
        num_buckets=min(num_buckets, 8),
    ).take_all()
    idf = {r["term"]: (n_docs * scale) // int(r["df"]) for r in df_rows}

    def term_scores(d: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_id": pd.Series(dtype="int64"),
             "score": pd.Series(dtype="int64")}
        )
        if not len(d):
            return empty
        scores = [
            (idf[t] * int(tf) * (a + c) * q * total_tokens)
            // (
                c * q * total_tokens * int(tf)
                + a * (q - p) * total_tokens
                + a * p * int(dl) * n_docs
            )
            for t, dl, tf in zip(d["term"], d["dl"], d["tf"])
        ]
        return pd.DataFrame(
            {"doc_id": d["doc_id"].astype("int64"),
             "score": pd.Series(scores, index=d.index, dtype="int64")}
        )

    def per_doc_topk(d: pd.DataFrame) -> pd.DataFrame:
        # a doc's term rows are co-located by the exchange (re-split
        # blocks upstream can straddle a doc) — sum, then partial top-k
        if not len(d):
            return d
        out = d.groupby("doc_id", sort=False, as_index=False)["score"].sum()
        out["score"] = out["score"].astype("int64")
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="stable"
        ).head(k)

    parts = bucketed_group_map(
        pairs.map_batches(term_scores, batch_format="pandas"),
        ["doc_id"],
        per_doc_topk,
        num_buckets=min(num_buckets, 8),
    ).to_pandas()
    parts = parts.sort_values(
        ["score", "doc_id"], ascending=[False, True], kind="stable"
    )
    return parts.head(k).reset_index(drop=True)
