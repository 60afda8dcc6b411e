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


def dup_ngram_stats(
    docs: ray.data.Dataset,
    n: int = 3,
    min_count: int = 2,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """CROSS-corpus duplicate n-gram statistics — the other half of the
    Gopher/MassiveText dup-ngram signal (Rae et al. 2021 §A1.1; also
    the RefinedWeb/C4 boilerplate diagnostic): for every document, how
    many of its token n-gram windows occur ``>= min_count`` times in
    the WHOLE corpus. Unlike :func:`repetition_stats` (per-doc, no
    shuffle) this is a global computation, returned as exact integers:

        doc_id, total_ngrams, dup_ngrams      (int64)

    ``total_ngrams`` = n-gram windows in the doc (len - n + 1);
    ``dup_ngrams``  = windows whose n-gram is corpus-duplicated.
    Documents with fewer than ``n`` tokens have no windows and emit no
    row (documented contract — there is nothing to score).

    Scale shape (two bucketed exchanges, nothing on the driver):

    1. explode+combine: vectorized n-gram build — ``n`` shifted Arrow
       slices of the flattened token array joined in ONE
       ``binary_join_element_wise`` call (windows straddling a doc
       masked by comparing the two endpoint doc indices; valid because
       the flattened index is doc-monotonic) — then a per-block C++
       ``group_by`` combiner to ``(doc_id, ngram, m)``: a within-doc
       repeated gram crosses the wire once per block, not per
       occurrence.
    2. ngram exchange: every occurrence of a gram lands in one bucket,
       so the duplicate decision (corpus count >= min_count) is made
       in-bucket and only per-doc PARTIALS (doc_id, m, dup_m) leave —
       the gram strings themselves never cross a second exchange.
    3. doc exchange: sum partials per doc_id. total_ngrams needs no
       separate pass: every window is some gram occurrence, so
       sum(m) per doc IS the window count.
    """
    from ..store.dataset import bucketed_group_map

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "ngram": pa.array([], pa.string()),
            "m": pa.array([], pa.int64()),
        }
    )

    def explode(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(pc.fill_null(text, ""), " ")
        counts = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        total = len(flat)
        n_wins = total - (n - 1)
        if n_wins <= 0:
            return empty
        doc_idx = np.repeat(np.arange(len(ids_np), dtype=np.int64), counts)
        slices = [flat.slice(s, n_wins) for s in range(n)]
        grams = pc.binary_join_element_wise(*slices, " ")
        valid = doc_idx[:n_wins] == doc_idx[n - 1 :]
        tbl = pa.table(
            {
                "doc_id": pa.array(np.repeat(ids_np, counts)[:n_wins]),
                "ngram": grams,
            }
        ).filter(pa.array(valid))
        gc = tbl.group_by(["doc_id", "ngram"], use_threads=False).aggregate(
            [("ngram", "count")]
        )
        return pa.table(
            {
                "doc_id": pc.cast(gc["doc_id"], pa.int64()),
                "ngram": gc["ngram"],
                "m": pc.cast(gc["ngram_count"], pa.int64()),
            }
        )

    grams = docs.map_batches(explode, batch_format="pyarrow")

    def decide(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "total_p": pd.Series(dtype="int64"),
                    "dup_p": pd.Series(dtype="int64"),
                }
            )
        corpus_c = df.groupby("ngram", sort=False)["m"].transform("sum")
        out = df[["doc_id"]].copy()
        out["total_p"] = df["m"]
        out["dup_p"] = np.where(corpus_c >= min_count, df["m"], 0)
        return (
            out.groupby("doc_id", sort=False)
            .sum()
            .reset_index()
            .astype({"total_p": "int64", "dup_p": "int64"})
        )

    partials = bucketed_group_map(
        grams, ["ngram"], decide, num_buckets=num_buckets
    )

    def finish(df):
        g = df.groupby("doc_id", sort=False)
        out = g.agg(
            total_ngrams=("total_p", "sum"), dup_ngrams=("dup_p", "sum")
        ).reset_index()
        return out.astype({"total_ngrams": "int64", "dup_ngrams": "int64"})

    return bucketed_group_map(
        partials, ["doc_id"], finish, num_buckets=num_buckets
    )


def remove_dup_spans(
    docs: ray.data.Dataset,
    n: int = 5,
    min_count: int = 2,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT duplicate-span removal — the token-window form of the
    "deduplicating training data" substring dedup (Lee et al. 2022,
    arXiv:2107.06499): every token position covered by ANY n-gram
    window that occurs >= ``min_count`` times in the whole corpus
    (occurrences, not documents — a within-doc repeat counts) is
    removed; the survivors are re-joined with single spaces. Returns

        doc_id, text (cleaned), removed (int64 tokens removed)

    one row per input document (unchanged docs pass through; a fully
    covered doc comes back with text = '').

    Scale shape (two bucketed exchanges, nothing driver-side):

    1. window explode (streaming map): the dup_ngram_stats Arrow
       kernel — n shifted slices of the flattened token array, one
       ``binary_join_element_wise``, doc-boundary windows masked —
       emitting ONE ROW PER WINDOW (ngram, doc_id, pos). Exactness
       costs this volume (no 64-bit hashing: at 10^13 windows birthday
       collisions would silently over-delete; Lee et al. pay the same
       bill with distributed suffix arrays).
    2. ngram-bucket exchange: the corpus count per gram is decided
       in-bucket; only the window STARTS of duplicated grams leave
       (doc_id, pos) — coverage expansion to n positions happens after
       the doc exchange, so the wire carries 1 row per dup window, not
       n.
    3. doc-bucket exchange co-grouping the original docs with their
       dup starts (the hash_join tagged-union shape): per bucket, one
       Arrow tokenize of the docs, a numpy scatter marks covered
       positions, and the survivors re-join per doc via a C groupby.
    """
    from ..store.dataset import bucketed_group_map

    empty = pa.table(
        {
            "ngram": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
        }
    )

    def explode(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        ids_np = ids.to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(pc.fill_null(text, ""), " ")
        counts = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        total = len(flat)
        n_wins = total - (n - 1)
        if n_wins <= 0:
            return empty
        doc_idx = np.repeat(np.arange(len(ids_np), dtype=np.int64), counts)
        slices = [flat.slice(s, n_wins) for s in range(n)]
        grams = pc.binary_join_element_wise(*slices, " ")
        valid = doc_idx[:n_wins] == doc_idx[n - 1 :]
        # 0-based position within the document
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos = np.arange(total, dtype=np.int64)[:n_wins] - np.repeat(
            offsets, counts
        )[:n_wins]
        return pa.table(
            {
                "ngram": grams,
                "doc_id": pa.array(np.repeat(ids_np, counts)[:n_wins]),
                "pos": pa.array(pos),
            }
        ).filter(pa.array(valid))

    windows = docs.map_batches(explode, batch_format="pyarrow")

    def dup_starts(df):
        import pandas as pd

        if not len(df):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "pos": pd.Series(dtype="int64"),
                }
            )
        c = df.groupby("ngram", sort=False)["ngram"].transform("size")
        out = df.loc[c >= min_count, ["doc_id", "pos"]]
        return out.astype({"doc_id": "int64", "pos": "int64"})

    starts = bucketed_group_map(
        windows, ["ngram"], dup_starts, num_buckets=num_buckets
    )

    # tagged union (the hash_join shape): doc rows carry pos = -1
    def tag_docs(batch: pa.Table) -> pa.Table:
        m = len(batch)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "text": pc.cast(batch["text"], pa.string()),
                "pos": pa.nulls(m, pa.int64()).fill_null(-1),
            }
        )

    def tag_starts(batch: pa.Table) -> pa.Table:
        m = len(batch)
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "text": pa.nulls(m, pa.string()),
                "pos": pc.cast(batch["pos"], pa.int64()),
            }
        )

    both = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        starts.map_batches(tag_starts, batch_format="pyarrow")
    )

    def rebuild(df):
        import pandas as pd

        is_doc = df["pos"].to_numpy() < 0
        dd = df[is_doc]
        ss = df[~is_doc]
        if not len(dd):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "text": pd.Series(dtype="object"),
                    "removed": pd.Series(dtype="int64"),
                }
            )
        text = pa.array(dd["text"].fillna("").to_numpy(), type=pa.string())
        toks = pc.split_pattern(text, " ")
        counts = (
            pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        )
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        total = len(flat)
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ids_np = dd["doc_id"].to_numpy()
        row_of = pd.Series(np.arange(len(ids_np)), index=ids_np)
        covered = np.zeros(total, dtype=bool)
        if len(ss):
            srow = row_of[ss["doc_id"].to_numpy()].to_numpy()
            g = offsets[srow] + ss["pos"].to_numpy()
            idx = (g[:, None] + np.arange(n)).ravel()
            covered[idx] = True
        doc_idx = np.repeat(np.arange(len(ids_np), dtype=np.int64), counts)
        kept = ~covered
        kept_tok = flat.to_pandas().to_numpy()[kept]
        kept_idx = doc_idx[kept]
        joined = (
            pd.Series(kept_tok)
            .groupby(kept_idx, sort=False)
            .agg(" ".join)
            .reindex(np.arange(len(ids_np)), fill_value="")
        )
        removed = counts - np.bincount(kept_idx, minlength=len(ids_np))
        return pd.DataFrame(
            {
                "doc_id": ids_np.astype("int64"),
                "text": joined.to_numpy(),
                "removed": removed.astype("int64"),
            }
        )

    return bucketed_group_map(both, ["doc_id"], rebuild, num_buckets=num_buckets)
