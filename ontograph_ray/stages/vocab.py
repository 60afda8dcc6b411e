"""Global-vocabulary coverage scoring — the corpus-statistics pattern.

Quality signals that depend on CORPUS-level statistics (not just the
document itself): here, how much of each document is covered by the
corpus's top-K most frequent tokens. Low coverage flags
gibberish/encoding junk; near-1.0 coverage flags boilerplate. The same
three-stage shape serves any derive-from-the-corpus statistic
(IDF tables, stopword induction, unigram LM scoring).

Scale shape — the canonical "big aggregate, small result, broadcast
back" plan, no full-corpus materialization anywhere:

1. per-block PARTIAL token counts (map-side combiner — each block
   shrinks from tokens to its distinct tokens before the exchange);
2. global per-token sum via ONE bucketed exchange keyed on a
   small-int token-hash bucket (``bucketed_group_map`` — the counts
   table is vocab-sized, far smaller than the corpus), then a
   per-block top-K over the globally-summed table merged on the
   driver: O(K × blocks) rows cross the wire, never the vocabulary;
3. the K-token vocab broadcast via ``ray.put``; per-doc coverage is
   one streaming ``is_in`` + segment-sum pass over the corpus.

Ties at the top-K boundary break deterministically by
(count DESC, token ASC) — mirrored in the DuckDB oracle's ORDER BY.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_VOCAB_CACHE: dict = {}


def _partial_counts(batch: pa.Table) -> pa.Table:
    toks = pc.split_pattern(batch["text"], " ")
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    g = (
        pa.table({"token": flat})
        .group_by(["token"], use_threads=False)
        .aggregate([("token", "count")])
    )
    return pa.table({"token": g["token"], "c": pc.cast(g["token_count"], pa.int64())})


def _sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
    return df.groupby("token", sort=False)["c"].sum().reset_index()


def _block_topk(batch: pa.Table, k: int) -> pa.Table:
    df = batch.to_pandas()
    df = df.sort_values(["c", "token"], ascending=[False, True], kind="stable")
    return pa.Table.from_pandas(df.head(k), preserve_index=False)


def top_vocab(docs: ray.data.Dataset, k: int = 100) -> list[str]:
    """The corpus's top-``k`` tokens by global count (ties → token
    ascending), computed with one exchange (see module doc)."""
    from ..store.dataset import bucketed_group_map

    counts = bucketed_group_map(
        docs.map_batches(_partial_counts, batch_format="pyarrow"),
        ["token"],
        _sum_bucket,
    )
    cand = counts.map_batches(
        _block_topk, fn_kwargs={"k": k}, batch_format="pyarrow"
    ).take_all()
    df = pd.DataFrame(cand).sort_values(
        ["c", "token"], ascending=[False, True], kind="stable"
    )
    return df["token"].head(k).tolist()


def _coverage_batch(batch: pa.Table, vocab_ref=None) -> pa.Table:
    key = vocab_ref.hex() if hasattr(vocab_ref, "hex") else id(vocab_ref)
    vocab = _VOCAB_CACHE.get(key)
    if vocab is None:
        vocab = _VOCAB_CACHE[key] = (
            ray.get(vocab_ref) if hasattr(vocab_ref, "hex") else vocab_ref
        )
    toks = pc.split_pattern(batch["text"], " ")
    counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    member = pc.is_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    in_vocab = np.bincount(doc_idx[member], minlength=len(counts)).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(counts, pa.int64()),
            "n_in_vocab": pa.array(in_vocab, pa.int64()),
        }
    )


def vocab_coverage(docs: ray.data.Dataset, k: int = 100) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_in_vocab) — tokens of each doc that are in
    the corpus-global top-``k`` vocabulary."""
    vocab = pa.array(top_vocab(docs, k), pa.string())
    vocab_ref = ray.put(vocab)
    return docs.map_batches(
        _coverage_batch, fn_kwargs={"vocab_ref": vocab_ref}, batch_format="pyarrow"
    )
