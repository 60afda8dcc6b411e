"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

All are Dataset plans built from map_batches + bucketed groupbys, with
the same scale shape as the triple dedup (G17): per-block combiners
before every shuffle, hash buckets so reduce UDF calls are O(buckets),
candidate verification before any pair is accepted, and union-find
(pipelines.canonicalize) for clustering.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..pipelines.canonicalize import connected_components

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset,
    key: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Keep one row per distinct ``key`` — the row with the smallest
    ``id_col`` (deterministic winner). Hash-partition on key bucket,
    per-block combiner first."""

    def local_first(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="stable").drop_duplicates(subset=[key])
        df = df.copy()
        df["__bucket"] = (
            pd.util.hash_pandas_object(df[key], index=False) % num_buckets
        ).astype("int64")
        return df

    def bucket_first(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(id_col, kind="stable").drop_duplicates(subset=[key])
        return out.drop(columns=["__bucket"])

    return (
        ds.map_batches(local_first, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(bucket_first, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def _shingles(text: str, k: int) -> set[int]:
    """Character k-gram shingle set, hashed to stable 32-bit ints
    (crc32 — deterministic across processes, unlike built-in hash)."""
    if len(text) < k:
        return {zlib.crc32(text.encode())} if text else set()
    data = text.encode()
    return {zlib.crc32(data[i : i + k]) for i in range(len(data) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))


class MinHasher:
    """Actor stage: per-doc MinHash signature (num_perm permutations of
    32-bit shingle hashes via the (a*x+b) mod p universal family).
    Permutation coefficients generated once per actor from a fixed
    seed."""

    P = (1 << 61) - 1

    def __init__(self, k: int = 5, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.k = k
        self.num_perm = num_perm
        # a,b < 2^31 so a*x + b with 32-bit shingle hashes stays inside
        # uint64 (< 2^63 + 2^31) — overflow-free native vector math, no
        # Python-object bignums in the hot loop.
        self.a = rng.randint(1, 1 << 31, size=num_perm).astype(np.uint64)
        self.b = rng.randint(0, 1 << 31, size=num_perm).astype(np.uint64)

    def signature(self, text: str) -> np.ndarray:
        sh = np.fromiter(_shingles(text, self.k), dtype=np.int64).astype(np.uint64)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (a * x + b) mod p, min over shingles — vectorized outer product
        vals = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(self.P)
        return np.min(vals, axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in df["text"]]
        out = df[["doc_id"]].copy()
        out["sig"] = [s.tolist() for s in sigs]
        return out


# Per-worker cache of MinHasher instances keyed by parameters — task
# pools get actor-like "state built once per worker" without paying
# the several seconds of Ray Data actor-pool startup/queueing (the
# permutation coefficients are tiny and seeded, so every worker builds
# the identical state).
_MINHASHER_CACHE: dict = {}


def _minhash_batch(df: pd.DataFrame, k=5, num_perm=64) -> pd.DataFrame:
    key = (k, num_perm)
    h = _MINHASHER_CACHE.get(key)
    if h is None:
        h = _MINHASHER_CACHE[key] = MinHasher(k=k, num_perm=num_perm)
    return h(df)


def minhash_signatures(
    ds: ray.data.Dataset, k: int = 5, num_perm: int = 64, concurrency=None
) -> ray.data.Dataset:
    """Per-doc MinHash signatures. Task pool with per-worker cached
    state (see _MINHASHER_CACHE); pass ``concurrency`` to force the
    actor-pool form instead — the right shape only when per-actor
    state is heavy. Explicit repartition between the I/O-bound read
    (few fat blocks) and this CPU-bound stage so every slot has
    work — the doctrine's read→compute exchange."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    ds = ds.repartition(cpus * 2)
    if concurrency is not None:
        return ds.map_batches(
            MinHasher,
            fn_constructor_kwargs={"k": k, "num_perm": num_perm},
            batch_format="pandas",
            batch_size=1024,
            concurrency=concurrency,
        )
    return ds.map_batches(
        _minhash_batch,
        fn_kwargs={"k": k, "num_perm": num_perm},
        batch_format="pandas",
        batch_size=1024,
    )


def lsh_candidate_pairs(
    sigs: ray.data.Dataset,
    bands: int = 16,
    num_buckets: int = 64,
    mode: str = "star",
    clique_cap: int = 2048,
) -> ray.data.Dataset:
    """Signatures → (band_id, band_hash) buckets → candidate doc pairs.

    ``mode="star"`` (default): k-1 anchor→member edges per bucket —
    sufficient connectivity when candidates feed a union-find
    clustering (minhash_dedup), and immune to the quadratic blowup on
    template-heavy corpora. ``mode="clique"``: all k²/2 in-bucket
    pairs — required when the *pair list itself* is the result
    (ngram_jaccard_pairs). Even in clique mode, an LSH bucket larger
    than ``clique_cap`` docs degrades to star edges: a 10⁵-doc
    template bucket would otherwise emit 5×10⁹ pairs in ONE reduce
    task. At that bucket size the docs are near-identical boilerplate
    and anchor edges preserve the dedup-relevant connectivity; the
    cap bounds the worst single-bucket output at
    clique_cap²/2 pairs."""

    def to_bands(df: pd.DataFrame) -> pd.DataFrame:
        rows_doc, rows_band, rows_hash = [], [], []
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            r = len(sig) // bands
            for b in range(bands):
                chunk = sig[b * r : (b + 1) * r]
                rows_doc.append(doc_id)
                rows_band.append(b)
                rows_hash.append(zlib.crc32(chunk.tobytes()))
        out = pd.DataFrame(
            {"doc_id": rows_doc, "band_id": rows_band, "band_hash": rows_hash}
        )
        out["__bucket"] = (
            pd.util.hash_pandas_object(
                out["band_id"].astype(str) + ":" + out["band_hash"].astype(str),
                index=False,
            )
            % num_buckets
        ).astype("int64")
        return out

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # STAR edges (bucket-min anchor → member), not the full
        # clique: candidates feed a union-find clustering downstream,
        # for which k-1 anchor edges give the same connectivity as
        # k²/2 pairs — on template-heavy corpora (huge LSH buckets)
        # this is the difference between 10^5 and 10^7 verifications.
        srcs, dsts = [], []
        for _, g in df.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g["doc_id"].unique())
            if mode == "clique" and len(ids) <= clique_cap:
                for i in range(len(ids) - 1):
                    for j in range(i + 1, len(ids)):
                        srcs.append(ids[i])
                        dsts.append(ids[j])
            else:
                anchor = ids[0]
                for other in ids[1:]:
                    srcs.append(anchor)
                    dsts.append(other)
        out = pd.DataFrame({"src_id": srcs, "dst_id": dsts}).drop_duplicates()
        return out

    banded = sigs.map_batches(to_bands, batch_format="pandas")
    return banded.groupby("__bucket").map_groups(pairs_in_bucket, batch_format="pandas")


class _JaccardVerifier:
    """Actor stage: verify candidate pairs with exact n-gram Jaccard.
    Holds the (broadcast) doc_id→text map — candidate verification is a
    small-side lookup, not a shuffle. Partitioning assumption: the text
    corpus of candidate docs fits the object store / worker heap; at
    larger scale replace with a bucketed join on doc_id."""

    def __init__(self, texts_ref, k: int, threshold: float):
        self.texts = ray.get(texts_ref)
        self.k = k
        self.threshold = threshold
        self.cache: dict = {}

    def _sh(self, doc_id):
        s = self.cache.get(doc_id)
        if s is None:
            s = _shingles(self.texts.get(doc_id, ""), self.k)
            self.cache[doc_id] = s
        return s

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sims = [
            jaccard(self._sh(s), self._sh(d))
            for s, d in zip(df["src_id"], df["dst_id"])
        ]
        df = df.copy()
        df["jaccard"] = sims
        return df[df["jaccard"] >= self.threshold]


# per-worker cache of verifier instances (holds the broadcast text map
# and its shingle cache) — task pool gets actor-like state reuse
# without pool startup.
_VERIFIER_CACHE: dict = {}


def _verify_batch(df: pd.DataFrame, texts_ref=None, k=5, threshold=0.8) -> pd.DataFrame:
    key = (texts_ref.hex() if hasattr(texts_ref, "hex") else id(texts_ref), k, threshold)
    v = _VERIFIER_CACHE.get(key)
    if v is None:
        v = _VERIFIER_CACHE[key] = _JaccardVerifier(texts_ref, k, threshold)
    return v(df)


def minhash_dedup(
    ds: ray.data.Dataset,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
    num_buckets: int = 64,
    concurrency=None,
) -> ray.data.Dataset:
    """Full MinHash-LSH near-dup removal: shingle → minhash → banded
    LSH → candidate pairs → exact-Jaccard verify → union-find clusters
    → keep the min doc_id per cluster. Returns the surviving rows.

    The input is consumed three times (signatures, the verify-side
    text broadcast, the final survivor filter); pin it once so a lazy
    upstream chain (e.g. a filter + dedup shuffle feeding this stage)
    is not recomputed per consumer."""
    ds = ds.materialize()
    sigs = minhash_signatures(ds, k, num_perm, concurrency)
    from ..store.dataset import distinct_on

    # the same (anchor, member) pair fires in several bands — one
    # bucketed distinct so each pair is verified exactly once
    cands = distinct_on(
        lsh_candidate_pairs(sigs, bands, num_buckets), ["src_id", "dst_id"], 16
    )

    texts = {r["doc_id"]: r["text"] for r in ds.select_columns(["doc_id", "text"]).take_all()}
    texts_ref = ray.put(texts)
    verified = cands.map_batches(
        _verify_batch,
        fn_kwargs={"texts_ref": texts_ref, "k": k, "threshold": threshold},
        batch_format="pandas",
    )

    def as_str_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"src": df["src_id"].astype(str), "dst": df["dst_id"].astype(str)}
        )

    # one execution for the emptiness check AND the component pass
    edges = verified.map_batches(as_str_edges, batch_format="pandas").materialize()
    if edges.count() == 0:
        return ds
    comps = connected_components(edges, num_buckets=num_buckets)
    # losers: nodes whose component representative is a different doc.
    # Components are keyed by *string* doc ids; min-string == min-int is
    # not guaranteed, but any deterministic representative is valid.
    losers = frozenset(
        int(r["node"]) for r in comps.take_all() if r["node"] != r["component"]
    )

    def drop_losers(df: pd.DataFrame) -> pd.DataFrame:
        # task map with the (small) loser set captured in the closure —
        # no actor-pool startup for a membership filter.
        return df[~df["doc_id"].isin(losers)]

    return ds.map_batches(drop_losers, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """Actor stage: 64-bit SimHash over whitespace tokens (crc32 token
    hashes, bit-vote aggregation — vectorized with numpy bit tricks)."""

    def __init__(self):
        self.bit_weights = 1 << np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = text.split(" ")
        if not toks:
            return 0
        hashes = np.array(
            [zlib.crc32(t.encode()) | (zlib.crc32(t[::-1].encode()) << 32) for t in toks],
            dtype=np.uint64,
        )
        bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        votes = bits.sum(axis=0) * 2 - len(toks)
        return int(((votes > 0).astype(np.uint64) * self.bit_weights).sum())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["simhash"] = [np.uint64(self.simhash(t)) for t in df["text"]]
        return out


def simhash_signatures(ds: ray.data.Dataset, concurrency=(1, 8)) -> ray.data.Dataset:
    return ds.map_batches(
        SimHasher, batch_format="pandas", batch_size=1024, concurrency=concurrency
    )


def simhash_near_dup_pairs(
    ds: ray.data.Dataset, max_hamming: int = 3, num_buckets: int = 64
) -> ray.data.Dataset:
    """Near-dup candidates by SimHash banding: split the 64-bit hash in
    4 16-bit chunks; by pigeonhole, pairs within hamming≤3 share at
    least one chunk → groupby chunk value, verify hamming in-bucket."""
    sigs = simhash_signatures(ds)

    def to_chunks(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, sh in zip(df["doc_id"], df["simhash"]):
            v = int(sh)
            for c in range(4):
                rows.append(
                    {
                        "doc_id": doc_id,
                        "simhash": np.uint64(v),
                        "chunk_id": c,
                        "chunk_val": (v >> (16 * c)) & 0xFFFF,
                    }
                )
        out = pd.DataFrame(rows)
        out["__bucket"] = (
            pd.util.hash_pandas_object(
                out["chunk_id"].astype(str) + ":" + out["chunk_val"].astype(str),
                index=False,
            )
            % num_buckets
        ).astype("int64")
        return out

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        srcs, dsts, dists = [], [], []
        for _, g in df.groupby(["chunk_id", "chunk_val"], sort=False):
            items = sorted(set(zip(g["doc_id"], g["simhash"].astype(np.uint64))))
            for i in range(len(items) - 1):
                for j in range(i + 1, len(items)):
                    (a, ha), (b, hb) = items[i], items[j]
                    d = bin(int(ha) ^ int(hb)).count("1")
                    if d <= max_hamming:
                        srcs.append(a)
                        dsts.append(b)
                        dists.append(d)
        return pd.DataFrame(
            {"src_id": srcs, "dst_id": dsts, "hamming": dists}
        ).drop_duplicates(subset=["src_id", "dst_id"])

    chunked = sigs.map_batches(to_chunks, batch_format="pandas")
    out = chunked.groupby("__bucket").map_groups(pairs, batch_format="pandas")

    # cross-bucket duplicates possible (pair sharing 2 chunks) → global
    # distinct on the pair key
    def rebucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = (
            pd.util.hash_pandas_object(
                df["src_id"].astype(str) + ":" + df["dst_id"].astype(str), index=False
            )
            % num_buckets
        ).astype("int64")
        return df

    return (
        out.map_batches(rebucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(
            lambda df: df.drop_duplicates(subset=["src_id", "dst_id"]).drop(
                columns=["__bucket"]
            ),
            batch_format="pandas",
        )
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct) and embedding near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    ds: ray.data.Dataset, k: int = 5, threshold: float = 0.8, concurrency=None
) -> ray.data.Dataset:
    """All-pairs n-gram Jaccard via MinHash-LSH candidates + exact
    verification (the scalable form of the quadratic baseline).
    Verification is a task pool with the per-worker cached broadcast
    text map (_verify_batch) — same shape as minhash_dedup."""
    sigs = minhash_signatures(ds, k=k, concurrency=concurrency)
    cands = lsh_candidate_pairs(sigs, mode="clique")
    texts = {r["doc_id"]: r["text"] for r in ds.select_columns(["doc_id", "text"]).take_all()}
    texts_ref = ray.put(texts)
    return cands.map_batches(
        _verify_batch,
        fn_kwargs={"texts_ref": texts_ref, "k": k, "threshold": threshold},
        batch_format="pandas",
    )


def embedding_near_dup_pairs(
    emb_ds: ray.data.Dataset,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: every pair with cosine ≥ threshold.
    Uses the brute-force blocked matmul from stages.ann against the
    corpus itself, keeping only upper-triangle pairs."""
    from .ann import self_similarity_pairs

    return self_similarity_pairs(emb_ds, threshold, id_col=id_col, vec_col=vec_col)
