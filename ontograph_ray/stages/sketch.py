"""Distributed cardinality sketch: K-Minimum-Values (KMV).

Estimates the number of distinct values in a column with bounded
memory: every block contributes its k smallest 64-bit value hashes
(a vectorized partial — the combiner), the driver merges the tiny
per-block candidate sets and estimates

    D ≈ (k - 1) / r_k ,   r_k = k-th smallest hash / 2^64

(Bar-Yossef et al., "Counting distinct elements in a data stream",
RANDOM 2002). Deterministic: crc32 value hashing, no RNG. The
reference has no approximate aggregates (SURVEY §2.6); this is a
scale-path addition — exact distinct needs a full shuffle, the sketch
needs one small gather.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

import ray
import ray.data


def _hash_series(s: pd.Series) -> np.ndarray:
    """Uniform 64-bit value hashes. crc32 alone is NOT avalanche —
    structured/similar inputs (e.g. near-identical documents) cluster
    in hash space and bias the k-th-minimum estimator (measured 2×
    undercount on a 500-doc corpus of same-vocabulary texts) — so the
    crc is passed through a splitmix64 finalizer, which is uniform and
    stays deterministic across processes (no PYTHONHASHSEED issues)."""
    h = np.fromiter(
        (zlib.crc32(str(v).encode()) for v in s), dtype=np.uint64, count=len(s)
    )
    # splitmix64 finalizer
    h = (h + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h ^= h >> np.uint64(30)
    h = (h * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h ^= h >> np.uint64(27)
    h = (h * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    h ^= h >> np.uint64(31)
    return h


def kmv_partials(ds: ray.data.Dataset, col: str, k: int = 1024) -> ray.data.Dataset:
    """Per-block k smallest distinct value hashes (the combiner)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"h": pd.Series(dtype="uint64")})
        h = np.unique(_hash_series(df[col]))
        return pd.DataFrame({"h": h[:k]})

    return ds.map_batches(partial, batch_format="pandas")


def kmv_distinct_count(ds: ray.data.Dataset, col: str, k: int = 1024) -> int:
    """Merged KMV estimate of the number of distinct values of ``col``."""
    parts = kmv_partials(ds, col, k)
    merged = np.unique(
        np.concatenate(
            [np.array([r["h"] for r in parts.take_all()], dtype=np.uint64), np.array([], dtype=np.uint64)]
        )
    )
    if len(merged) < k:
        # fewer than k distinct hashes seen → the sketch is exact.
        # (STRICT: exactly k survivors is ambiguous — a single block
        # truncates at k even when more distinct values exist, so k
        # survivors must fall through to the estimator, which is
        # consistent in both cases.)
        return int(len(merged))
    kth = merged[k - 1]
    return int(round((k - 1) / (float(kth) / float(1 << 64))))
