"""Bounded per-worker caches for dereferenced broadcast objects.

Stages that broadcast a small side (ray.put once, read inside every
map_batches task) cache the dereferenced value per worker process so a
worker running many batches pays ray.get once. The caches are keyed by
ObjectRef hex, so every NEW broadcast (each query run re-puts its side)
adds an entry — uncapped, a long-lived worker running many queries
accumulates dead entries forever. ``cached_get`` bounds every such
cache the same way: clear-when-full (entries are tiny in count, so a
full clear beats LRU bookkeeping; the one live ref re-populates on the
next batch).
"""

from __future__ import annotations

import ray

# Per-cache entry bound. Small on purpose: at any moment only the
# broadcast refs of the currently-running stages are live, and a miss
# after a clear costs one ray.get of an object that is still pinned in
# the local object store.
CACHE_MAX = 8


def cached_get(cache: dict, ref, transform=None):
    """Return the dereferenced (and optionally transformed) value of a
    broadcast ``ref``, memoized in ``cache`` with the clear-when-full
    bound. ``ref`` may also be a plain value (local/test path) — it is
    then cached by ``id()`` without a ray.get."""
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    val = cache.get(key)
    if val is None:
        raw = ray.get(ref) if hasattr(ref, "hex") else ref
        if transform is not None:
            raw = transform(raw)
        if len(cache) >= CACHE_MAX:
            cache.clear()
        val = cache[key] = raw
    return val
