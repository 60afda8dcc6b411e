"""PII scrubbing for web-text corpora: deterministic regex redaction
of emails, phone numbers and IPv4 addresses (the standard pre-training
hygiene pass).

One streaming ``map_batches``; the kernel is a fixed chain of RE2
kernels (``count_substring_regex`` + ``replace_substring_regex``) —
no Python per row, no shuffle, trivially linear at any scale. Patterns
are applied in declaration order (emails before phones before IPs) and
that order is part of the contract: the DuckDB oracle applies the same
chain with ``regexp_replace(..., 'g')`` (RE2 on both sides, so the
redacted text is byte-identical).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# (name, RE2 pattern, replacement) — ORDER MATTERS (see module doc).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?\d{3}[- .]\d{3,4}[- .]\d{4}", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_batch(batch: pa.Table) -> pa.Table:
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    total = np.zeros(len(text), dtype=np.int64)
    for _, pattern, repl in PII_PATTERNS:
        total += pc.count_substring_regex(text, pattern).to_numpy(
            zero_copy_only=False
        )
        text = pc.replace_substring_regex(text, pattern, repl)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "clean_text": text,
            "n_redactions": pa.array(total, pa.int64()),
        }
    )


def scrub_pii(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, clean_text, n_redactions) with all PII_PATTERNS
    redacted from ``text``."""
    return docs.map_batches(scrub_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# URL canonicalization (CCNet / Common-Crawl-style URL dedup key)
# ---------------------------------------------------------------------------

# query params dropped outright (tracking identifiers)
URL_DROP_PARAMS = frozenset({"gclid", "fbclid", "ref"})


def canonicalize_urls(
    ds: ray.data.Dataset, url_col: str = "url", out_col: str = "url_canon"
) -> ray.data.Dataset:
    """Canonical URL form for web-corpus dedup — the standard rules:

    - strip the fragment (``#...``)
    - lowercase the scheme and host
    - strip the scheme's default port (``:80`` http, ``:443`` https)
    - strip a trailing slash from a non-root path
    - drop tracking query params (``utm_*`` prefixes and
      ``URL_DROP_PARAMS`` keys), sort the survivors lexicographically
      (binary collation, matching DuckDB ``list_sort``)

    One streaming ``map_batches``: regex component extraction is
    vectorized; the query-param filter/sort works on the exploded
    param series (bounded by params-per-URL). URLs without a
    ``scheme://host`` shape degrade to empty components — pin the
    shape upstream. Appends ``out_col``; all other columns pass
    through."""
    import pandas as pd

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        u = df[url_col].astype(str).str.replace(r"#.*$", "", regex=True)
        idx = df.index
        scheme = (
            u.str.extract(r"^([A-Za-z]+)://", expand=False).fillna("").str.lower()
        )
        hostport = (
            u.str.extract(r"^[A-Za-z]+://([^/?]+)", expand=False)
            .fillna("")
            .str.lower()
        )
        host = hostport.where(
            ~((scheme == "http") & hostport.str.endswith(":80")),
            hostport.str[:-3],
        )
        host = host.where(
            ~((scheme == "https") & hostport.str.endswith(":443")),
            hostport.str[:-4],
        )
        path = (
            u.str.extract(r"^[A-Za-z]+://[^/?]*(/[^?]*)", expand=False).fillna("")
        )
        path = path.where(
            ~((path.str.len() > 1) & path.str.endswith("/")), path.str[:-1]
        )
        query = u.str.extract(r"\?([^#]*)", expand=False).fillna("")
        parts = query.str.split("&").explode()
        key = parts.str.split("=").str[0]
        keep = (
            parts.notna()
            & parts.ne("")
            & ~parts.str.startswith("utm_")
            & ~key.isin(URL_DROP_PARAMS)
        )
        q2 = (
            parts[keep]
            .groupby(level=0)
            .agg(lambda s: "&".join(sorted(s)))
            .reindex(idx)
            .fillna("")
        )
        out = df.copy()
        out[out_col] = (
            scheme
            + "://"
            + host
            + path
            + q2.where(q2.eq(""), "?" + q2)
        )
        return out

    return ds.map_batches(canon, batch_format="pandas", batch_size=4096)


def url_dedup(
    ds: ray.data.Dataset,
    url_col: str = "url",
    id_col: str = "doc_id",
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Canonical-URL dedup: canonicalize, then keep the minimum
    ``id_col`` per canonical URL with the duplicate count — one
    bucketed exchange keyed on the canonical form (the CCNet URL-level
    dedup pass that runs before any content dedup)."""
    import pandas as pd

    from ..store.dataset import bucketed_group_map

    canon = canonicalize_urls(ds, url_col=url_col)

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url_canon", sort=False)[id_col]
        out = g.agg(keep_doc="min", n_dups="size").reset_index()
        return out.astype({"keep_doc": "int64", "n_dups": "int64"})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(columns=["url_canon", id_col])
        return df[["url_canon", id_col]]

    return bucketed_group_map(
        canon, ["url_canon"], per_key, num_buckets=num_buckets, partial_fn=partial
    )
