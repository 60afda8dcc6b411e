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
