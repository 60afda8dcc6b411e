"""JSONL source/sink for document corpora.

JSON-Lines is the de-facto interchange format for LLM training corpora
(one JSON object per line; files are the parallelism unit, exactly like
the WARC source). This module round-trips the ``documents`` table shape
through it:

- :func:`write_documents_jsonl` — partitioned sink via
  ``Dataset.write_json`` (one file per block, so a 100 TB corpus writes
  as many independent shards as the pipeline has blocks; resumable at
  file granularity like the Parquet sinks).
- :func:`read_documents_jsonl` — ``ray.data.read_json`` with the column
  order and Arrow types pinned to ``DOCUMENTS_SCHEMA``. JSON is
  schema-less (readers infer int64/float/str per file and may disagree
  across shards); the explicit cast makes the round-trip exact and the
  schema stable regardless of shard boundaries.

Scale shape: both directions stream — the sink writes per block, the
reader parallelizes per file and the normalizing cast is one
``map_batches`` of ``Table.cast``. No driver materialization.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("source", pa.string()),
        ("n_chars", pa.int64()),
    ]
)


def write_documents_jsonl(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned JSONL sink (one ``.json`` file per block)."""
    ds.write_json(out_dir)


def read_documents_jsonl(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read a JSONL corpus directory back as the typed documents table.

    ``columns`` prunes AFTER the parse (JSONL has no column projection
    at the byte level — one reason Parquet is the engine's canonical
    storage and JSONL only an interchange format; the cast+select still
    happens block-wise, never on the driver)."""
    schema = DOCUMENTS_SCHEMA
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def normalize(batch: pa.Table) -> pa.Table:
        return batch.select(schema.names).cast(schema)

    return ray.data.read_json(path).map_batches(
        normalize, batch_format="pyarrow"
    )
