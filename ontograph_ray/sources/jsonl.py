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


def write_documents_jsonl_gz(ds: ray.data.Dataset, out_dir: str) -> None:
    """GZIP-compressed partitioned JSONL sink — the format most public
    web corpora actually ship as (one ``part-<sha1>.jsonl.gz`` per
    block, named by content hash like the WARC sink, so a re-run
    overwrites its own shards idempotently and a failed run resumes at
    file granularity). Compression is stdlib ``gzip`` per block —
    independent members, no cross-file state."""
    import gzip
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        if rows:
            body = "\n".join(
                json.dumps(r, ensure_ascii=False, sort_keys=True) for r in rows
            ) + "\n"
            data = body.encode("utf-8")
            fname = (
                f"part-{hashlib.sha1(data).hexdigest()[:16]}.jsonl.gz"
            )
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(gzip.compress(data))
        return pa.table({"files": pa.array([1], pa.int64())})

    # consume the sink stage (count() just drives the writes)
    ds.map_batches(write_block, batch_format="pyarrow").count()


def read_documents_jsonl_gz(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read a gzip'd JSONL corpus directory back as the typed documents
    table. Files are the parallel unit (``read_binary_files`` → one
    gunzip + one ``pyarrow.json`` parse per file inside
    ``map_batches``) — the same shape as the WARC reader, no driver
    materialization, and concatenated gzip members are handled."""
    import gzip

    import pyarrow.json as pj

    schema = DOCUMENTS_SCHEMA
    if columns is not None:
        schema = pa.schema([schema.field(c) for c in columns])

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch["bytes"].to_pylist():
            # Ray's binary reader auto-decompresses on the .gz
            # extension (pyarrow "detect" mode); gunzip here only if
            # the gzip magic is still present (e.g. extensionless
            # shards or double-wrapped members)
            data = (
                gzip.decompress(buf) if buf[:2] == b"\x1f\x8b" else bytes(buf)
            )
            t = pj.read_json(pa.BufferReader(data))
            tables.append(t.select(schema.names).cast(schema))
        if not tables:
            return schema.empty_table()
        return pa.concat_tables(tables)

    return ray.data.read_binary_files(path).map_batches(
        parse, batch_format="pyarrow", batch_size=4
    )
