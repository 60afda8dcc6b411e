"""CSV source/sink for document corpora.

CSV is the lowest-common-denominator interchange format (spreadsheet
exports, legacy crawls, database dumps). Like the JSONL source, this
module round-trips the ``documents`` table shape through it:

- :func:`write_documents_csv` — partitioned sink via
  ``Dataset.write_csv`` (one file per block; a 100 TB corpus writes as
  many independent shards as the pipeline has blocks, resumable at file
  granularity like the Parquet/JSONL sinks). pyarrow's CSV writer
  quotes embedded commas, quotes and newlines, so arbitrary document
  text survives.
- :func:`read_documents_csv` — ``ray.data.read_csv`` with column types
  pinned to the documents schema via ``ConvertOptions`` (CSV is
  untyped; per-file inference may disagree across shards — e.g. a
  shard whose ``lang`` values are all "no"/"nb" parses as bool) and
  ``newlines_in_values=True`` so quoted multi-line text parses instead
  of tearing rows.

Scale shape: both directions stream — the sink writes per block, the
reader parallelizes per file and the pin is applied by the parser
itself (no extra pass). CSV cannot project columns at the byte level
(another reason Parquet stays the engine's canonical storage); the
optional ``columns`` prune is a block-wise select after the parse.
"""

from __future__ import annotations

from pyarrow import csv as pacsv

import ray.data

from .jsonl import DOCUMENTS_SCHEMA


def write_documents_csv(ds: ray.data.Dataset, out_dir: str) -> None:
    """Partitioned CSV sink (one ``.csv`` file per block)."""
    ds.write_csv(out_dir)


def read_documents_csv(
    path: str, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read a CSV corpus directory back as the typed documents table."""
    ds = ray.data.read_csv(
        path,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in DOCUMENTS_SCHEMA}
        ),
    )
    names = list(DOCUMENTS_SCHEMA.names if columns is None else columns)
    return ds.map_batches(
        lambda batch: batch.select(names), batch_format="pyarrow"
    )
