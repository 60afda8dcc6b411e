"""Common-Crawl-style page table: deterministic synthesis + extraction.

Input shape per the engine's north rule: a Parquet table
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. The sandbox has no crawl data, so pages are
synthesized *deterministically* from the driver's ``documents`` table
(`doc_id`, `text`, `lang`): url and timestamp derive from doc_id, and
``html`` wraps the text in deterministic boilerplate with proper
entity escaping.

The per-row invariant the whole pipeline is pinned to: the extractor
is a pure function with ``extract_text(html) == text`` byte-identical
for every url (versioned via EXTRACTOR_VERSION; golden-bytes test in
tests/test_pipeline.py).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

EXTRACTOR_VERSION = "1.0.0"

URL_PREFIX = "https://docs.example.org/page/"
_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_HTML_HEAD = '<html><head><meta charset="utf-8"><title>'
_HTML_MID = '</title></head><body><nav>boilerplate nav | links | footer</nav><main><p>'
_HTML_TAIL = "</p></main><footer>crawl boilerplate</footer></body></html>"


def _escape(col: pa.ChunkedArray | pa.Array):
    col = pc.replace_substring(col, "&", "&amp;")
    col = pc.replace_substring(col, "<", "&lt;")
    col = pc.replace_substring(col, ">", "&gt;")
    return col


def _unescape(col):
    col = pc.replace_substring(col, "&lt;", "<")
    col = pc.replace_substring(col, "&gt;", ">")
    col = pc.replace_substring(col, "&amp;", "&")
    return col


def synthesize_pages_batch(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang) → pages(url, warc_ts, html, text,
    lang). Fully vectorized; html is built by string kernels and cast
    to binary."""
    doc_id = pc.cast(batch["doc_id"], pa.string())
    url = pc.binary_join_element_wise(pa.scalar(URL_PREFIX), doc_id, "")
    ts = pa.array(
        (batch["doc_id"].to_numpy(zero_copy_only=False) * 1_000_000 + _EPOCH_US),
    ).cast(pa.timestamp("us"))
    html = pc.binary_join_element_wise(
        pa.scalar(_HTML_HEAD),
        doc_id,
        pa.scalar(_HTML_MID),
        _escape(batch["text"]),
        pa.scalar(_HTML_TAIL),
        "",
    )
    return pa.table(
        {
            "url": url,
            "warc_ts": ts,
            "html": pc.cast(html, pa.binary()),
            "text": batch["text"],
            "lang": batch["lang"],
        },
        schema=PAGES_SCHEMA,
    )


def read_pages(sf_dir: str, parallelism: int | None = None) -> ray.data.Dataset:
    """P1: read the documents table (columns pruned at the read) and
    synthesize the page table."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    return ds.map_batches(synthesize_pages_batch, batch_format="pyarrow")


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """P2: pure, versioned text extraction — html → text, byte-identical
    per url. Drops the wide ``html`` column immediately (scale: the
    binary payload never travels past this stage)."""
    html = pc.cast(batch["html"], pa.string())
    body = pc.extract_regex(html, r"(?s)<main><p>(?P<t>.*)</p></main>")
    text = _unescape(pc.struct_field(body, "t"))
    out = pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "text": pc.fill_null(text, ""),
            "lang": batch["lang"],
        }
    )
    return out


def extract_text(html: bytes) -> str:
    """Scalar extractor (same function, one row) — used by golden tests."""
    tbl = pa.table(
        {
            "url": [""],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": pa.array([html], pa.binary()),
            "lang": [""],
        }
    )
    return extract_text_batch(tbl)["text"][0].as_py()
