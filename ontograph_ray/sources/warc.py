"""WARC source: Common-Crawl-style web-archive files → the page table.

The engine's canonical input is the Parquet page table of
BASELINE.json's input_hint (`url, warc_ts, html, text, lang`); real
Common-Crawl data arrives as WARC/1.0 files (ISO 28500 — public
format). This reader turns a directory of ``.warc`` / ``.warc.gz``
files into a Dataset with columns ``(url: string,
warc_ts: timestamp[us], html: binary)`` — exactly the raw half of the
page schema; `pipelines.pages.extract_text_batch` takes it from there.

Physical shape: `ray.data.read_binary_files` (one record batch per
file — WARC files are the natural parallelism unit, ~1 GB each in
Common Crawl) → one parse task per file. The parser is a plain
byte-scanner over record boundaries (WARC is length-prefixed via
``Content-Length``, so parsing is O(records), never O(bytes²)) and
only materializes response records' payload bodies.

No external WARC library is used (none is available in this
container, and none is needed — the format is 10 header lines and a
length-delimited payload).
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

import pyarrow as pa

import ray.data

_CRLF2 = b"\r\n\r\n"

PAGE_RAW_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)


def _parse_warc_bytes(data: bytes) -> tuple[list, list, list]:
    """Parse one WARC file's bytes → (urls, timestamps, bodies) for
    every ``WARC-Type: response`` record. Tolerant of both bare
    concatenated records and gzip'd whole files (Common Crawl gzips
    per-record; ``gzip.decompress`` handles concatenated members)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if not data.startswith(b"WARC/"):
        # non-WARC file in the directory (e.g. the sink's _MANIFEST)
        return [], [], []
    urls, stamps, bodies = [], [], []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            break
        header = data[pos:hdr_end].decode("utf-8", "replace")
        fields: dict[str, str] = {}
        for line in header.split("\r\n")[1:]:  # line 0 = "WARC/1.0"
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        length = int(fields.get("content-length", "0"))
        payload = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if fields.get("warc-type") != "response":
            continue
        url = fields.get("warc-target-uri", "")
        ts_raw = fields.get("warc-date", "1970-01-01T00:00:00Z")
        ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
            timezone.utc
        )
        # payload is an HTTP response; body follows the first CRLFCRLF
        body_at = payload.find(_CRLF2)
        body = payload[body_at + 4 :] if body_at >= 0 else payload
        urls.append(url)
        stamps.append(ts.replace(tzinfo=None))
        bodies.append(body)
    return urls, stamps, bodies


def _parse_batch(batch: pa.Table) -> pa.Table:
    urls, stamps, bodies = [], [], []
    for blob in batch["bytes"]:
        u, s, b = _parse_warc_bytes(blob.as_py())
        urls.extend(u)
        stamps.extend(s)
        bodies.extend(b)
    return pa.table(
        {"url": urls, "warc_ts": stamps, "html": bodies}, schema=PAGE_RAW_SCHEMA
    )


def read_warc(paths: "str | list[str]", **read_kwargs) -> ray.data.Dataset:
    """Directory / list of WARC files → Dataset(url, warc_ts, html).

    One parse task per file; downstream stages (text extraction etc.)
    should `repartition` if files are few and fat."""
    files = ray.data.read_binary_files(paths, **read_kwargs)
    return files.map_batches(_parse_batch, batch_format="pyarrow")


def write_warc_file(path: str, records: list[dict]) -> None:
    """Write a minimal WARC/1.0 file (test/fixture helper; also the
    shape a re-archival sink would emit per block). Each record:
    ``{"url": str, "ts": datetime, "html": bytes}``."""
    buf = io.BytesIO()
    for r in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"Content-Length: {len(http)}\r\n"
            "\r\n"
        ).encode()
        buf.write(hdr)
        buf.write(http)
        buf.write(b"\r\n\r\n")
    data = buf.getvalue()
    if path.endswith(".gz"):
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)


def write_warc(ds: ray.data.Dataset, out_dir: str) -> int:
    """Partitioned WARC/1.0 sink: one ``part-<sha1>.warc.gz`` file per
    input block, named by a content hash of the block's URLs so a
    re-run overwrites its own outputs, then RECONCILED: after the
    write, every ``part-*.warc.gz`` in ``out_dir`` that this run did
    not produce is deleted and the expected file set is recorded in a
    ``_MANIFEST`` file. Without the reconcile step a re-run under a
    different block layout would leave the previous layout's part
    files behind and read_warc would return duplicated records — the
    content-hash naming alone is only idempotent for identical
    layouts. Never one giant file. Returns the number of records
    written."""
    import hashlib
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def sink(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"n": pa.array([], pa.int64()), "part": pa.array([], pa.string())}
            )
        urls = batch["url"].to_pylist()
        stamps = batch["warc_ts"].to_pylist()
        html = batch["html"].to_pylist()
        fname = f"part-{hashlib.sha1(chr(10).join(urls).encode()).hexdigest()[:16]}.warc.gz"
        write_warc_file(
            os.path.join(out_dir, fname),
            [
                {"url": u, "ts": t, "html": h}
                for u, t, h in zip(urls, stamps, html)
            ],
        )
        return pa.table(
            {
                "n": pa.array([batch.num_rows], pa.int64()),
                "part": pa.array([fname], pa.string()),
            }
        )

    rows = ds.map_batches(sink, batch_format="pyarrow").take_all()
    expected = {r["part"] for r in rows}
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".warc.gz") and f not in expected:
            os.remove(os.path.join(out_dir, f))
    with open(os.path.join(out_dir, "_MANIFEST"), "w") as mf:
        json.dump({"parts": sorted(expected)}, mf)
    return sum(r["n"] for r in rows)
