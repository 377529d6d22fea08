"""WARC (ISO 28500) source: Common-Crawl archive files → the pages table.

The engine's canonical input is the pages table ``(url, warc_ts, html,
text, lang)`` (BASELINE.json input_hint); production crawls deliver that
data as WARC files. This reader turns a directory of WARC files into that
table: ``spark.read.format("binaryFile")`` distributes whole files to
executors (one task per file — WARC records are not splittable without an
index), and an Arrow-batched ``mapInPandas`` UDF walks each file's
record structure (header block, ``Content-Length``-delimited payload,
CRLF CRLF separators) emitting one row per ``response`` record.

Format knowledge is the public WARC/1.0 + 1.1 spec: records are
``WARC/1.x`` header lines, ``Name: value`` headers (``WARC-Type``,
``WARC-Target-URI``, ``WARC-Date``, ``Content-Length``), a blank line,
``Content-Length`` payload bytes, then CRLF CRLF. HTTP response payloads
carry their own status line + headers before the body; we strip them at
the first blank line.

Gzip: Common Crawl ships per-record-gzipped ``.warc.gz`` members
(concatenated gzip streams); Python's zlib decompresses concatenated
members sequentially, so ``.gz`` inputs work through the same path.

100 TB plan: parallelism = #files (Common Crawl segments are ~1 GB —
64k files per crawl, far above any cluster's core count); the parse is
one pass per file, no driver involvement, and the output feeds directly
into ``extract.html_to_text`` / the mention pipeline. Set
``spark.sql.files.maxPartitionBytes`` irrelevant here — binaryFile never
splits; memory per task is bounded by the largest single file, so keep
segment-sized (not crawl-sized) inputs.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, record_id string, "
    "source_file string"
)


def _parse_warc_bytes(
    raw: bytes,
    source: str,
    record_types: tuple = ("response",),
    strip_http: bool = True,
) -> list[tuple]:
    """Parse one WARC file's bytes into (url, ts, payload, record_id,
    file) tuples for records of ``record_types``. ``strip_http`` drops
    the HTTP envelope (status line + headers) from each payload —
    right for crawl ``response`` records, wrong for WET ``conversion``
    records whose payload is already bare text. Pure function →
    unit-testable without Spark."""
    if raw[:2] == b"\x1f\x8b":
        # concatenated gzip members decompress as one stream
        raw = gzip.decompress(raw)
    out: list[tuple] = []
    buf = io.BytesIO(raw)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        if not line:
            break
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # desynced (truncated/corrupt record) — stop rather than emit
            # garbage; the lineage row count downstream surfaces the gap
            break
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if h.strip() == b"":
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        length = int(headers.get("content-length", "0"))
        payload = buf.read(length)
        if headers.get("warc-type") in record_types:
            if strip_http:
                # strip the HTTP envelope: body starts after the first
                # blank line
                sep = payload.find(b"\r\n\r\n")
                body = payload[sep + 4 :] if sep >= 0 else payload
            else:
                body = payload
            ts = headers.get("warc-date")
            out.append(
                (
                    headers.get("warc-target-uri"),
                    pd.Timestamp(ts).tz_localize(None)
                    if ts and pd.Timestamp(ts).tzinfo
                    else (pd.Timestamp(ts) if ts else None),
                    body,
                    headers.get("warc-record-id"),
                    source,
                )
            )
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory (or glob) of ``.warc`` / ``.warc.gz`` files → DataFrame
    with :data:`WARC_PAGES_SCHEMA`. One task per file; records parsed
    executor-side in Arrow batches."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "record_id", "source_file"]
        for pdf in batches:
            rows: list[tuple] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(_parse_warc_bytes(bytes(c), str(p)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WARC_PAGES_SCHEMA)


WET_TEXT_SCHEMA = (
    "url string, warc_ts timestamp, text string, record_id string, "
    "source_file string"
)


def read_wet(
    spark: SparkSession, path: str, glob: str = "*.wet*"
) -> DataFrame:
    """Directory/glob of WET files (Common Crawl's extracted-text
    archives: WARC containers of ``conversion`` records whose payload is
    the bare UTF-8 text) → ``(url, warc_ts, text, record_id,
    source_file)``. Same one-task-per-file scale shape as
    :func:`read_warc`. ``glob`` selects the archive files (pass
    ``"part-*"`` for a directory written by :func:`write_wet`)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select("path", "content")
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "text", "record_id", "source_file"]
        for pdf in batches:
            rows: list[tuple] = []
            for p, c in zip(pdf["path"], pdf["content"]):
                rows.extend(
                    (u, ts, body.decode("utf-8", "replace"), rid, src)
                    for u, ts, body, rid, src in _parse_warc_bytes(
                        bytes(c),
                        str(p),
                        record_types=("conversion",),
                        strip_http=False,
                    )
                )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, WET_TEXT_SCHEMA)


def write_wet(
    pages: DataFrame,
    path: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> None:
    """Distributed WET sink: serialize each page's extracted text as a
    spec-shaped WARC ``conversion`` record and write with the text
    writer — one output file per partition, records streamed
    executor-side (no driver collect; the columnar→record formatting is
    one codegen'd ``concat``). Round-trips through :func:`read_wet`.

    Record ids are md5(url) urns: deterministic, so re-writing the same
    table is idempotent byte-for-byte (the resumability contract
    everywhere else in this engine)."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    ts = F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col(url_col),
        F.lit("\r\nWARC-Date: "),
        F.coalesce(ts, F.lit("1970-01-01T00:00:00Z")),
        F.lit("\r\nWARC-Record-ID: <urn:md5:"),
        F.md5(F.col(url_col)),
        F.lit(">\r\nContent-Length: "),
        # byte length, not char length — the reader consumes exactly
        # Content-Length bytes of UTF-8 payload
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"),
        text,
        F.lit("\r\n\r"),
    )
    # write.text keeps embedded newlines verbatim and appends one \n per
    # row → the trailing "\r\n\r" + writer newline is the spec's
    # CRLF CRLF record separator
    pages.select(rec.alias("value")).write.mode("overwrite").text(path)


def write_warc(rows: list[tuple], path: str, gzip_out: bool = False) -> None:
    """Tiny WARC writer for tests/fixtures: ``rows`` of (url, iso_ts,
    html_bytes). Emits spec-shaped ``response`` records with an HTTP
    envelope. Driver-side by design — fixture generation, not a sink."""
    buf = io.BytesIO()
    for i, (url, ts, html) in enumerate(rows):
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            "\r\n"
        ).encode()
        buf.write(header)
        buf.write(http)
        buf.write(b"\r\n\r\n")
    data = buf.getvalue()
    if gzip_out:
        data = gzip.compress(data)
    with open(path, "wb") as f:
        f.write(data)
