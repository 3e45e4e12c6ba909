"""WARC (Web ARChive, ISO 28500) crawl-archive source.

The on-disk format of Common Crawl and every Heritrix-style crawler —
the raw input of an LLM training-data pipeline. Reference parity note:
the reference (index.js:1-290) has no file-source surface; this is
[EXT] LLM-pipeline scope per SURVEY §2.

Format (public spec, ISO 28500 / WARC 1.1): a WARC file is a
concatenation of records, each

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...          (WARC-Type, WARC-Target-URI,
    \\r\\n                              WARC-Date, Content-Length, ...)
    <Content-Length octets of body>
    \\r\\n\\r\\n

For ``response`` records the body is a full HTTP/1.1 response message
(status line + headers + payload). Common Crawl ships each record as
its own gzip member, concatenated — ``gzip.decompress`` handles
multi-member streams natively, so one code path covers both plain and
.warc.gz inputs.

Scale shape: ``read_warc_files`` parallelizes at FILE granularity
(``binaryFile`` scan -> Arrow-batched record fan-out). That is the
right unit for real crawls: Common Crawl segments are ~1 GB by
construction (tens of thousands of files per crawl), so a 1000-executor
cluster saturates on file parallelism without splitting any single
archive. Sub-file splitting needs a gzip-member offset index (each record is
an independent member, so members ARE split points) —
``warc_member_index`` builds exactly that: CDX-style (offset,
compressed length, type, url) rows whose every span is an
independently range-fetchable record, the metadata artifact a crawl
tier shards work by.
"""

from __future__ import annotations

import gzip
import re
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "iter_warc_records",
    "iter_gzip_members",
    "parse_http_response",
    "encode_warc",
    "warc_responses",
    "warc_member_index",
    "read_warc_files",
    "synth_warc_corpus",
]

_GZIP_MAGIC = b"\x1f\x8b"


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield records from one WARC file as dicts with lower-cased
    header names plus ``version`` and ``body`` (bytes).

    Accepts plain or gzipped (single- or multi-member) input. Hostile
    inputs raise ``ValueError`` with a named reason — a crawl tier
    quarantines bad archives rather than ingesting garbage."""
    if data[:2] == _GZIP_MAGIC:
        try:
            data = gzip.decompress(data)
        except Exception as e:  # zlib raises several types
            raise ValueError(f"WARC: bad gzip stream: {e}") from e
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate (and require at EOF) inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("WARC: truncated version line")
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"WARC: bad version line {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {"version": version}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("WARC: truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            k, sep, v = line.partition(b":")
            if not sep:
                raise ValueError(f"WARC: malformed header {line!r}")
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC: missing/bad Content-Length") from e
        if clen < 0 or pos + clen > n:
            raise ValueError("WARC: body exceeds file")
        headers["body"] = data[pos : pos + clen]
        pos += clen
        if data[pos : pos + 4] != b"\r\n\r\n":
            raise ValueError("WARC: missing record separator")
        pos += 4
        yield headers


def iter_gzip_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (compressed_offset, compressed_length, raw_bytes) per
    gzip MEMBER of a multi-member stream — the Common Crawl layout's
    split points. Incremental chunked feeding (never re-slicing the
    tail), so a 100k-member archive indexes in O(bytes), not O(n^2)."""
    import zlib

    pos = 0
    n = len(data)
    chunk = 1 << 20
    while pos < n:
        if data[pos : pos + 2] != _GZIP_MAGIC:
            raise ValueError(f"WARC: not a gzip member at offset {pos}")
        d = zlib.decompressobj(wbits=31)
        raw = bytearray()
        feed = pos
        while not d.eof:
            if feed >= n:
                raise ValueError("WARC: truncated gzip member")
            try:
                raw += d.decompress(data[feed : feed + chunk])
            except zlib.error as e:
                raise ValueError(f"WARC: bad gzip member: {e}") from e
            feed += chunk
        consumed = min(feed, n) - len(d.unused_data)
        yield pos, consumed - pos, bytes(raw)
        pos = consumed


def warc_member_index(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """CDX-style fetch index for gzip-member WARC archives: one row
    per member — (archive id, member_idx, offset, compressed length,
    warc_type, url, record bytes). THIS closes the module docstring's
    named growth path: ``offset``/``comp_length`` are exactly the
    HTTP range request that retrieves one record from object storage
    without touching the rest of the archive, and the index is the
    metadata build artifact a 100 TB crawl tier shards work by.
    Plain (non-gzip) archives get record byte offsets with
    comp_length = the record's stored length — same fetch semantics.
    ``errors="quarantine"`` adds (err_class, err_msg) side rows for
    damaged archives instead of killing the task
    (sources/envelope.py)."""
    from timeseries_data_provider_spark.sources.envelope import (
        extraction_envelope,
    )

    def per_row(rid: int, blob: bytes) -> list[dict]:
        rows = []
        try:
            if blob[:2] == _GZIP_MAGIC:
                members = iter_gzip_members(blob)
            else:
                members = _plain_record_spans(blob)
            for idx, (off, clen, raw) in enumerate(members):
                recs = list(iter_warc_records(raw))
                # one record per member in the CC layout; a
                # multi-record member indexes as its first
                rec = recs[0] if recs else {}
                rows.append(
                    {
                        "member_idx": idx,
                        "offset": off,
                        "comp_length": clen,
                        "warc_type": rec.get("warc-type"),
                        "url": rec.get("warc-target-uri"),
                        "record_bytes": len(raw),
                    }
                )
        except ValueError as e:
            raise ValueError(f"archive {rid}: {e}") from e
        return rows

    return extraction_envelope(
        df,
        per_row,
        [
            ("member_idx", "long"),
            ("offset", "long"),
            ("comp_length", "long"),
            ("warc_type", "string"),
            ("url", "string"),
            ("record_bytes", "long"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


def _plain_record_spans(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Record spans of an UNCOMPRESSED WARC: (offset, stored length,
    record bytes) — derived by re-walking the record framing."""
    pos = 0
    n = len(data)
    while pos < n:
        start = pos
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        # parse exactly one record to find its end
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC: truncated header block")
        m = re.search(
            rb"^content-length:\s*(\d+)\s*$",
            data[pos:hdr_end],
            re.IGNORECASE | re.MULTILINE,
        )
        if not m:
            raise ValueError("WARC: missing/bad Content-Length")
        end = hdr_end + 4 + int(m.group(1)) + 4
        if end > n:
            raise ValueError("WARC: body exceeds file")
        yield start, end - start, data[start:end]
        pos = end


def parse_http_response(body: bytes) -> tuple[int, dict, bytes]:
    """Split a ``response`` record body (an HTTP/1.1 message) into
    (status_code, lower-cased headers, payload bytes)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP: missing header terminator")
    head, payload = body[:sep], body[sep + 4 :]
    lines = head.split(b"\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"HTTP: bad status line {lines[0]!r}")
    try:
        status = int(parts[1])
    except ValueError as e:
        raise ValueError(f"HTTP: bad status {parts[1]!r}") from e
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep2, v = line.partition(b":")
        if sep2:
            headers[k.decode("ascii", "replace").strip().lower()] = (
                v.decode("utf-8", "replace").strip()
            )
    return status, headers, payload


def encode_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """Test/fixture writer: serialize records (dicts with ``type``,
    ``uri``, ``date``, ``body`` and optional extra headers) into a
    WARC file. ``gzip_members=True`` emits the Common Crawl layout —
    one gzip member per record, ``mtime=0`` so output is
    deterministic."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["body"]
        head = [
            b"WARC/1.0",
            b"WARC-Type: " + r["type"].encode(),
            b"WARC-Record-ID: <urn:uuid:%08d>" % i,
            b"WARC-Date: " + r.get("date", "2026-01-01T00:00:00Z").encode(),
        ]
        if r.get("uri"):
            head.append(b"WARC-Target-URI: " + r["uri"].encode())
        for k, v in r.get("extra", {}).items():
            head.append(f"{k}: {v}".encode())
        head.append(b"Content-Length: %d" % len(body))
        rec = b"\r\n".join(head) + b"\r\n\r\n" + body + b"\r\n\r\n"
        out += gzip.compress(rec, mtime=0) if gzip_members else rec
    return bytes(out)


def http_response_bytes(
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html",
) -> bytes:
    """Serialize an HTTP/1.1 response message (fixture helper)."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved"}.get(status, "X")
    return (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload


def warc_responses(
    df: DataFrame,
    blob_col: str = "payload",
    id_col: str = "doc_id",
    errors: str = "raise",
) -> DataFrame:
    """Arrow-batched 1->N fan-out of WARC archives into one row per
    ``response`` record: (id, record index, url, warc_date, http
    status, mime type, payload bytes). Non-response records
    (warcinfo/request/metadata) are counted but not emitted — the
    text pipeline consumes responses. Per-archive independence means
    zero shuffle; parse errors carry the archive id in the message.
    ``errors="quarantine"`` adds (err_class, err_msg) side rows for
    damaged archives instead of killing the task
    (sources/envelope.py)."""

    from timeseries_data_provider_spark.sources.envelope import (
        extraction_envelope,
    )

    def per_row(rid: int, blob: bytes) -> list[dict]:
        try:
            recs = list(iter_warc_records(blob))
        except ValueError as e:
            raise ValueError(f"archive {rid}: {e}") from e
        rows = []
        for idx, rec in enumerate(recs):
            if rec.get("warc-type") != "response":
                continue
            status, hh, payload = parse_http_response(rec["body"])
            mime = hh.get("content-type", "")
            # strip parameters: "text/html; charset=utf-8"
            mime = mime.split(";", 1)[0].strip()
            rows.append(
                {
                    "record_idx": idx,
                    "url": rec.get("warc-target-uri"),
                    "warc_date": rec.get("warc-date"),
                    "http_status": status,
                    "mime": mime,
                    "n_records": len(recs),
                    "body": payload,
                }
            )
        return rows

    return extraction_envelope(
        df,
        per_row,
        [
            ("record_idx", "long"),
            ("url", "string"),
            ("warc_date", "string"),
            ("http_status", "long"),
            ("mime", "string"),
            ("n_records", "long"),
            ("body", "binary"),
        ],
        id_col=id_col,
        blob_col=blob_col,
        errors=errors,
    )


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of .warc / .warc.gz files into response rows.

    File-granular parallelism via the ``binaryFile`` source (see the
    module docstring for why that is the right split unit for real
    crawls); each file is parsed once, in place, by the same fan-out
    as ``warc_responses``."""
    files = (
        spark.read.format("binaryFile")
        .load(path)
        .select(
            F.xxhash64("path").alias("doc_id"),
            F.col("content").alias("payload"),
        )
    )
    return warc_responses(files)


def synth_warc_corpus(
    documents: DataFrame, html_builder=None, url_builder=None
) -> DataFrame:
    """Deterministic real WARC archive per document — the planted
    input for q64's crawl-front-end columns (the synth_media pattern:
    the corpus has no binary crawl column, so the probe builds real
    archives whose every field is closed-form doc_id math).

    Each archive is Common Crawl-shaped: three gzip members —
    warcinfo, request, response — where the response wraps an HTML
    page built by ``html_builder(doc_id, text)`` (default: a plain
    ``<p>text</p>`` page) at URL ``url_builder(doc_id)`` (default
    ``http://example{id%7}.com/doc/{id}``; pass a messier builder to
    exercise URL canonicalization downstream). Status 404 on
    id%13==0 else 200, mime text/html."""

    def default_builder(doc_id: int, text: str) -> str:
        return f"<html><body><p>{text}</p></body></html>"

    builder = html_builder or default_builder
    make_url = url_builder or (
        lambda doc_id: f"http://example{doc_id % 7}.com/doc/{doc_id}"
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "payload": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                doc_id = int(doc_id)
                url = make_url(doc_id)
                status = 404 if doc_id % 13 == 0 else 200
                page = builder(doc_id, text).encode("utf-8")
                payload = encode_warc(
                    [
                        {
                            "type": "warcinfo",
                            "uri": None,
                            "body": b"software: tdps-synth\r\n",
                        },
                        {
                            "type": "request",
                            "uri": url,
                            "body": b"GET / HTTP/1.1\r\n\r\n",
                        },
                        {
                            "type": "response",
                            "uri": url,
                            "body": http_response_bytes(page, status),
                        },
                    ]
                )
                out["doc_id"].append(doc_id)
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    from timeseries_data_provider_spark.tables import widen_for_python

    return widen_for_python(
        documents.select("doc_id", "text")
    ).mapInPandas(synth, "doc_id long, payload binary")
