"""WARC (Web ARChive, ISO 28500) source — the CommonCrawl container.

The 100 TB web corpus this package's curation operators target ships
as WARC: crawls arrive as ``.warc.gz`` files whose records each hold
one HTTP exchange. The format is stdlib all the way down: a record is
a ``WARC/1.x`` version line, CRLF header lines, a blank line,
``Content-Length`` payload bytes, and a CRLF CRLF terminator; the
compressed form is one gzip MEMBER per record (the spec's
record-at-time compression), which ``zlib`` walks member-by-member.
``warc_import`` reads a directory distributed (binaryFile scan, one
Python parse per file, Arrow-batched into rows); HTTP response
records additionally split status/headers from the body so the
payload column is the HTML the pipeline wants
(operators/html.html_extract is the next stage).

Scope: WARC/1.0 and /1.1, plain and record-at-time gzip (sniffed per
file), record types passed through with their headers (filter on
``warc_type == 'response'`` for page bodies), HTTP header split with
status + Content-Type surfaced. NOT parsed: chunked transfer
encodings inside payloads (stored bodies are already de-chunked by
compliant crawlers; non-compliant payloads pass through raw),
segmented records (continuation), per-member split offsets inside
one .gz (a file is one task — the avro-style block-split index needs
a member directory WARC doesn't carry; CommonCrawl ships ~1 GB files
precisely so file-granular parallelism works).
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class WarcError(ValueError):
    """Malformed or unsupported-by-scope WARC input."""


def _gzip_members(data: bytes):
    """Yield decompressed gzip members from record-at-time-compressed
    bytes (zlib with wbits=47 stops at each member's end; unused_data
    is the next member)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(47)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as e:
            raise WarcError(f"gzip member at {pos} failed: {e}") from None
        if not d.eof:
            raise WarcError(f"truncated gzip member at {pos}")
        yield out
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise WarcError("gzip member consumed no bytes")
        pos += consumed


def _parse_headers(block: bytes):
    """CRLF header block -> (first_line, {lower_name: value})."""
    lines = block.split(b"\r\n")
    first = lines[0].decode("latin1")
    headers = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        headers[k.strip().lower().decode("latin1")] = \
            v.strip().decode("latin1", "replace")
    return first, headers


def warc_iter_records(data: bytes, max_records: int = 1_000_000):
    """Yield (warc_headers, payload_bytes) from ONE uncompressed WARC
    stream. ``max_records`` bounds crafted inputs (strictly-forward
    walk)."""
    pos = 0
    n = 0
    while pos < len(data):
        # tolerate extra CRLFs between records (some writers pad)
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        n += 1
        if n > max_records:
            raise WarcError("record budget exceeded")
        if not data.startswith(b"WARC/", pos):
            raise WarcError(f"expected WARC version line at {pos}")
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            raise WarcError("truncated WARC header block")
        first, headers = _parse_headers(data[pos:hdr_end])
        if not first.startswith("WARC/1."):
            raise WarcError(f"unsupported WARC version {first!r}")
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise WarcError("record without Content-Length") from None
        except ValueError:
            raise WarcError("bad Content-Length") from None
        if length < 0:
            raise WarcError("negative Content-Length")
        body_start = hdr_end + 4
        if body_start + length > len(data):
            raise WarcError("record payload overruns file")
        yield headers, data[body_start:body_start + length]
        pos = body_start + length
        if data[pos:pos + 4] == b"\r\n\r\n":
            pos += 4  # the spec's two-CRLF record terminator


def _split_http(payload: bytes):
    """(status:int|None, content_type:str|None, body:bytes) for an
    HTTP response payload; a payload without an HTTP/ status line
    passes through whole."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    sep = payload.find(b"\r\n\r\n")
    if sep == -1:
        return None, None, payload
    first, headers = _parse_headers(payload[:sep])
    parts = first.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, payload
    return status, headers.get("content-type"), payload[sep + 4:]


WARC_SCHEMA = T.StructType([
    T.StructField("file", T.StringType(), False),
    T.StructField("record_idx", T.IntegerType(), False),
    T.StructField("warc_type", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("record_id", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("content_type", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
])


def warc_decode_file(data: bytes):
    """One WARC file's bytes (plain or record-at-time gzip, sniffed)
    -> list of row tuples matching WARC_SCHEMA minus the file column."""
    rows = []
    if data[:2] == b"\x1f\x8b":
        streams = _gzip_members(data)
    else:
        streams = (data,)
    idx = 0
    for stream in streams:
        for headers, payload in warc_iter_records(stream):
            status, ctype, body = _split_http(payload)
            rows.append((
                idx,
                headers.get("warc-type"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("warc-record-id"),
                status,
                ctype or headers.get("content-type"),
                body,
                len(body),
            ))
            idx += 1
    return rows


def warc_import(spark: SparkSession, path: str,
                pattern: str = "*.warc*") -> DataFrame:
    """Read a directory of WARC files distributed: binaryFile scan,
    one Python decode per file (CommonCrawl's ~1 GB-per-file layout
    makes file granularity the parallelism unit), Arrow-batched rows
    out. Filter ``warc_type == 'response'`` and feed ``payload`` to
    operators/html.html_extract for the text pipeline."""
    from collections.abc import Iterator

    import pandas as pd

    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for row in warc_decode_file(bytes(content)):
                    out.append((p,) + row)
            yield pd.DataFrame(out, columns=cols)

    return files.mapInPandas(run, schema=WARC_SCHEMA)


# --------------------------------------------------------------- builder
def warc_build(records, gzip_members: bool = False) -> bytes:
    """Author a WARC file (the test-harness/gate half). Each record is
    a dict with warc_type, target_uri (optional), payload bytes, and
    optional http (status, content_type) to wrap the payload as an
    HTTP response."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = r["payload"]
        if r.get("http"):
            status, ctype = r["http"]
            payload = (f"HTTP/1.1 {status} X\r\n"
                       f"Content-Type: {ctype}\r\n"
                       f"Content-Length: {len(payload)}\r\n\r\n"
                       ).encode("latin1") + payload
        hdrs = [b"WARC/1.0",
                b"WARC-Type: " + r["warc_type"].encode("latin1"),
                b"WARC-Record-ID: <urn:uuid:%d>" % i,
                b"WARC-Date: 2026-01-01T00:00:00Z"]
        if r.get("target_uri"):
            hdrs.append(b"WARC-Target-URI: "
                        + r["target_uri"].encode("latin1"))
        hdrs.append(b"Content-Length: %d" % len(payload))
        rec = b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += c.compress(rec) + c.flush()
        else:
            out += rec
    return bytes(out)
