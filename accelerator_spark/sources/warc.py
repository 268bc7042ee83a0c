"""WARC (Web ARChive, ISO 28500) source — the CommonCrawl container.

The 100 TB web corpus this package's curation operators target ships
as WARC: crawls arrive as ``.warc.gz`` files whose records each hold
one HTTP exchange. The format is stdlib all the way down: a record is
a ``WARC/1.x`` version line, CRLF header lines, a blank line,
``Content-Length`` payload bytes, and a CRLF CRLF terminator; the
compressed form is one gzip MEMBER per record (the spec's
record-at-time compression), which ``zlib`` walks member-by-member.

``warc_import`` reads a directory distributed. Two fan-out shapes:

- **file-granular** (always available): binaryFile scan, one Python
  decode per file. Peak Python heap per task is bounded by the CHUNK,
  not the file (VERDICT r8 #2): the decode is a generator walk —
  gzip members are decompressed one record at a time and rows leave
  as an Arrow batch every ``chunk_records`` records or
  ``chunk_bytes`` of payload, whichever comes first, so a ~1 GB
  .warc.gz never materializes its 3-5x decompressed self.
- **record-granular** (VERDICT r8 #6): when a ``.cdx``/``.cdx.gz``
  sidecar exists next to a locally-readable file (CommonCrawl ships
  them), its record offsets become SPLIT POINTS: the file fans out
  into ~``target_split_bytes`` byte ranges cut at record starts, one
  task per range, the avro block-split pattern (sources/avro.py) —
  removing the 1 GB task-granularity floor. Ranges partition the
  whole byte span, so a split read is byte-identical to the
  whole-file read; each task validates its decoded record count
  against the index and fails loudly on a PARTIAL sidecar (one that
  skips records would silently shift record_idx otherwise).

HTTP response records additionally split status/headers from the
body so the payload column is the HTML the pipeline wants
(operators/charset.decode_payload then operators/html.html_extract).

Scope: WARC/1.0 and /1.1, plain and record-at-time gzip (sniffed per
file and per range), record types passed through with their headers
(filter on ``warc_type == 'response'`` for page bodies), HTTP header
split with status + Content-Type surfaced, CDXJ and classic-CDX
sidecar formats. NOT parsed: chunked transfer encodings inside
payloads (stored bodies are already de-chunked by compliant crawlers;
non-compliant payloads pass through raw), segmented records
(continuation).
"""

from __future__ import annotations

import os
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class WarcError(ValueError):
    """Malformed or unsupported-by-scope WARC input."""


ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # zstd frame magic, little-endian


def _maybe_zstd(data: bytes, codec_hook):
    """Route zstd-compressed bytes through the injectable codec hook
    (the image-decoder-hook pattern, operators/multimodal.py):
    CommonCrawl is migrating to .warc.zst and stdlib gains
    ``compression.zstd`` only in 3.14, so the hook is how the source
    becomes zstd-ready the day the environment has a codec.

    Hook contract: the hook receives the compressed bytes — possibly
    a CONCATENATION of frames (record-at-time compression, like the
    gzip-member layout; a CDX range spanning several records hands
    the hook several back-to-back frames) — and must return the
    decompressed stream of ALL of them. Python 3.14's
    ``compression.zstd.decompress`` handles concatenated frames;
    python-zstandard's one-shot ``zstandard.decompress`` does NOT (it
    stops at the first frame or errors on trailing data) — wrap it in
    a frame loop, e.g.::

        def hook(data):
            out, d = [], zstandard.ZstdDecompressor()
            with d.stream_reader(io.BytesIO(data),
                                 read_across_frames=True) as r:
                while chunk := r.read(1 << 20):
                    out.append(chunk)
            return b"".join(out)

    Memory caveat: the hook path decompresses the given bytes WHOLE —
    on a full .warc.zst shard (no CDX ranges) peak task heap is the
    decompressed shard, unlike the gzip-member path which streams
    member-at-a-time; record-granular CDX splits restore the bounded
    behavior. None -> a clear unsupported error naming the hook."""
    if data[:4] != ZSTD_MAGIC:
        return data
    if codec_hook is None:
        raise WarcError(
            "zstd-compressed WARC input and no codec available: pass "
            "codec_hook=<bytes->bytes zstd decompressor that handles "
            "CONCATENATED frames> (e.g. Python 3.14 "
            "compression.zstd.decompress, or python-zstandard's "
            "stream_reader(read_across_frames) in a loop — one-shot "
            "zstandard.decompress stops at the first frame)")
    return codec_hook(data)


def surt(uri: str) -> str:
    """SURT (Sort-friendly URI Reordering Transform) form of a URI —
    the urlkey convention CDX tooling sorts and merges on
    (``http://www.Example.com:8080/A?q=1`` →
    ``com,example,www:8080)/a?q=1``): scheme and userinfo dropped,
    host labels reversed and comma-joined, default http/https ports
    dropped, everything lowercased. IPv4 and IPv6 hosts are NOT
    label-reversed (an address is not a hierarchy). A string without
    a parseable host passes through lowercased — the sidecar must
    never fail on a weird crawl URI."""
    from urllib.parse import urlsplit

    def _enc(s: str) -> str:
        # the urlkey is FIELD 1 of a space-delimited CDX line and sits
        # left of the JSON block our own cdx_offsets scans for: a
        # space, brace or quote would corrupt the line structure —
        # percent-encode exactly those (real CDX canonicalizers do
        # the same; %-escapes already present are left intact)
        return "".join("%%%02x" % ord(ch) if ch in ' {}"\\\t\n\r'
                       else ch for ch in s)

    try:
        sp = urlsplit((uri or "").strip())
        host = sp.hostname or ""
        port = sp.port
    except ValueError:
        return _enc((uri or "").lower())
    if not host:
        return _enc((uri or "").lower())
    if ":" in host or host.replace(".", "").isdigit():
        key = "[" + host + "]" if ":" in host else host  # IP literal
    else:
        key = ",".join(reversed(host.split(".")))
    default = {"http": 80, "https": 443}.get(sp.scheme.lower())
    if port is not None and port != default:
        key += ":%d" % port
    path = sp.path or "/"
    if sp.query:
        path += "?" + sp.query
    return _enc((key + ")" + path).lower())


def _cdx_timestamp(date: str | None) -> str:
    """A WARC-Date ISO string as the 14-digit CDX timestamp
    (``2025-04-01T00:00:00Z`` → ``20250401000000``) — what CDX tooling
    sorts within a urlkey; unparseable/absent dates fall back to the
    placeholder ``-`` rather than failing a sidecar write."""
    digits = "".join(ch for ch in str(date or "") if ch.isdigit())[:14]
    return digits if len(digits) == 14 else "-"


def _cdxj_line(uri: str, timestamp: str, offset: int, length: int) -> str:
    """One CDXJ sidecar line: SURT urlkey + timestamp + a JSON payload
    built with json.dumps — a quote or backslash in the URI must yield
    VALID JSON (ADVICE r9), and third-party CDX tooling sorts on the
    urlkey, so it is SURT form, not the raw URI (VERDICT r9 #5)."""
    import json

    return "%s %s %s" % (
        surt(uri) if uri else "-", timestamp,
        json.dumps({"url": uri or "-", "offset": str(offset),
                    "length": str(length)}, separators=(", ", ": ")))


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
    """CRLF header block -> (first_line, {lower_name: value}). Header
    VALUES decode UTF-8 first (ISO 28500: warc-fields are UTF-8 — and
    warc_export writes Target-URIs as UTF-8, so the round-trip is
    symmetric), falling back to latin1 for the legacy byte-soup a real
    crawl contains; names are ASCII tokens, latin1 is exact there."""
    lines = block.split(b"\r\n")
    first = lines[0].decode("latin1")
    headers = {}
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(b":")
        v = v.strip()
        try:
            val = v.decode("utf-8")
        except UnicodeDecodeError:
            val = v.decode("latin1")
        headers[k.strip().lower().decode("latin1")] = val
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


def warc_iter_file(data: bytes, base_idx: int = 0, codec_hook=None):
    """STREAMING decode of one WARC byte span (plain, record-at-time
    gzip, or zstd via ``codec_hook`` — sniffed): yields row tuples
    matching WARC_SCHEMA minus the file column, one at a time — gzip
    members decompress lazily, so a caller that drains in chunks holds
    one record plus its chunk in memory, never the decompressed file
    (VERDICT r8 #2). ``base_idx`` seeds record_idx for range reads."""
    data = _maybe_zstd(data, codec_hook)
    if data[:2] == b"\x1f\x8b":
        streams = _gzip_members(data)
    else:
        streams = (data,)
    idx = base_idx
    for stream in streams:
        for headers, payload in warc_iter_records(stream):
            status, ctype, body = _split_http(payload)
            yield (
                idx,
                headers.get("warc-type"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("warc-record-id"),
                status,
                ctype or headers.get("content-type"),
                body,
                len(body),
            )
            idx += 1


def warc_decode_file(data: bytes):
    """One WARC file's bytes -> list of row tuples (the materializing
    convenience for tests/gates over SMALL inputs; the distributed
    reader drains warc_iter_file in bounded chunks instead)."""
    return list(warc_iter_file(data))


# ------------------------------------------------------------- CDX index
def cdx_offsets(data: bytes) -> list:
    """Sorted record-start offsets from one CDX sidecar's bytes (plain
    or gzip, possibly multi-member). Two line formats, auto-detected:

    - CDXJ (CommonCrawl's current shape): ``urlkey timestamp {json}``
      with the byte offset in the JSON ``offset`` field;
    - classic CDX: a `` CDX <letters>`` header line names the
      space-separated fields; ``V`` is the file offset.
    """
    import json

    if data[:2] == b"\x1f\x8b":
        data = b"".join(_gzip_members(data))
    text = data.decode("utf-8", "replace")
    offsets = []
    v_at = None
    for line in text.splitlines():
        if not line.strip():
            continue
        if line.startswith(" CDX "):
            letters = line.split()[1:]
            v_at = letters.index("V") if "V" in letters else None
            if v_at is None:
                raise WarcError("classic CDX header without offset (V)")
            continue
        brace = line.find("{")
        if brace != -1:
            try:
                offsets.append(int(json.loads(line[brace:])["offset"]))
            except (ValueError, KeyError) as e:
                raise WarcError(f"bad CDXJ line: {e}") from None
        elif v_at is not None:
            parts = line.split()
            try:
                offsets.append(int(parts[v_at]))
            except (IndexError, ValueError):
                raise WarcError("bad classic CDX line") from None
        else:
            raise WarcError("unrecognized CDX line (no JSON, no header)")
    return sorted(offsets)


def warc_cdx_ranges(offsets: list, file_size: int,
                    target_bytes: int = 128 << 20) -> list:
    """Partition [0, file_size) into byte ranges cut ONLY at record
    starts, each >= target_bytes (a single over-size record is its own
    range). Returns [(start, end, base_idx, n_records), ...]. Because
    the ranges tile the whole byte span, a split read decodes exactly
    the bytes a whole-file read would; base_idx keeps record_idx
    file-global. Requires a COMPLETE index: the first record must be
    at byte 0 (decode tasks additionally validate their record count
    against n_records, so a sidecar that skips records fails loudly
    instead of silently shifting record_idx)."""
    cuts = sorted(set(offsets))
    if not cuts:
        raise WarcError("empty CDX index")
    if cuts[0] != 0:
        raise WarcError(
            f"CDX does not index the first record (offset {cuts[0]})")
    if cuts[-1] >= file_size:
        raise WarcError("CDX offset beyond the file")
    ranges = []
    start, base, n_in = 0, 0, 0
    for k in range(1, len(cuts) + 1):
        end = cuts[k] if k < len(cuts) else file_size
        n_in += 1
        if end - start >= target_bytes or k == len(cuts):
            ranges.append((start, end, base, n_in))
            base += n_in
            start, n_in = end, 0
    return ranges


def _find_cdx(local: str) -> str | None:
    """Sidecar next to a WARC file: <name>.cdx(.gz) tried against the
    full name, the name minus the compression extension (.gz/.zst),
    and the name minus .warc(.gz/.zst)."""
    stems = [local]
    for suffix in (".gz", ".zst", ".warc.gz", ".warc.zst", ".warc"):
        if local.endswith(suffix):
            stems.append(local[:-len(suffix)])
    for stem in stems:
        for ext in (".cdx", ".cdx.gz"):
            cand = stem + ext
            if os.path.exists(cand):
                return cand
    return None


def _chunked_frames(rows, cols, chunk_records: int, chunk_bytes: int):
    """Drain a row-tuple iterator into pandas DataFrames of at most
    chunk_records rows / chunk_bytes of payload — the per-task heap
    bound (rows carry n_bytes last)."""
    import pandas as pd

    out, nbytes = [], 0
    for row in rows:
        out.append(row)
        nbytes += row[-1] or 0
        if len(out) >= chunk_records or nbytes >= chunk_bytes:
            yield pd.DataFrame(out, columns=cols)
            out, nbytes = [], 0
    if out:
        yield pd.DataFrame(out, columns=cols)


def warc_import(spark: SparkSession, path: str,
                pattern: str = "*.warc*",
                split: bool | str = "auto",
                target_split_bytes: int = 128 << 20,
                chunk_records: int = 1024,
                chunk_bytes: int = 64 << 20,
                codec_hook=None) -> DataFrame:
    """Read a directory of WARC files distributed. Files that are
    locally readable AND have a CDX sidecar fan out into
    ~``target_split_bytes`` record-aligned byte ranges (one task per
    range; ``split=True`` demands this for every file, ``split=False``
    disables it); the rest read file-per-task via binaryFile. Both
    paths stream: rows leave in Arrow batches of ``chunk_records`` /
    ``chunk_bytes``, so task heap is bounded by the chunk.
    ``codec_hook`` (a picklable bytes->bytes decompressor) enables
    .warc.zst input — see _maybe_zstd; for the split path the hook
    must accept a concatenation of record-at-time frames. Filter
    ``warc_type == 'response'`` and feed ``payload`` through
    operators/charset.decode_payload to operators/html.html_extract
    for the text pipeline."""
    from .avro import _as_local

    if pattern and pattern.endswith((".cdx", ".cdx.gz")):
        raise WarcError("pattern matches CDX sidecars, not WARC files")
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))
    cols = [f.name for f in WARC_SCHEMA.fields]

    split_pairs = []   # (spark_path, local, cdx_local)
    unsplit = []
    if split is True or split == "auto":
        # paths-only collect (binaryFile prunes content) — the same
        # bounded manifest-class collect the avro split planner does
        paths = [r["path"] for r in files.select("path").collect()]
        for sp in paths:
            # a .cdx that the glob itself matched is a sidecar, not data
            if sp.endswith((".cdx", ".cdx.gz")):
                continue
            local = _as_local(sp)
            cdx = _find_cdx(local) if local else None
            if cdx:
                split_pairs.append((sp, local, cdx))
            else:
                unsplit.append(sp)
        if split is True and unsplit:
            raise WarcError(
                f"warc_import(split=True): no usable CDX sidecar for "
                f"{unsplit[0]} (and {len(unsplit) - 1} more)")

    parts = []
    if split_pairs:
        # stage 1: DISTRIBUTED index scan — each task reads its
        # sidecars (KBs per GB of crawl) and emits coalesced ranges
        def scan(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for sp, local, cdx in zip(pdf["p"], pdf["l"], pdf["c"]):
                    with open(cdx, "rb") as f:
                        offs = cdx_offsets(f.read())
                    size = os.path.getsize(local)
                    for s, e, b, n in warc_cdx_ranges(
                            offs, size, target_split_bytes):
                        rows.append((sp, local, s, e, b, n))
                yield pd.DataFrame(rows, columns=[
                    "p", "l", "start", "end", "base", "n"])

        pairs_df = spark.createDataFrame(split_pairs, "p string, "
                                         "l string, c string")
        ranges = pairs_df.mapInPandas(
            scan, schema="p string, l string, start long, end long, "
                         "base long, n long")
        # materialize the index on the DRIVER (one ~100-byte row per
        # target_split_bytes of crawl) and hand each decode task
        # exactly ONE range: AQE would coalesce by the index rows'
        # BYTES, not the decode work each stands for (avro planner
        # note / memory r7)
        idx = [tuple(r) for r in ranges.collect()]

        def decode_ranges(batches):
            for pdf in batches:
                for sp, local, start, end, base, n in zip(
                        pdf["p"], pdf["l"], pdf["start"], pdf["end"],
                        pdf["base"], pdf["n"]):
                    with open(local, "rb") as f:
                        f.seek(int(start))
                        span = f.read(int(end) - int(start))
                    got = [0]

                    def counted(rows_iter, _got=got):
                        for row in rows_iter:
                            _got[0] += 1
                            yield (sp,) + row

                    yield from _chunked_frames(
                        counted(warc_iter_file(span, int(base),
                                               codec_hook)),
                        cols, chunk_records, chunk_bytes)
                    if got[0] != int(n):
                        raise WarcError(
                            f"range [{start},{end}) of {local} decoded "
                            f"{got[0]} records, CDX said {n} — partial "
                            "or stale sidecar")

        if idx:
            rdd = spark.sparkContext.parallelize(idx, len(idx))
            rdf = spark.createDataFrame(rdd, schema=ranges.schema)
            parts.append(rdf.mapInPandas(decode_ranges,
                                         schema=WARC_SCHEMA))

    whole = files
    if split_pairs:
        done = {sp for sp, _, _ in split_pairs}
        whole = files.filter(
            ~F.col("path").isin(*done) if done else F.lit(True))
    if not split_pairs or unsplit:
        def run(batches):
            for pdf in batches:
                for p, content in zip(pdf["path"], pdf["content"]):
                    if p.endswith((".cdx", ".cdx.gz")):
                        continue  # sidecar swept up by a wide pattern
                    yield from _chunked_frames(
                        ((p,) + row
                         for row in warc_iter_file(bytes(content),
                                                   codec_hook=codec_hook)),
                        cols, chunk_records, chunk_bytes)

        parts.append(whole.mapInPandas(run, schema=WARC_SCHEMA))

    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out


# --------------------------------------------------------------- builder
def warc_build(records, gzip_members: bool = False,
               with_cdx: bool = False):
    """Author a WARC file (the test-harness/gate half). Each record is
    a dict with warc_type, target_uri (optional), payload bytes, and
    optional http (status, content_type) to wrap the payload as an
    HTTP response. ``with_cdx=True`` additionally returns the matching
    CDXJ sidecar bytes (offset/length per record) for split-read
    fixtures."""
    out = bytearray()
    cdx_lines = []
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
        at = len(out)
        if gzip_members:
            c = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += c.compress(rec) + c.flush()
        else:
            out += rec
        cdx_lines.append(_cdxj_line(r.get("target_uri") or "",
                                    "20260101000000", at, len(out) - at))
    if with_cdx:
        return bytes(out), ("\n".join(cdx_lines) + "\n").encode()
    return bytes(out)


def warc_export(df: DataFrame, path: str,
                uri_col: str = "target_uri",
                payload_col: str = "payload",
                content_type_col: str | None = "content_type",
                status_col: str | None = "http_status",
                date_col: str | None = None,
                fixed_date: str = "2026-01-01T00:00:00Z",
                gzip_members: bool = True,
                with_cdx: bool = True,
                codec_hook=None,
                codec_ext: str = ".zst") -> int:
    """Write a DataFrame of pages back out as WARC response records —
    the re-shard half of the crawl pipeline (filter/dedup a crawl with
    the corpus operators, then land the survivors as a smaller crawl
    other WARC tooling can read). One ``part-<hex>.warc(.gz)`` per
    partition, record-at-time gzip members (the spec's splittable
    form), plus a matching ``.cdx`` CDXJ sidecar by default so the
    exported shards re-import record-granular through this module's
    own split reader (_find_cdx naming). Sidecar urlkeys are SURT
    form (``surt`` — what third-party CDX tooling sorts/merges on)
    and the JSON payload is json.dumps-built, so hostile URIs cannot
    break the sidecar. Records stream to the open shard handle as
    they are authored — task heap is O(record), not O(partition).

    ``codec_hook`` (a picklable bytes->bytes COMPRESSOR producing one
    frame per record) writes ``part-<hex>.warc<codec_ext>`` shards in
    record-at-time frames instead of gzip members — the write half of
    the zstd readiness story (the read half is warc_import's
    decompressor hook); because frames align with record starts, the
    sidecar's offsets remain valid split points. Overrides
    ``gzip_members`` when set.

    Determinism contract: WARC-Record-ID is ``<urn:md5:...>`` of
    uri+payload and WARC-Date comes from ``date_col`` (ISO strings)
    or the ``fixed_date`` param — never the wall clock, so a re-shard
    of the same inputs produces byte-identical RECORDS (file names are
    fresh per write; fixture/test/diff-friendly;
    pass the crawl's real dates via date_col). Returns rows written.
    NULL payloads are skipped (a failed fetch has no record).

    Task-commit protocol (ADVICE r10): shard and sidecar stream into
    hidden ``.…inprogress`` temps and are atomically renamed on close
    (sidecar first, so a visible .warc always has its .cdx) — a
    failed or killed task never leaves a truncated shard under a
    final name. Speculative execution must stay off (Spark's
    default): a completed speculative twin would commit a duplicate
    randomly-named shard — enforced at entry (raises WarcError when
    spark.speculation=true; ADVICE r11)."""
    from .tar import require_no_speculation

    require_no_speculation(df, WarcError, "warc_export")
    os.makedirs(path, exist_ok=True)
    cols = [uri_col, payload_col]
    opt = {}
    for role, c in (("ct", content_type_col), ("st", status_col),
                    ("dt", date_col)):
        if c is not None and c in df.columns:
            opt[role] = c
            cols.append(c)
    slim = df.select(*cols)

    def write(batches):
        import hashlib as _hashlib

        import pandas as pd

        # STREAMED writes (VERDICT r9 #1): each record goes straight
        # to the open shard handle (fh.tell() is the CDX offset) and
        # each sidecar line straight to the .cdx handle — task heap is
        # one record, never the whole compressed shard
        n = 0
        fh = cfh = None
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                d = dict(zip(pdf.columns, row))
                payload = d[payload_col]
                if payload is None:
                    continue
                payload = bytes(payload)
                uri = d.get(uri_col) or ""
                status = int(d.get(opt.get("st"), 200) or 200) \
                    if "st" in opt else 200
                ctype = (d.get(opt.get("ct")) or "text/html") \
                    if "ct" in opt else "text/html"
                date = (d.get(opt.get("dt")) or fixed_date) \
                    if "dt" in opt else fixed_date
                http = (f"HTTP/1.1 {status} X\r\n"
                        f"Content-Type: {ctype}\r\n"
                        f"Content-Length: {len(payload)}\r\n\r\n"
                        ).encode("latin1") + payload
                rid = _hashlib.md5(
                    uri.encode("utf-8", "surrogateescape") + b"\x00"
                    + payload).hexdigest()
                hdrs = [b"WARC/1.0",
                        b"WARC-Type: response",
                        b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
                        b"WARC-Date: " + str(date).encode("latin1"),
                        b"WARC-Target-URI: "
                        + uri.encode("utf-8", "surrogateescape"),
                        b"Content-Type: application/http; "
                        b"msgtype=response",
                        b"Content-Length: %d" % len(http)]
                rec = (b"\r\n".join(hdrs) + b"\r\n\r\n" + http
                       + b"\r\n\r\n")
                if fh is None:
                    if codec_hook is not None:
                        suffix = ".warc" + codec_ext
                    elif gzip_members:
                        suffix = ".warc.gz"
                    else:
                        suffix = ".warc"
                    fname = "part-" + os.urandom(8).hex() + suffix
                    final = os.path.join(path, fname)
                    # rename-on-close task commit (ADVICE r10): stream
                    # into a hidden .inprogress temp; os.replace is
                    # atomic on one filesystem, so a failed/retried
                    # task never leaves a truncated shard visible to
                    # readers (Spark's file listing skips dot-prefixed
                    # names). Speculation must stay off (the Spark
                    # default) — a completed speculative twin would
                    # commit a duplicate randomly-named shard.
                    fh = open(os.path.join(
                        path, "." + fname + ".inprogress"), "wb")
                    if with_cdx:
                        # sidecar named <stem>.cdx with the bare .warc
                        # stem — exactly what _find_cdx tries first
                        # after stripping the compression extension
                        cdx_final = final[:-len(suffix)] + ".cdx"
                        # explicit utf-8: surt() leaves non-ASCII URI
                        # bytes in the urlkey, and a C-locale executor
                        # would raise UnicodeEncodeError on the write
                        # (ADVICE r10)
                        cfh = open(os.path.join(
                            path,
                            "." + os.path.basename(cdx_final)
                            + ".inprogress"), "w", encoding="utf-8")
                at = fh.tell()
                if codec_hook is not None:
                    fh.write(codec_hook(rec))
                elif gzip_members:
                    c = zlib.compressobj(6, zlib.DEFLATED, 31)
                    fh.write(c.compress(rec) + c.flush())
                else:
                    fh.write(rec)
                if cfh is not None:
                    cfh.write(_cdxj_line(uri, _cdx_timestamp(date),
                                         at, fh.tell() - at) + "\n")
                n += 1
        # commit order: sidecar first, shard second — whenever the
        # .warc is visible its .cdx is too, so the split reader never
        # races a half-committed pair (an orphan .cdx is inert)
        if cfh is not None:
            cfh.close()
            os.replace(cfh.name, cdx_final)
        if fh is not None:
            fh.close()
            os.replace(fh.name, final)
        yield pd.DataFrame({"n": [n]})

    import pandas as pd  # noqa: F401  (schema hint for linters)
    counts = slim.mapInPandas(write, schema="n long").collect()
    return sum(r["n"] for r in counts)
