"""TAR / WebDataset source — the multimodal training-shard container.

Large multimodal training corpora ship as directories of ``.tar`` /
``.tar.gz`` shards in the WebDataset layout: each *sample* is a group
of adjacent members sharing a basename up to the first dot
(``dir/abc123.jpg`` + ``dir/abc123.txt`` + ``dir/abc123.json`` →
sample ``dir/abc123`` with parts ``jpg``/``txt``/``json``). The shard
is the unit of parallelism — exactly Spark's binaryFile granularity —
so the source maps one task per shard and streams members out in
bounded Arrow batches, the sources/warc.py memory contract.

``tar_import`` emits one row per regular-file member (directories,
links and PAX metadata entries are consumed by the stdlib reader and
never surface); ``webdataset_group`` folds members into one row per
sample with an ``ext → payload`` map, last-wins on duplicate
extensions by archive order (a malformed shard must not abort a
100 TB read). Parsing is stdlib ``tarfile`` in stream mode (``r|*``):
POSIX ustar, GNU long-name, and PAX extended headers all land here,
and gzip/bzip2/xz compression is sniffed per shard; the decompressed
stream is never materialized whole.

``tar_build`` hand-authors spec bytes (ustar header layout from IEEE
1003.1: 512-byte blocks, octal size/mtime, space-seeded checksum) so
gates and tests cross-check the hand-rolled writer against the stdlib
reader — the same foreign-pair discipline as the WARC/Avro fixtures.

Reference scope note: the reference engine has no tar container
(its import surface is csvimport + zip chains,
/root/reference/accelerator/standard_methods/a_csvimport_zip.py); this
source is part of the LLM-pipeline extension surface (brief §extras:
multimodal columns need their native shard format).
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TarError(ValueError):
    """Malformed or unsupported-by-scope tar input."""


TAR_SCHEMA = T.StructType([
    T.StructField("path", T.StringType()),        # source shard
    T.StructField("member_idx", T.LongType()),    # archive order, 0-based
    T.StructField("member", T.StringType()),      # full member name
    T.StructField("sample_key", T.StringType()),  # wds key (see wds_key_ext)
    T.StructField("ext", T.StringType()),         # wds extension ("" if none)
    T.StructField("payload", T.BinaryType()),
    T.StructField("size", T.LongType()),
    T.StructField("mtime", T.LongType()),         # epoch seconds
])


def wds_key_ext(name: str) -> tuple[str, str]:
    """WebDataset sample key + extension for a member name: the
    basename splits at its FIRST dot (directories stay in the key, the
    extension keeps any further dots: ``d/a.seg.json`` → (``d/a``,
    ``seg.json``)). A leading ``./`` is archive noise, not identity —
    GNU tar writes it, the key must not keep it. No dot → ext ''."""
    if name.startswith("./"):
        name = name[2:]
    slash = name.rfind("/")
    base = name[slash + 1:]
    dot = base.find(".")
    if dot < 0:
        return name, ""
    return name[:slash + 1] + base[:dot], base[dot + 1:]


def tar_iter_members(data: bytes):
    """Yield ``(idx, name, payload, size, mtime)`` for each REGULAR
    file member of a (possibly gzip/bzip2/xz-compressed) tar, in
    archive order, streaming: stream mode (``r|*``) decompresses
    incrementally, so peak heap is one member, never the decompressed
    shard. Directories, sym/hard links, devices and FIFOs carry no
    sample payload and are skipped (links deliberately — following
    them would need random access and can alias data outside the
    sample; WebDataset writers emit regular files only). idx counts
    regular files, matching the row numbering the schema promises."""
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r|*")
    except tarfile.TarError as e:
        raise TarError(f"not a tar stream: {e}") from e
    idx = 0
    try:
        with tf:
            for info in tf:
                if not info.isreg():
                    continue
                fh = tf.extractfile(info)
                payload = fh.read() if fh is not None else b""
                if len(payload) != info.size:
                    raise TarError(
                        f"member {info.name!r}: payload truncated at "
                        f"{len(payload)} of {info.size} bytes")
                yield idx, info.name, payload, info.size, int(info.mtime)
                idx += 1
    except tarfile.TarError as e:
        raise TarError(f"corrupt tar stream: {e}") from e


def tar_decode_file(path: str, data: bytes,
                    chunk_records: int = 1024,
                    chunk_bytes: int = 64 << 20):
    """Generator of row-lists for one shard, cut every
    ``chunk_records`` members or ``chunk_bytes`` of payload —
    the Arrow-batch memory bound (one oversized member still forms
    its own batch; the bound is per-batch overhead, not a splitter)."""
    out, nbytes = [], 0
    for idx, name, payload, size, mtime in tar_iter_members(data):
        key, ext = wds_key_ext(name)
        out.append((path, idx, name, key, ext, payload, size, mtime))
        nbytes += size
        if len(out) >= chunk_records or nbytes >= chunk_bytes:
            yield out
            out, nbytes = [], 0
    if out:
        yield out


def tar_import(spark: SparkSession, path: str,
               pattern: str = "*.tar*",
               chunk_records: int = 1024,
               chunk_bytes: int = 64 << 20) -> DataFrame:
    """Read a directory of tar/WebDataset shards distributed: one task
    per shard (binaryFile — shards are sized for this, typically
    100 MB-1 GB), rows leave in bounded Arrow batches. Feed the result
    to ``webdataset_group`` for sample rows, or filter ``ext`` and
    route payloads to the multimodal probes/decoders directly."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))
    cols = [f.name for f in TAR_SCHEMA.fields]

    def run(batches):
        import pandas as pd
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for rows in tar_decode_file(
                        p, bytes(content), chunk_records, chunk_bytes):
                    yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=TAR_SCHEMA)


def webdataset_group(members: DataFrame) -> DataFrame:
    """Fold ``tar_import`` rows into one row per (path, sample_key)
    WebDataset sample: ``parts`` maps ext → payload (duplicate ext
    within a sample: LAST archive occurrence wins — deterministic and
    tolerant of malformed shards), plus part count/size and the key's
    first member position for order recovery. All JVM-side: one
    shuffle on the sample key, ``max_by`` picks the winner without a
    window pass."""
    per_ext = (members
               .groupBy("path", "sample_key", "ext")
               .agg(F.expr("max_by(payload, member_idx)").alias("payload"),
                    F.max("member_idx").alias("_last_idx"),
                    F.min("member_idx").alias("_first_idx"),
                    F.sum("size").alias("_size")))
    return (per_ext
            .groupBy("path", "sample_key")
            .agg(F.map_from_entries(
                     F.sort_array(F.collect_list(
                         F.struct("ext", "payload")))).alias("parts"),
                 F.count(F.lit(1)).alias("n_parts"),
                 F.sum("_size").alias("total_bytes"),
                 F.min("_first_idx").alias("first_member_idx")))


def _octal(n: int, width: int) -> bytes:
    """Octal field: NUL-terminated, zero-padded — the ustar layout."""
    if n < 0 or n >= 8 ** (width - 1):
        raise TarError(f"field value {n} exceeds {width}-byte octal")
    return b"%0*o\0" % (width - 1, n)


def tar_build(members, mtime: int = 0, gzip_compress: bool = False,
              mtime_step: int = 0) -> bytes:
    """Hand-author a POSIX ustar archive from ``(name, payload)``
    pairs — spec bytes (IEEE 1003.1 ustar header: 100-byte name,
    octal size/mtime, checksum over a space-seeded header, magic
    ``ustar\\0 00``), NOT stdlib tarfile, so reading it back with the
    stdlib-based ``tar_iter_members`` is a genuine writer/reader
    cross-check. Names longer than 100 bytes use the ustar prefix
    field (suffices for fixtures; no GNU/PAX long-name writing)."""
    import gzip as _gzip

    blocks = []
    for i, (name, payload) in enumerate(members):
        nb = name.encode("utf-8")
        prefix = b""
        if len(nb) > 100:
            cut = nb.rfind(b"/", 0, 156)
            if cut <= 0 or len(nb) - cut - 1 > 100:
                raise TarError(f"name too long for ustar: {name!r}")
            prefix, nb = nb[:cut], nb[cut + 1:]
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb                       # name
        hdr[100:108] = _octal(0o644, 8)           # mode
        hdr[108:116] = _octal(0, 8)               # uid
        hdr[116:124] = _octal(0, 8)               # gid
        hdr[124:136] = _octal(len(payload), 12)   # size
        hdr[136:148] = _octal(mtime + i * mtime_step, 12)
        hdr[148:156] = b" " * 8                   # chksum seed
        hdr[156] = 0x30                           # typeflag '0' regular
        hdr[257:263] = b"ustar\0"                 # magic
        hdr[263:265] = b"00"                      # version
        hdr[345:345 + len(prefix)] = prefix
        hdr[148:156] = b"%06o\0 " % sum(hdr)
        blocks.append(bytes(hdr))
        blocks.append(payload)
        pad = -len(payload) % 512
        blocks.append(b"\0" * pad)
    blocks.append(b"\0" * 1024)                   # end-of-archive
    raw = b"".join(blocks)
    if gzip_compress:
        return _gzip.compress(raw, mtime=0)
    return raw
