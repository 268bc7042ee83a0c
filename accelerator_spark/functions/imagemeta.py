"""Pure-stdlib image metadata probe — dimensions/format WITHOUT decode.

At 100 TB, most image-corpus planning questions (what format? what
dims? animated? rotated?) should not pay a single pixel of decode:
filtering a scrape to "images between 64px and 8192px, not animated"
via the real decoders would burn executor-months on pixels nobody
looks at. ``image_probe`` answers them from headers alone:

- PNG: IHDR fields (spec §11.2.2) — O(33 bytes).
- GIF: logical screen descriptor + a block-structure walk that SKIPS
  the LZW payloads via their length prefixes, so frame counting is
  O(file/255) pointer hops, not O(pixels) decompression.
- JPEG: marker-segment walk to the SOF header (dims, channels,
  progressive flag) and the APP1 EXIF orientation — stops at SOS,
  never touching entropy data.
- WebP (RIFF): VP8 lossy key-frame dims (start code 9d 01 2a), VP8L
  lossless 14-bit packed dims, VP8X extended canvas (24-bit) with
  alpha/animation flags and an ANMF frame count — the one common
  scraped-image format whose DECODE is genuinely out of stdlib reach;
  the probe keeps it plannable anyway.
- TIFF: baseline 6.0 IFD walk — dims/depth/orientation tags, linked
  IFDs counted as pages (multi-page scans).
- BMP: BITMAPINFOHEADER dims.

Golden fixtures: PNG/GIF/JPEG probe results are cross-checked against
the real decoders' output in tests (two independent code paths);
WebP/BMP against hand-derived spec bytes (no foreign reader in this
container — the mp4-golden pattern).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .jpeg import _exif_orientation


class ImageMetaError(ValueError):
    """Malformed or unsupported-by-scope image header."""


@dataclass(frozen=True)
class ImageMeta:
    format: str          # png / gif / jpeg / webp / bmp
    width: int
    height: int
    bit_depth: int       # bits per sample (0 = not stated by header)
    channels: int        # 0 = not stated by header (webp/bmp variants)
    n_frames: int        # GIF image blocks / WebP ANMF chunks, else 1
    progressive: bool    # JPEG SOF2 / PNG interlace / GIF interlace
    orientation: int     # JPEG EXIF 1..8; 1 elsewhere
    has_alpha: bool


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> (channels, has_alpha)
_PNG_COLOR = {0: (1, False), 2: (3, False), 3: (1, False),
              4: (2, True), 6: (4, True)}


def _probe_png(data: bytes) -> ImageMeta:
    if len(data) < 33 or data[12:16] != b"IHDR":
        raise ImageMetaError("truncated PNG IHDR")
    w, h = struct.unpack(">II", data[16:24])
    # the spec caps dims at 2^31-1; a crafted header past that must
    # raise (contained by on_error='null') — a huge int sailing through
    # would abort the whole Arrow batch at serialization time, outside
    # the per-row containment (review r8)
    if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
        raise ImageMetaError(f"invalid PNG dimensions {w}x{h}")
    depth, color, _comp, _filt, interlace = data[24:29]
    if color not in _PNG_COLOR:
        raise ImageMetaError(f"bad PNG color type {color}")
    ch, alpha = _PNG_COLOR[color]
    return ImageMeta("png", w, h, depth, ch, 1, interlace == 1, 1, alpha)


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise ImageMetaError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _probe_gif(data: bytes) -> ImageMeta:
    if len(data) < 13:
        raise ImageMetaError("truncated GIF header")
    w, h, packed = struct.unpack("<HHB", data[6:11])
    # bits 4-6 are the logical-screen "color resolution" (bits per
    # primary); bits 0-2 size the GLOBAL COLOR TABLE and only govern
    # how many palette bytes to skip below (ADVICE r8: the two differ
    # on real headers — GCT size is not a depth)
    depth = ((packed >> 4) & 0x07) + 1
    pos = 13
    if packed & 0x80:                       # global color table
        pos += 3 * (2 << (packed & 0x07))
    n_frames = 0
    interlaced = False
    saw_trailer = False
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:                       # trailer
            saw_trailer = True
            break
        if b == 0x21:                       # extension: label + blocks
            if pos >= len(data):
                raise ImageMetaError("truncated GIF extension")
            pos = _skip_subblocks(data, pos + 1)
        elif b == 0x2C:                     # image descriptor
            if pos + 9 > len(data):
                raise ImageMetaError("truncated GIF image descriptor")
            fpacked = data[pos + 8]
            if fpacked & 0x40:
                interlaced = True
            pos += 9
            if fpacked & 0x80:              # local color table
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1                        # LZW minimum code size
            pos = _skip_subblocks(data, pos)
            n_frames += 1
        else:
            raise ImageMetaError(f"bad GIF block 0x{b:02x}")
    if not saw_trailer:
        # a partial download cut at a block boundary must probe as
        # corrupt, not silently report fewer frames (review r8)
        raise ImageMetaError("truncated GIF (no trailer)")
    return ImageMeta("gif", w, h, depth, 3, n_frames, interlaced, 1,
                     False)


def _probe_jpeg(data: bytes) -> ImageMeta:
    pos = 2
    orientation = 1
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise ImageMetaError(f"expected JPEG marker at {pos}")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            continue
        if pos + 2 > len(data):
            raise ImageMetaError("truncated JPEG segment header")
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ImageMetaError("truncated JPEG segment")
        seg = data[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            orientation = _exif_orientation(seg[6:]) or orientation
        elif marker in (0xC0, 0xC1, 0xC2) or (
                0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                          0xCC)):
            if len(seg) < 6:
                raise ImageMetaError("truncated SOF")
            depth = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            # progressive DCT frames: Huffman (C2), differential (C6),
            # arithmetic (CA), differential arithmetic (CE) — SOF2
            # alone misses the arithmetic/differential variants
            # (review r8)
            return ImageMeta("jpeg", w, h, depth, ncomp, 1,
                             marker in (0xC2, 0xC6, 0xCA, 0xCE),
                             orientation, False)
        elif marker == 0xDA:
            break   # scans start; SOF should have come first
    raise ImageMetaError("no SOF header in JPEG stream")


def _probe_webp(data: bytes) -> ImageMeta:
    if len(data) < 20:
        raise ImageMetaError("truncated WebP")
    pos = 12
    width = height = 0
    alpha = False
    n_frames = 1
    fmt_seen = False
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = pos + 8
        if body + size > len(data):
            raise ImageMetaError(f"WebP chunk {fourcc!r} overruns file")
        if fourcc == b"VP8X":
            if size < 10:
                raise ImageMetaError("truncated VP8X")
            flags = data[body]
            alpha = bool(flags & 0x10)
            if flags & 0x02:                # animation
                n_frames = 0                # counted from ANMF below
            width = int.from_bytes(data[body + 4:body + 7],
                                   "little") + 1
            height = int.from_bytes(data[body + 7:body + 10],
                                    "little") + 1
            fmt_seen = True
        elif fourcc == b"ANMF":
            n_frames += 1
        elif fourcc == b"VP8 " and not fmt_seen:
            # lossy key frame: 3-byte frame tag, start code 9d 01 2a,
            # then 14-bit dims (VP8 spec §9.1)
            if size < 10 or data[body + 3:body + 6] != b"\x9d\x01\x2a":
                raise ImageMetaError("bad VP8 key frame header")
            w16, h16 = struct.unpack("<HH", data[body + 6:body + 10])
            width, height = w16 & 0x3FFF, h16 & 0x3FFF
            fmt_seen = True
        elif fourcc == b"VP8L" and not fmt_seen:
            # lossless: 1-byte signature 0x2F, then 28 bits of
            # (w-1, h-1) 14 bits each, LSB-first
            if size < 5 or data[body] != 0x2F:
                raise ImageMetaError("bad VP8L signature")
            bits = int.from_bytes(data[body + 1:body + 5], "little")
            width = (bits & 0x3FFF) + 1
            height = ((bits >> 14) & 0x3FFF) + 1
            alpha = alpha or bool((bits >> 28) & 1)
            fmt_seen = True
        pos = body + size + (size & 1)      # RIFF pads odd sizes
    if not fmt_seen:
        raise ImageMetaError("no VP8/VP8L/VP8X chunk in WebP")
    return ImageMeta("webp", width, height, 8, 0, max(n_frames, 1),
                     False, 1, alpha)


def _probe_tiff(data: bytes) -> ImageMeta:
    """Baseline TIFF 6.0 IFD walk: dims (tags 256/257), bit depth
    (258), samples/pixel (277), orientation (274); every linked IFD is
    one page (n_frames). Values are read only when inline (count 1,
    SHORT/LONG) — offset-stored arrays (e.g. per-channel
    BitsPerSample) fall back to the first inline-representable case or
    0, which keeps the probe O(header)."""
    if len(data) < 8:
        # a <8-byte blob must raise ImageMetaError, not struct.error
        # from the short magic/offset slices (fuzz round 10)
        raise ImageMetaError("truncated TIFF header")
    e = "<" if data[:2] == b"II" else ">"
    if struct.unpack(e + "H", data[2:4])[0] != 42:
        raise ImageMetaError("bad TIFF magic number")
    off = struct.unpack(e + "I", data[4:8])[0]
    w = h = depth = 0
    spp = orientation = 1
    n_ifds = 0
    first = True
    while off:
        n_ifds += 1
        if n_ifds > 4096:
            raise ImageMetaError("TIFF IFD chain budget exceeded")
        if off + 2 > len(data):
            raise ImageMetaError("truncated TIFF IFD")
        n = struct.unpack(e + "H", data[off:off + 2])[0]
        end = off + 2 + 12 * n
        if end + 4 > len(data):
            raise ImageMetaError("truncated TIFF IFD entries")
        if first:
            for i in range(n):
                ent = off + 2 + 12 * i
                tag, typ, cnt = struct.unpack(
                    e + "HHI", data[ent:ent + 8])
                if cnt != 1 or typ not in (3, 4):
                    continue
                val = struct.unpack(
                    e + ("H" if typ == 3 else "I"),
                    data[ent + 8:ent + 8 + (2 if typ == 3 else 4)])[0]
                if tag == 256:
                    w = val
                elif tag == 257:
                    h = val
                elif tag == 258:
                    depth = val
                elif tag == 277:
                    spp = val
                elif tag == 274 and 1 <= val <= 8:
                    orientation = val
            first = False
        off = struct.unpack(e + "I", data[end:end + 4])[0]
    if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
        raise ImageMetaError(f"invalid TIFF dimensions {w}x{h}")
    return ImageMeta("tiff", w, h, depth, spp, n_ifds, False,
                     orientation, spp == 4)


def _probe_bmp(data: bytes) -> ImageMeta:
    if len(data) < 26:
        raise ImageMetaError("truncated BMP header")
    hdr_size = struct.unpack("<I", data[14:18])[0]
    if hdr_size >= 40:                       # BITMAPINFOHEADER family
        w, h = struct.unpack("<ii", data[18:26])
        if len(data) < 30:
            raise ImageMetaError("truncated BMP info header")
        depth = struct.unpack("<H", data[28:30])[0]
    elif hdr_size == 12:                     # BITMAPCOREHEADER
        w, h = struct.unpack("<HH", data[18:22])
        depth = struct.unpack("<H", data[24:26])[0]
    else:
        raise ImageMetaError(f"unknown BMP header size {hdr_size}")
    # negative HEIGHT is legal (top-down rows); negative or zero WIDTH
    # is not — surface it as corrupt instead of a nonsense dimension
    # (review r8)
    if w <= 0 or h == 0:
        raise ImageMetaError(f"invalid BMP dimensions {w}x{h}")
    return ImageMeta("bmp", w, abs(h), depth, 0, 1, False, 1, False)


def image_probe(data: bytes) -> ImageMeta:
    """Sniff the format by magic bytes and parse ONLY headers. Raises
    ImageMetaError for unknown/corrupt headers — route those rows
    through on_error='null' containment on dirty corpora."""
    data = bytes(data) if data else b""
    if data[:8] == _PNG_SIG:
        return _probe_png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return _probe_gif(data)
    if data[:3] == b"\xff\xd8\xff":
        return _probe_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _probe_webp(data)
    if data[:4] in (b"II*\x00", b"MM\x00*"):
        return _probe_tiff(data)
    if data[:2] == b"BM":
        return _probe_bmp(data)
    raise ImageMetaError(
        "unrecognized image magic (png/gif/jpeg/webp/tiff/bmp)")


# --------------------------------------------------------------- builders
# WebP/BMP test-harness halves (PNG/GIF/JPEG fixtures come from the
# real encoders in functions/png.py etc.).

def webp_build_lossy(width: int, height: int) -> bytes:
    """Metadata-only VP8 (lossy) WebP: RIFF + VP8 chunk holding just
    the key-frame header — dims are real, pixels absent."""
    if not (1 <= width <= 0x3FFF and 1 <= height <= 0x3FFF):
        raise ImageMetaError("VP8 dims must fit 14 bits")
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" \
        + struct.pack("<HH", width, height)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_build_lossless(width: int, height: int,
                        alpha: bool = False) -> bytes:
    if not (1 <= width <= 0x4000 and 1 <= height <= 0x4000):
        raise ImageMetaError("VP8L dims must fit 14 bits")
    bits = (width - 1) | ((height - 1) << 14) | (int(alpha) << 28)
    body = b"\x2f" + bits.to_bytes(4, "little")
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_build_extended(width: int, height: int, n_frames: int = 0,
                        alpha: bool = False) -> bytes:
    """VP8X container: canvas dims + optional ANMF animation frames
    (empty frame chunks — the probe reads counts, not pixels)."""
    if not (1 <= width <= 1 << 24 and 1 <= height <= 1 << 24):
        raise ImageMetaError("VP8X dims must fit 24 bits")
    flags = (0x10 if alpha else 0) | (0x02 if n_frames else 0)
    body = (bytes([flags]) + b"\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little"))
    chunks = b"VP8X" + struct.pack("<I", len(body)) + body
    for _ in range(n_frames):
        frame = b"\x00" * 16
        chunks += b"ANMF" + struct.pack("<I", len(frame)) + frame
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" \
        + chunks


def tiff_build(width: int, height: int, depth: int = 8,
               n_pages: int = 1, orientation: int = 1,
               byte_order: str = "II") -> bytes:
    """Header-only baseline TIFF: ``n_pages`` linked IFDs, the first
    carrying dims/depth/orientation tags (SHORT/LONG inline values)."""
    e = "<" if byte_order == "II" else ">"
    if n_pages < 1:
        raise ImageMetaError("n_pages must be >= 1")
    out = bytearray(byte_order.encode() + struct.pack(e + "H", 42)
                    + struct.pack(e + "I", 8))

    def entry(tag, typ, val):
        v = struct.pack(e + ("H" if typ == 3 else "I"), val)
        return struct.pack(e + "HHI", tag, typ, 1) + v.ljust(4, b"\x00")

    for p in range(n_pages):
        tags = ([entry(256, 4, width), entry(257, 4, height),
                 entry(258, 3, depth), entry(274, 3, orientation)]
                if p == 0 else [entry(256, 4, width),
                                entry(257, 4, height)])
        ifd = struct.pack(e + "H", len(tags)) + b"".join(tags)
        next_off = len(out) + len(ifd) + 4 if p < n_pages - 1 else 0
        out += ifd + struct.pack(e + "I", next_off)
    return bytes(out)


def bmp_build(width: int, height: int, depth: int = 24) -> bytes:
    """Header-only BMP (BITMAPINFOHEADER)."""
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, depth,
                       0, 0, 2835, 2835, 0, 0)
    return (b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 54) + info)
