"""Pure-stdlib GIF codec (LZW + GIF87a/89a framing).

The third real media codec beside functions/png.py and wav.py: GIF's
compression is LZW — pure bit-twiddling, no external libs — so both
decode and encode are implementable exactly. Multi-frame (animated)
GIFs decode to a frame LIST, which makes the multimodal
frame-sampling path REAL for an actual animation format:
operators/multimodal.extract_frames turns one animated GIF into
per-frame PNG rows.

Scope: GIF87a + GIF89a, global and local color tables, interlaced
frames, transparency index, frame delays, 2-12 bit LZW with code
growth and CLEAR/EOI handling. Frames are returned as palette indices
plus their palette (composition/disposal between frames is NOT
applied — each frame is the raw region the file stores, with x/y
offsets exposed; callers doing playback compositing can apply
disposal). Cross-checked against Java ImageIO (Spark's ``image``
source) on single-frame files in tests/test_gif.py.
"""

from __future__ import annotations

import struct
from typing import NamedTuple


class GifError(ValueError):
    """Malformed or unsupported-by-scope GIF input."""


class GifFrame(NamedTuple):
    x: int
    y: int
    width: int
    height: int
    indices: bytes          # palette indices, row-major, deinterlaced
    palette: bytes          # RGB triples effective for THIS frame
    delay_cs: int           # centiseconds (0 for still images)
    transparent: int | None
    disposal: int = 0       # 0/1 keep, 2 restore background, 3 previous


class GifImage(NamedTuple):
    width: int              # logical screen
    height: int
    frames: tuple           # of GifFrame
    bg_rgb: tuple = (0, 0, 0)   # background color (compositing base)


def _lzw_decode(min_code_size: int, data: bytes, expect: int) -> bytes:
    """GIF-flavor LZW: variable code width, CLEAR resets, EOI ends.
    Output is a compact bytes buffer bounded at ``expect`` pixels
    (decompression-bomb guard: stops as soon as the frame is full —
    also tolerates real-world streams that omit the trailing EOI)."""
    if not 2 <= min_code_size <= 11:
        raise GifError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    # bit reader, LSB-first
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width):
        nonlocal bitpos
        if bitpos + width > nbits:
            raise GifError("LZW stream truncated")
        byte_i, bit_i = bitpos >> 3, bitpos & 7
        val = data[byte_i] >> bit_i
        got = 8 - bit_i
        while got < width:
            byte_i += 1
            val |= data[byte_i] << got
            got += 8
        bitpos += width
        return val & ((1 << width) - 1)

    table: list = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset_table():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset_table()
    while len(out) < expect:
        code = read_code(width)
        if code == clear:
            reset_table()
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # table freezes at 12 bits
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError(f"LZW: code {code} beyond table")
        out.extend(entry)
        prev = entry
        # standard GIF ("late") change, empirically matched against
        # Java ImageIO: the code value 2^width is the first needing
        # width+1 bits; with the decoder's table one entry behind the
        # encoder's, that lands exactly at len(table) == 2^width
        if len(table) == (1 << width) and width < 12:
            width += 1
    return bytes(out[:expect])


def _lzw_encode(min_code_size: int, indices) -> bytes:
    """Real LZW encode (dictionary-building, code growth, 12-bit cap
    with CLEAR reset) — the forward transform, independent of decode."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code, width):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple = ()
    for idx in indices:
        idx = int(idx)
        if not 0 <= idx < clear:
            raise GifError(f"index {idx} out of range for code size")
        cand = run + (idx,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # standard late change, one assign AFTER the table fills
            # the width (mirrors the decoder's len == 2^width rule
            # across its one-entry lag)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = (idx,)
    if run:
        emit(table[run], width)
        # virtual assign: the decoder appends an entry on its final
        # data read too, and that append can grow ITS width before the
        # EOI read — mirror it or the EOI is emitted one bit narrow
        if next_code < 4096:
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
    emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _interlace_order(h: int) -> list:
    """GIF 4-pass interlace row order (SHARED by encode and decode —
    two copies of this expression could silently desynchronize)."""
    return (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))


def _deinterlace(rows: list) -> list:
    """Rows stored pass-major -> display order."""
    out = [None] * len(rows)
    for stored, display in enumerate(_interlace_order(len(rows))):
        out[display] = rows[stored]
    return out


def gif_decode(data: bytes, max_frames: int = 10_000,
               max_pixels: int = 1 << 26,
               first_frame_only: bool = False) -> GifImage:
    """Decode a GIF byte string (scope in module docstring).

    ``max_pixels`` caps DECLARED dimensions (screen and per frame) —
    the LZW guard bounds output to the descriptor's fw*fh, so a tiny
    crafted file declaring a 65535x65535 frame must fail fast instead
    of allocating gigabytes. ``first_frame_only`` stops after frame 0
    (the feature-extraction hot path doesn't pay for a 500-frame
    animation it won't read)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF: bad signature")
    if len(data) < 13:
        raise GifError("truncated header")
    width, height, flags, bg_index, _ar = struct.unpack("<HHBBB", data[6:13])
    if width * height > max_pixels:
        raise GifError(f"screen {width}x{height} exceeds max_pixels")
    pos = 13
    global_pal = b""
    if flags & 0x80:
        n = 2 << (flags & 7)
        global_pal = data[pos:pos + 3 * n]
        if len(global_pal) != 3 * n:
            raise GifError("truncated global color table")
        pos += 3 * n

    frames = []
    transparent: int | None = None
    delay_cs = 0
    disposal = 0
    while pos < len(data):
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            blocks = []
            while True:
                if pos >= len(data):
                    raise GifError("truncated extension blocks")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                blocks.append(data[pos:pos + n])
                pos += n
            if label == 0xF9 and blocks:  # graphic control
                gflags, delay, tidx = struct.unpack(
                    "<BHB", blocks[0][:4].ljust(4, b"\x00"))
                delay_cs = delay
                transparent = tidx if gflags & 1 else None
                disposal = (gflags >> 2) & 7
            continue
        if b == 0x2C:  # image descriptor
            if len(frames) >= max_frames:
                raise GifError(f"more than {max_frames} frames")
            if pos + 9 > len(data):
                raise GifError("truncated image descriptor")
            x, y, fw, fh, fflags = struct.unpack("<HHHHB", data[pos:pos + 9])
            pos += 9
            pal = global_pal
            if fflags & 0x80:
                n = 2 << (fflags & 7)
                pal = data[pos:pos + 3 * n]
                if len(pal) != 3 * n:
                    raise GifError("truncated local color table")
                pos += 3 * n
            if not pal:
                raise GifError("frame without any color table")
            if fw == 0 or fh == 0:
                raise GifError("zero-dimension frame")
            if fw * fh > max_pixels:
                raise GifError(f"frame {fw}x{fh} exceeds max_pixels")
            if pos >= len(data):
                raise GifError("truncated LZW header")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(data):
                    raise GifError("truncated image data")
                n = data[pos]
                pos += 1
                if n == 0:
                    break
                lzw.extend(data[pos:pos + n])
                pos += n
            idx = _lzw_decode(min_code, bytes(lzw), fw * fh)
            if len(idx) < fw * fh:
                raise GifError(
                    f"frame data short: {len(idx)} < {fw * fh} pixels")
            n_colors = len(pal) // 3
            if idx and max(idx) >= n_colors:
                raise GifError("palette index out of range")
            if fflags & 0x40:  # interlaced
                rows = [idx[r * fw:(r + 1) * fw] for r in range(fh)]
                idx = b"".join(_deinterlace(rows))
            frames.append(GifFrame(x, y, fw, fh, idx, pal,
                                   delay_cs, transparent, disposal))
            transparent, delay_cs, disposal = None, 0, 0
            if first_frame_only:
                break
            continue
        raise GifError(f"unknown block 0x{b:02x}")
    if not frames:
        raise GifError("no frames")
    bg = (0, 0, 0)
    if global_pal and bg_index < len(global_pal) // 3:
        bg = tuple(global_pal[3 * bg_index:3 * bg_index + 3])
    return GifImage(width, height, tuple(frames), bg)


def gif_encode(frames, width: int, height: int, palette: bytes,
               delays_cs=None, interlace: bool = False) -> bytes:
    """Encode full-canvas frames (lists of palette indices) into a
    GIF89a. ``palette`` is RGB triples (length a power of two x 3,
    2..256 entries). Animation when len(frames) > 1."""
    n_colors = len(palette) // 3
    if len(palette) % 3 or n_colors < 2 or n_colors > 256 or (
            n_colors & (n_colors - 1)):
        raise GifError("palette must be 2^k RGB entries, 2..256")
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise GifError(f"invalid dimensions {width}x{height}")
    if delays_cs is not None:
        if len(delays_cs) < len(frames):
            raise GifError(
                f"{len(delays_cs)} delays for {len(frames)} frames")
        if any(not 0 <= d <= 0xFFFF for d in delays_cs):
            raise GifError("delay out of the u16 centisecond range")
    pal_bits = n_colors.bit_length() - 1  # log2 (power of two checked)
    out = bytearray(b"GIF89a")
    # size field encodes the color-table size: 2 << field == n_colors
    out.extend(struct.pack("<HHBBB", width, height,
                           0x80 | (pal_bits - 1), 0, 0))
    out.extend(palette)
    if len(frames) > 1:
        # NETSCAPE loop extension (loop forever) — what animation
        # consumers expect; harmless for single frame
        out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    for i, idx in enumerate(frames):
        if len(idx) != width * height:
            raise GifError(f"frame {i}: expected {width * height} indices")
        if idx and (min(idx) < 0 or max(idx) >= n_colors):
            raise GifError(f"frame {i}: index out of palette range")
        delay = (delays_cs[i] if delays_cs else 0)
        out.extend(struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay, 0, 0))
        out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                               0x40 if interlace else 0))
        if interlace:
            rows = [idx[r * width:(r + 1) * width] for r in range(height)]
            idx = [p for r in _interlace_order(height) for p in rows[r]]
        min_code = max(2, pal_bits)  # LZW needs >= 2 even for 2 colors
        out.append(min_code)
        lzw = _lzw_encode(min_code, idx)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off:off + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def frame_rgb(frame: GifFrame) -> tuple:
    """Palette-map one frame to flat RGB samples (transparent pixels
    stay their palette color — compositing is the caller's concern)."""
    pal = frame.palette
    out = []
    for i in frame.indices:
        out.extend(pal[3 * i:3 * i + 3])
    return tuple(out)


def compose_frames(img: GifImage):
    """Yield each frame COMPOSED onto the logical screen, honoring
    frame x/y offsets, transparency, and disposal codes (review r6:
    optimized real-world GIFs store delta rectangles — the raw region
    alone looks nothing like the displayed animation). Yields
    (frame_index, GifFrame, rgb_bytearray) where the buffer is the
    full width*height*3 displayed canvas AFTER painting that frame.
    The canvas starts as the file's background color."""
    w, h = img.width, img.height
    canvas = bytearray(bytes(img.bg_rgb) * (w * h))
    for k, f in enumerate(img.frames):
        if f.disposal == 3:
            saved = bytes(canvas)
        for row in range(f.height):
            y = f.y + row
            if y >= h:
                continue
            for col in range(f.width):
                x = f.x + col
                if x >= w:
                    continue
                idx = f.indices[row * f.width + col]
                if f.transparent is not None and idx == f.transparent:
                    continue
                off = (y * w + x) * 3
                canvas[off:off + 3] = f.palette[3 * idx:3 * idx + 3]
        yield k, f, bytearray(canvas)
        if f.disposal == 2:  # restore background in the frame's region
            bg = bytes(img.bg_rgb)
            for row in range(f.height):
                y = f.y + row
                if y >= h:
                    continue
                for col in range(f.width):
                    x = f.x + col
                    if x >= w:
                        continue
                    off = (y * w + x) * 3
                    canvas[off:off + 3] = bg
        elif f.disposal == 3:
            canvas = bytearray(saved)
