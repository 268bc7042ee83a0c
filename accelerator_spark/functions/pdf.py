"""Pure-stdlib PDF text extraction (the scraped-document front).

Scraped corpora are PDF-heavy and the pipeline's document path ended
at HTML (VERDICT r8 #3); the dominant PDF compression is FlateDecode,
which is stdlib ``zlib``, so the text path needs no external codec.
This module parses the object graph the way a conforming reader does
— ``startxref`` -> xref (classic TABLE or, in post-1.5 writers, an
XREF STREAM with PNG-predictor-filtered entries, chained via /Prev
for incremental updates) -> trailer /Root -> /Pages tree -> per-page
/Contents streams — and walks the text operators of each content
stream: BT/ET blocks, Tj / ' / " / TJ shows, Td/TD/T*/Tm line moves.
Objects packed into OBJECT STREAMS (/Type /ObjStm, xref type-2
entries) are unpacked, so files from modern writers (which put every
non-stream object there) read whole.

Scope and honest limits:

- Filters: every TEXT filter — FlateDecode and LZWDecode (both with
  /Predictor 2 and the PNG predictors 10-15; the LZW bitstream is
  foreign-checked against Java ImageIO's TIFF reader), ASCII85Decode,
  ASCIIHexDecode, RunLengthDecode — plus unfiltered streams. The
  image-only filters (DCT, JPX, CCITT, JBIG2) raise; they never carry
  page text.
- String bytes decode as PDFDocEncoding-approximated latin-1, or
  UTF-16BE behind a BOM. Font /ToUnicode CMaps and composite-font
  multi-byte codes are NOT parsed: extraction is exact for simple
  fonts with Standard/WinAnsi-style encodings (the builder half and
  the overwhelmingly common case for machine-written Latin text) and
  best-effort otherwise — the same boundary every lightweight
  extractor draws.
- Encrypted PDFs raise. Hybrid-reference files (/XRefStm in a classic
  trailer) read the classic side only.

Every walk is budgeted (objects, pages, recursion) so crafted inputs
fail loudly instead of looping. The builder (``pdf_build``) authors
classic-xref, xref-stream and object-stream files for the oracle gate
(queries.pdf_extract_report) and the hostile tests.
"""

from __future__ import annotations

import base64
import re
import zlib
from typing import NamedTuple


class PdfError(ValueError):
    """Malformed, encrypted, or unsupported-by-scope PDF input."""


class Ref(NamedTuple):
    num: int
    gen: int


class Name(str):
    """A /Name token (subclass so dict keys still compare as str)."""
    __slots__ = ()


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")


class _Buf:
    """Byte cursor with PDF whitespace/comment skipping."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def skip_ws(self):
        d, n = self.data, len(self.data)
        while self.pos < n:
            b = d[self.pos]
            if b in _WS:
                self.pos += 1
            elif b == 0x25:  # % comment to EOL
                eol = d.find(b"\n", self.pos)
                cr = d.find(b"\r", self.pos)
                if eol == -1 or (cr != -1 and cr < eol):
                    eol = cr
                self.pos = n if eol == -1 else eol + 1
            else:
                return

    def peek(self) -> int:
        if self.pos >= len(self.data):
            raise PdfError("unexpected end of data")
        return self.data[self.pos]

    def expect(self, kw: bytes):
        if not self.data.startswith(kw, self.pos):
            raise PdfError(f"expected {kw!r} at {self.pos}")
        self.pos += len(kw)


def _parse_name(buf: _Buf) -> Name:
    d = buf.data
    buf.pos += 1  # the /
    start = buf.pos
    while buf.pos < len(d) and d[buf.pos] not in _WS \
            and d[buf.pos] not in _DELIM:
        buf.pos += 1
    raw = d[start:buf.pos]
    if b"#" in raw:
        out = bytearray()
        i = 0
        while i < len(raw):
            # a #-escape needs exactly TWO hex digits; '#d' at end of
            # name stays literal (review r9: the old off-by-one bound
            # decoded a single trailing digit)
            if raw[i:i + 1] == b"#" and i + 3 <= len(raw):
                try:
                    out.append(int(raw[i + 1:i + 3], 16))
                    i += 3
                    continue
                except ValueError:
                    pass
            out.append(raw[i])
            i += 1
        raw = bytes(out)
    return Name(raw.decode("latin-1"))


_ESCAPES = {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t", 0x62: b"\b",
            0x66: b"\f", 0x28: b"(", 0x29: b")", 0x5C: b"\\"}


def _parse_literal_string(buf: _Buf) -> bytes:
    d = buf.data
    buf.pos += 1  # the (
    out = bytearray()
    depth = 1
    while True:
        if buf.pos >= len(d):
            raise PdfError("unterminated literal string")
        b = d[buf.pos]
        buf.pos += 1
        if b == 0x5C:  # backslash
            if buf.pos >= len(d):
                raise PdfError("truncated string escape")
            e = d[buf.pos]
            buf.pos += 1
            rep = _ESCAPES.get(e)
            if rep is not None:
                out += rep
            elif 0x30 <= e <= 0x37:  # \ddd octal, up to 3 digits
                oct_digits = [e - 0x30]
                while (len(oct_digits) < 3 and buf.pos < len(d)
                       and 0x30 <= d[buf.pos] <= 0x37):
                    oct_digits.append(d[buf.pos] - 0x30)
                    buf.pos += 1
                v = 0
                for dg in oct_digits:
                    v = v * 8 + dg
                out.append(v & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                if e == 0x0D and buf.pos < len(d) and d[buf.pos] == 0x0A:
                    buf.pos += 1
            else:
                out.append(e)  # \x = x for unknown escapes (spec)
        elif b == 0x28:
            depth += 1
            out.append(b)
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out)
            out.append(b)
        else:
            out.append(b)


def _parse_hex_string(buf: _Buf) -> bytes:
    d = buf.data
    buf.pos += 1  # the <
    end = d.find(b">", buf.pos)
    if end == -1:
        raise PdfError("unterminated hex string")
    hx = bytes(c for c in d[buf.pos:end] if c not in _WS)
    buf.pos = end + 1
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("latin-1"))
    except ValueError:
        raise PdfError("bad hex string") from None


def parse_object(buf: _Buf, allow_ref: bool = True):
    """One PDF object at the cursor. ``allow_ref`` enables the
    two-token lookahead for ``n g R`` indirect references (content
    streams never contain them, so their tokenizer disables it)."""
    buf.skip_ws()
    b = buf.peek()
    d = buf.data
    if b == 0x2F:  # /Name
        return _parse_name(buf)
    if b == 0x28:  # (string)
        return _parse_literal_string(buf)
    if b == 0x3C:  # << dict or <hex>
        if d.startswith(b"<<", buf.pos):
            buf.pos += 2
            out = {}
            while True:
                buf.skip_ws()
                if d.startswith(b">>", buf.pos):
                    buf.pos += 2
                    return out
                key = parse_object(buf, allow_ref)
                if not isinstance(key, Name):
                    raise PdfError("dict key is not a name")
                out[str(key)] = parse_object(buf, allow_ref)
        return _parse_hex_string(buf)
    if b == 0x5B:  # [ array ]
        buf.pos += 1
        out = []
        while True:
            buf.skip_ws()
            if buf.peek() == 0x5D:
                buf.pos += 1
                return out
            out.append(parse_object(buf, allow_ref))
    m = _NUM_RE.match(d, buf.pos)
    if m:
        tok = m.group(0)
        buf.pos = m.end()
        if b"." in tok:
            return float(tok)
        v = int(tok)
        if allow_ref and v >= 0:
            save = buf.pos
            buf.skip_ws()
            m2 = _NUM_RE.match(d, buf.pos)
            if m2 and b"." not in m2.group(0):
                p2 = m2.end()
                look = _Buf(d, p2)
                look.skip_ws()
                if d.startswith(b"R", look.pos) and (
                        look.pos + 1 >= len(d)
                        or d[look.pos + 1] in _WS
                        or d[look.pos + 1] in _DELIM):
                    buf.pos = look.pos + 1
                    return Ref(v, int(m2.group(0)))
            buf.pos = save
        return v
    for kw, val in ((b"true", True), (b"false", False), (b"null", None)):
        if d.startswith(kw, buf.pos):
            buf.pos += len(kw)
            return val
    raise PdfError(f"cannot parse object at {buf.pos}")


def _png_unpredict(data: bytes, columns: int, colors: int = 1,
                   bpc: int = 8) -> bytes:
    """Reverse PNG row predictors (the per-row filter-byte scheme xref
    streams almost always use; functions/png.py has the image-side
    twin, re-implemented here on exact stream geometry)."""
    stride = (columns * colors * bpc + 7) // 8
    fill = (colors * bpc + 7) // 8
    if stride <= 0:
        raise PdfError("bad predictor geometry")
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    while pos < len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1:pos + 1 + stride])
        if len(row) != stride:
            raise PdfError("truncated predictor row")
        pos += 1 + stride
        if ft == 1:  # Sub
            for i in range(fill, stride):
                row[i] = (row[i] + row[i - fill]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = row[i - fill] if i >= fill else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = row[i - fill] if i >= fill else 0
                bb = prev[i]
                c = prev[i - fill] if i >= fill else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (
                    bb if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        elif ft != 0:
            raise PdfError(f"bad PNG predictor filter {ft}")
        out += row
        prev = bytes(row)
    return bytes(out)


def lzw_decode(data: bytes, early: int = 1,
               max_bytes: int = 256 << 20) -> bytes:
    """TIFF/PDF-variant LZW (MSB-first variable-width codes, 256 =
    ClearTable, 257 = EOD, width 9->12 with the EarlyChange-1 bump the
    PDF spec defaults to). The bitstream (including the width-change
    timing — the GIF-precedent risk class) is validated against the
    FOREIGN Java ImageIO TIFF reader in tests/test_pdf.py."""
    out = bytearray()
    table: list = []
    width = 9
    prev: bytes | None = None

    def clear():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    clear()
    acc = nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # tolerate a missing EOD
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        acc &= (1 << nbits) - 1
        if code == 256:
            clear()
            continue
        if code == 257:
            return bytes(out)
        if prev is None:
            if code >= 258:
                raise PdfError("LZW: first code after clear is not a "
                               "literal")
            entry = table[code]
        elif len(out) > max_bytes:
            # ~2500x amplification is possible from repeated max-width
            # codes — a decompression bomb must fail before it
            # materializes (review r9b; the sitemap gzip budget's twin)
            raise PdfError("LZW: decompressed-size budget exceeded")
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise PdfError("LZW: code beyond table")
            if len(table) < 4096:
                table.append(prev + entry[:1])
        out += entry
        prev = entry
        if len(table) >= (1 << width) - early and width < 12:
            width += 1


def lzw_encode(data: bytes, early: int = 1) -> bytes:
    """The matching encoder (builder/gate half): emits an initial
    ClearTable, resets the table before it fills, ends with EOD."""
    out = bytearray()
    acc = nbits = 0

    def emit(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
            acc &= (1 << nbits) - 1

    dic = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)
    s = b""
    for i in range(len(data)):
        t = s + data[i:i + 1]
        if t in dic:
            s = t
            continue
        emit(dic[s], width)
        dic[t] = next_code
        next_code += 1
        if next_code > (1 << width) - early and width < 12:
            width += 1
        if next_code >= 4096 - early:
            emit(256, width)  # ClearTable before the table overflows
            dic = {bytes([j]): j for j in range(256)}
            next_code = 258
            width = 9
        s = data[i:i + 1]
    if s:
        emit(dic[s], width)
        next_code += 1
        if next_code > (1 << width) - early and width < 12:
            width += 1
    emit(257, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _ascii85_decode(data: bytes) -> bytes:
    data = bytes(c for c in data if c not in _WS)
    if data.endswith(b"~>"):
        data = data[:-2]
    try:
        return base64.a85decode(data)
    except ValueError as e:
        raise PdfError(f"ASCII85Decode failed: {e}") from None


def _asciihex_decode(data: bytes) -> bytes:
    eod = data.find(b">")
    if eod != -1:
        data = data[:eod]
    hx = bytes(c for c in data if c not in _WS)
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("latin-1"))
    except ValueError:
        raise PdfError("ASCIIHexDecode: bad hex digit") from None


def _runlength_decode(data: bytes) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        ln = data[pos]
        pos += 1
        if ln == 128:  # EOD
            return bytes(out)
        if ln < 128:
            chunk = data[pos:pos + ln + 1]
            if len(chunk) != ln + 1:
                raise PdfError("RunLengthDecode: truncated literal run")
            out += chunk
            pos += ln + 1
        else:
            if pos >= n:
                raise PdfError("RunLengthDecode: truncated repeat run")
            out += data[pos:pos + 1] * (257 - ln)
            pos += 1
    return bytes(out)


def _apply_predictor(data: bytes, p: dict, resolve) -> bytes:
    pred = resolve(p.get("Predictor", 1))
    if pred and pred >= 10:
        return _png_unpredict(
            data, resolve(p.get("Columns", 1)),
            resolve(p.get("Colors", 1)),
            resolve(p.get("BitsPerComponent", 8)))
    if pred == 2:
        cols = resolve(p.get("Columns", 1))
        if not isinstance(cols, int) or cols < 1:
            raise PdfError("bad predictor geometry")
        out = bytearray(data)
        for r in range(0, len(out) - cols + 1, cols):
            for i in range(r + 1, r + cols):
                out[i] = (out[i] + out[i - 1]) & 0xFF
        return bytes(out)
    if pred not in (None, 1):
        raise PdfError(f"unsupported predictor {pred}")
    return data


def _decode_stream(sdict: dict, raw: bytes, resolve,
                   max_bytes: int = 256 << 20) -> bytes:
    """Apply /Filter (+ /DecodeParms) to raw stream bytes. The TEXT
    filters are covered — FlateDecode, LZWDecode (both with
    predictors), ASCII85Decode, ASCIIHexDecode, RunLengthDecode; the
    image-only filters (DCT/JPX/CCITT/JBIG2) raise (scope note in the
    module docstring). Every stage is capped at ``max_bytes`` of
    output, so a crafted flate/LZW bomb fails loudly before it
    materializes (review r9b)."""
    filt = resolve(sdict.get("Filter"))
    parms = resolve(sdict.get("DecodeParms")) or {}
    if filt is None:
        return raw
    if isinstance(filt, Name):
        filt, parms = [filt], [parms]
    elif not isinstance(parms, list):
        parms = [parms] + [{}] * (len(filt) - 1)
    if len(parms) < len(filt):
        # a /DecodeParms list shorter than /Filter is spec-legal
        # ([null] for a 2-filter chain); zip() truncating it would
        # silently skip trailing filters (review r9)
        parms = list(parms) + [{}] * (len(filt) - len(parms))
    data = raw
    for f, p in zip(filt, parms):
        p = resolve(p) or {}
        name = str(f)
        if name == "FlateDecode":
            d = zlib.decompressobj()
            try:
                data = d.decompress(data, max_bytes + 1)
            except zlib.error as e:
                raise PdfError(f"FlateDecode failed: {e}") from None
            if len(data) > max_bytes or not d.eof:
                raise PdfError("FlateDecode: decompressed-size budget "
                               "exceeded (or truncated stream)")
            data = _apply_predictor(data, p, resolve)
        elif name == "LZWDecode":
            early = resolve(p.get("EarlyChange", 1))
            data = lzw_decode(data, 1 if early is None else int(early),
                              max_bytes=max_bytes)
            data = _apply_predictor(data, p, resolve)
        elif name == "ASCII85Decode":
            data = _ascii85_decode(data)
        elif name == "ASCIIHexDecode":
            data = _asciihex_decode(data)
        elif name == "RunLengthDecode":
            data = _runlength_decode(data)
        else:
            raise PdfError(f"unsupported stream filter /{f}")
        if len(data) > max_bytes:
            raise PdfError("stream decompressed-size budget exceeded")
    return data


class PdfDoc:
    """Parsed object graph with lazy, budgeted object loading."""

    def __init__(self, data: bytes, max_objects: int = 100_000):
        self.data = data
        self.max_objects = max_objects
        self._cache = {}
        self._loading: set = set()  # cycle guard (review r9)
        self._loads = 0
        if not data.startswith(b"%PDF-"):
            raise PdfError("missing %PDF- header")
        self.xref, self.trailer = self._read_xref_chain()
        if self.trailer.get("Encrypt") is not None:
            raise PdfError("encrypted PDF (unsupported)")

    # -- xref -----------------------------------------------------
    def _read_xref_chain(self):
        d = self.data
        at = d.rfind(b"startxref", max(0, len(d) - 2048))
        if at == -1:
            raise PdfError("no startxref")
        buf = _Buf(d, at + len(b"startxref"))
        buf.skip_ws()
        m = _NUM_RE.match(d, buf.pos)
        if not m or b"." in m.group(0):
            raise PdfError("bad startxref offset")
        off = int(m.group(0))
        xref: dict = {}
        trailer = None
        seen = set()
        while off is not None:
            if off in seen or len(seen) > 64:
                raise PdfError("cyclic or absurd xref /Prev chain")
            seen.add(off)
            if off < 0 or off >= len(d):
                raise PdfError("xref offset outside file")
            buf = _Buf(d, off)
            buf.skip_ws()
            if d.startswith(b"xref", buf.pos):
                tdict = self._read_classic_xref(buf, xref)
            else:
                tdict = self._read_xref_stream(buf, xref)
            if trailer is None:
                trailer = tdict
            prev = tdict.get("Prev")
            off = int(prev) if prev is not None else None
        return xref, trailer

    def _read_classic_xref(self, buf: _Buf, xref: dict) -> dict:
        d = buf.data
        buf.expect(b"xref")
        while True:
            buf.skip_ws()
            if d.startswith(b"trailer", buf.pos):
                buf.pos += len(b"trailer")
                t = parse_object(buf)
                if not isinstance(t, dict):
                    raise PdfError("trailer is not a dict")
                return t
            m = _NUM_RE.match(d, buf.pos)
            if not m:
                raise PdfError("bad xref subsection header")
            start = int(m.group(0))
            buf.pos = m.end()
            buf.skip_ws()
            m = _NUM_RE.match(d, buf.pos)
            if not m:
                raise PdfError("bad xref subsection count")
            count = int(m.group(0))
            buf.pos = m.end()
            buf.skip_ws()
            # spec entries are exactly 20 bytes ('oooooooooo ggggg n'
            # + 2-byte EOL); tolerate the 19-byte single-\n variant
            # some writers emit by matching, not fixed-striding
            ent_re = re.compile(rb"(\d{10}) \d{5} ([nf])[ \r\n]{1,2}")
            for i in range(count):
                m = ent_re.match(d, buf.pos)
                if not m:
                    raise PdfError("truncated or malformed xref entry")
                num = start + i
                if num not in xref:  # newest update wins
                    # free ('f') entries RECORD the deletion — skipping
                    # them would resurrect objects freed by an
                    # incremental update from older /Prev sections
                    # (redaction leak, review r9)
                    xref[num] = ("o", int(m.group(1))) \
                        if m.group(2) == b"n" else ("f",)
                buf.pos = m.end()

    def _read_xref_stream(self, buf: _Buf, xref: dict) -> dict:
        d = buf.data
        m = _NUM_RE.match(d, buf.pos)
        if not m:
            raise PdfError("xref offset points at neither table nor "
                           "stream object")
        sdict, raw = self._load_indirect_at(buf.pos, allow_stream=True)
        if not isinstance(sdict, dict) or raw is None:
            raise PdfError("xref stream object has no stream")
        if str(sdict.get("Type", "")) != "XRef":
            raise PdfError("xref stream /Type is not /XRef")
        data = _decode_stream(sdict, raw, self._resolve_direct)
        w = [int(x) for x in sdict.get("W", [])]
        if len(w) != 3 or any(x < 0 for x in w) or sum(w) == 0:
            raise PdfError("bad xref stream /W")
        size = int(sdict.get("Size", 0))
        index = sdict.get("Index", [0, size])
        if len(index) % 2:
            raise PdfError("odd xref stream /Index")
        rw = sum(w)
        pos = 0

        def field(chunk, a, b):
            return int.from_bytes(chunk[a:b], "big") if b > a else None

        for k in range(0, len(index), 2):
            start, count = int(index[k]), int(index[k + 1])
            for i in range(count):
                chunk = data[pos:pos + rw]
                if len(chunk) < rw:
                    raise PdfError("truncated xref stream data")
                pos += rw
                t = field(chunk, 0, w[0])
                if t is None:
                    t = 1  # omitted type field defaults to 1
                f2 = field(chunk, w[0], w[0] + w[1]) or 0
                f3 = field(chunk, w[0] + w[1], rw) or 0
                num = start + i
                if num in xref:
                    continue  # newest update wins
                if t == 1:
                    xref[num] = ("o", f2)
                elif t == 2:
                    xref[num] = ("s", f2, f3)
                elif t == 0:
                    # record the free entry so older /Prev sections
                    # cannot resurrect a deleted object (review r9)
                    xref[num] = ("f",)
        return sdict

    # -- objects --------------------------------------------------
    def _resolve_direct(self, v):
        return self.resolve(v) if isinstance(v, Ref) else v

    def _load_indirect_at(self, off: int, allow_stream: bool):
        """(object, raw_stream_bytes|None) for ``n g obj`` at off."""
        d = self.data
        self._loads += 1
        if self._loads > self.max_objects:
            raise PdfError("object budget exceeded")
        buf = _Buf(d, off)
        buf.skip_ws()
        for _ in range(2):  # object number, generation
            m = _NUM_RE.match(d, buf.pos)
            if not m:
                raise PdfError(f"expected indirect object at {off}")
            buf.pos = m.end()
            buf.skip_ws()
        buf.expect(b"obj")
        obj = parse_object(buf)
        buf.skip_ws()
        raw = None
        if d.startswith(b"stream", buf.pos):
            if not allow_stream:
                raise PdfError("unexpected stream")
            if not isinstance(obj, dict):
                raise PdfError("stream without a dict")
            buf.pos += len(b"stream")
            if d.startswith(b"\r\n", buf.pos):
                buf.pos += 2
            elif d.startswith(b"\n", buf.pos):
                buf.pos += 1
            length = self._resolve_direct(obj.get("Length"))
            if not isinstance(length, int) or length < 0 \
                    or buf.pos + length > len(d):
                raise PdfError("bad stream /Length")
            raw = d[buf.pos:buf.pos + length]
            buf.pos += length
            buf.skip_ws()
            buf.expect(b"endstream")
        return obj, raw

    def resolve(self, v, _depth: int = 0):
        """Follow indirect references (transitively, budgeted)."""
        while isinstance(v, Ref):
            if _depth > 32:
                raise PdfError("reference chain too deep")
            _depth += 1
            key = v.num
            if key in self._cache:
                v = self._cache[key]
                continue
            ent = self.xref.get(key)
            if ent is None or ent[0] == "f":
                v = None  # unknown or freed object resolves to null
                break
            if key in self._loading:
                # a crafted type-2 entry can point an ObjStm at itself
                # (or a cycle) — without this the mutual recursion
                # bypasses both budgets and dies with RecursionError
                # (review r9)
                raise PdfError("cyclic indirect-object reference")
            self._loading.add(key)
            try:
                if ent[0] == "o":
                    obj, raw = self._load_indirect_at(ent[1],
                                                      allow_stream=True)
                    if raw is not None:
                        obj = _Stream(obj, raw)
                else:
                    obj = self._load_from_objstm(ent[1], ent[2])
            finally:
                self._loading.discard(key)
            self._cache[key] = obj
            v = obj
        return v

    def _load_from_objstm(self, stm_num: int, idx: int):
        stm = self.resolve(Ref(stm_num, 0))
        if not isinstance(stm, _Stream) \
                or str(stm.dict.get("Type", "")) != "ObjStm":
            raise PdfError("xref type-2 entry does not point at an "
                           "object stream")
        data = _decode_stream(stm.dict, stm.raw, self._resolve_direct)
        n = int(self._resolve_direct(stm.dict.get("N", 0)))
        first = int(self._resolve_direct(stm.dict.get("First", 0)))
        if not 0 <= idx < n:
            raise PdfError("object-stream index out of range")
        buf = _Buf(data)
        pairs = []
        for _ in range(n):
            buf.skip_ws()
            m = _NUM_RE.match(data, buf.pos)
            if not m:
                raise PdfError("bad object-stream pair table")
            onum = int(m.group(0))
            buf.pos = m.end()
            buf.skip_ws()
            m = _NUM_RE.match(data, buf.pos)
            if not m:
                raise PdfError("bad object-stream pair table")
            pairs.append((onum, int(m.group(0))))
            buf.pos = m.end()
        off = first + pairs[idx][1]
        if off >= len(data):
            raise PdfError("object-stream offset outside stream")
        return parse_object(_Buf(data, off))

    def stream_bytes(self, v) -> bytes:
        """Resolve to a stream and return its DECODED bytes."""
        s = self.resolve(v)
        if not isinstance(s, _Stream):
            raise PdfError("expected a stream object")
        return _decode_stream(s.dict, s.raw, self._resolve_direct)


class _Stream(NamedTuple):
    dict: dict
    raw: bytes


# ------------------------------------------------------- text extraction
_LINE_OPS = {"Td", "TD", "T*", "Tm", "ET"}


def _pdf_text(b: bytes) -> str:
    if b.startswith(b"\xfe\xff"):
        try:
            return b[2:].decode("utf-16-be")
        except UnicodeDecodeError:
            return b[2:].decode("latin-1")
    return b.decode("latin-1")


def extract_content_text(content: bytes, budget: int = 2_000_000) -> str:
    """Text shown by one content stream: Tj / ' / \" / TJ string
    operands, with line breaks at Td/TD/T*/Tm/ET and the
    newline-implying ' and \" forms. Inline images (BI..EI) are
    skipped whole — their binary payload must not reach the
    tokenizer."""
    d = content
    buf = _Buf(d)
    parts: list = []
    stack: list = []
    n = len(d)
    steps = 0
    while True:
        buf.skip_ws()
        if buf.pos >= n:
            break
        steps += 1
        if steps > budget:
            raise PdfError("content token budget exceeded")
        b = d[buf.pos]
        if (b in b"/(<[" or b in b"+-." or 0x30 <= b <= 0x39):
            try:
                stack.append(parse_object(buf, allow_ref=False))
            except PdfError:
                buf.pos += 1  # skip one hostile byte, keep walking
            continue
        start = buf.pos
        while buf.pos < n and d[buf.pos] not in _WS \
                and d[buf.pos] not in _DELIM:
            buf.pos += 1
        if buf.pos == start:
            buf.pos += 1  # stray delimiter (e.g. unbalanced ])
            continue
        op = d[start:buf.pos].decode("latin-1")
        if op == "Tj":
            if stack and isinstance(stack[-1], bytes):
                parts.append(_pdf_text(stack[-1]))
        elif op == "'":
            parts.append("\n")
            if stack and isinstance(stack[-1], bytes):
                parts.append(_pdf_text(stack[-1]))
        elif op == '"':
            parts.append("\n")
            if stack and isinstance(stack[-1], bytes):
                parts.append(_pdf_text(stack[-1]))
        elif op == "TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        parts.append(_pdf_text(el))
        elif op in _LINE_OPS:
            parts.append("\n")
        elif op == "BI":
            at = d.find(b"EI", buf.pos)
            while at != -1 and not (
                    d[at - 1] in _WS
                    and (at + 2 >= n or d[at + 2] in _WS
                         or d[at + 2] in _DELIM)):
                at = d.find(b"EI", at + 2)
            if at == -1:
                raise PdfError("unterminated inline image")
            buf.pos = at + 2
        stack.clear()
    lines = []
    for chunk in "".join(parts).split("\n"):
        line = chunk.strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def pdf_page_texts(data: bytes, max_pages: int = 50_000) -> list:
    """Parse a whole PDF and return one extracted text string per
    page, in page-tree order."""
    doc = PdfDoc(data)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfError("trailer /Root is not a dict")
    pages_ref = root.get("Pages")
    out = []
    seen = set()

    def walk(node_v, depth):
        if depth > 64:
            raise PdfError("page tree too deep")
        if isinstance(node_v, Ref):
            if node_v.num in seen:
                raise PdfError("cyclic page tree")
            seen.add(node_v.num)
        node = doc.resolve(node_v)
        if not isinstance(node, dict):
            raise PdfError("page tree node is not a dict")
        t = str(node.get("Type", ""))
        if t == "Pages" or (t == "" and "Kids" in node):
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise PdfError("/Pages without /Kids list")
            for kid in kids:
                walk(kid, depth + 1)
        elif t == "Page":
            if len(out) >= max_pages:
                raise PdfError("page budget exceeded")
            contents = doc.resolve(node.get("Contents"))
            if contents is None:
                out.append("")
                return
            if isinstance(contents, _Stream):
                blob = _decode_stream(contents.dict, contents.raw,
                                      doc._resolve_direct)
            elif isinstance(contents, list):
                blob = b"\n".join(doc.stream_bytes(c) for c in contents)
            else:
                raise PdfError("/Contents is neither stream nor array")
            out.append(extract_content_text(blob))
        else:
            raise PdfError(f"unexpected page-tree node type {t!r}")

    walk(pages_ref, 0)
    return out


def pdf_extract_text(data: bytes) -> tuple:
    """(text, n_pages): pages joined by newline — the operator-facing
    convenience over pdf_page_texts."""
    pages = pdf_page_texts(data)
    return "\n".join(p for p in pages if p), len(pages)


# --------------------------------------------------------------- builder
def _esc_literal(s: str) -> bytes:
    b = s.encode("latin-1")
    return (b.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
            .replace(b")", b"\\)").replace(b"\r", b"\\r")
            .replace(b"\n", b"\\n"))


def _rl_encode(data: bytes) -> bytes:
    """All-literal RunLength encoding (builder half — correctness, not
    ratio)."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i:i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)  # EOD
    return bytes(out)


_CONTENT_FILTERS = {
    "flate": (b"/FlateDecode", zlib.compress),
    "lzw": (b"/LZWDecode", lzw_encode),
    "a85": (b"/ASCII85Decode", lambda d: base64.a85encode(d) + b"~>"),
    "ahx": (b"/ASCIIHexDecode", lambda d: d.hex().encode() + b">"),
    "rl": (b"/RunLengthDecode", _rl_encode),
}


def pdf_build(pages, compress: bool = True, xref_stream: bool = False,
              use_objstm: bool = False, predictor: bool = False,
              content_filter: str | None = None) -> bytes:
    """Author a PDF (the test-harness/gate half). ``pages`` is a list
    of page texts; each page's lines (split on newline) become Tj
    shows separated by T* line moves. Variants: classic xref table
    (default), ``xref_stream=True`` (/Type /XRef, /W [1 2 1], optional
    PNG Up ``predictor``), ``use_objstm=True`` (non-stream objects
    packed into a /Type /ObjStm, implies xref_stream);
    ``content_filter`` picks the content-stream codec
    (flate/lzw/a85/ahx/rl, default per ``compress``). Text must be
    latin-1-encodable (builder scope)."""
    if use_objstm:
        xref_stream = True
    objs: dict = {}   # num -> bytes (full body) for plain objects
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode()
    streams: dict = {}  # num -> (dict_bytes, raw)
    for i, text in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs[pnum] = (
            f"<< /Type /Page /Parent 2 0 R /Contents {cnum} 0 R "
            f"/MediaBox [0 0 612 792] /Resources << /Font "
            f"<< /F1 {font_num} 0 R >> >> >>").encode()
        lines = text.split("\n")
        body = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td ")
        for j, line in enumerate(lines):
            if j:
                body += b"T* "
            body += b"(" + _esc_literal(line) + b") Tj "
        body += b"ET"
        raw = bytes(body)
        fkey = content_filter or ("flate" if compress else None)
        if fkey is not None:
            fname, enc = _CONTENT_FILTERS[fkey]
            raw = enc(raw)
            sd = b"<< /Length %d /Filter %s >>" % (len(raw), fname)
        else:
            sd = b"<< /Length %d >>" % len(raw)
        streams[cnum] = (sd, raw)
    objs[font_num] = (b"<< /Type /Font /Subtype /Type1 "
                      b"/BaseFont /Helvetica >>")
    size = font_num + 1
    stm_num = xnum = None
    if use_objstm:
        stm_num = size
        size += 1
    if xref_stream:
        xnum = size
        size += 1

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict = {}

    def emit(num, body: bytes, raw=None):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(body)
        if raw is not None:
            out.extend(b"\nstream\n")
            out.extend(raw)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    objstm_entries: dict = {}  # num -> idx (type-2 xref entries)
    if use_objstm:
        packed = sorted(objs)
        parts, offs_in = [], []
        at = 0
        for num in packed:
            offs_in.append((num, at))
            parts.append(objs[num])
            at += len(objs[num]) + 1
        header = " ".join(f"{n} {o}" for n, o in offs_in).encode() + b"\n"
        payload = header + b"\n".join(parts) + b"\n"
        raw = zlib.compress(payload)
        emit(stm_num,
             b"<< /Type /ObjStm /N %d /First %d /Length %d "
             b"/Filter /FlateDecode >>"
             % (len(packed), len(header), len(raw)), raw)
        for idx, num in enumerate(packed):
            objstm_entries[num] = (stm_num, idx)
    else:
        for num in sorted(objs):
            emit(num, objs[num])
    for num in sorted(streams):
        sd, raw = streams[num]
        emit(num, sd, raw)

    if not xref_stream:
        xref_at = len(out)
        out.extend(b"xref\n0 %d\n" % size)
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, size):
            out.extend(b"%010d 00000 n \n" % offsets[num])
        out.extend(b"trailer\n<< /Size %d /Root 1 0 R >>\n" % size)
    else:
        # entries for 0..size-1; type/f2/f3 with W [1 2 1]
        rows = bytearray()
        entries = []
        for num in range(size):
            if num == 0:
                entries.append((0, 0, 255))
            elif num in objstm_entries:
                s, i = objstm_entries[num]
                entries.append((2, s, i))
            elif num == xnum:
                entries.append((1, 0, 0))  # patched below
            else:
                entries.append((1, offsets[num], 0))
        xref_at = len(out)
        entries[xnum] = (1, xref_at, 0)
        for t, f2, f3 in entries:
            if f2 > 0xFFFF:
                raise PdfError("builder: offset exceeds the 2-byte "
                               "/W field (file too large)")
            rows += bytes([t]) + f2.to_bytes(2, "big") \
                + f3.to_bytes(1, "big")
        parms = b""
        data = bytes(rows)
        if predictor:
            stride = 4
            filtered = bytearray()
            prev = bytes(stride)
            for r in range(0, len(data), stride):
                row = data[r:r + stride]
                filtered.append(2)  # Up
                filtered += bytes((row[i] - prev[i]) & 0xFF
                                  for i in range(stride))
                prev = row
            data = bytes(filtered)
            parms = b" /DecodeParms << /Predictor 12 /Columns 4 >>"
        raw = zlib.compress(data)
        emit(xnum,
             b"<< /Type /XRef /Size %d /W [1 2 1] /Root 1 0 R "
             b"/Filter /FlateDecode%s /Length %d >>"
             % (size, parms, len(raw)), raw)
        xref_at = offsets[xnum]
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(out)
