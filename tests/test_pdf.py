"""PDF text extraction tests (functions/pdf.py, VERDICT r8 #3).

Spec-derived golden bytes laid out independently of pdf_build, all
four builder variants (classic xref / uncompressed / xref stream with
PNG predictor / object streams), the content-stream operator walk
(escapes, hex and UTF-16BE strings, TJ arrays, ' and \" forms, inline
images), incremental updates via /Prev, hostile inputs, and the
distributed operator."""

import zlib

import pytest

from accelerator_spark.functions.pdf import (
    Name, PdfError, Ref, _Buf, extract_content_text, parse_object,
    pdf_build, pdf_extract_text, pdf_page_texts)


def _golden_classic() -> bytes:
    """Minimal one-page PDF written out longhand (uncompressed stream,
    object order and whitespace unlike pdf_build's) with a correct
    hand-assembled xref table."""
    content = b"BT /F1 12 Tf 72 720 Td (Golden) Tj ET"
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(content),
                                                      content),
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj " % i + body + b" endobj\n"
    xref_at = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for off in offsets[1:]:
        out += b"%010d 00000 n \n" % off
    out += (b"trailer << /Size 5 /Root 1 0 R >>\n"
            b"startxref\n%d\n%%%%EOF\n" % xref_at)
    return bytes(out)


def test_golden_spec_bytes():
    text, n = pdf_extract_text(_golden_classic())
    assert (text, n) == ("Golden", 1)


@pytest.mark.parametrize("kw", [
    dict(), dict(compress=False), dict(xref_stream=True),
    dict(xref_stream=True, predictor=True), dict(use_objstm=True),
    dict(use_objstm=True, predictor=True)])
def test_builder_variants_roundtrip(kw):
    pages = ["Page one\nwith a second line", "Page two",
             "a(b)c\\d & <tag>"]
    blob = pdf_build(pages, **kw)
    got = pdf_page_texts(blob)
    assert got == pages
    text, n = pdf_extract_text(blob)
    assert n == 3 and text == "\n".join(pages)


def test_object_lexer():
    def parse(b):
        return parse_object(_Buf(b))

    assert parse(b" /A#20B ") == Name("A B")
    assert parse(b"<< /K [1 2.5 (s) <414243> /N true null] >>") == \
        {"K": [1, 2.5, b"s", b"ABC", Name("N"), True, None]}
    assert parse(b"12 0 R") == Ref(12, 0)
    assert parse(b"12 0 RG") == 12  # RG is an operator, not a ref
    assert parse(b"(a\\101\\n\\(x\\)\\\\ b)") == b"aA\n(x)\\ b"
    assert parse(b"(line\\\ncontinued)") == b"linecontinued"
    assert parse(b"(nested (p) q)") == b"nested (p) q"
    assert parse(b"% comment\n 7") == 7
    with pytest.raises(PdfError, match="unterminated literal"):
        parse(b"(never closed")
    with pytest.raises(PdfError, match="cannot parse"):
        parse(b"}")


def test_content_operators():
    assert extract_content_text(b"BT (A) Tj (B) Tj ET") == "AB"
    assert extract_content_text(b"BT (x) Tj 0 -14 Td (y) Tj ET") == \
        "x\ny"
    assert extract_content_text(b"BT (x) Tj (y) ' (z) \" ET"
                                .replace(b'"', b'"')) == "x\ny\nz"
    assert extract_content_text(
        b"BT [(Ker) -120 (ned) 3 (!)] TJ ET") == "Kerned!"
    assert extract_content_text(b"BT <48690A4279> Tj ET") == "Hi\nBy"
    # UTF-16BE behind a BOM
    assert extract_content_text(
        b"BT (\xfe\xff\x00H\x00i) Tj ET") == "Hi"
    # inline image payload (binary, contains '(' and 'Tj') is skipped
    assert extract_content_text(
        b"BT (a) Tj ET q BI /W 2 /H 1 ID \xff(Tj\x00EI junk EI Q "
        b"BT (b) Tj ET") == "a\nb"
    with pytest.raises(PdfError, match="unterminated inline image"):
        extract_content_text(b"BI /W 2 ID \xff\x00")
    # hostile stray bytes don't derail the walk
    assert extract_content_text(b"} ] >> BT (ok) Tj ET") == "ok"


def test_incremental_update_prev_chain():
    """An appended update (new content for page 1, xref with /Prev)
    must win over the original object."""
    base = pdf_build(["Original text", "Page 2"], compress=False)
    content = b"BT (Updated) Tj ET"
    upd_at = len(base)
    update = bytearray(b"4 0 obj << /Length %d >> stream\n%s\n"
                       b"endstream endobj\n" % (len(content), content))
    # original startxref offset (the /Prev target)
    import re as _re

    prev = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    xref_at = upd_at + len(update)
    update += (b"xref\n0 1\n0000000000 65535 f \n4 1\n%010d 00000 n \n"
               b"trailer << /Size 8 /Root 1 0 R /Prev %d >>\n"
               b"startxref\n%d\n%%%%EOF\n" % (upd_at, prev, xref_at))
    got = pdf_page_texts(base + bytes(update))
    assert got == ["Updated", "Page 2"]


def test_hostile_inputs():
    good = pdf_build(["x"])
    with pytest.raises(PdfError, match="%PDF-"):
        pdf_extract_text(b"not a pdf")
    with pytest.raises(PdfError, match="no startxref"):
        pdf_extract_text(good[:good.rfind(b"startxref")])
    with pytest.raises(PdfError, match="xref"):
        pdf_extract_text(good[:good.rfind(b"startxref")]
                         + b"startxref\n%d\n%%%%EOF\n" % (len(good),))
    # truncated xref table
    cut = good[:good.rfind(b"trailer")]
    with pytest.raises(PdfError):
        pdf_extract_text(cut + b"startxref\n%d\n%%%%EOF\n"
                         % good.rfind(b"xref"))
    # bad stream /Length
    bad = good.replace(b"/Length", b"/Length 999999 /X", 1)
    with pytest.raises(PdfError):
        pdf_extract_text(bad)
    # unsupported filter on the content stream (SAME-LENGTH corruption
    # — an insertion would shift every xref offset and mask the error)
    bad = pdf_build(["x"]).replace(b"FlateDecode", b"DCTDecode  ", 1)
    with pytest.raises(PdfError, match="unsupported stream filter"):
        pdf_extract_text(bad)
    # encrypted flag (trailer /Root swapped for /Encrypt, same length)
    bad = pdf_build(["x"]).replace(b"/Root 1 0 R", b"/Encrypt 99", 1)
    with pytest.raises(PdfError, match="encrypted"):
        pdf_extract_text(bad)
    # cyclic page tree: /Pages' kid points back at /Pages
    cyc = pdf_build(["x"], compress=False).replace(
        b"/Kids [3 0 R]", b"/Kids [2 0 R]", 1)
    with pytest.raises(PdfError, match="cyclic page tree"):
        pdf_extract_text(cyc)
    # cyclic /Prev chain (same-length trailer rewrite)
    base = pdf_build(["x"])
    import re as _re

    at = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    assert at < 100_000
    cyc = base.replace(b"/Root 1 0 R", b"/Prev %05d" % at, 1)
    with pytest.raises(PdfError, match="cyclic or absurd"):
        pdf_extract_text(cyc)


def test_xref_stream_details():
    """Type-2 entries resolve through the object stream; a wrong
    /Type on the pointed-at object fails loudly; predictor geometry
    errors are caught."""
    blob = pdf_build(["hello objstm"], use_objstm=True)
    assert pdf_page_texts(blob) == ["hello objstm"]
    # corrupt the ObjStm's /Type
    bad = blob.replace(b"/Type /ObjStm", b"/Type /Objzz", 1)
    with pytest.raises(PdfError):
        pdf_page_texts(bad)
    # a predictor row with a bad filter byte
    from accelerator_spark.functions.pdf import _png_unpredict

    with pytest.raises(PdfError, match="bad PNG predictor"):
        _png_unpredict(b"\x09\x00\x00\x00\x00", 4)
    with pytest.raises(PdfError, match="truncated predictor"):
        _png_unpredict(b"\x02\x00", 4)
    assert _png_unpredict(b"\x02\x01\x02" + b"\x02\x01\x02", 2) == \
        b"\x01\x02\x02\x04"


def test_extract_pdf_text_distributed(spark):
    from accelerator_spark.operators.multimodal import extract_pdf_text

    rows = [
        (1, pdf_build(["doc one", "page 2"]), "application/pdf"),
        (2, pdf_build(["doc two"], use_objstm=True), "application/pdf"),
        (3, b"%PDF-1.4 broken", "application/pdf"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    got = {r["media_id"]: r
           for r in extract_pdf_text(df, on_error="null").collect()}
    assert (got[1]["text"], got[1]["n_pages"]) == ("doc one\npage 2", 2)
    assert (got[2]["text"], got[2]["n_pages"]) == ("doc two", 1)
    assert got[3]["text"] is None and got[3]["n_bytes"] == 15
    with pytest.raises(Exception):
        extract_pdf_text(df).collect()  # on_error="raise" default


def test_review_r9_fixes():
    """Review r9: freed objects stay deleted, short /DecodeParms pads,
    ObjStm cycles raise PdfError, trailing one-digit #-escape stays
    literal."""
    import re as _re
    import zlib as _zlib

    from accelerator_spark.functions.pdf import PdfDoc, _decode_stream

    # (1) incremental update FREEING the content object: the old
    # /Prev section must not resurrect it (redaction leak)
    base = pdf_build(["Deleted secret", "Page 2"], compress=False)
    prev = int(_re.search(rb"startxref\s+(\d+)", base).group(1))
    xref_at = len(base)
    upd = (b"xref\n0 1\n0000000000 65535 f \n4 1\n"
           b"0000000000 65535 f \n"
           b"trailer << /Size 8 /Root 1 0 R /Prev %d >>\n"
           b"startxref\n%d\n%%%%EOF\n" % (prev, xref_at))
    assert pdf_page_texts(base + upd) == ["", "Page 2"]
    # (2) /DecodeParms shorter than the /Filter chain still applies
    # every filter
    double = _zlib.compress(_zlib.compress(b"BT (x) Tj ET"))
    sdict = {"Filter": [Name("FlateDecode"), Name("FlateDecode")],
             "DecodeParms": [None]}
    assert _decode_stream(sdict, double, lambda v: v) == b"BT (x) Tj ET"
    # (3) a type-2 xref entry pointing an ObjStm at itself raises
    # PdfError, not RecursionError
    blob = pdf_build(["x"], use_objstm=True)
    doc = PdfDoc(blob)
    stm_num = next(e[1] for e in doc.xref.values()
                   if e[0] == "s")
    doc.xref[stm_num] = ("s", stm_num, 0)
    doc._cache.clear()
    with pytest.raises(PdfError, match="cyclic indirect-object"):
        doc.resolve(Ref(stm_num, 0))
    # (4) one-digit trailing #-escape stays literal
    assert parse_object(_Buf(b"/A#4 ")) == Name("A#4")
    assert parse_object(_Buf(b"/A#41")) == Name("AA")


@pytest.mark.parametrize("cf", ["flate", "lzw", "a85", "ahx", "rl"])
def test_content_filters_roundtrip(cf):
    pages = ["Filtered text\nsecond line", "page 2 (with) specials\\"]
    blob = pdf_build(pages, content_filter=cf)
    assert pdf_page_texts(blob) == pages


def test_lzw_golden_and_roundtrip():
    """Hand-derived spec vector ('AAAAA' -> Clear,65,258,258,EOD at
    width 9) plus round-trips across both width bumps and the
    table-reset path."""
    import random

    from accelerator_spark.functions.pdf import lzw_decode, lzw_encode

    def bits(codes, w=9):
        acc = nb = 0
        out = bytearray()
        for c in codes:
            acc = (acc << w) | c
            nb += w
            while nb >= 8:
                out.append((acc >> (nb - 8)) & 0xFF)
                nb -= 8
                acc &= (1 << nb) - 1
        if nb:
            out.append((acc << (8 - nb)) & 0xFF)
        return bytes(out)

    golden = bits([256, 65, 258, 258, 257])
    assert lzw_decode(golden) == b"AAAAA"
    assert lzw_encode(b"AAAAA") == golden
    random.seed(11)
    for n in (0, 1, 300, 5000, 90_000):  # 90k crosses a table reset
        data = bytes(random.randrange(5) for _ in range(n))
        assert lzw_decode(lzw_encode(data)) == data, n
    blob = bytes(random.randrange(256) for _ in range(20_000))
    assert lzw_decode(lzw_encode(blob)) == blob  # incompressible path
    with pytest.raises(PdfError, match="beyond table"):
        lzw_decode(bits([256, 65, 300, 257]))
    with pytest.raises(PdfError, match="not a literal"):
        lzw_decode(bits([256, 300, 257]))


def _tiff_lzw_ours(w, h, pixels):
    """Minimal grayscale LZW TIFF around OUR encoder's strip bytes."""
    import struct

    from accelerator_spark.functions.pdf import lzw_encode

    comp = lzw_encode(bytes(pixels))
    strip_at = 8
    ifd_at = strip_at + len(comp) + (len(comp) & 1)
    tags = [(256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8),
            (259, 3, 1, 5), (262, 3, 1, 1), (273, 4, 1, strip_at),
            (277, 3, 1, 1), (278, 3, 1, h), (279, 4, 1, len(comp))]
    ifd = struct.pack("<H", len(tags))
    for t, typ, cnt, val in tags:
        ifd += struct.pack("<HHII", t, typ, cnt, val)
    ifd += struct.pack("<I", 0)
    return (b"II*\x00" + struct.pack("<I", ifd_at) + comp
            + b"\x00" * (len(comp) & 1) + ifd)


def test_lzw_foreign_imageio_decodes_ours(spark, tmp_path):
    """FOREIGN cross-check, direction 1: the JVM's ImageIO TIFF reader
    (an independent LZW implementation) decodes OUR bitstream
    pixel-exactly — including the 9->10->11 width-change timing, the
    exact failure class self-round-trips cannot catch (the GIF
    precedent)."""
    w, h = 128, 64
    pixels = bytes(((x * 7 + y * 13) // 5) % 251
                   for y in range(h) for x in range(w))
    path = tmp_path / "ours_lzw.tif"
    path.write_bytes(_tiff_lzw_ours(w, h, pixels))
    row = spark.read.format("image").load(str(path)).collect()[0]["image"]
    assert (row.width, row.height) == (w, h)
    data = bytes(row.data)
    got = bytes(data[p * row.nChannels] for p in range(w * h))
    assert got == pixels


def test_lzw_foreign_ours_decodes_imageio(spark, tmp_path):
    """FOREIGN cross-check, direction 2: ImageIO WRITES an LZW TIFF,
    our lzw_decode reads its strips back pixel-exactly (undoing the
    horizontal-differencing predictor if the writer used one)."""
    import struct

    from accelerator_spark.functions.pdf import lzw_decode

    w, h = 40, 23
    pixels = bytes((x * 3 + y * 11) % 253 for y in range(h)
                   for x in range(w))
    jvm = spark._jvm
    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    raster = bi.getRaster()
    for i, v in enumerate(pixels):
        raster.setSample(i % w, i // w, 0, v)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "tiff").next()
    param = writer.getDefaultWriteParam()
    param.setCompressionMode(
        jvm.javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    path = str(tmp_path / "theirs_lzw.tif")
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(
        jvm.java.io.File(path))
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None),
                 param)
    ios.close()

    blob = open(path, "rb").read()
    bo = "<" if blob[:2] == b"II" else ">"
    (ifd_at,) = struct.unpack(bo + "I", blob[4:8])
    (n_tags,) = struct.unpack(bo + "H", blob[ifd_at:ifd_at + 2])
    tags = {}
    for k in range(n_tags):
        at = ifd_at + 2 + 12 * k
        tag, typ, cnt = struct.unpack(bo + "HHI", blob[at:at + 8])
        if typ == 3 and cnt == 1:
            (val,) = struct.unpack(bo + "H", blob[at + 8:at + 10])
            tags[tag] = [val]
        elif cnt == 1:
            (val,) = struct.unpack(bo + "I", blob[at + 8:at + 12])
            tags[tag] = [val]
        else:
            (off,) = struct.unpack(bo + "I", blob[at + 8:at + 12])
            sz, fmt = {3: (2, "H"), 4: (4, "I")}[typ]
            tags[tag] = [struct.unpack(bo + fmt,
                                       blob[off + j * sz:
                                            off + (j + 1) * sz])[0]
                         for j in range(cnt)]
    assert tags[259] == [5]  # really LZW-compressed
    rows_per_strip = tags.get(278, [h])[0]
    out = bytearray()
    for off, cnt in zip(tags[273], tags[279]):
        out += lzw_decode(blob[off:off + cnt])
    if tags.get(317, [1])[0] == 2:  # horizontal differencing
        for r in range(0, len(out), w):
            for i in range(r + 1, min(r + w, len(out))):
                out[i] = (out[i] + out[i - 1]) & 0xFF
    assert bytes(out) == pixels
    del rows_per_strip


def test_review_r9b_budgets_and_geometry():
    """Review r9 pass 2: flate/LZW decompression bombs fail before
    materializing; Predictor-2 with zero columns raises PdfError, not
    ValueError."""
    from accelerator_spark.functions.pdf import (
        _decode_stream, lzw_decode, lzw_encode)

    bomb = zlib.compress(b"\x00" * (1 << 20))
    with pytest.raises(PdfError, match="budget"):
        _decode_stream({"Filter": Name("FlateDecode")}, bomb,
                       lambda v: v, max_bytes=1000)
    with pytest.raises(PdfError, match="budget"):
        lzw_decode(lzw_encode(b"\x00" * (1 << 20)), max_bytes=1000)
    with pytest.raises(PdfError, match="bad predictor geometry"):
        _decode_stream(
            {"Filter": Name("FlateDecode"),
             "DecodeParms": {"Predictor": 2, "Columns": 0}},
            zlib.compress(b"abcd"), lambda v: v)
