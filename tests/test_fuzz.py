"""Hostile-input fuzz sweep: every container/codec parser that runs
over corpus bytes in executor tasks must raise ITS OWN error type (or
classify/return) on mutated input — never leak zlib.error, struct.error,
KeyError, UnicodeDecodeError, RuntimeError, negative-seek ValueError...
from stdlib internals. Seeded and deterministic (no flaky corpus);
round-10 findings fixed by this suite: npz member reads, zipfile
office/epub member machinery, office_kind/_sniff_zip central-directory
parses, CPython wave's bare RuntimeError, avro schema/key/string
decodes, short-TIFF struct.error."""

import io
import random
import zipfile

import pytest

N_MUTATIONS = 150


def _mutations(data: bytes, seed: int, n: int = N_MUTATIONS):
    rng = random.Random(seed)
    for _ in range(n):
        b = bytearray(data)
        op = rng.randrange(4)
        if op == 0 and b:
            b[rng.randrange(len(b))] = rng.randrange(256)
        elif op == 1 and b:
            del b[rng.randrange(len(b))]
        elif op == 2:
            b.insert(rng.randrange(len(b) + 1), rng.randrange(256))
        else:
            b = b[:rng.randrange(len(b) + 1)]
        yield bytes(b)


def _assert_contained(name, valid_bytes, fn, ok_types, seed=7):
    leaks = {}
    for m in _mutations(valid_bytes, seed):
        try:
            fn(m)
        except ok_types:
            pass
        except Exception as e:  # noqa: BLE001 — the point of the test
            key = f"{type(e).__name__}: {str(e)[:60]}"
            leaks[key] = leaks.get(key, 0) + 1
    assert not leaks, f"{name} leaked foreign exceptions: {leaks}"


def _zip_bytes(files: dict) -> bytes:
    b = io.BytesIO()
    with zipfile.ZipFile(b, "w", zipfile.ZIP_DEFLATED) as z:
        for n, c in files.items():
            z.writestr(n, c)
    return b.getvalue()


def test_fuzz_warc_and_cdx():
    from accelerator_spark.sources.warc import (
        WarcError, cdx_offsets, warc_build, warc_iter_file)

    recs = [{"warc_type": "response", "target_uri": "http://x/%d" % i,
             "payload": b"<p>hi</p>", "http": (200, "text/html")}
            for i in range(3)]
    for gz in (False, True):
        blob = warc_build(recs, gzip_members=gz)
        _assert_contained(f"warc(gz={gz})", blob,
                          lambda b: list(warc_iter_file(b)), (WarcError,))
    _, cdx = warc_build(recs, with_cdx=True)
    _assert_contained("cdx", cdx, cdx_offsets, (WarcError,))


def test_fuzz_tar():
    from accelerator_spark.sources.tar import (
        TarError, tar_build, tar_iter_members)

    for gz in (False, True):
        blob = tar_build([("d/a.txt", b"T" * 600), ("d/a.json", b"J")],
                         gzip_compress=gz)
        _assert_contained(f"tar(gz={gz})", blob,
                          lambda b: list(tar_iter_members(b)),
                          (TarError,))


def test_fuzz_tensors():
    import numpy as np

    from accelerator_spark.sources.tensors import (
        TensorFormatError, safetensors_build, tensor_decode_file)

    st = safetensors_build({"emb": ("F32", [2, 3], [1, 2, 3, 4, 5, 6]),
                            "ids": ("I64", [2], [7, 8])})
    _assert_contained("safetensors", st,
                      lambda b: list(tensor_decode_file("p", b)),
                      (TensorFormatError,))
    buf = io.BytesIO()
    np.save(buf, np.arange(12.0).reshape(3, 4))
    npy = buf.getvalue()
    _assert_contained("npy", npy,
                      lambda b: list(tensor_decode_file("p", b)),
                      (TensorFormatError,))
    _assert_contained("npz", _zip_bytes({"a.npy": npy}),
                      lambda b: list(tensor_decode_file("p", b)),
                      (TensorFormatError,))


def test_fuzz_codecs_png_gif_jpeg_wav():
    from accelerator_spark.functions.gif import (
        GifError, gif_decode, gif_encode)
    from accelerator_spark.functions.jpeg import (
        JpegError, jpeg_decode, jpeg_encode)
    from accelerator_spark.functions.png import (
        PngError, png_decode, png_encode)
    from accelerator_spark.functions.wav import (
        WavError, wav_decode, wav_encode)

    _assert_contained(
        "png", png_encode(list(range(72)), 9, 8, color_type=0),
        png_decode, (PngError,))
    _assert_contained(
        "gif", gif_encode([bytes(i % 16 for i in range(24))], 4, 6,
                          bytes(range(48))), gif_decode, (GifError,))
    _assert_contained(
        "jpeg", jpeg_encode([(x * 7 + y * 3) % 256
                             for y in range(16) for x in range(16)],
                            16, 16, 1), jpeg_decode, (JpegError,))
    _assert_contained(
        "wav", wav_encode(list(range(100)), 8000, 1, 1), wav_decode,
        (WavError,))


def test_fuzz_office_epub_rtf_pdf_mbox():
    from accelerator_spark.functions.docx import (
        OfficeError, docx_text, office_kind, xlsx_cells)
    from accelerator_spark.functions.epub import EpubError, epub_text
    from accelerator_spark.functions.pdf import (
        PdfError, pdf_build, pdf_extract_text)
    from accelerator_spark.functions.rtf import RtfError, rtf_text
    from accelerator_spark.sources.mail import mbox_decode_file

    docx = _zip_bytes({
        "[Content_Types].xml": "<Types/>",
        "word/document.xml": ("<w:document xmlns:w='x'><w:body><w:p>"
                              "<w:r><w:t>Hi</w:t></w:r></w:p>"
                              "</w:body></w:document>")})
    _assert_contained("docx", docx, docx_text, (OfficeError,))
    _assert_contained("office_kind", docx, office_kind, ())  # never raises
    xlsx = _zip_bytes({
        "xl/workbook.xml": ("<workbook><sheets><sheet name='S' "
                            "r:id='rId1' xmlns:r='r'/></sheets>"
                            "</workbook>"),
        "xl/_rels/workbook.xml.rels": (
            "<Relationships><Relationship Id='rId1' "
            "Target='worksheets/sheet1.xml'/></Relationships>"),
        "xl/worksheets/sheet1.xml": (
            "<worksheet><sheetData><row r='1'><c r='A1'><v>5</v></c>"
            "</row></sheetData></worksheet>")})
    _assert_contained("xlsx", xlsx, lambda b: list(xlsx_cells(b)),
                      (OfficeError,))
    epub = _zip_bytes({
        "mimetype": "application/epub+zip",
        "META-INF/container.xml": (
            "<container><rootfiles><rootfile full-path='c.opf'/>"
            "</rootfiles></container>"),
        "c.opf": ("<package><manifest><item id='a' href='a.xhtml'/>"
                  "</manifest><spine><itemref idref='a'/></spine>"
                  "</package>"),
        "a.xhtml": "<html><body><p>Hello</p></body></html>"})
    _assert_contained("epub", epub, epub_text, (EpubError, OfficeError))
    _assert_contained(
        "rtf",
        rb"{\rtf1\ansi a\'e9b \u-10179?\u-8704? {\fonttbl j} \bin3 xy"
        rb"z\par end}", rtf_text, (RtfError,))
    for xs in (False, True):
        _assert_contained(
            f"pdf(xref_stream={xs})",
            pdf_build(["Hello world\nsecond line"], xref_stream=xs),
            pdf_extract_text, (PdfError,))
    mbox = (b"From a@b Thu Jan  1 00:00:00 2026\n"
            b"Subject: =?utf-8?b?aGk=?=\n"
            b"Content-Type: text/plain; charset=utf-8\n"
            b"Date: Thu, 1 Jan 2026 00:00:00 +0000\n\nbody line\n")
    _assert_contained("mbox", mbox,
                      lambda b: list(mbox_decode_file("p", b)), ())


def test_fuzz_avro():
    from accelerator_spark.sources.avro import (
        AvroError, avro_decode_file, avro_encode_file)

    blob = avro_encode_file(
        {"type": "record", "name": "R", "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "u", "type": ["null", {
                "type": "enum", "name": "E", "symbols": ["X", "Y"]}]},
            {"name": "fx", "type": {
                "type": "fixed", "name": "FX", "size": 2}}]},
        [{"a": 1, "b": "x", "m": {"k": "v"}, "u": "X", "fx": b"ab"},
         {"a": 2, "b": "y", "m": {}, "u": None, "fx": b"cd"}])
    _assert_contained("avro", blob,
                      lambda b: list(avro_decode_file(b)), (AvroError,))


def test_fuzz_media_probes_and_sniff():
    from accelerator_spark.functions.flac import (
        FlacError, flac_build, flac_probe)
    from accelerator_spark.functions.imagemeta import (
        ImageMetaError, bmp_build, image_probe, tiff_build,
        webp_build_lossy)
    from accelerator_spark.functions.mkv import (
        MkvError, mkv_build, mkv_probe)
    from accelerator_spark.functions.mp3 import (
        Mp3Error, mp3_build_frames, mp3_probe)
    from accelerator_spark.functions.mp4 import (
        Mp4Error, mp4_build, mp4_probe)
    from accelerator_spark.functions.ogg import (
        OggError, ogg_build_opus, ogg_probe)
    from accelerator_spark.operators.sniff import sniff_format

    _assert_contained(
        "mp4", mp4_build(1000, 7500, [dict(
            track_id=1, handler="vide", codec="avc1", width=640,
            height=360, timescale=30000, duration=225000,
            n_samples=225)]), mp4_probe, (Mp4Error,))
    _assert_contained("flac", flac_build(44100, 2, 16, 44100 * 3),
                      flac_probe, (FlacError,))
    _assert_contained("ogg", ogg_build_opus(2, 312, 48000, [960, 1920]),
                      ogg_probe, (OggError,))
    _assert_contained("mp3", mp3_build_frames("1", 3, [9, 9, 9], 0),
                      mp3_probe, (Mp3Error,))
    _assert_contained(
        "mkv", mkv_build("webm", 1_000_000, 12000.0, [
            dict(number=1, track_type=1, codec="V_VP9", width=640,
                 height=360)], n_clusters=2), mkv_probe, (MkvError,))
    for nm, blob in (("webp", webp_build_lossy(64, 48)),
                     ("tiff", tiff_build(64, 48)),
                     ("bmp", bmp_build(64, 48))):
        _assert_contained(nm, blob, image_probe, (ImageMetaError,))
    # the sniffer CLASSIFIES hostile bytes, it never raises
    _assert_contained("sniff",
                      _zip_bytes({"word/document.xml": "<x/>"}),
                      sniff_format, ())


def test_fuzz_sitemap():
    import gzip

    from accelerator_spark.operators.robots import (
        SitemapError, parse_sitemap)

    xml = (b"<?xml version='1.0'?><urlset><url><loc>http://a/1</loc>"
           b"</url><url><loc>http://a/2</loc></url></urlset>")
    _assert_contained("sitemap_plain", xml, parse_sitemap,
                      (SitemapError,))
    _assert_contained("sitemap_gz", gzip.compress(xml), parse_sitemap,
                      (SitemapError,))


def test_fuzz_charset_decode_never_raises():
    from accelerator_spark.operators.charset import decode_bytes

    payload = "h\xe9llo <meta charset=windows-1252>".encode("cp1252")
    _assert_contained("charset", payload,
                      lambda b: decode_bytes(b, "text/html"), ())
    with pytest.raises(TypeError):
        # sanity: the helper itself still type-checks its contract
        decode_bytes(object(), None)
