"""Format sniffing tests (operators/sniff.py) over REAL builder
outputs from across the package — every format the engine parses must
sniff to the family that parses it."""

import gzip

from accelerator_spark.operators.sniff import (
    corpus_inventory, sniff_blobs, sniff_format)


def test_real_builder_outputs_sniff_correctly():
    from accelerator_spark.functions.docx import docx_build, xlsx_build
    from accelerator_spark.functions.rtf import rtf_build
    from accelerator_spark.sources.mail import mbox_build
    from accelerator_spark.sources.tar import tar_build
    from accelerator_spark.sources.warc import warc_build

    cases = {
        ("document", "docx"): docx_build(["p"]),
        ("document", "xlsx"): xlsx_build({"S": [["a"]]}),
        ("document", "rtf"): rtf_build(["p"]),
        ("document", "mbox"): mbox_build([b"H: v\n\nbody"]),
        ("archive", "tar"): tar_build([("a.txt", b"x")]),
        ("archive", "tar.gz"): tar_build([("a.txt", b"x")],
                                         gzip_compress=True),
    }
    for expect, data in cases.items():
        assert sniff_format(data) == expect, expect
    rec = [{"warc_type": "response", "target_uri": "http://x/",
            "payload": b"<i>", "http": (200, "text/html")}]
    assert sniff_format(warc_build(rec)) == ("web", "warc")
    assert sniff_format(warc_build(rec, gzip_members=True)) == \
        ("web", "warc.gz")


def test_magic_heads():
    cases = {
        b"\x89PNG\r\n\x1a\n" + b"\0" * 20: ("image", "png"),
        b"GIF89a" + b"\0" * 20: ("image", "gif"),
        b"\xff\xd8\xff\xe0" + b"\0" * 20: ("image", "jpeg"),
        b"RIFF\x10\0\0\0WEBPVP8 ": ("image", "webp"),
        b"II*\x00" + b"\0" * 30: ("image", "tiff"),
        b"BM" + b"\0" * 30: ("image", "bmp"),
        b"RIFF\x10\0\0\0WAVEfmt ": ("audio", "wav"),
        b"fLaC\0\0\0\x22": ("audio", "flac"),
        b"OggS\0\x02" + b"\0" * 20: ("audio", "ogg"),
        b"ID3\x04\0\0\0\0\0\0": ("audio", "mp3"),
        b"\xff\xfb\x90\x00" + b"\0" * 20: ("audio", "mp3"),
        b"\0\0\0\x18ftypisom" + b"\0" * 8: ("video", "mp4"),
        b"\x1aE\xdf\xa3" + b"\0" * 20: ("video", "webm"),
        b"%PDF-1.7\n": ("document", "pdf"),
        b"{\\rtf1 x}": ("document", "rtf"),
        b"WARC/1.0\r\n": ("web", "warc"),
        b"Obj\x01\0": ("data", "avro"),
        b"PAR1" + b"\0" * 10: ("data", "parquet"),
        b"ARROW1\0\0": ("data", "arrow"),
        b"  <!DOCTYPE HTML><html>": ("web", "html"),
        b"<?xml version='1.0'?><a/>": ("document", "xml"),
        b'{"k": 1}': ("text", "json"),
        b"plain old words\nline two\n": ("text", "plain"),
        b"\x00\x01\x02\x03" * 64: ("unknown", "binary"),
        b"": ("unknown", "empty"),
    }
    for data, expect in cases.items():
        assert sniff_format(data) == expect, (expect, data[:12])


def test_gzip_peek_one_level():
    assert sniff_format(gzip.compress(b"%PDF-1.4\n")) == \
        ("document", "pdf.gz")
    assert sniff_format(gzip.compress(b"WARC/1.0\r\nx")) == \
        ("web", "warc.gz")
    # nested gzip stops at one level; corrupt member flagged
    assert sniff_format(gzip.compress(gzip.compress(b"x")))[1] == "gzip"
    assert sniff_format(b"\x1f\x8b\x08\0junkjunk") == \
        ("archive", "gzip-corrupt")


def test_dataframe_inventory(spark):
    rows = [(1, bytearray(b"%PDF-1.4 x")), (2, bytearray(b"GIF89a\0\0")),
            (3, bytearray(b"%PDF-1.5 y")), (4, None)]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    inv = {(r.family, r.format): (r.n_files, r.total_bytes)
           for r in corpus_inventory(df).collect()}
    assert inv[("document", "pdf")] == (2, 20)
    assert inv[("image", "gif")] == (1, 8)
    blobs = {r.media_id: r.format for r in sniff_blobs(df).collect()}
    assert blobs[4] is None
