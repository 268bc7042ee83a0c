"""Header-only image metadata probe tests (functions/imagemeta.py).

PNG/GIF/JPEG probe results are cross-checked against the REAL decoders
(two independent code paths over the same bytes); WebP/BMP against
hand-derived spec golden bytes and builder round-trips; hostile inputs;
and the distributed probe_image_meta integration."""

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.imagemeta import (
    ImageMetaError, bmp_build, image_probe, webp_build_extended,
    webp_build_lossless, webp_build_lossy)
from accelerator_spark.operators.multimodal import probe_image_meta

PROP = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


@PROP
@given(st.data())
def test_prop_png_probe_matches_decoder(data):
    from accelerator_spark.functions.png import png_decode, png_encode

    w = data.draw(st.integers(1, 12))
    h = data.draw(st.integers(1, 12))
    color = data.draw(st.sampled_from([0, 2, 4, 6]))
    ch = {0: 1, 2: 3, 4: 2, 6: 4}[color]
    px = data.draw(st.lists(st.integers(0, 255), min_size=w * h * ch,
                            max_size=w * h * ch))
    blob = png_encode(px, w, h, color_type=color)
    m = image_probe(blob)
    img = png_decode(blob)
    assert (m.format, m.width, m.height) == ("png", img.width,
                                             img.height)
    assert (m.channels, m.bit_depth) == (img.channels, img.bit_depth)
    assert m.has_alpha == (color in (4, 6))
    assert (m.n_frames, m.orientation) == (1, 1)


@PROP
@given(st.data())
def test_prop_gif_probe_matches_decoder(data):
    from accelerator_spark.functions.gif import gif_decode, gif_encode

    w = data.draw(st.integers(1, 10))
    h = data.draw(st.integers(1, 10))
    nframes = data.draw(st.integers(1, 4))
    inter = data.draw(st.booleans())
    frames = [data.draw(st.lists(st.integers(0, 3), min_size=w * h,
                                 max_size=w * h))
              for _ in range(nframes)]
    blob = gif_encode(frames, w, h, bytes(12), interlace=inter)
    m = image_probe(blob)
    img = gif_decode(blob)
    assert (m.format, m.width, m.height) == ("gif", img.width,
                                             img.height)
    assert m.n_frames == len(img.frames) == nframes
    assert m.progressive == inter


def test_jpeg_probe_matches_decoder_and_exif():
    from accelerator_spark.functions.jpeg import jpeg_decode, jpeg_encode
    from test_jpeg import _exif_app1, _splice_app1

    for w, h, ch in [(8, 8, 1), (16, 8, 3), (13, 7, 3)]:
        blob = jpeg_encode([100] * (w * h * ch), w, h, channels=ch)
        m = image_probe(blob)
        img = jpeg_decode(blob)
        assert (m.format, m.width, m.height) == ("jpeg", img.width,
                                                 img.height)
        assert m.channels == img.channels
        assert (m.progressive, m.orientation) == (False, 1)
    # EXIF orientation surfaces without decode
    blob = _splice_app1(jpeg_encode([5] * 64, 8, 8, channels=1),
                        _exif_app1(6))
    m = image_probe(blob)
    assert m.orientation == 6 == jpeg_decode(blob).orientation
    # progressive flag from a real ImageIO-written SOF2 fixture corpus
    import glob
    import os
    fdir = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")
    prog = sorted(glob.glob(os.path.join(fdir, "*progressive*")))
    if prog:
        assert image_probe(open(prog[0], "rb").read()).progressive


def test_webp_golden_spec_bytes():
    """Hand-derived WebP chunks, field-by-field from the VP8/VP8L/VP8X
    specs (no foreign WebP reader ships in this container)."""
    # VP8 lossy: RIFF/WEBP + VP8 chunk, frame tag + 9d012a + 14-bit dims
    body = b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", 640, 480)
    golden = (b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
              + b"VP8 " + struct.pack("<I", len(body)) + body)
    m = image_probe(golden)
    assert (m.format, m.width, m.height) == ("webp", 640, 480)
    assert webp_build_lossy(640, 480) == golden
    # VP8L lossless: signature 0x2f + packed (w-1 | (h-1)<<14 | a<<28)
    bits = (97 - 1) | ((33 - 1) << 14) | (1 << 28)
    lbody = b"\x2f" + bits.to_bytes(4, "little")
    lgolden = (b"RIFF" + struct.pack("<I", 4 + 8 + len(lbody) + 1)
               + b"WEBP" + b"VP8L" + struct.pack("<I", len(lbody))
               + lbody + b"\x00")
    m = image_probe(lgolden)
    assert (m.width, m.height, m.has_alpha) == (97, 33, True)
    assert webp_build_lossless(97, 33, alpha=True) == lgolden
    # VP8X animated: canvas 24-bit dims + 3 ANMF frames
    m = image_probe(webp_build_extended(2000, 1000, n_frames=3,
                                        alpha=True))
    assert (m.width, m.height, m.n_frames, m.has_alpha) == \
        (2000, 1000, 3, True)


def test_bmp_and_malformed():
    m = image_probe(bmp_build(320, 200))
    assert (m.format, m.width, m.height, m.bit_depth) == \
        ("bmp", 320, 200, 24)
    # top-down BMP (negative height) reports absolute dims
    blob = bytearray(bmp_build(32, 16))
    blob[22:26] = struct.pack("<i", -16)
    assert image_probe(bytes(blob)).height == 16
    with pytest.raises(ImageMetaError, match="magic"):
        image_probe(b"\x00not an image")
    with pytest.raises(ImageMetaError, match="magic"):
        image_probe(b"")
    with pytest.raises(ImageMetaError, match="truncated"):
        image_probe(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10)
    with pytest.raises(ImageMetaError, match="overruns"):
        image_probe(webp_build_lossy(10, 10)[:-3])
    with pytest.raises(ImageMetaError, match="truncated WebP"):
        image_probe(b"RIFF\x04\x00\x00\x00WEBP")
    with pytest.raises(ImageMetaError, match="no VP8"):
        image_probe(b"RIFF\x0c\x00\x00\x00WEBP"
                    b"JUNK\x00\x00\x00\x00")
    # GIF with garbage block type
    from accelerator_spark.functions.gif import gif_encode
    g = bytearray(gif_encode([[0]], 1, 1, bytes(6)))
    at = bytes(g).index(b"\x2c")
    g[at] = 0x7E
    with pytest.raises(ImageMetaError, match="bad GIF block"):
        image_probe(bytes(g))
    # JPEG cut before SOF
    from accelerator_spark.functions.jpeg import jpeg_encode
    j = jpeg_encode([0] * 64, 8, 8, channels=1)
    at = j.index(b"\xff\xc0")
    with pytest.raises(ImageMetaError, match="truncated|no SOF"):
        image_probe(j[:at + 3])


def test_advice_r8_gif_bit_depth_from_color_resolution():
    """ADVICE r8: GIF bit_depth comes from the logical-screen 'color
    resolution' field (bits 4-6 of the packed byte), not from the
    global-color-table SIZE field (bits 0-2) — headers where the two
    differ must report the former."""
    from accelerator_spark.functions.gif import gif_encode

    g = bytearray(gif_encode([[0] * 4], 2, 2, bytes(12)))  # 4-color GCT
    packed = g[10]
    assert packed & 0x07 == 1  # table-size field: 2<<1 == 4 colors
    # color resolution 7 (8 bits/primary), table size unchanged
    g[10] = (packed & 0x8F) | (7 << 4)
    m = image_probe(bytes(g))
    assert (m.width, m.height, m.bit_depth) == (2, 2, 8)
    # color resolution 0 with a 256-entry table: depth 1, and the
    # table-size field still governs the palette skip (probe walks on)
    g2 = bytearray(gif_encode([[0] * 4], 2, 2, bytes(768)))
    assert g2[10] & 0x07 == 7
    g2[10] = g2[10] & 0x8F
    m2 = image_probe(bytes(g2))
    assert (m2.bit_depth, m2.n_frames) == (1, 1)


def test_probe_image_meta_distributed(spark):
    from accelerator_spark.functions.png import png_encode

    rows_in = [
        (1, png_encode([7, 8, 9, 10], 2, 2, color_type=0), ""),
        (2, webp_build_extended(800, 600, n_frames=2), "image/webp"),
        (3, b"\xff\xd8corrupt", "image/jpeg"),
    ]
    df = spark.createDataFrame(
        rows_in, "media_id long, payload binary, mime string")
    got = {r["media_id"]: r
           for r in probe_image_meta(df, on_error="null").collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == \
        ("png", 2, 2)
    assert (got[2]["format"], got[2]["n_frames"]) == ("webp", 2)
    assert got[3]["format"] is None and got[3]["n_bytes"] == 9


def test_review_r8_hardening():
    """Review r8: dims that would overflow the IntegerType schema (or
    are zero/negative) raise and get contained instead of aborting the
    Arrow batch; truncated GIFs raise instead of under-counting; all
    progressive-DCT SOF variants set the flag."""
    import struct as _s

    from accelerator_spark.functions.gif import gif_encode
    from accelerator_spark.functions.jpeg import jpeg_encode
    from accelerator_spark.functions.png import png_encode

    # PNG declaring width 2^31: probe raises (Arrow int32 ceiling)
    blob = bytearray(png_encode([0, 0, 0, 0], 2, 2, color_type=0))
    blob[16:20] = _s.pack(">I", 1 << 31)
    with pytest.raises(ImageMetaError, match="invalid PNG dimensions"):
        image_probe(bytes(blob))
    # GIF cut at a block boundary (before the 0x3B trailer)
    g = gif_encode([[0]] * 3, 1, 1, bytes(6))
    with pytest.raises(ImageMetaError, match="no trailer"):
        image_probe(g[:-1])
    # BMP negative width is corrupt, not a dimension
    b = bytearray(bmp_build(10, 10))
    b[18:22] = _s.pack("<i", -1)
    with pytest.raises(ImageMetaError, match="invalid BMP"):
        image_probe(bytes(b))
    # SOF10 (progressive arithmetic) sets the progressive flag
    j = bytearray(jpeg_encode([0] * 64, 8, 8, channels=1))
    at = bytes(j).index(b"\xff\xc0")
    j[at + 1] = 0xCA
    assert image_probe(bytes(j)).progressive is True


def test_review_r8_containment_end_to_end(spark):
    """The overflow-dims row is contained by on_error='null' (the
    whole point of raising inside per_row, review r8)."""
    import struct as _s

    from accelerator_spark.functions.png import png_encode

    blob = bytearray(png_encode([0, 0, 0, 0], 2, 2, color_type=0))
    blob[16:20] = _s.pack(">I", 1 << 31)
    df = spark.createDataFrame(
        [(1, bytes(blob), "image/png")],
        "media_id long, payload binary, mime string")
    rows = probe_image_meta(df, on_error="null").collect()
    assert rows[0]["format"] is None and rows[0]["n_bytes"] > 0


def test_tiff_golden_spec_bytes_and_pages():
    """Hand-derived little-endian TIFF header: II + 42 + IFD at 8,
    three entries (256=LONG 640, 257=LONG 480, 274=SHORT 6), no next
    IFD — written out field-by-field from TIFF 6.0 §2."""
    from accelerator_spark.functions.imagemeta import tiff_build

    golden = (b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
              + struct.pack("<H", 3)
              + struct.pack("<HHI", 256, 4, 1) + struct.pack("<I", 640)
              + struct.pack("<HHI", 257, 4, 1) + struct.pack("<I", 480)
              + struct.pack("<HHI", 274, 3, 1)
              + struct.pack("<H", 6) + b"\x00\x00"
              + struct.pack("<I", 0))
    m = image_probe(golden)
    assert (m.format, m.width, m.height) == ("tiff", 640, 480)
    assert (m.orientation, m.n_frames) == (6, 1)
    # builder/probe round-trips: big-endian, multi-page, depth
    for bo in ("II", "MM"):
        m = image_probe(tiff_build(97, 33, depth=16, n_pages=3,
                                   orientation=8, byte_order=bo))
        assert (m.format, m.width, m.height) == ("tiff", 97, 33), bo
        assert (m.bit_depth, m.n_frames, m.orientation) == (16, 3, 8)
    # malformed: bad magic number (caught by the 4-byte sniff),
    # truncated IFD, zero dims
    with pytest.raises(ImageMetaError, match="magic"):
        image_probe(b"II\x2b\x00" + b"\x00" * 8)
    with pytest.raises(ImageMetaError, match="truncated TIFF"):
        image_probe(tiff_build(4, 4)[:12])
    with pytest.raises(ImageMetaError, match="invalid TIFF"):
        image_probe(tiff_build(4, 4).replace(
            struct.pack("<I", 4), struct.pack("<I", 0), 1))
