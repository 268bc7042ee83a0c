"""Pure-stdlib baseline JPEG codec tests (functions/jpeg.py).

Exact round-trips on the unit-quant constant-block path, tolerance
round-trips elsewhere (two correct JPEG decoders may differ ~1/255 per
sample — the spec bounds IDCT accuracy, not bit-exact output), the
committed two-provenance fixture corpus cross-checked against Java
ImageIO in BOTH directions (our encoder -> their decoder, their
encoder incl. 4:2:0 subsampling -> our decoder), restart markers,
malformed/out-of-scope inputs, and the real_decoder / image_resizer
routing."""

import glob
import os
import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.jpeg import (
    JpegError, _fdct2, _idct2, jpeg_decode, jpeg_encode)
from accelerator_spark.operators.multimodal import (
    decode_features, image_resizer, real_decoder, resize_media)

PROP = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "jpeg")
UNIT_Q = ([1] * 64, [1] * 64)


def _const_blocks(vals, bw, bh):
    """bw*bh constant 8x8 blocks -> (pixels, w, h)."""
    w, h = 8 * bw, 8 * bh
    px = bytearray(w * h)
    for i, c in enumerate(vals):
        by, bx = divmod(i, bw)
        for y in range(8):
            for x in range(8):
                px[(by * 8 + y) * w + bx * 8 + x] = c
    return bytes(px), w, h


def test_dct_pair_is_inverse():
    rnd = random.Random(7)
    blk = [rnd.randrange(256) - 128 for _ in range(64)]
    back = _idct2(_fdct2(blk))
    assert max(abs(a - b) for a, b in zip(blk, back)) < 1e-9


@PROP
@given(st.data())
def test_prop_constant_blocks_exact(data):
    """Constant 8x8 blocks + unit quant tables round-trip EXACTLY:
    the only nonzero coefficient is an integer DC (8*(c-128)), and
    8s * 1/8 is exact in IEEE float — the lever the oracle gate uses
    on an otherwise lossy codec."""
    bw = data.draw(st.integers(1, 3))
    bh = data.draw(st.integers(1, 3))
    vals = data.draw(st.lists(st.integers(0, 255), min_size=bw * bh,
                              max_size=bw * bh))
    px, w, h = _const_blocks(vals, bw, bh)
    rst = data.draw(st.sampled_from([0, 1, 2]))
    img = jpeg_decode(jpeg_encode(px, w, h, channels=1, quant=UNIT_Q,
                                  restart_interval=rst))
    assert (img.width, img.height, img.channels) == (w, h, 1)
    assert img.pixels == px


@PROP
@given(st.data())
def test_prop_gray_q100_within_one(data):
    """quality=100 (all-ones tables): arbitrary content round-trips
    within +-1 per sample (quantization of sub-half coefficients)."""
    w = data.draw(st.integers(1, 20))
    h = data.draw(st.integers(1, 20))
    px = bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * h,
                                  max_size=w * h)))
    img = jpeg_decode(jpeg_encode(px, w, h, channels=1, quality=100))
    assert (img.width, img.height) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, img.pixels)) <= 1


def test_rgb_roundtrip_tolerance():
    """4:4:4 color at q95 on a smooth gradient: small loss from quant +
    two YCbCr conversions; sanity-bound it."""
    w, h = 16, 16
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([x * 8, y * 8, 128])
    img = jpeg_decode(jpeg_encode(bytes(px), w, h, channels=3, quality=95))
    assert img.channels == 3
    diffs = [abs(a - b) for a, b in zip(px, img.pixels)]
    assert max(diffs) <= 6 and sum(diffs) / len(diffs) <= 2


def test_restart_marker_roundtrip_and_sequence_check():
    rnd = random.Random(3)
    px = bytes(rnd.randrange(256) for _ in range(40 * 24))
    blob = jpeg_encode(px, 40, 24, channels=1, quality=100,
                       restart_interval=3)
    assert b"\xff\xdd" in blob  # DRI present
    img = jpeg_decode(blob)
    assert max(abs(a - b) for a, b in zip(px, img.pixels)) <= 1
    # corrupt the first RSTn's sequence number -> detected
    for m in range(8):
        i = blob.find(bytes([0xFF, 0xD0 + m]))
        if i > 0:
            bad = blob[:i + 1] + bytes([0xD0 + (m + 1) % 8]) + blob[i + 2:]
            with pytest.raises(JpegError, match="restart"):
                jpeg_decode(bad)
            break
    else:
        pytest.fail("no RST marker found")


def test_malformed_and_out_of_scope():
    px, w, h = _const_blocks([100], 1, 1)
    good = jpeg_encode(px, w, h, channels=1)
    with pytest.raises(JpegError, match="SOI"):
        jpeg_decode(b"PNG" + good)
    with pytest.raises(JpegError, match="truncated"):
        jpeg_decode(good[:20])
    with pytest.raises(JpegError, match="truncated"):
        jpeg_decode(good[:-12])  # cut inside entropy data
    # flip SOF0 -> SOF2: the baseline scan header (Se=63) is invalid
    # under progressive rules — caught, not mis-decoded
    i = good.find(b"\xff\xc0")
    prog = good[:i + 1] + b"\xc2" + good[i + 2:]
    with pytest.raises(JpegError, match="Se"):
        jpeg_decode(prog)
    # genuinely out-of-scope SOF: lossless sequential
    nosup = good[:i + 1] + b"\xc3" + good[i + 2:]
    with pytest.raises(JpegError, match="unsupported"):
        jpeg_decode(nosup)
    with pytest.raises(JpegError, match="max_pixels"):
        jpeg_decode(good, max_pixels=4)
    with pytest.raises(JpegError, match="quality"):
        jpeg_encode(px, w, h, quality=0)
    with pytest.raises(JpegError, match="samples"):
        jpeg_encode(px, w, h + 1, channels=1)
    with pytest.raises(JpegError, match="channels"):
        jpeg_encode(px, w, h, channels=2)


def _imageio_rgb(spark, path):
    """Decode one file with the JVM's ImageIO via Spark's image source
    -> (w, h, RGB bytes). ImageIO returns OpenCV-style BGR order and
    widens grayscale to 3 channels."""
    row = spark.read.format("image").load(path).collect()[0]["image"]
    data = bytes(row.data)
    nch = row.nChannels
    out = bytearray()
    for p in range(row.width * row.height):
        b = data[p * nch:(p + 1) * nch]
        if nch == 1:
            out += bytes([b[0], b[0], b[0]])
        else:
            out += bytes([b[2], b[1], b[0]])
    return row.width, row.height, bytes(out)


def _ours_rgb(img):
    if img.channels == 3:
        return img.pixels
    return bytes(v for p in img.pixels for v in (p, p, p))


def test_jpeg_fixture_corpus_matches_imageio(spark):
    """Two-provenance committed corpus, both codecs, pixel compare:
    ours_* files prove a FOREIGN decoder accepts our encoder's output;
    imageio_* files (written by ImageIO's encoder: 4:2:0 subsampling,
    its own tables) prove our decoder reads foreign files. Tolerances:
    4:4:4/grayscale differ only by IDCT + color-convert rounding (<=2);
    4:2:0 adds chroma-upsample rounding (both sides use the triangular
    'fancy' filter; ours composes the 1-D form separably — 1 ulp)."""
    files = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.jpg")))
    assert len(files) >= 13, "fixture corpus missing — see tools/make_jpeg_fixtures.py"
    assert sum("prog" in f for f in files) >= 3  # progressive covered
    assert any("420" in f for f in files)        # our 4:2:0 encoder
    for f in files:
        name = os.path.basename(f)
        mine = jpeg_decode(open(f, "rb").read())
        w, h, theirs = _imageio_rgb(spark, f)
        assert (w, h) == (mine.width, mine.height), name
        ours = _ours_rgb(mine)
        diffs = [abs(a - b) for a, b in zip(ours, theirs)]
        mx, mean = max(diffs), sum(diffs) / len(diffs)
        if name.startswith("imageio_") or "420" in name:
            # 4:2:0 files (either encoder): both decoders fancy-
            # upsample, diffs are rounding-sized
            assert mx <= 4 and mean <= 1, (name, mx, mean)
        else:
            assert mx <= 2, (name, mx, mean)


def test_unit_quant_fixture_exact():
    """The committed unit-quant constant-block fixture decodes to the
    exact generator pixels (regenerate via tools/make_jpeg_fixtures.py
    to see the construction)."""
    rnd = random.Random(20260815)
    for _ in range(24 * 17):
        rnd.randrange(256)  # gray corpus draw, discarded
    img = jpeg_decode(open(os.path.join(
        FIXTURE_DIR, "ours_gray_blocks_unitq.jpg"), "rb").read())
    vals = [rnd.randrange(256) for _ in range(8)]
    px, w, h = _const_blocks(vals, 4, 2)
    assert (img.width, img.height) == (w, h)
    assert img.pixels == px


def test_real_decoder_jpeg_features():
    px, w, h = _const_blocks([0, 255], 2, 1)
    feat, gw, gh = real_decoder(
        jpeg_encode(px, w, h, channels=1, quant=UNIT_Q), "image/jpeg")
    assert (gw, gh) == (w, h)
    assert feat == [pytest.approx(0.5)]
    with pytest.raises(JpegError):
        real_decoder(b"\xff\xd8\xff junk", "image/jpeg")


def test_decode_features_routes_real_jpeg(spark):
    px, w, h = _const_blocks([10, 20, 30, 40], 2, 2)
    df = spark.createDataFrame(
        [(1, jpeg_encode(px, w, h, channels=1, quant=UNIT_Q),
          "image/jpeg"),
         (2, b"\xff\xd8\xff corrupt", "image/jpeg")],
        "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_features(
        df, decoder=real_decoder, on_error="null").collect()}
    assert (out[1]["width"], out[1]["height"]) == (w, h)
    assert out[1]["feature"][0] == pytest.approx(25 / 255, rel=1e-5)
    assert out[2]["width"] is None
    assert out[2]["n_bytes"] == len(b"\xff\xd8\xff corrupt")


def test_image_resizer_unified_formats(spark):
    """VERDICT r6 #5: one resizer for every decodable image format.
    Constant-content sources resize to constant PNGs exactly; output
    payloads re-decode through the PNG codec."""
    from accelerator_spark.functions.gif import gif_encode
    from accelerator_spark.functions.png import png_decode, png_encode

    # JPEG (unit-quant constant blocks): exact through resize
    px, w, h = _const_blocks([77] * 8, 4, 2)
    blob, nw, nh = image_resizer(
        jpeg_encode(px, w, h, channels=1, quant=UNIT_Q),
        "image/jpeg", 8)
    assert (nw, nh) == (8, 4)
    assert png_decode(blob).pixels == (77,) * 32
    # GIF frame 0 -> RGB PNG at screen dims
    gif = gif_encode([bytes([1]) * 12], 4, 3,
                     palette=bytes([0, 0, 0, 10, 200, 30]))
    blob, nw, nh = image_resizer(gif, "image/gif", 2)
    assert (nw, nh) == (2, 1)
    img = png_decode(blob)
    assert img.channels == 3 and set(img.pixels) == {10, 200, 30}
    # PNG path unchanged (the r6 name still routes)
    from accelerator_spark.operators.multimodal import png_resizer
    assert png_resizer is image_resizer
    blob, nw, nh = image_resizer(png_encode([9, 9, 9, 9], 2, 2),
                                 "image/png", 1)
    assert (nw, nh) == (1, 1) and png_decode(blob).pixels == (9,)
    with pytest.raises(NotImplementedError, match="image_resizer"):
        image_resizer(b"RIFF....WEBP", "image/webp", 8)
    # distributed: mixed-format corpus through resize_media
    rows = [(1, jpeg_encode(px, w, h, channels=1, quant=UNIT_Q),
             "image/jpeg"),
            (2, gif, "image/gif"),
            (3, png_encode([1, 2, 3, 4], 2, 2), "image/png"),
            (4, b"not media", "text/plain")]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in resize_media(
        df, max_side=8, resizer=image_resizer, on_error="null").collect()}
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    assert (out[2]["width"], out[2]["height"]) == (4, 3)
    assert (out[3]["width"], out[3]["height"]) == (2, 2)
    assert out[4]["payload"] is None  # contained


def test_restart_accepts_fill_bytes():
    """Review r7: T.81 B.1.1.2 allows 0xFF fill bytes before any
    marker, restarts included — a conformant foreign file with padding
    must decode."""
    px, w, h = _const_blocks([50, 100, 150, 200], 4, 1)
    blob = jpeg_encode(px, w, h, channels=1, quant=UNIT_Q,
                       restart_interval=1)
    i = blob.find(b"\xff\xd0")
    assert i > 0
    padded = blob[:i] + b"\xff" + blob[i:]  # FF FF D0
    assert jpeg_decode(padded).pixels == px


def test_progressive_contract_guards():
    """Review r7: malformed progressive inputs stay inside the
    JpegError contract — truncation at a scan boundary (EOI is the only
    completeness signal progressive has), zero-component scans, and
    refinement scans naming a missing Huffman table."""
    blob = open(os.path.join(FIXTURE_DIR, "imageio_prog_smooth.jpg"),
                "rb").read()
    full = jpeg_decode(blob)
    assert (full.width, full.height) == (24, 16)
    # cut right before the SECOND SOS: only the DC-first scan survives;
    # must raise, not silently decode a lower-fidelity image
    first_sos = blob.find(b"\xff\xda")
    second_sos = blob.find(b"\xff\xda", first_sos + 2)
    assert second_sos > 0
    with pytest.raises(JpegError, match="truncated"):
        jpeg_decode(blob[:second_sos])
    # zero-component scan header
    ns_off = first_sos + 4  # marker(2) + length(2) -> ns byte
    zeroed = blob[:ns_off] + b"\x00" + blob[ns_off + 1:]
    with pytest.raises(JpegError, match="zero components"):
        jpeg_decode(zeroed)
    # strip every DHT: the FIRST scan (whether DC-first or a
    # refinement) must raise the missing-table JpegError, never an
    # AttributeError/KeyError escape
    out = bytearray()
    i = 2
    out += blob[:2]
    while i + 1 < len(blob):
        if blob[i] == 0xFF and blob[i + 1] == 0xC4:
            ln = (blob[i + 2] << 8) | blob[i + 3]
            i += 2 + ln
            continue
        out.append(blob[i])
        i += 1
    out += blob[i:]
    with pytest.raises(JpegError, match="missing .. table|missing"):
        jpeg_decode(bytes(out))


def test_encoder_420_subsampling():
    """r7: the encoder's 4:2:0 mode — SOF declares 2x2/1x1/1x1
    sampling, chroma planes are 2x2 box averages, the decoder reads it
    back within chroma-averaging loss, and flat-chroma images (where
    averaging loses nothing) round-trip as tightly as 4:4:4."""
    w, h = 19, 11  # odd dims exercise edge replication both ways
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 255) // 18, (y * 255) // 10, 128])
    blob = jpeg_encode(bytes(px), w, h, channels=3, quality=95,
                       subsampling="4:2:0")
    i = blob.find(b"\xff\xc0")
    assert blob[i + 11] == 0x22 and blob[i + 14] == 0x11
    img = jpeg_decode(blob)
    assert (img.width, img.height, img.channels) == (w, h, 3)
    diffs = [abs(a - b) for a, b in zip(px, img.pixels)]
    # loss is bounded by chroma averaging over the gradient steps
    assert max(diffs) <= 16 and sum(diffs) / len(diffs) <= 2.5
    # restart markers compose with 4:2:0 MCUs
    blob_rst = jpeg_encode(bytes(px), w, h, channels=3, quality=95,
                           subsampling="4:2:0", restart_interval=1)
    img2 = jpeg_decode(blob_rst)
    assert img2.pixels == img.pixels
    with pytest.raises(JpegError, match="subsampling"):
        jpeg_encode(bytes(px), w, h, channels=3, subsampling="4:1:1")
    # a typo'd value raises for GRAYSCALE too (review r7: it was
    # silently coerced to 4:4:4 before the validity check ran)
    with pytest.raises(JpegError, match="subsampling"):
        jpeg_encode(bytes(range(64)), 8, 8, channels=1,
                    subsampling="420")
    # gray ignores the knob entirely
    g = bytes(range(64))
    assert jpeg_decode(jpeg_encode(g, 8, 8, subsampling="4:2:0")).pixels \
        == jpeg_decode(jpeg_encode(g, 8, 8)).pixels


def test_jpeg_encode_quant_table_validation():
    """ADVICE r7: caller-supplied quant entries outside 1..255 escaped
    the JpegError contract (0 -> ZeroDivisionError in _encode_block;
    fractional/negative -> KeyError past the fixed Huffman size
    categories). Validate up front with the same clamp _scale_q uses."""
    px = [128] * 64
    for bad in ([0] * 64, [-1] * 64, [256] * 64, [1.5] * 64,
                [1] * 63 + [0]):
        with pytest.raises(JpegError, match="quant"):
            jpeg_encode(px, 8, 8, channels=1, quant=(bad, [1] * 64))
        with pytest.raises(JpegError, match="quant"):
            jpeg_encode(px, 8, 8, channels=1, quant=([1] * 64, bad))
    # boundary values stay accepted
    jpeg_decode(jpeg_encode(px, 8, 8, channels=1,
                            quant=([255] * 64, [1] * 64)))


# ------------------------------------------------------- EXIF orientation

def _exif_app1(orientation: int, byte_order: str = "II",
               tag_type: int = 3) -> bytes:
    """Hand-authored APP1 segment: Exif header + TIFF with a 1-entry
    IFD0 carrying the orientation tag. ImageIO ignores EXIF, so these
    fixtures are spec-authored (VERDICT r7 #5)."""
    import struct

    e = "<" if byte_order == "II" else ">"
    tiff = (byte_order.encode()
            + struct.pack(e + "H", 42)
            + struct.pack(e + "I", 8)           # IFD0 at offset 8
            + struct.pack(e + "H", 1)           # one entry
            + struct.pack(e + "HHI", 0x0112, tag_type, 1)
            + struct.pack(e + "H", orientation) + b"\x00\x00"
            + struct.pack(e + "I", 0))          # no next IFD
    body = b"Exif\x00\x00" + tiff
    import struct as _s
    return b"\xff\xe1" + _s.pack(">H", 2 + len(body)) + body


def _splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    return jpeg[:2] + app1 + jpeg[2:]


def test_exif_orientation_parsed_both_byte_orders():
    base = jpeg_encode([99] * 64, 8, 8, channels=1, quant=UNIT_Q)
    assert jpeg_decode(base).orientation == 1
    for k in range(1, 9):
        for bo in ("II", "MM"):
            img = jpeg_decode(_splice_app1(base, _exif_app1(k, bo)))
            assert img.orientation == k, (k, bo)
            assert img.pixels == jpeg_decode(base).pixels  # never applied


def test_exif_malformed_never_fails_decode():
    """EXIF is bolted-on third-party metadata: every mangled shape
    leaves orientation at 1 and the pixel decode intact."""
    base = jpeg_encode([50] * 64, 8, 8, channels=1, quant=UNIT_Q)
    good = jpeg_decode(base).pixels
    import struct

    def app1(body: bytes) -> bytes:
        return b"\xff\xe1" + struct.pack(">H", 2 + len(body)) + body

    cases = [
        _exif_app1(9),                          # out-of-range value
        _exif_app1(0),
        _exif_app1(6, tag_type=4),              # wrong type (LONG)
        app1(b"Exif\x00\x00"),                  # empty TIFF body
        app1(b"Exif\x00\x00XX" + b"\x00" * 8),  # bad byte order
        app1(_exif_app1(6)[4:14]),              # truncated mid-TIFF
    ]
    for app1 in cases:
        img = jpeg_decode(_splice_app1(base, app1))
        assert img.orientation == 1
        assert img.pixels == good


def test_apply_exif_orientation_hand_checked():
    """All 8 transforms on an asymmetric 2x3 image, expectations
    written out by hand from the tag semantics."""
    from accelerator_spark.functions.jpeg import apply_exif_orientation

    # w=2, h=3, values:   a b
    #                     c d
    #                     e f
    a, b, c, d, e, f = range(10, 16)
    px = bytes([a, b, c, d, e, f])
    want = {
        1: (px, 2, 3),
        2: (bytes([b, a, d, c, f, e]), 2, 3),          # flip H
        3: (bytes([f, e, d, c, b, a]), 2, 3),          # rot 180
        4: (bytes([e, f, c, d, a, b]), 2, 3),          # flip V
        5: (bytes([a, c, e, b, d, f]), 3, 2),          # transpose
        6: (bytes([e, c, a, f, d, b]), 3, 2),          # rot 90 CW
        7: (bytes([f, d, b, e, c, a]), 3, 2),          # transverse
        8: (bytes([b, d, f, a, c, e]), 3, 2),          # rot 270 CW
    }
    for k, (wpx, ww, wh) in want.items():
        got = apply_exif_orientation(px, 2, 3, 1, k)
        assert got == (wpx, ww, wh), k
    # involutions / inverse pairs close the algebra
    for k in (2, 3, 4, 5, 7):
        p1, w1, h1 = apply_exif_orientation(px, 2, 3, 1, k)
        assert apply_exif_orientation(p1, w1, h1, 1, k) == (px, 2, 3)
    p6, w6, h6 = apply_exif_orientation(px, 2, 3, 1, 6)
    assert apply_exif_orientation(p6, w6, h6, 1, 8) == (px, 2, 3)
    # multi-channel: samples move together
    rgb = bytes(range(18))
    p, w2, h2 = apply_exif_orientation(rgb, 2, 3, 3, 6)
    assert (w2, h2) == (3, 2)
    assert p[0:3] == rgb[12:15]  # out(0,0) = src(0,2) = pixel e
    with pytest.raises(JpegError, match="orientation"):
        apply_exif_orientation(px, 2, 3, 1, 11)


def test_image_resizer_applies_exif_orientation():
    """An orientation-6 (portrait phone) JPEG through image_resizer
    comes out rotated upright: dims swap and the constant-block layout
    lands where a 90-degree clockwise rotation puts it."""
    from accelerator_spark.functions.png import png_decode

    # 8x16 grayscale: block A=40 on top, B=200 below
    px, w, h = _const_blocks([40, 200], 1, 2)
    blob = _splice_app1(
        jpeg_encode(list(px), w, h, channels=1, quant=UNIT_Q),
        _exif_app1(6))
    out, nw, nh = image_resizer(blob, "image/jpeg", max_side=16)
    assert (nw, nh) == (16, 8)
    back = png_decode(out)
    # rot 90 CW: the top block (A) moves to the RIGHT half
    for y in range(8):
        row = back.pixels[y * 16:(y + 1) * 16]
        assert set(row[:8]) == {200} and set(row[8:]) == {40}
    # without the tag, dims stay sensor-order
    out2, nw2, nh2 = image_resizer(
        jpeg_encode(list(px), w, h, channels=1, quant=UNIT_Q),
        "image/jpeg", max_side=16)
    assert (nw2, nh2) == (8, 16)


# ---------------------------------------------------- progressive ENCODER

def test_progressive_encoder_roundtrip_exact_and_tolerance():
    """r8: spectral-selection SOF2 encoder. Unit-quant constant blocks
    round-trip EXACTLY through our own progressive decoder; smooth
    content at q95 stays within the codec tolerance; band partition
    validation."""
    from accelerator_spark.functions.jpeg import jpeg_encode_progressive

    px, w, h = _const_blocks([31, 99, 180, 255], 2, 2)
    img = jpeg_decode(jpeg_encode_progressive(list(px), w, h,
                                              channels=1, quant=UNIT_Q))
    assert (img.width, img.height) == (w, h)
    assert img.pixels == tuple(px) if isinstance(img.pixels, tuple) \
        else bytes(img.pixels) == px
    # single-band and three-band scripts agree with the default
    for bands in (((1, 63),), ((1, 2), (3, 17), (18, 63))):
        img2 = jpeg_decode(jpeg_encode_progressive(
            list(px), w, h, channels=1, quant=UNIT_Q, bands=bands))
        assert bytes(img2.pixels) == px, bands
    # color gradient, q95 tolerance
    rgb = [v for y in range(10) for x in range(11)
           for v in (x * 9 % 256, y * 11 % 256, (x + y) * 7 % 256)]
    img3 = jpeg_decode(jpeg_encode_progressive(rgb, 11, 10, channels=3,
                                               quality=95))
    assert max(abs(a - b) for a, b in zip(rgb, img3.pixels)) <= 4
    # bands must partition 1..63 contiguously
    for bad in (((1, 5),), ((2, 63),), ((1, 5), (7, 63)),
                ((1, 63), (1, 63))):
        with pytest.raises(JpegError, match="bands"):
            jpeg_encode_progressive([0] * 64, 8, 8, channels=1,
                                    bands=bad)


def test_progressive_encoder_imageio_foreign_decode(spark, tmp_path):
    """The interop direction r7 couldn't cover: OUR progressive (SOF2)
    files decoded by the foreign Java ImageIO decoder. Unit-quant
    constant blocks compare EXACTLY; q90 content within the standard
    cross-decoder tolerance."""
    from accelerator_spark.functions.jpeg import jpeg_encode_progressive

    # exact case: constant blocks, unit quant, grayscale
    px, w, h = _const_blocks([10, 77, 140, 203, 255, 32], 3, 2)
    p1 = str(tmp_path / "prog_exact.jpg")
    with open(p1, "wb") as f:
        f.write(jpeg_encode_progressive(list(px), w, h, channels=1,
                                        quant=UNIT_Q))
    iw, ih, irgb = _imageio_rgb(spark, p1)
    assert (iw, ih) == (w, h)
    assert irgb == bytes(v for p in px for v in (p, p, p))
    # tolerance case: color noise at q90, multi-band
    import random
    rnd = random.Random(42)
    w2, h2 = 21, 13
    rgb = [rnd.randrange(256) for _ in range(w2 * h2 * 3)]
    blob = jpeg_encode_progressive(rgb, w2, h2, channels=3, quality=90)
    p2 = str(tmp_path / "prog_tol.jpg")
    with open(p2, "wb") as f:
        f.write(blob)
    iw, ih, irgb = _imageio_rgb(spark, p2)
    assert (iw, ih) == (w2, h2)
    ours = jpeg_decode(blob)
    # ImageIO and our decoder agree on OUR progressive file within the
    # spec's cross-decoder tolerance (IDCT + color-convert rounding)
    diffs = [abs(a - b) for a, b in zip(_ours_rgb(ours), irgb)]
    assert max(diffs) <= 3 and sum(diffs) / len(diffs) < 1.0
