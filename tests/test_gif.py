"""Pure-stdlib GIF codec tests (functions/gif.py).

Hypothesis round-trips (palette sizes x interlace x multi-frame), LZW
stress including 12-bit growth and CLEAR resets, malformed inputs,
Java ImageIO pixel-for-pixel cross-check on a committed fixture
corpus, real_decoder routing, and the distributed extract_frames ->
PNG pipeline.
"""

import glob
import os

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.gif import (
    GifError, _lzw_decode, _lzw_encode, frame_rgb, gif_decode, gif_encode)
from accelerator_spark.operators.multimodal import (
    decode_features, extract_frames, real_decoder)

PROP = settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "gif")


@PROP
@given(st.data())
def test_prop_gif_roundtrip(data):
    n_colors = data.draw(st.sampled_from([2, 4, 16, 256]))
    pal = bytes(data.draw(st.lists(st.integers(0, 255),
                                   min_size=3 * n_colors,
                                   max_size=3 * n_colors)))
    w = data.draw(st.integers(1, 24))
    h = data.draw(st.integers(1, 24))
    nframes = data.draw(st.integers(1, 3))
    frames = [data.draw(st.lists(st.integers(0, n_colors - 1),
                                 min_size=w * h, max_size=w * h))
              for _ in range(nframes)]
    inter = data.draw(st.booleans())
    delays = data.draw(st.lists(st.integers(0, 500), min_size=nframes,
                                max_size=nframes))
    img = gif_decode(gif_encode(frames, w, h, pal, delays_cs=delays,
                                interlace=inter))
    assert (img.width, img.height) == (w, h)
    assert len(img.frames) == nframes
    for f, src, d in zip(img.frames, frames, delays):
        assert list(f.indices) == src
        assert (f.width, f.height, f.delay_cs) == (w, h, d)
        assert f.palette == pal


@PROP
@given(st.data())
def test_prop_lzw_roundtrip(data):
    mcs = data.draw(st.integers(2, 8))
    src = data.draw(st.lists(st.integers(0, (1 << mcs) - 1), max_size=400))
    assert _lzw_decode(mcs, _lzw_encode(mcs, src), len(src)) == src


def test_gif_12bit_growth_and_runs():
    """High-entropy 400x300 forces the dictionary through every code
    width to the 12-bit cap and a CLEAR reset; long runs exercise the
    KwKwK special case."""
    import random

    rnd = random.Random(1)
    pal = bytes(rnd.randrange(256) for _ in range(768))
    fr = [rnd.randrange(256) for _ in range(400 * 300)]
    assert list(gif_decode(gif_encode([fr], 400, 300, pal)).frames[0]
                .indices) == fr
    runs = [s % 4 for s in ([0] * 3000 + [1, 0, 1, 1, 0] * 600)]
    assert _lzw_decode(2, _lzw_encode(2, runs), len(runs)) == runs


def test_gif_malformed():
    good = gif_encode([[0, 1, 2, 3]], 2, 2,
                      b"\x00" * 3 + b"\x55" * 3 + b"\xaa" * 3 + b"\xff" * 3)
    with pytest.raises(GifError, match="signature"):
        gif_decode(b"BMP" + good)
    with pytest.raises(GifError, match="truncated"):
        gif_decode(good[:20])
    with pytest.raises(GifError, match="palette"):
        gif_encode([[0]], 1, 1, b"\x00\x01")  # not multiple of 3
    with pytest.raises(GifError, match="palette"):
        gif_encode([[0]], 1, 1, b"\x00" * 9)  # 3 entries: not a power of 2
    with pytest.raises(GifError, match="index"):
        gif_encode([[7]], 1, 1, b"\x00" * 6)  # index beyond 2 colors
    with pytest.raises(GifError, match="expected"):
        gif_encode([[0]], 2, 2, b"\x00" * 6)  # wrong pixel count
    # LZW output bomb guard: frame descriptor says 1x1, data says more
    with pytest.raises(GifError):
        blob = bytearray(gif_encode([[0] * 100], 10, 10,
                                    b"\x00" * 6))
        # shrink the descriptor dims to 1x1 (offsets: screen dims at
        # 6..10; descriptor dims 5..9 bytes into the 0x2C block)
        at = bytes(blob).index(b"\x2c")
        blob[at + 5:at + 9] = b"\x01\x00\x01\x00"
        blob[6:10] = b"\x01\x00\x01\x00"
        gif_decode(bytes(blob))


def test_gif_fixture_corpus_matches_imageio(spark):
    """Committed GIF fixtures decode pixel-identically under our codec
    and the JVM's ImageIO (frame 0; ImageIO returns BGR bytes)."""
    files = sorted(glob.glob(os.path.join(FIXTURE_DIR, "*.gif")))
    assert len(files) >= 4, "fixture corpus missing — tools/make_gif_fixtures.py"
    ours = {}
    for f in files:
        img = gif_decode(open(f, "rb").read())
        ours[os.path.basename(f)] = (img.width, img.height,
                                     frame_rgb(img.frames[0]))
    rows = spark.read.format("image").load(FIXTURE_DIR).collect()
    assert len(rows) == len(files)
    for row in rows:
        img = row["image"]
        name = img.origin.rsplit("/", 1)[-1]
        w, h, rgb = ours[name]
        assert (img.width, img.height) == (w, h), name
        data, nch = bytes(img.data), img.nChannels
        got = []
        for p in range(w * h):
            b = data[p * nch:(p + 1) * nch]
            got.extend([b[2], b[1], b[0]] if nch >= 3 else [b[0]] * 3)
        assert tuple(got) == rgb, name


def test_real_decoder_gif_routing():
    pal = b"\xff\x00\x00" + b"\x00\x00\xff"  # red, blue
    blob = gif_encode([[0, 1]], 2, 1, pal)
    feat, w, h = real_decoder(blob, "image/gif")
    assert (w, h) == (2, 1)
    assert feat == [pytest.approx(0.5), pytest.approx(0.0),
                    pytest.approx(0.5)]
    # magic sniff without the mime
    feat2, _, _ = real_decoder(blob, "application/octet-stream")
    assert feat2 == feat


def test_extract_frames_distributed(spark):
    """Animated GIF -> per-frame PNG rows through the real pipeline;
    every_n sampling; on_error containment; PNG payloads re-decode to
    the exact palette-mapped pixels."""
    from accelerator_spark.functions.png import png_decode

    pal = bytes(range(48))  # 16 colors
    frames = [[i % 16 for i in range(12)], [15 - (i % 16) for i in range(12)],
              [5] * 12]
    gif3 = gif_encode(frames, 4, 3, pal, delays_cs=[1, 2, 3])
    df = spark.createDataFrame(
        [(1, gif3, "image/gif"), (2, b"corrupt", "image/gif")],
        "media_id long, payload binary, mime string")
    rows = extract_frames(df.filter("media_id = 1")).collect()
    assert [(r["frame_idx"], r["n_frames"], r["delay_cs"]) for r in
            sorted(rows, key=lambda r: r["frame_idx"])] == [
        (0, 3, 1), (1, 3, 2), (2, 3, 3)]
    for r in rows:
        png = png_decode(bytes(r["payload"]))
        assert (png.width, png.height) == (4, 3)
        f = frames[r["frame_idx"]]
        expect = []
        for i in f:
            expect.extend(pal[3 * i:3 * i + 3])
        assert png.pixels == tuple(expect)
    # sampling: every 2nd frame
    sampled = extract_frames(df.filter("media_id = 1"), every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]
    # containment
    out = extract_frames(df, on_error="null").collect()
    bad = [r for r in out if r["media_id"] == 2]
    assert len(bad) == 1 and bad[0]["payload"] is None
    with pytest.raises(Exception):
        extract_frames(df).collect()
    with pytest.raises(ValueError, match="every_n"):
        extract_frames(df, every_n=0)
    # the extracted PNGs feed decode_features(real_decoder) directly
    feats = decode_features(
        extract_frames(df.filter("media_id = 1")), decoder=real_decoder)
    assert feats.count() == 3
