"""FLAC STREAMINFO and Ogg (Opus/Vorbis) metadata probe tests
(functions/flac.py, functions/ogg.py).

Hand-derived golden bytes authored field-by-field from the FLAC format
spec / RFC 3533 + RFC 7845 / Vorbis I (independent of the builders —
no foreign FLAC/Ogg reader ships in this container, the mp4-golden
pattern), builder <-> probe property round-trips, hostile inputs, and
the probe_audio_meta routing integration."""

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.flac import (
    FlacError, flac_build, flac_probe)
from accelerator_spark.functions.ogg import (
    OggError, ogg_build_opus, ogg_build_vorbis, ogg_probe)
from accelerator_spark.operators.multimodal import probe_audio_meta

PROP = settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


def test_flac_golden_spec_bytes_and_builder_agreement():
    """STREAMINFO written out longhand: 44100 Hz, 2 channels, 16 bps,
    882000 total samples (20 s). The 64-bit group is
    rate(20) | ch-1(3) | bps-1(5) | total(36):
    44100<<44 | 1<<41 | 15<<36 | 882000."""
    group = (44100 << 44) | (1 << 41) | (15 << 36) | 882000
    info = (b"\x10\x00\x10\x00" + b"\x00" * 6
            + group.to_bytes(8, "big") + b"\x00" * 16)
    golden = b"fLaC" + b"\x80" + len(info).to_bytes(3, "big") + info
    m = flac_probe(golden)
    assert (m.sample_rate, m.n_channels, m.bits_per_sample) == \
        (44100, 2, 16)
    assert m.total_samples == 882000
    assert m.duration_s == pytest.approx(20.0)
    assert (m.n_meta_blocks, m.meta_bytes) == (1, len(golden))
    # builder reproduces the golden bytes
    assert flac_build(44100, 2, 16, 882000) == golden


def test_flac_extra_blocks_and_malformed():
    blob = flac_build(48000, 1, 24, 10**9,
                      extra_blocks=[(4, b"vendor\x00comment"),
                                    (3, b"\x00" * 18)])
    m = flac_probe(blob)
    assert (m.sample_rate, m.n_channels, m.bits_per_sample) == \
        (48000, 1, 24)
    assert m.n_meta_blocks == 3 and m.meta_bytes == len(blob)
    with pytest.raises(FlacError, match="magic"):
        flac_probe(b"fLaX" + blob[4:])
    with pytest.raises(FlacError, match="truncated"):
        flac_probe(blob[:6])   # mid-block-header cut
    with pytest.raises(FlacError, match="overruns"):
        flac_probe(blob[:10])  # header ok, payload cut
    with pytest.raises(FlacError, match="overruns"):
        flac_probe(blob[:-4])
    # first block must be STREAMINFO
    bad = b"fLaC" + b"\x84\x00\x00\x02xx"
    with pytest.raises(FlacError, match="not STREAMINFO"):
        flac_probe(bad)
    # wrong STREAMINFO length
    with pytest.raises(FlacError, match="34 bytes"):
        flac_probe(b"fLaC" + b"\x80\x00\x00\x02xx")
    # duplicate STREAMINFO
    dup = flac_build(8000, 1, 8, 0,
                     extra_blocks=[(0, b"\x00" * 34)])
    with pytest.raises(FlacError, match="duplicate"):
        flac_probe(dup)
    # builder validation
    for kwargs in [dict(sample_rate=0), dict(n_channels=9),
                   dict(bits_per_sample=33),
                   dict(total_samples=1 << 36)]:
        args = dict(sample_rate=44100, n_channels=2,
                    bits_per_sample=16, total_samples=1)
        args.update(kwargs)
        with pytest.raises(FlacError):
            flac_build(**args)


@PROP
@given(st.data())
def test_prop_flac_build_probe_roundtrip(data):
    rate = data.draw(st.integers(1, (1 << 20) - 1))
    ch = data.draw(st.integers(1, 8))
    bps = data.draw(st.integers(4, 32))
    total = data.draw(st.integers(0, (1 << 36) - 1))
    n_extra = data.draw(st.integers(0, 3))
    extra = [(data.draw(st.integers(1, 6)),
              bytes(data.draw(st.integers(0, 32))))
             for _ in range(n_extra)]
    m = flac_probe(flac_build(rate, ch, bps, total, extra_blocks=extra))
    assert (m.sample_rate, m.n_channels, m.bits_per_sample,
            m.total_samples) == (rate, ch, bps, total)
    assert m.n_meta_blocks == 1 + n_extra


def test_ogg_golden_spec_bytes_opus():
    """One BOS page carrying a longhand OpusHead (RFC 7845 §5.1:
    magic, version 1, channels, pre-skip u16 LE, input rate u32 LE,
    gain, mapping family) + one EOS page with granule 96312, built
    byte-by-byte per RFC 3533's page layout. Duration =
    (granule - pre_skip) / 48000."""
    head = (b"OpusHead\x01\x02" + struct.pack("<HI", 312, 44100)
            + b"\x00\x00\x00")
    bos = (b"OggS\x00\x02" + struct.pack("<qI", 0, 7)
           + struct.pack("<I", 0) + b"\x00" * 4
           + bytes([1, len(head)]) + head)
    eos = (b"OggS\x00\x04" + struct.pack("<qI", 96312, 7)
           + struct.pack("<I", 1) + b"\x00" * 4 + bytes([1, 0]))
    golden = bos + eos
    m = ogg_probe(golden)
    assert (m.codec, m.sample_rate, m.granule_rate) == \
        ("opus", 44100, 48000)
    assert (m.n_channels, m.pre_skip) == (2, 312)
    assert (m.last_granule, m.n_samples) == (96312, 96000)
    assert m.duration_s == pytest.approx(2.0)
    assert m.n_pages == 2
    # builder reproduces the golden bytes
    assert ogg_build_opus(2, 312, 44100, [96312], serial=7) == golden


def test_ogg_vorbis_and_multipage():
    blob = ogg_build_vorbis(1, 22050, [11025, 22050, 44100])
    m = ogg_probe(blob)
    assert (m.codec, m.sample_rate, m.granule_rate) == \
        ("vorbis", 22050, 22050)
    assert (m.n_samples, m.n_pages) == (44100, 4)
    assert m.duration_s == pytest.approx(2.0)
    # granule -1 (continuation) pages don't regress the maximum
    blob2 = ogg_build_opus(1, 0, 48000, [4800, -1, 9600])
    assert ogg_probe(blob2).n_samples == 9600


def test_ogg_malformed_and_unknown_codec():
    good = ogg_build_opus(2, 0, 48000, [4800])
    with pytest.raises(OggError, match="capture"):
        ogg_probe(b"Oggs" + good[4:])
    with pytest.raises(OggError, match="version"):
        ogg_probe(good[:4] + b"\x09" + good[5:])
    with pytest.raises(OggError, match="overruns|truncated|trailing"):
        ogg_probe(good[:-1])
    # corrupt chain: second page's capture pattern broken
    bad = bytearray(good)
    at = good.index(b"OggS", 4)
    bad[at] = 0x58
    with pytest.raises(OggError, match="corrupt page chain"):
        ogg_probe(bytes(bad))
    # unknown codec id header still yields page/granule stats
    head = b"Speex   " + b"\x00" * 8
    blob = (b"OggS\x00\x02" + struct.pack("<qI", 0, 3)
            + struct.pack("<I", 0) + b"\x00" * 4
            + bytes([1, len(head)]) + head
            + b"OggS\x00\x04" + struct.pack("<qI", 555, 3)
            + struct.pack("<I", 1) + b"\x00" * 4 + bytes([1, 0]))
    m = ogg_probe(blob)
    assert (m.codec, m.last_granule, m.n_pages) == ("unknown", 555, 2)


@PROP
@given(st.data())
def test_prop_ogg_build_probe_roundtrip(data):
    kind = data.draw(st.sampled_from(["opus", "vorbis"]))
    ch = data.draw(st.integers(1, 8))
    n_pages = data.draw(st.integers(1, 6))
    granules = sorted(data.draw(st.lists(
        st.integers(0, 10**12), min_size=n_pages, max_size=n_pages)))
    if kind == "opus":
        pre = data.draw(st.integers(0, 65535))
        rate = data.draw(st.integers(1, 192000))
        m = ogg_probe(ogg_build_opus(ch, pre, rate, granules))
        assert (m.codec, m.granule_rate) == ("opus", 48000)
        assert m.n_samples == max(0, granules[-1] - pre)
    else:
        rate = data.draw(st.integers(1, 192000))
        m = ogg_probe(ogg_build_vorbis(ch, rate, granules))
        assert (m.codec, m.granule_rate) == ("vorbis", rate)
        assert m.n_samples == granules[-1]
    assert m.n_channels == ch
    assert m.n_pages == n_pages + 1


def test_probe_audio_meta_routes_flac_and_ogg(spark):
    flac = flac_build(96000, 2, 24, 9_600_000)
    opus = ogg_build_opus(1, 3840, 16000, [48000 * 60 + 3840])
    df = spark.createDataFrame(
        [(1, flac, ""), (2, opus, "")],
        "media_id long, payload binary, mime string")
    rows = {r["media_id"]: r for r in probe_audio_meta(df).collect()}
    r1 = rows[1]
    assert (r1["codec"], r1["sample_rate"], r1["n_channels"]) == \
        ("flac", 96000, 2)
    assert r1["n_samples"] == 9_600_000
    assert r1["duration_s"] == pytest.approx(100.0)
    assert r1["n_frames"] is None and r1["bitrate_kbps"] is None
    r2 = rows[2]
    assert (r2["codec"], r2["sample_rate"], r2["n_channels"]) == \
        ("opus", 16000, 1)
    assert r2["n_samples"] == 48000 * 60
    assert r2["duration_s"] == pytest.approx(60.0)
    assert r2["n_frames"] == 2  # page count


def test_review_r8_ogg_hardening():
    """Review r8: unknown-codec Ogg rows NULL their unstated audio
    fields through probe_audio_meta, and the page builder emits the
    RFC 3533 terminating-0 lacing for 255-multiple bodies."""
    from accelerator_spark.functions.ogg import _page

    # lacing: 255-byte body -> [255, 0], 510 -> [255, 255, 0]
    p = _page(0, 0, 1, 0, b"x" * 255)
    assert p[26] == 2 and p[27:29] == b"\xff\x00"
    p = _page(0, 0, 1, 0, b"x" * 510)
    assert p[26] == 3 and p[27:30] == b"\xff\xff\x00"
    # empty body keeps the single-0 lacing
    p = _page(0, 0, 1, 0, b"")
    assert p[26] == 1 and p[27] == 0


def test_review_r8_ogg_unknown_codec_nulls(spark):
    import struct as _s

    head = b"Speex   " + b"\x00" * 8
    blob = (b"OggS\x00\x02" + _s.pack("<qI", 0, 3)
            + _s.pack("<I", 0) + b"\x00" * 4
            + bytes([1, len(head)]) + head
            + b"OggS\x00\x04" + _s.pack("<qI", 555, 3)
            + _s.pack("<I", 1) + b"\x00" * 4 + bytes([1, 0]))
    df = spark.createDataFrame(
        [(1, blob, "audio/ogg")],
        "media_id long, payload binary, mime string")
    r = probe_audio_meta(df).collect()[0]
    assert r["codec"] == "unknown" and r["n_frames"] == 2
    for col in ("sample_rate", "n_channels", "n_samples", "duration_s",
                "bitrate_kbps"):
        assert r[col] is None, col
