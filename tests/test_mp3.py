"""Pure-stdlib MPEG-audio (MP3) metadata probe tests (functions/mp3.py).

Hand-derived golden frame bytes authored bit-by-bit from ISO/IEC
11172-3 §2.4.1 (independent of mp3_build_frames — no foreign MP3
reader ships in this container, the mp4-golden pattern), builder <->
probe property round-trips across versions/layers/rates, ID3v2/ID3v1
wrappers, junk resync, VBR detection, hostile inputs, and the
distributed probe_audio_meta integration."""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.mp3 import (
    Mp3Error, id3v1_append, id3v2_wrap, mp3_build_frames, mp3_probe)
from accelerator_spark.operators.multimodal import probe_audio_meta

PROP = settings(
    max_examples=25,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


def test_golden_spec_bytes_probe_and_builder_agreement():
    """One MPEG-1 Layer III frame header written out longhand:
    sync(11x1) ver=11(MPEG1) layer=01(III) prot=1 bitrate=1001
    (128 kbps) rate=00(44100) pad=0 priv=0 mode=11(mono) rest=0
    -> FF FB 90 C0; frame length = 144*128000//44100 = 417 bytes,
    1152 samples."""
    golden = bytearray(417)
    golden[:4] = b"\xff\xfb\x90\xc0"
    golden *= 3  # three identical CBR frames
    m = mp3_probe(bytes(golden))
    assert (m.version, m.layer) == ("1", 3)
    assert (m.sample_rate, m.channel_mode, m.n_channels) == \
        (44100, "mono", 1)
    assert (m.n_frames, m.n_samples) == (3, 3 * 1152)
    assert (m.bitrate_kbps, m.vbr) == (128, False)
    assert (m.id3v2_size, m.has_id3v1) == (0, False)
    assert m.duration_s == pytest.approx(3 * 1152 / 44100)
    # builder reproduces the golden bytes for the same inputs
    built = mp3_build_frames("1", 3, [9, 9, 9], 0, "mono")
    assert built == bytes(golden)


def test_frame_lengths_per_layer_and_version():
    """Spec frame-length formulas: Layer I quadruples slots; Layer III
    halves in MPEG-2/2.5 (72 factor); padding adds one slot (4 bytes
    for Layer I, 1 otherwise)."""
    # MPEG1 Layer I, 32 kbps idx1 @ 44100, padded:
    # (12*32000//44100 + 1) * 4 = (8+1)*4 = 36
    b = mp3_build_frames("1", 1, [1], 0, paddings=[1])
    assert len(b) == 36 and mp3_probe(b).n_samples == 384
    # MPEG2 Layer III, 64 kbps idx8 @ 24000: 72*64000//24000 = 192
    b = mp3_build_frames("2", 3, [8], 1)
    assert len(b) == 192
    m = mp3_probe(b)
    assert (m.version, m.sample_rate, m.n_samples) == ("2", 24000, 576)
    # MPEG2.5 Layer II, 8 kbps idx1 @ 8000: 144*8000//8000 = 144
    b = mp3_build_frames("2.5", 2, [1], 2)
    assert len(b) == 144
    m = mp3_probe(b)
    assert (m.version, m.sample_rate, m.n_samples) == ("2.5", 8000, 1152)


def test_id3_wrappers_and_junk_resync():
    body = mp3_build_frames("1", 3, [9] * 4, 0)
    # ID3v2 with 100 padding bytes (+10 header)
    m = mp3_probe(id3v2_wrap(body, 100))
    assert (m.id3v2_size, m.n_frames) == (110, 4)
    # footer flag adds 10 more
    m = mp3_probe(id3v2_wrap(body, 100, footer=True))
    assert (m.id3v2_size, m.n_frames) == (120, 4)
    # ID3v1 trailer detected and excluded from the walk
    m = mp3_probe(id3v1_append(id3v2_wrap(body, 7), b"title"))
    assert (m.id3v2_size, m.has_id3v1, m.n_frames) == (17, True, 4)
    # junk between tag and first frame: bounded resync finds the sync
    m = mp3_probe(id3v2_wrap(b"\x00garbage\x01" + body, 5))
    assert m.n_frames == 4
    # trailing junk after real frames ends the walk cleanly
    m = mp3_probe(body + b"APETAGEX junk that is not a frame header")
    assert m.n_frames == 4


def test_vbr_detection_and_average():
    body = mp3_build_frames("1", 3, [1, 9, 14], 0)  # 32, 128, 320
    m = mp3_probe(body)
    assert m.vbr is True
    assert m.n_frames == 3
    assert m.bitrate_kbps == (32 + 128 + 320) // 3


def test_malformed_and_hostile():
    with pytest.raises(Mp3Error, match="too short"):
        mp3_probe(b"\xff\xfb")
    with pytest.raises(Mp3Error, match="no MPEG audio frames"):
        mp3_probe(b"\x00" * 4096)
    # free-format bitrate (index 0) is out of scope, not a wrong answer
    free = bytearray(mp3_build_frames("1", 3, [9], 0))
    free[2] = 0x00  # bitrate index 0
    with pytest.raises(Mp3Error, match="free-format"):
        mp3_probe(bytes(free))
    # ID3v2 size overrunning the file
    with pytest.raises(Mp3Error, match="overruns"):
        mp3_probe(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f")
    # non-syncsafe size byte
    with pytest.raises(Mp3Error, match="syncsafe"):
        mp3_probe(b"ID3\x04\x00\x00\x80\x00\x00\x00" + b"\x00" * 10)
    # a false sync inside the junk scan whose "frame" disagrees with
    # nothing (it IS the first) but leads nowhere: the walk stops at
    # the end without crashing
    blob = b"\xff\xfb\x90\xc0"  # header, then truncated body
    m = mp3_probe(blob)
    assert m.n_frames == 1  # truncated final frame still counts
    # a mid-stream byte flip that still parses as a header but
    # disagrees on version/rate stops the walk instead of corrupting
    # totals
    body = bytearray(mp3_build_frames("1", 3, [9] * 3, 0))
    body[417:421] = mp3_build_frames("2", 3, [8], 1)[:4]
    m = mp3_probe(bytes(body))
    assert m.n_frames == 1


@PROP
@given(st.data())
def test_prop_build_probe_roundtrip(data):
    version = data.draw(st.sampled_from(["1", "2", "2.5"]))
    layer = data.draw(st.integers(1, 3))
    rate_idx = data.draw(st.integers(0, 2))
    mode = data.draw(st.sampled_from(
        ["stereo", "joint_stereo", "dual_channel", "mono"]))
    n = data.draw(st.integers(1, 12))
    idxs = data.draw(st.lists(st.integers(1, 14), min_size=n, max_size=n))
    pads = data.draw(st.lists(st.integers(0, 1), min_size=n, max_size=n))
    tag = data.draw(st.integers(0, 64))
    body = mp3_build_frames(version, layer, idxs, rate_idx, mode, pads)
    blob = id3v2_wrap(body, tag) if tag else body
    if data.draw(st.booleans()):
        blob = id3v1_append(blob)
    m = mp3_probe(blob)
    assert (m.version, m.layer) == (version, layer)
    assert m.channel_mode == mode
    assert m.n_channels == (1 if mode == "mono" else 2)
    assert m.n_frames == n
    spf = 384 if layer == 1 else (
        1152 if layer == 2 or version == "1" else 576)
    assert m.n_samples == n * spf
    assert m.vbr == (len(set(idxs)) > 1)
    assert m.id3v2_size == (10 + tag if tag else 0)


def test_probe_audio_meta_distributed(spark):
    """MP3 + WAV + unknown through the Arrow scaffold: real rows for
    the probeable formats, containment for the rest."""
    from accelerator_spark.functions.wav import wav_encode

    mp3 = id3v2_wrap(mp3_build_frames("1", 3, [9] * 5, 0, "stereo"), 32)
    wav = wav_encode(bytes(range(48)), 8000)
    df = spark.createDataFrame(
        [(1, mp3, "audio/mpeg"), (2, wav, "audio/wav"),
         (3, b"\xde\xad\xaa\xcc", "audio/aac"), (4, b"", "audio/mpeg")],
        "media_id long, payload binary, mime string")
    rows = {r["media_id"]: r
            for r in probe_audio_meta(df, on_error="null").collect()}
    r1 = rows[1]
    assert (r1["codec"], r1["sample_rate"], r1["n_channels"]) == \
        ("mp3", 44100, 2)
    assert (r1["n_frames"], r1["n_samples"]) == (5, 5 * 1152)
    assert (r1["bitrate_kbps"], r1["vbr"], r1["id3v2_size"]) == \
        (128, False, 42)
    r2 = rows[2]
    assert (r2["codec"], r2["sample_rate"], r2["n_samples"]) == \
        ("wav", 8000, 48)
    assert r2["n_frames"] is None and r2["bitrate_kbps"] == 64
    # contained rows keep n_bytes (triage signal), null the rest
    for mid in (3, 4):
        assert rows[mid]["codec"] is None
        assert rows[mid]["sample_rate"] is None
    assert rows[3]["n_bytes"] == 4 and rows[4]["n_bytes"] == 0
    # on_error='raise' surfaces the actionable hook message
    with pytest.raises(Exception, match="NotImplementedError|stdlib"):
        probe_audio_meta(df.filter("media_id = 3")).collect()


def test_free_format_false_sync_does_not_abort():
    """Review r8: a false sync carrying a zero bitrate nibble — in
    leading junk OR trailing bytes — must not abort the probe; only a
    genuinely free-format stream gets the scope error."""
    body = mp3_build_frames("1", 3, [9] * 3, 0)
    # leading junk containing sync+MPEG1L3+bitrate-0: resyncs past it
    m = mp3_probe(b"\xff\xfb\x00\x00junk" + body)
    assert m.n_frames == 3
    # trailing free-format-looking bytes: walk ends cleanly
    m = mp3_probe(body + b"\xff\xfb\x00\x00")
    assert m.n_frames == 3
    # a stream whose only header IS free-format: actionable scope error
    free = bytearray(mp3_build_frames("1", 3, [9], 0))
    free[2] = 0x00
    with pytest.raises(Mp3Error, match="free-format"):
        mp3_probe(bytes(free))


def test_adts_aac_not_routed_to_mp3(spark):
    """Review r8: AAC ADTS shares the 0xFFF sync but carries layer bits
    00 — it must hit the actionable not-implemented path, not the MPEG
    walk (which would emit garbage mp3 metadata for an AAC asset)."""
    adts = b"\xff\xf1\x50\x80\x00\x1f\xfc" + b"\x00" * 64
    df = spark.createDataFrame(
        [(1, adts, "")], "media_id long, payload binary, mime string")
    rows = probe_audio_meta(df, on_error="null").collect()
    assert rows[0]["codec"] is None  # contained, not mislabeled mp3
    with pytest.raises(Exception, match="NotImplementedError|stdlib"):
        probe_audio_meta(df).collect()


def test_id3v2_tags_golden_and_encodings():
    """Hand-authored v2.4 tag bytes (syncsafe frame sizes, UTF-8) and
    v2.3 (big-endian sizes, UTF-16 with BOM) both parse; non-text
    frames are skipped by length; v2.2 and corrupt tags return {}."""
    import struct

    from accelerator_spark.functions.mp3 import (
        id3v2_build_tags, id3v2_tags)

    # golden v2.4: one TIT2 frame "Né" in utf-8, written longhand
    payload = b"\x03N\xc3\xa9"
    frame = b"TIT2" + bytes([0, 0, 0, len(payload)]) + b"\x00\x00" \
        + payload
    tag = b"ID3\x04\x00\x00" + bytes([0, 0, 0, len(frame)]) + frame
    assert id3v2_tags(tag) == {"TIT2": "Né"}
    # builder reproduces the golden bytes
    assert id3v2_build_tags({"TIT2": "Né"}) == tag
    # v2.3 utf-16 round-trip + all standard fields + TXXX join
    t3 = id3v2_build_tags({"TIT2": "Song", "TPE1": "Artist",
                           "TALB": "Album", "TYER": "1999",
                           "TCON": "Jazz",
                           "TXXX": "mood\x00calm"}, version=3)
    got = id3v2_tags(t3 + mp3_build_frames("1", 3, [9], 0))
    assert got == {"TIT2": "Song", "TPE1": "Artist", "TALB": "Album",
                   "TYER": "1999", "TCON": "Jazz", "TXXX": "mood:calm"}
    # APIC (binary art) is skipped by length, following text still read
    apic = b"APIC" + bytes([0, 0, 0, 8]) + b"\x00\x00" + b"\xff" * 8
    t = id3v2_build_tags({"TALB": "X"})
    spliced = t[:10] + apic + t[10:]
    n = len(spliced) - 10
    fixed = (spliced[:6]
             + bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
             + spliced[10:])
    assert id3v2_tags(fixed) == {"TALB": "X"}
    # v2.2, no tag, corrupt: all {}
    assert id3v2_tags(b"ID3\x02\x00\x00" + b"\x00" * 10) == {}
    assert id3v2_tags(mp3_build_frames("1", 3, [9], 0)) == {}
    assert id3v2_tags(b"ID3\x04\x00\x00\x7f\x7f\x7f\x7f" + b"TIT2") == {}
    # a frame overrunning the tag keeps earlier frames
    big = id3v2_build_tags({"TIT2": "keep"})
    trunc_frame = b"TPE1" + bytes([0, 0, 0, 100]) + b"\x00\x00\x03hi"
    n = len(big) - 10 + len(trunc_frame)
    blob = (big[:6]
            + bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
            + big[10:] + trunc_frame)
    assert id3v2_tags(blob) == {"TIT2": "keep"}


def test_extract_id3_tags_distributed(spark):
    from accelerator_spark.functions.mp3 import id3v2_build_tags
    from accelerator_spark.operators.multimodal import extract_id3_tags

    tagged = id3v2_build_tags(
        {"TIT2": "T1", "TPE1": "A1", "TDRC": "2021"}) \
        + mp3_build_frames("1", 3, [9], 0)
    bare = mp3_build_frames("1", 3, [9], 0)
    df = spark.createDataFrame(
        [(1, tagged, "audio/mpeg"), (2, bare, "audio/mpeg")],
        "media_id long, payload binary, mime string")
    rows = {r["media_id"]: r for r in extract_id3_tags(df).collect()}
    assert (rows[1]["title"], rows[1]["artist"], rows[1]["year"]) == \
        ("T1", "A1", "2021")
    assert rows[1]["n_text_frames"] == 3
    assert rows[2]["title"] is None and rows[2]["n_text_frames"] == 0


def test_id3v2_review_r8_flag_handling():
    """Review r8: tag-level unsynchronisation returns {} (parsing
    shifted bytes yields garbage text); compressed/encrypted/DLI
    frames are skipped; v2.4 multi-value NULs become '/'."""
    from accelerator_spark.functions.mp3 import (
        id3v2_build_tags, id3v2_tags)

    good = id3v2_build_tags({"TIT2": "ok"})
    # tag-level unsync flag set -> {}
    unsync = good[:5] + bytes([good[5] | 0x80]) + good[6:]
    assert id3v2_tags(unsync) == {}
    # v2.3 compressed frame skipped, clean frame still read
    t3 = id3v2_build_tags({"TIT2": "keep"}, version=3)
    comp = b"TPE1" + (6).to_bytes(4, "big") + b"\x00\x80" \
        + b"\x00zlib??"[:6]
    n = len(t3) - 10 + len(comp)
    blob = (t3[:6] + bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
            + t3[10:] + comp)
    assert id3v2_tags(blob) == {"TIT2": "keep"}
    # v2.4 data-length-indicator frame skipped
    t4 = id3v2_build_tags({"TALB": "keep"})
    dli = b"TPE1" + bytes([0, 0, 0, 6]) + b"\x00\x01" + b"\x00" * 6
    n = len(t4) - 10 + len(dli)
    blob = (t4[:6] + bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
            + t4[10:] + dli)
    assert id3v2_tags(blob) == {"TALB": "keep"}
    # v2.4 multi-value list: NUL separator -> '/'
    got = id3v2_tags(id3v2_build_tags({"TPE1": "ArtistA\x00ArtistB"}))
    assert got == {"TPE1": "ArtistA/ArtistB"}


def test_extract_id3_tags_year_normalized(spark):
    """Review r8: v2.4 TDRC full timestamps normalize to yyyy so the
    year column means one thing across tag versions."""
    from accelerator_spark.functions.mp3 import id3v2_build_tags
    from accelerator_spark.operators.multimodal import extract_id3_tags

    blob = id3v2_build_tags({"TDRC": "2004-06-01T12:00"}) \
        + mp3_build_frames("1", 3, [9], 0)
    df = spark.createDataFrame([(1, blob, "audio/mpeg")],
                               "media_id long, payload binary, mime string")
    assert extract_id3_tags(df).collect()[0]["year"] == "2004"
