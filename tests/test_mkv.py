"""Matroska/WebM (EBML) metadata probe tests (functions/mkv.py).

Hand-derived golden elements authored byte-by-byte from RFC 8794 +
the Matroska element registry (independent of mkv_build — no foreign
Matroska reader ships in this container, the mp4-golden pattern),
builder <-> probe property round-trips, unknown-size (streamed)
segments, hostile inputs, and the probe_video_meta routing."""

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.mkv import (
    MkvError, mkv_build, mkv_probe)
from accelerator_spark.operators.multimodal import probe_video_meta

PROP = settings(
    max_examples=20,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


def _golden_webm():
    """One WebM written out longhand: EBML header (DocType 'webm'),
    Segment(Info(TimecodeScale 1000000, Duration 12000.0 ticks),
    Tracks(video VP9 640x360 + audio Opus 48kHz stereo), 2 empty
    Clusters). EBML varints: 1-byte sizes carry 0x80 | n."""
    def el(id_bytes, payload):
        return id_bytes + bytes([0x80 | len(payload)]) + payload

    header = el(b"\x1a\x45\xdf\xa3",
                el(b"\x42\x86", b"\x01")        # EBMLVersion 1
                + el(b"\x42\xf7", b"\x01")      # EBMLReadVersion 1
                + el(b"\x42\x82", b"webm")      # DocType
                + el(b"\x42\x87", b"\x04")      # DocTypeVersion
                + el(b"\x42\x85", b"\x02"))     # DocTypeReadVersion
    info = el(b"\x15\x49\xa9\x66",
              el(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big"))
              + el(b"\x44\x89", struct.pack(">d", 12000.0)))
    video = el(b"\xae",
               el(b"\xd7", b"\x01") + el(b"\x83", b"\x01")
               + el(b"\x86", b"V_VP9")
               + el(b"\xe0", el(b"\xb0", (640).to_bytes(2, "big"))
                    + el(b"\xba", (360).to_bytes(2, "big"))))
    audio = el(b"\xae",
               el(b"\xd7", b"\x02") + el(b"\x83", b"\x02")
               + el(b"\x86", b"A_OPUS")
               + el(b"\xe1", el(b"\xb5", struct.pack(">f", 48000.0))
                    + el(b"\x9f", b"\x02")))
    tracks = el(b"\x16\x54\xae\x6b", video + audio)
    cluster = el(b"\x1f\x43\xb6\x75", el(b"\xe7", b"\x00"))
    seg_body = info + tracks + cluster + cluster
    segment = b"\x18\x53\x80\x67" + bytes([0x80 | len(seg_body)]) \
        + seg_body
    return header + segment


def test_golden_spec_bytes_and_builder_agreement():
    golden = _golden_webm()
    m = mkv_probe(golden)
    assert m.doc_type == "webm"
    assert (m.timescale_ns, m.duration_ticks) == (1_000_000, 12000.0)
    assert m.duration_s == pytest.approx(12.0)
    assert m.n_clusters == 2
    v, a = m.tracks
    assert (v.track_type, v.codec, v.width, v.height) == \
        (1, "V_VP9", 640, 360)
    assert (a.track_type, a.codec, a.sample_rate, a.n_channels) == \
        (2, "A_OPUS", 48000.0, 2)
    built = mkv_build("webm", 1_000_000, 12000.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=640,
             height=360),
        dict(number=2, track_type=2, codec="A_OPUS",
             sample_rate=48000.0, n_channels=2)], n_clusters=2)
    assert built == golden


def test_unknown_size_segment_and_matroska():
    """Streamed files write the Segment size as all-ones (unknown);
    the walk extends it to EOF."""
    blob = mkv_build("matroska", 500_000, 4000.0, [
        dict(number=1, track_type=1, codec="V_AV1", width=1920,
             height=1080)], n_clusters=3, unknown_segment_size=True)
    m = mkv_probe(blob)
    assert m.doc_type == "matroska"
    assert m.duration_s == pytest.approx(2.0)  # 4000 * 0.5ms
    assert m.n_clusters == 3
    assert m.tracks[0].codec == "V_AV1"


def test_malformed_and_hostile():
    good = mkv_build("webm", 1_000_000, 1000.0, [])
    with pytest.raises(MkvError, match="magic"):
        mkv_probe(b"RIFF" + good[4:])
    with pytest.raises(MkvError, match="truncated|overruns"):
        mkv_probe(good[:-3])
    with pytest.raises(MkvError, match="no Segment"):
        mkv_probe(good[:good.index(b"\x18\x53\x80\x67")])
    # element claiming to overrun its container
    bad = bytearray(good)
    at = good.index(b"\x15\x49\xa9\x66") + 4
    bad[at] = 0xFF - 1  # huge 1-byte size
    with pytest.raises(MkvError, match="overruns"):
        mkv_probe(bytes(bad))
    # hostile: thousands of tiny elements exhaust the budget
    spam = b"\xec\x80" * 50_000  # Void elements, empty
    blob = mkv_build("webm", 1_000_000, 0.0, [])[:0]
    hdr = mkv_build("webm", 1_000_000, 0.0, [])
    seg_at = hdr.index(b"\x18\x53\x80\x67")
    blob = hdr[:seg_at] + b"\x18\x53\x80\x67\xff" + spam
    with pytest.raises(MkvError, match="budget"):
        mkv_probe(blob, max_elements=1000)
    # zero timescale is invalid
    z = mkv_build("webm", 1, 0.0, [])
    z = z.replace(b"\x2a\xd7\xb1\x81\x01", b"\x2a\xd7\xb1\x81\x00")
    with pytest.raises(MkvError, match="positive"):
        mkv_probe(z)


@PROP
@given(st.data())
def test_prop_build_probe_roundtrip(data):
    n_tracks = data.draw(st.integers(0, 3))
    tracks = []
    for i in range(n_tracks):
        kind = data.draw(st.sampled_from(["video", "audio", "sub"]))
        t = dict(number=i + 1,
                 track_type={"video": 1, "audio": 2, "sub": 17}[kind],
                 codec=data.draw(st.sampled_from(
                     ["V_VP8", "V_VP9", "V_AV1", "A_OPUS", "A_VORBIS",
                      "S_TEXT/UTF8"])))
        if kind == "video":
            t["width"] = data.draw(st.integers(1, 8192))
            t["height"] = data.draw(st.integers(1, 8192))
        elif kind == "audio":
            t["sample_rate"] = float(data.draw(
                st.sampled_from([8000, 16000, 44100, 48000])))
            t["n_channels"] = data.draw(st.integers(1, 8))
        tracks.append(t)
    ts = data.draw(st.integers(1, 10**9))
    dur = float(data.draw(st.integers(0, 10**9)))
    k = data.draw(st.integers(0, 5))
    unk = data.draw(st.booleans())
    m = mkv_probe(mkv_build("webm", ts, dur, tracks, n_clusters=k,
                            unknown_segment_size=unk))
    assert (m.timescale_ns, m.duration_ticks) == (ts, dur)
    assert m.n_clusters == k
    assert len(m.tracks) == n_tracks
    for want, got in zip(tracks, m.tracks):
        assert got.number == want["number"]
        assert got.codec == want["codec"]
        assert got.width == want.get("width", 0)
        assert got.sample_rate == want.get("sample_rate", 0.0)


def test_probe_video_meta_routes_webm(spark):
    webm = mkv_build("webm", 1_000_000, 90_000.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=1280,
             height=720),
        dict(number=2, track_type=2, codec="A_OPUS",
             sample_rate=48000.0, n_channels=2)], n_clusters=7)
    df = spark.createDataFrame(
        [(1, webm, "video/webm")],
        "media_id long, payload binary, mime string")
    r = probe_video_meta(df).collect()[0]
    assert r["brand"] == "webm"
    assert r["movie_timescale"] == 1_000_000
    assert r["movie_duration"] == 90_000
    assert r["duration_s"] == pytest.approx(90.0)
    assert (r["codec"], r["width"], r["height"]) == ("V_VP9", 1280, 720)
    assert r["n_frames"] is None and r["n_fragments"] == 7
    assert r["n_tracks"] == 2


def test_review_r8_unknown_size_clusters_count():
    """Review r8: streamed WebM writes EVERY cluster with unknown size
    (browser MediaRecorder output); the first one must not swallow the
    rest of the segment."""
    blob = mkv_build("webm", 1_000_000, 1000.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=64,
             height=48)])
    # rewrite the 3 built clusters as unknown-size by hand
    cluster_known = b"\x1f\x43\xb6\x75" + bytes([0x80 | 4]) \
        + b"\xe7\x81\x00\xff"  # padding byte inside
    cluster_unknown = b"\x1f\x43\xb6\x75\xff" + b"\xe7\x81\x00"
    seg_at = blob.index(b"\x18\x53\x80\x67")
    body = blob[seg_at + 5:]  # known-size segment, 1-byte size
    new_body = body + cluster_unknown * 3
    rebuilt = blob[:seg_at] + b"\x18\x53\x80\x67\xff" + new_body
    m = mkv_probe(rebuilt)
    assert m.n_clusters == 3
    assert m.tracks[0].codec == "V_VP9"  # Tracks before them still read
    del cluster_known


def test_advice_r8_payload_embedded_id_is_not_a_boundary():
    """ADVICE r8: an unknown-size cluster whose media payload embeds a
    segment-level ID byte pattern must NOT be split at the false match
    — a candidate only terminates the cluster when a well-formed size
    varint follows it and the implied body stays in bounds."""
    blob = mkv_build("webm", 1_000_000, 1000.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=64,
             height=48)])
    seg_at = blob.index(b"\x18\x53\x80\x67")
    body = blob[seg_at + 5:]  # known-size segment, 1-byte size
    # hostile payload embeds: a Cluster ID followed by an INVALID size
    # varint (0x00), and an Info ID followed by a size (0x61 0xff =
    # 8703) that would overrun the file — both must be rejected
    hostile = (b"\xe7\x81\x00"
               + b"\x1f\x43\xb6\x75\x00"
               + b"\x15\x49\xa9\x66\x61\xff"
               + b"\xe7\x81\x01")
    cluster_unknown = b"\x1f\x43\xb6\x75\xff" + hostile
    real_cluster = (b"\x1f\x43\xb6\x75" + bytes([0x80 | 3])
                    + b"\xe7\x81\x00")
    rebuilt = (blob[:seg_at] + b"\x18\x53\x80\x67\xff" + body
               + cluster_unknown + real_cluster)
    m = mkv_probe(rebuilt)
    assert m.n_clusters == 2  # hostile payload stays inside cluster 1
    assert m.tracks[0].codec == "V_VP9"


def test_review_r8_overflow_and_mislabeled_mime_containment(spark):
    """Review r8: EBML uints past the column types become NULL inside
    per-row containment (not an Arrow batch abort), and a
    'video/webm' mime on valid MP4 bytes keeps parsing as MP4."""
    import struct as _s

    from accelerator_spark.functions.mp4 import mp4_build

    blob = bytearray(mkv_build("webm", 1_000_000, 100.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=64,
             height=48)]))
    # TimecodeScale: 3-byte payload -> 8-byte all-high payload
    at = bytes(blob).index(b"\x2a\xd7\xb1")
    blob[at:at + 3 + 1 + 3] = b"\x2a\xd7\xb1" + bytes([0x88]) \
        + _s.pack(">Q", 1 << 63)
    # fix enclosing sizes: easier to rebuild info via builder with a
    # huge width instead
    huge = mkv_build("webm", 1_000_000, 100.0, [
        dict(number=1, track_type=1, codec="V_VP9", width=1 << 33,
             height=48)])
    mp4 = mp4_build(1000, 5000, [dict(
        track_id=1, handler="vide", codec="avc1", width=64, height=48,
        timescale=600, duration=3000, n_samples=25)])
    df = spark.createDataFrame(
        [(1, huge, "video/webm"), (2, mp4, "video/webm")],
        "media_id long, payload binary, mime string")
    rows = {r["media_id"]: r
            for r in probe_video_meta(df, on_error="null").collect()}
    assert rows[1]["brand"] == "webm" and rows[1]["width"] is None
    # mislabeled mime: magic wins, MP4 parses as MP4
    assert rows[2]["brand"] == "isom" and rows[2]["n_frames"] == 25
