"""Pure-stdlib ISO-BMFF (MP4) metadata parser tests (functions/mp4.py).

A hand-derived golden box tree authored field-by-field from ISO/IEC
14496-12 (independent of mp4_build, the avro-golden pattern — no
foreign MP4 reader ships in this container), mp4_build <-> mp4_probe
property round-trips, version-1 full boxes, largesize and to-EOF
framing, malformed/hostile inputs, and the distributed
probe_video_meta -> frame_sample_plan integration."""

import struct

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.mp4 import (
    Mp4Error, mp4_build, mp4_probe)
from accelerator_spark.operators.multimodal import (
    frame_sample_plan, probe_video_meta)

PROP = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


def _spec_box(t, payload):
    return struct.pack(">I", 8 + len(payload)) + t + payload


def _spec_full(t, v, flags, payload):
    return _spec_box(t, bytes([v]) + flags.to_bytes(3, "big") + payload)


def _golden_bytes():
    """Spec-layout container, every field written out longhand:
    movie timescale 1000 / duration 7500 ms, one avc1 video track
    640x360 @ timescale 30000 / duration 225000 (7.5 s), 180 samples."""
    mvhd = _spec_full(b"mvhd", 0, 0, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),      # ctime mtime
        struct.pack(">I", 1000), struct.pack(">I", 7500),
        struct.pack(">I", 0x00010000),                   # rate
        struct.pack(">H", 0x0100),                       # volume
        b"\x00" * 10,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        b"\x00" * 24,
        struct.pack(">I", 2),                            # next track
    ]))
    tkhd = _spec_full(b"tkhd", 0, 7, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 1),                            # track_id
        b"\x00" * 4,
        struct.pack(">I", 7500),                         # duration
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        struct.pack(">I", 640 << 16),                    # 16.16 width
        struct.pack(">I", 360 << 16),
    ]))
    mdhd = _spec_full(b"mdhd", 0, 0, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 30000), struct.pack(">I", 225000),
        struct.pack(">H", 0x55C4), struct.pack(">H", 0),
    ]))
    hdlr = _spec_full(b"hdlr", 0, 0,
                      b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    entry = struct.pack(">I", 16) + b"avc1" + b"\x00" * 8
    stsd = _spec_full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stsz = _spec_full(b"stsz", 0, 0, struct.pack(">II", 0, 180))
    stbl = _spec_box(b"stbl", stsd + stsz)
    minf = _spec_box(b"minf", stbl)
    mdia = _spec_box(b"mdia", mdhd + hdlr + minf)
    trak = _spec_box(b"trak", tkhd + mdia)
    ftyp = _spec_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    return ftyp + _spec_box(b"moov", mvhd + trak)


def test_golden_spec_bytes_probe_and_builder_agreement():
    golden = _golden_bytes()
    meta = mp4_probe(golden)
    assert meta.brand == "isom"
    assert (meta.timescale, meta.duration) == (1000, 7500)
    assert meta.duration_s == 7.5
    assert len(meta.tracks) == 1
    t = meta.tracks[0]
    assert (t.track_id, t.handler, t.codec) == (1, "vide", "avc1")
    assert (t.width, t.height) == (640, 360)
    assert (t.timescale, t.duration, t.n_samples) == (30000, 225000, 180)
    assert t.duration_s == 7.5
    # mp4_build reproduces the hand-derived bytes exactly for the same
    # inputs — so the builder (gate harness) can't drift from the spec
    # layout without this test catching it
    built = mp4_build(1000, 7500, [dict(
        track_id=1, handler="vide", codec="avc1", width=640, height=360,
        timescale=30000, duration=225000, n_samples=180)])
    assert built == golden


@PROP
@given(st.data())
def test_prop_build_probe_roundtrip(data):
    n_tracks = data.draw(st.integers(1, 3))
    ts = data.draw(st.integers(1, 10**6))
    dur = data.draw(st.integers(0, 2**31 - 1))
    tracks = []
    for i in range(n_tracks):
        tracks.append(dict(
            track_id=i + 1,
            handler=data.draw(st.sampled_from(["vide", "soun", "text"])),
            codec=data.draw(st.sampled_from(["avc1", "hvc1", "mp4a",
                                             "tx3g"])),
            width=data.draw(st.integers(0, 8192)),
            height=data.draw(st.integers(0, 8192)),
            timescale=data.draw(st.integers(1, 10**6)),
            duration=data.draw(st.integers(0, 2**31 - 1)),
            n_samples=data.draw(st.integers(0, 2**31 - 1)),
        ))
    meta = mp4_probe(mp4_build(ts, dur, tracks))
    assert (meta.timescale, meta.duration) == (ts, dur)
    assert len(meta.tracks) == n_tracks
    for want, got in zip(tracks, meta.tracks):
        assert got.track_id == want["track_id"]
        assert got.handler == want["handler"]
        assert got.codec == want["codec"]
        assert (got.width, got.height) == (want["width"], want["height"])
        assert (got.timescale, got.duration, got.n_samples) == (
            want["timescale"], want["duration"], want["n_samples"])


def test_v1_boxes_largesize_and_eof_framing():
    # version-1 mvhd/mdhd carry 64-bit times and duration
    mvhd1 = _spec_full(b"mvhd", 1, 0, b"".join([
        struct.pack(">Q", 0), struct.pack(">Q", 0),
        struct.pack(">I", 90000), struct.pack(">Q", 2**33),
        b"\x00" * 80]))
    moov = _spec_box(b"moov", mvhd1)
    meta = mp4_probe(_spec_box(b"ftyp", b"mp42" + b"\x00" * 8) + moov)
    assert (meta.timescale, meta.duration) == (90000, 2**33)
    assert meta.brand == "mp42"
    # largesize framing (size == 1, 64-bit follows)
    payload = mvhd1
    big = (struct.pack(">I", 1) + b"moov"
           + struct.pack(">Q", 16 + len(payload)) + payload)
    assert mp4_probe(big).timescale == 90000
    # size == 0: box extends to EOF
    eof = struct.pack(">I", 0) + b"moov" + mvhd1
    assert mp4_probe(eof).timescale == 90000
    # v1 mdhd inside a track
    mdhd1 = _spec_full(b"mdhd", 1, 0, b"".join([
        struct.pack(">Q", 0), struct.pack(">Q", 0),
        struct.pack(">I", 48000), struct.pack(">Q", 2**34),
        struct.pack(">I", 0)]))
    trak = _spec_box(b"trak", _spec_box(b"mdia", mdhd1))
    meta = mp4_probe(_spec_box(b"moov", mvhd1 + trak))
    assert meta.tracks[0].timescale == 48000
    assert meta.tracks[0].duration == 2**34


def test_malformed_and_hostile():
    good = mp4_build(1000, 5000, [dict(
        track_id=1, handler="vide", codec="avc1", width=64, height=48,
        timescale=600, duration=3000, n_samples=25)])
    mp4_probe(good)
    with pytest.raises(Mp4Error, match="too short"):
        mp4_probe(b"\x00\x00")
    with pytest.raises(Mp4Error, match="truncated|overruns"):
        mp4_probe(good[:-7])
    with pytest.raises(Mp4Error, match="no moov"):
        mp4_probe(_spec_box(b"ftyp", b"isom" + b"\x00" * 8))
    # box claiming to overrun its container
    bad = bytearray(good)
    bad[0:4] = struct.pack(">I", len(good) + 100)
    with pytest.raises(Mp4Error, match="overruns"):
        mp4_probe(bytes(bad))
    # hostile: thousands of tiny nested boxes exhaust the budget, not
    # the stack or the clock
    blob = _spec_box(b"moov", _spec_box(b"udta", b"") * 50_000)
    with pytest.raises(Mp4Error, match="budget"):
        mp4_probe(blob, max_boxes=1000)


def test_probe_video_meta_distributed_and_plan(spark):
    """The full planning pipeline with zero codec bits: probe ->
    n_frames -> frame_sample_plan expands the frame indices a
    codec-equipped decode stage would fetch."""
    rows = []
    for i in range(1, 4):
        rows.append((i, mp4_build(1000, 1000 * i, [
            dict(track_id=1, handler="vide", codec="avc1",
                 width=320 * i, height=180 * i, timescale=600,
                 duration=600 * i, n_samples=90 * i),
            dict(track_id=2, handler="soun", codec="mp4a",
                 width=0, height=0, timescale=48000,
                 duration=48000 * i, n_samples=0),
        ]), "video/mp4"))
    # audio-only container: video columns must be NULL (review r7 —
    # the tracks[0] fallback reported audio metadata as video and fed
    # audio sample counts into frame_sample_plan)
    rows.append((5, mp4_build(1000, 4000, [
        dict(track_id=1, handler="soun", codec="mp4a", width=0,
             height=0, timescale=48000, duration=192000,
             n_samples=10_000_000)]), "audio/mp4"))
    rows.append((9, b"not an mp4 at all", "video/mp4"))
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in probe_video_meta(
        df, on_error="null").collect()}
    for i in range(1, 4):
        r = out[i]
        assert (r["movie_timescale"], r["movie_duration"]) == (1000, 1000 * i)
        assert r["duration_s"] == pytest.approx(float(i))
        assert (r["codec"], r["n_tracks"]) == ("avc1", 2)
        assert (r["width"], r["height"]) == (320 * i, 180 * i)
        assert r["n_frames"] == 90 * i
    assert out[5]["codec"] is None and out[5]["n_frames"] is None
    assert (out[5]["n_tracks"], out[5]["movie_duration"]) == (1, 4000)
    assert out[9]["codec"] is None  # contained
    assert out[9]["n_bytes"] == len(b"not an mp4 at all")
    with pytest.raises(Exception, match="Mp4Error|moov|box"):
        probe_video_meta(df).collect()
    # plan: every 30th frame of each probed video
    plan = frame_sample_plan(
        probe_video_meta(df, on_error="null"), every_n=30)
    got = {(r["media_id"], r["frame_idx"]) for r in plan.collect()}
    assert {(1, 0), (1, 30), (1, 60), (2, 0), (3, 0)} <= got
    assert all(fi % 30 == 0 for _, fi in got)
    # NULL n_frames (unparseable AND audio-only) -> no phantom frames
    assert not any(m in (5, 9) for m, _ in got)


def test_tkhd_trailing_bytes_fixed_offset_dims():
    """ADVICE r7: width/height must come from the version-fixed payload
    offset, not the last 8 bytes of the box — a tkhd with nonstandard
    trailing bytes (accepted by the box framing) must still report the
    true dims, not garbage read from the tail."""
    tkhd = _spec_full(b"tkhd", 0, 7, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 1),                            # track_id
        b"\x00" * 4,
        struct.pack(">I", 5000),                         # duration
        b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0, 0),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        struct.pack(">I", 320 << 16),                    # 16.16 width
        struct.pack(">I", 240 << 16),
        b"\xde\xad\xbe\xef\xde\xad\xbe\xef",             # trailing junk
    ]))
    mvhd = _spec_full(b"mvhd", 0, 0, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 1000), struct.pack(">I", 5000),
        struct.pack(">I", 0x00010000), struct.pack(">H", 0x0100),
        b"\x00" * 10,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        b"\x00" * 24, struct.pack(">I", 2),
    ]))
    meta = mp4_probe(_spec_box(b"moov", mvhd + _spec_box(b"trak", tkhd)))
    t = meta.tracks[0]
    assert (t.width, t.height) == (320, 240)


def _golden_fmp4():
    """Spec-layout FRAGMENTED container, hand-derived field-by-field
    from ISO/IEC 14496-12 §8.8 (independent of mp4_build_fragment):
    moov with mvex (mehd fragment_duration 6000 ms @ movie timescale
    1000; trex track 1 default_sample_duration 400), mvhd duration 0
    (the fragmented-stream convention), one avc1 track with an EMPTY
    stsz (0 samples in the init segment), then two fragments:
      moof#1: trun with per-sample durations 500+500+250 (3 samples)
      moof#2: tfhd default_sample_duration 300, count-only trun with
              4 samples (duration 4*300)
    Expected track totals: n_samples 7, duration 2450 @ timescale 600.
    """
    mvhd = _spec_full(b"mvhd", 0, 0, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 1000), struct.pack(">I", 0),   # duration 0!
        struct.pack(">I", 0x00010000), struct.pack(">H", 0x0100),
        b"\x00" * 10,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        b"\x00" * 24, struct.pack(">I", 2),
    ]))
    tkhd = _spec_full(b"tkhd", 0, 7, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 1), b"\x00" * 4,
        struct.pack(">I", 0),
        b"\x00" * 8, struct.pack(">HHHH", 0, 0, 0, 0),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                    0x40000000),
        struct.pack(">I", 640 << 16), struct.pack(">I", 360 << 16),
    ]))
    mdhd = _spec_full(b"mdhd", 0, 0, b"".join([
        struct.pack(">I", 0), struct.pack(">I", 0),
        struct.pack(">I", 600), struct.pack(">I", 0),
        struct.pack(">H", 0x55C4), struct.pack(">H", 0),
    ]))
    hdlr = _spec_full(b"hdlr", 0, 0,
                      b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00")
    entry = struct.pack(">I", 16) + b"avc1" + b"\x00" * 8
    stsd = _spec_full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    stsz = _spec_full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
    stbl = _spec_box(b"stbl", stsd + stsz)
    mdia = _spec_box(b"mdia", mdhd + hdlr + _spec_box(b"minf", stbl))
    trak = _spec_box(b"trak", tkhd + mdia)
    mehd = _spec_full(b"mehd", 0, 0, struct.pack(">I", 6000))
    trex = _spec_full(b"trex", 0, 0,
                      struct.pack(">5I", 1, 1, 400, 0, 0))
    mvex = _spec_box(b"mvex", mehd + trex)
    moov = _spec_box(b"moov", mvhd + trak + mvex)
    ftyp = _spec_box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    # fragment 1: traf(tfhd[default-base-is-moof] + trun[durations])
    tfhd1 = _spec_full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
    trun1 = _spec_full(b"trun", 0, 0x000100,
                       struct.pack(">I", 3)
                       + struct.pack(">III", 500, 500, 250))
    moof1 = _spec_box(b"moof",
                      _spec_full(b"mfhd", 0, 0, struct.pack(">I", 1))
                      + _spec_box(b"traf", tfhd1 + trun1))
    # fragment 2: tfhd carries default_sample_duration, count-only trun
    tfhd2 = _spec_full(b"tfhd", 0, 0x020008,
                       struct.pack(">II", 1, 300))
    trun2 = _spec_full(b"trun", 0, 0, struct.pack(">I", 4))
    moof2 = _spec_box(b"moof",
                      _spec_full(b"mfhd", 0, 0, struct.pack(">I", 2))
                      + _spec_box(b"traf", tfhd2 + trun2))
    mdat = _spec_box(b"mdat", b"")
    return ftyp + moov + moof1 + mdat + moof2 + mdat


def test_golden_fmp4_spec_bytes_and_builder_agreement():
    """VERDICT r7 #1: fragmented MP4 probes with real sample counts.
    Golden bytes hand-derived from the spec; the builder must
    reproduce them exactly for the same inputs."""
    golden = _golden_fmp4()
    meta = mp4_probe(golden)
    assert meta.n_fragments == 2
    # mvhd says 0; mehd fragment_duration takes over
    assert (meta.timescale, meta.duration) == (1000, 6000)
    assert meta.duration_s == 6.0
    t = meta.tracks[0]
    assert (t.track_id, t.handler, t.codec) == (1, "vide", "avc1")
    assert t.n_samples == 7            # 3 (per-sample trun) + 4 (count)
    assert t.duration == 500 + 500 + 250 + 4 * 300
    # builder half reproduces the golden bytes
    from accelerator_spark.functions.mp4 import mp4_build_fragment
    built = mp4_build(1000, 0, [dict(
        track_id=1, handler="vide", codec="avc1", width=640, height=360,
        timescale=600, duration=0, n_samples=0,
        default_sample_duration=400)], fragment_duration=6000)
    built += mp4_build_fragment(1, [dict(track_id=1,
                                         sample_durations=[500, 500, 250])])
    built += mp4_build_fragment(2, [dict(track_id=1, n_samples=4,
                                         default_sample_duration=300)])
    assert built == golden


def test_fmp4_trex_fallback_and_moov_last():
    """trun without durations and tfhd without a default falls back to
    the movie-level trex default; and moofs BEFORE moov (live-derived
    files write moov last) still count."""
    from accelerator_spark.functions.mp4 import mp4_build_fragment

    init = mp4_build(1000, 0, [dict(
        track_id=1, handler="vide", codec="avc1", width=64, height=48,
        timescale=600, duration=0, n_samples=0,
        default_sample_duration=400)], fragment_duration=4000)
    frag = mp4_build_fragment(1, [dict(track_id=1, n_samples=6)])
    meta = mp4_probe(init + frag)
    t = meta.tracks[0]
    assert (t.n_samples, t.duration) == (6, 6 * 400)  # trex default
    # moov last: split init into ftyp + moov and put moofs between
    ftyp_len = struct.unpack(">I", init[:4])[0]
    ftyp, moov = init[:ftyp_len], init[ftyp_len:]
    meta2 = mp4_probe(ftyp + frag + frag + moov)
    t2 = meta2.tracks[0]
    assert meta2.n_fragments == 2
    assert (t2.n_samples, t2.duration) == (12, 12 * 400)


def test_fmp4_hostile_trun():
    """A trun claiming 2^30 samples with per-sample durations must fail
    on the byte bound, not loop; a traf without tfhd is malformed."""
    from accelerator_spark.functions.mp4 import mp4_build_fragment

    init = mp4_build(1000, 0, [dict(
        track_id=1, handler="vide", codec="avc1", width=64, height=48,
        timescale=600, duration=0, n_samples=0)], fragment_duration=100)
    bad_trun = _spec_full(b"trun", 0, 0x000100,
                          struct.pack(">I", 1 << 30) + b"\x00" * 8)
    tfhd = _spec_full(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
    moof = _spec_box(b"moof", _spec_box(b"traf", tfhd + bad_trun))
    with pytest.raises(Mp4Error, match="overruns box"):
        mp4_probe(init + moof)
    orphan = _spec_box(b"moof", _spec_box(
        b"traf", _spec_full(b"trun", 0, 0, struct.pack(">I", 4))))
    with pytest.raises(Mp4Error, match="without tfhd"):
        mp4_probe(init + orphan)
    # a fragment for an unknown track id is ignored, not a crash
    ghost = mp4_build_fragment(1, [dict(track_id=9, n_samples=5)])
    meta = mp4_probe(init + ghost)
    assert meta.tracks[0].n_samples == 0 and meta.n_fragments == 1


@PROP
@given(st.data())
def test_prop_fmp4_build_probe_roundtrip(data):
    from accelerator_spark.functions.mp4 import mp4_build_fragment

    n_tracks = data.draw(st.integers(1, 2))
    tracks = []
    for i in range(n_tracks):
        tracks.append(dict(
            track_id=i + 1, handler="vide", codec="avc1",
            width=data.draw(st.integers(0, 4096)),
            height=data.draw(st.integers(0, 4096)),
            timescale=data.draw(st.integers(1, 10**6)), duration=0,
            n_samples=0,
            default_sample_duration=data.draw(st.integers(0, 10**4)),
        ))
    frag_dur = data.draw(st.integers(0, 2**31 - 1))
    blob = mp4_build(1000, 0, tracks, fragment_duration=frag_dur)
    want = {t["track_id"]: [0, 0] for t in tracks}
    n_frags = data.draw(st.integers(0, 4))
    for s in range(n_frags):
        runs = []
        for t in tracks:
            mode = data.draw(st.sampled_from(["durs", "count", "tfhd"]))
            if mode == "durs":
                durs = data.draw(st.lists(st.integers(0, 10**4),
                                          max_size=20))
                runs.append(dict(track_id=t["track_id"],
                                 sample_durations=durs))
                want[t["track_id"]][0] += len(durs)
                want[t["track_id"]][1] += sum(durs)
            elif mode == "tfhd":
                n = data.draw(st.integers(0, 1000))
                d = data.draw(st.integers(0, 10**4))
                runs.append(dict(track_id=t["track_id"], n_samples=n,
                                 default_sample_duration=d))
                want[t["track_id"]][0] += n
                want[t["track_id"]][1] += n * d
            else:
                n = data.draw(st.integers(0, 1000))
                runs.append(dict(track_id=t["track_id"], n_samples=n))
                want[t["track_id"]][0] += n
                want[t["track_id"]][1] += n * t["default_sample_duration"]
        blob += mp4_build_fragment(s + 1, runs)
    meta = mp4_probe(blob)
    assert meta.n_fragments == n_frags
    assert meta.duration == (frag_dur if frag_dur else 0)
    for t in meta.tracks:
        assert [t.n_samples, t.duration] == want[t.track_id]
