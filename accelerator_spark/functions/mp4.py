"""Pure-stdlib ISO Base Media File Format (MP4/MOV/M4A) METADATA
parser.

Video DECODE is genuinely out of stdlib reach (H.264/H.265 entropy
coding), but the container layer is just a length-prefixed box tree
(ISO/IEC 14496-12) — and at 100 TB of scraped video, the planning
questions (how long? what dims? what codec? how many frames?) are
container-metadata questions, not decode questions. ``mp4_probe``
answers them by walking boxes: mvhd (movie timescale/duration), per
track tkhd (dims), mdhd (media timescale/duration), hdlr (handler
type), stsd (first sample-entry fourcc = codec), stsz/stz2 (sample
count = frame count for video tracks). The result feeds
operators/multimodal.frame_sample_plan (which expands n_frames into
the frame indices a decode stage would fetch) without touching a
single codec bit.

Like png/gif/jpeg/avro, written from the public spec; validated
against a hand-derived golden box tree (tests/test_mp4.py) — the
container ships no foreign MP4 reader to cross-check against, so the
golden bytes are authored from the spec's field layouts the same way
the Avro golden fixtures are.

Scope: box walk with 64-bit largesize and size-0 (to-EOF) framing,
version 0 AND 1 full boxes for mvhd/tkhd/mdhd, multiple tracks,
nested moov/trak/mdia/minf/stbl descent, and FRAGMENTED MP4
(VERDICT r7 #1): moof/traf/trun sample counts and durations are
summed per track (with tfhd and mvex/trex default-duration fallback),
and mvex/mehd supplies the movie duration when mvhd carries the
fragmented-stream 0 — so DASH/HLS-style fMP4, most scraped web video,
probes with real n_frames instead of the stsz-only 0. NOT parsed
(skipped cleanly): edit lists, codec private data (avcC/esds
internals), chapters/udta, sidx segment indexes.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, replace


class Mp4Error(ValueError):
    """Malformed or unsupported-by-scope ISO-BMFF input."""


@dataclass(frozen=True)
class Mp4Track:
    track_id: int
    handler: str          # 'vide', 'soun', ... ('' if no hdlr)
    codec: str            # first stsd sample-entry fourcc ('' if none)
    width: int            # tkhd 16.16 fixed, integer part
    height: int
    timescale: int        # mdhd units/second
    duration: int         # in mdhd timescale units
    n_samples: int        # stsz/stz2 sample_count (frames for video)

    @property
    def duration_s(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


@dataclass(frozen=True)
class Mp4Meta:
    brand: str            # ftyp major brand ('' if no ftyp)
    timescale: int        # mvhd units/second
    duration: int         # in mvhd timescale units (mvex/mehd
    #                       fragment_duration when mvhd says 0 — the
    #                       fragmented-stream convention)
    tracks: tuple         # of Mp4Track
    n_fragments: int = 0  # top-level moof count (0 = plain MP4)

    @property
    def duration_s(self) -> float:
        return self.duration / self.timescale if self.timescale else 0.0


def _boxes(data: bytes, start: int, end: int, budget: list):
    """Yield (type, body_start, body_end) for the boxes in
    data[start:end); validates framing and charges the box budget
    (a recursion/looping bound for hostile inputs)."""
    pos = start
    while pos < end:
        budget[0] -= 1
        if budget[0] < 0:
            raise Mp4Error("box budget exceeded (hostile or corrupt)")
        if pos + 8 > end:
            raise Mp4Error("truncated box header")
        size = struct.unpack(">I", data[pos:pos + 4])[0]
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error("truncated largesize")
            size = struct.unpack(">Q", data[pos + 8:pos + 16])[0]
            body = pos + 16
        elif size == 0:
            size = end - pos  # box extends to end of enclosing space
        if size < body - pos or pos + size > end:
            raise Mp4Error(f"box {btype!r} size {size} overruns container")
        yield btype, body, pos + size
        pos += size


def _fullbox(data: bytes, start: int, end: int):
    """(version, flags, payload_start) of a full box."""
    if start + 4 > end:
        raise Mp4Error("truncated full box")
    return data[start], int.from_bytes(data[start + 1:start + 4], "big"), \
        start + 4


def _parse_mvhd(data, start, end):
    v, _, p = _fullbox(data, start, end)
    if v == 1:
        if p + 28 > end:
            raise Mp4Error("truncated mvhd v1")
        ts = struct.unpack(">I", data[p + 16:p + 20])[0]
        dur = struct.unpack(">Q", data[p + 20:p + 28])[0]
    else:
        if p + 16 > end:
            raise Mp4Error("truncated mvhd")
        ts, dur = struct.unpack(">II", data[p + 8:p + 16])
    return ts, dur


def _parse_tkhd(data, start, end):
    v, _, p = _fullbox(data, start, end)
    # full fixed layout: v0 = 80 payload bytes, v1 = 92 — anything
    # shorter would let the trailing width/height read overlap earlier
    # fields and report garbage dims silently (review r7)
    if end - p < (92 if v == 1 else 80):
        raise Mp4Error("truncated tkhd")
    tid_off = p + (16 if v == 1 else 8)
    track_id = struct.unpack(">I", data[tid_off:tid_off + 4])[0]
    # width/height at the version-fixed payload offset (v0: p+72, v1:
    # p+84), 16.16 fixed point — NOT the last 8 bytes of the box: the
    # size check above is >=, so a tkhd with nonstandard trailing bytes
    # would silently yield garbage dims from a box-relative read
    # (ADVICE r7)
    wh_off = p + (84 if v == 1 else 72)
    w, h = struct.unpack(">II", data[wh_off:wh_off + 8])
    return track_id, w >> 16, h >> 16


def _parse_mdhd(data, start, end):
    v, _, p = _fullbox(data, start, end)
    if v == 1:
        if p + 28 > end:
            raise Mp4Error("truncated mdhd v1")
        ts = struct.unpack(">I", data[p + 16:p + 20])[0]
        dur = struct.unpack(">Q", data[p + 20:p + 28])[0]
    else:
        if p + 16 > end:
            raise Mp4Error("truncated mdhd")
        ts, dur = struct.unpack(">II", data[p + 8:p + 16])
    return ts, dur


def _parse_mehd(data, start, end) -> int:
    """mvex/mehd fragment_duration (movie-timescale units): the total
    movie duration INCLUDING fragments — mvhd carries 0 in fragmented
    streams."""
    v, _, p = _fullbox(data, start, end)
    if v == 1:
        if p + 8 > end:
            raise Mp4Error("truncated mehd v1")
        return struct.unpack(">Q", data[p:p + 8])[0]
    if p + 4 > end:
        raise Mp4Error("truncated mehd")
    return struct.unpack(">I", data[p:p + 4])[0]


def _parse_trex(data, start, end):
    """mvex/trex: (track_id, default_sample_duration) — the
    movie-level fallback for fragments whose tfhd/trun carry no
    duration fields."""
    _, _, p = _fullbox(data, start, end)
    if p + 20 > end:
        raise Mp4Error("truncated trex")
    tid, _sdi, ddur, _dsize, _dflags = struct.unpack(
        ">5I", data[p:p + 20])
    return tid, ddur


def _parse_tfhd(data, start, end):
    """traf/tfhd: (track_id, default_sample_duration or None). The
    optional fields appear in flag order (ISO 14496-12 §8.8.7):
    base-data-offset(8) sample-description-index(4)
    default-sample-duration(4) ..."""
    _, flags, p = _fullbox(data, start, end)
    if p + 4 > end:
        raise Mp4Error("truncated tfhd")
    tid = struct.unpack(">I", data[p:p + 4])[0]
    p += 4
    if flags & 0x000001:   # base-data-offset
        p += 8
    if flags & 0x000002:   # sample-description-index
        p += 4
    ddur = None
    if flags & 0x000008:   # default-sample-duration
        if p + 4 > end:
            raise Mp4Error("truncated tfhd default-sample-duration")
        ddur = struct.unpack(">I", data[p:p + 4])[0]
    return tid, ddur


def _parse_trun(data, start, end):
    """traf/trun: (sample_count, duration_sum or None). duration_sum
    is the sum of per-sample durations when the sample-duration-present
    flag is set, else None (caller falls back to tfhd/trex defaults).
    The declared sample table must FIT in the box — that bounds the
    walk by actual bytes, so a crafted sample_count of 2^31 fails fast
    instead of looping."""
    _, flags, p = _fullbox(data, start, end)
    if p + 4 > end:
        raise Mp4Error("truncated trun")
    n = struct.unpack(">I", data[p:p + 4])[0]
    p += 4
    if flags & 0x000001:   # data-offset
        p += 4
    if flags & 0x000004:   # first-sample-flags
        p += 4
    # per-sample fields: duration(0x100) size(0x200) flags(0x400)
    # composition-time-offset(0x800), 4 bytes each, flag order
    per = [bit for bit in (0x100, 0x200, 0x400, 0x800) if flags & bit]
    stride = 4 * len(per)
    if p + n * stride > end:
        raise Mp4Error(f"trun sample table overruns box "
                       f"({n} samples x {stride} bytes)")
    if not (flags & 0x100) or n == 0:
        return n, None
    k = len(per)
    if k == 1:  # duration is the only per-sample field: one flat unpack
        return n, sum(struct.unpack(f">{n}I", data[p:p + 4 * n]))
    # multi-field entries: read ONLY the duration column (always field
    # 0 — 0x100 is the lowest flag bit). Unpacking the whole n*k table
    # to slice every k-th element materializes a ~30x-the-need tuple
    # for a 1M-sample trun (review r8).
    return n, sum(struct.unpack_from(">I", data, off)[0]
                  for off in range(p, p + n * stride, stride))


def _parse_moof(data, start, end, budget, trex_dur: dict):
    """One movie fragment: {track_id: (n_samples, duration)} summed
    over the fragment's traf/trun boxes. Duration per trun comes from
    per-sample durations when present, else tfhd's
    default-sample-duration, else the movie-level trex default, else
    0 (count still recorded)."""
    per_track = {}
    for bt, b0, b1 in _boxes(data, start, end, budget):
        if bt != b"traf":
            continue
        tid = None
        tfhd_dur = None
        runs = []
        for ct, c0, c1 in _boxes(data, b0, b1, budget):
            if ct == b"tfhd":
                tid, tfhd_dur = _parse_tfhd(data, c0, c1)
            elif ct == b"trun":
                runs.append(_parse_trun(data, c0, c1))
        if tid is None:
            raise Mp4Error("traf without tfhd")
        n_prev, d_prev = per_track.get(tid, (0, 0))
        for n, dsum in runs:
            if dsum is None:
                default = tfhd_dur if tfhd_dur is not None \
                    else trex_dur.get(tid, 0)
                dsum = n * default
            n_prev += n
            d_prev += dsum
        per_track[tid] = (n_prev, d_prev)
    return per_track


def mp4_probe(data: bytes, max_boxes: int = 1_000_000) -> Mp4Meta:
    """Parse container metadata from one ISO-BMFF byte string. Reads
    only box headers and the handful of fixed-layout leaf boxes above —
    never sample data — so probing a multi-GB file costs kilobytes of
    actual reads when the moov sits up front (faststart layout).
    ``max_boxes`` bounds total box visits; the default accommodates
    long fragmented recordings (hours of 2 s styp/moof/mdat triples)
    while still capping crafted millions-of-boxes inputs — the walk is
    strictly forward (every box advances the cursor), so the budget is
    a belt-and-braces bound, not a loop guard (review r7).

    Fragmented MP4 (VERDICT r7 #1): moof sample counts/durations are
    summed into each track's n_samples/duration, and mvex/mehd's
    fragment_duration replaces a zero mvhd duration — moofs may appear
    before OR after moov in the byte stream (live-derived files put
    moov last); the moov's mvex/trex defaults apply either way."""
    if len(data) < 8:
        raise Mp4Error("too short for an ISO-BMFF box")
    budget = [max_boxes]
    brand = ""
    ts = dur = 0
    saw_moov = False
    tracks = []
    mehd_dur = 0
    trex_dur: dict = {}
    moof_spans = []
    for btype, b0, b1 in _boxes(data, 0, len(data), budget):
        if btype == b"ftyp":
            if b1 - b0 >= 4:
                brand = data[b0:b0 + 4].decode("latin1").strip()
        elif btype == b"moov":
            saw_moov = True
            for ct, c0, c1 in _boxes(data, b0, b1, budget):
                if ct == b"mvhd":
                    ts, dur = _parse_mvhd(data, c0, c1)
                elif ct == b"trak":
                    tracks.append(_parse_trak(data, c0, c1, budget))
                elif ct == b"mvex":
                    for xt, x0, x1 in _boxes(data, c0, c1, budget):
                        if xt == b"mehd":
                            mehd_dur = _parse_mehd(data, x0, x1)
                        elif xt == b"trex":
                            tid, ddur = _parse_trex(data, x0, x1)
                            trex_dur[tid] = ddur
        elif btype == b"moof":
            # defer: trex defaults live in moov, which a live-derived
            # file writes AFTER its moofs
            moof_spans.append((b0, b1))
    if not saw_moov:
        raise Mp4Error("no moov box (not a complete MP4, or an "
                       "init-segment-less fragment stream)")
    frag: dict = {}
    for b0, b1 in moof_spans:
        for tid, (n, d) in _parse_moof(data, b0, b1, budget,
                                       trex_dur).items():
            n_prev, d_prev = frag.get(tid, (0, 0))
            frag[tid] = (n_prev + n, d_prev + d)
    if frag:
        tracks = [
            replace(t,
                    n_samples=t.n_samples + frag.get(t.track_id, (0, 0))[0],
                    duration=t.duration + frag.get(t.track_id, (0, 0))[1])
            for t in tracks
        ]
    if dur == 0 and mehd_dur:
        dur = mehd_dur
    return Mp4Meta(brand, ts, dur, tuple(tracks), len(moof_spans))


def _parse_trak(data, start, end, budget) -> Mp4Track:
    track_id = width = height = 0
    handler = codec = ""
    ts = dur = n_samples = 0
    for bt, b0, b1 in _boxes(data, start, end, budget):
        if bt == b"tkhd":
            track_id, width, height = _parse_tkhd(data, b0, b1)
        elif bt == b"mdia":
            for ct, c0, c1 in _boxes(data, b0, b1, budget):
                if ct == b"mdhd":
                    ts, dur = _parse_mdhd(data, c0, c1)
                elif ct == b"hdlr":
                    _, _, p = _fullbox(data, c0, c1)
                    if p + 8 <= c1:
                        handler = data[p + 4:p + 8].decode("latin1")
                elif ct == b"minf":
                    for st, s0, s1 in _boxes(data, c0, c1, budget):
                        if st != b"stbl":
                            continue
                        for xt, x0, x1 in _boxes(data, s0, s1, budget):
                            if xt == b"stsd":
                                _, _, p = _fullbox(data, x0, x1)
                                # entry_count(4) + first entry:
                                # size(4) fourcc(4)
                                if p + 12 <= x1:
                                    codec = data[p + 8:p + 12].decode(
                                        "latin1")
                            elif xt in (b"stsz", b"stz2"):
                                # stsz: sample_size(4) then count;
                                # stz2: reserved(3)+field_size(1) then
                                # count — sample_count sits at +4 both
                                _, _, p = _fullbox(data, x0, x1)
                                if p + 8 <= x1:
                                    n_samples = struct.unpack(
                                        ">I", data[p + 4:p + 8])[0]
    return Mp4Track(track_id, handler, codec, width, height, ts, dur,
                    n_samples)


# --------------------------------------------------------------- builder
# Minimal box writers — the test-harness half (like png_encode /
# avro_encode_file): enough to author deterministic, spec-layout
# containers for gates and property tests. Not a muxer: no sample
# data, no interleaving.

def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big")
                + payload)


def mp4_build(timescale: int, duration: int, tracks,
              brand: bytes = b"isom",
              fragment_duration: int | None = None) -> bytes:
    """Author a metadata-only MP4: ftyp + moov(mvhd + trak*). Each
    track is a dict with track_id, handler(4ch), codec(4ch), width,
    height, timescale, duration, n_samples; optional
    default_sample_duration feeds the track's trex when the movie is
    fragmented. ``fragment_duration`` (movie-timescale units), when
    given, marks the movie as fragmented: mvex(mehd + trex per track)
    is appended to moov, and ``duration`` is what mvhd itself reports
    (fragmented streams conventionally write 0 there). Append
    mp4_build_fragment(...) outputs for the moof/mdat sequence."""
    moov = _full(b"mvhd", 0, 0,
                 struct.pack(">II", 0, 0)            # ctime, mtime
                 + struct.pack(">II", timescale, duration)
                 + struct.pack(">I", 0x00010000)     # rate 1.0
                 + struct.pack(">H", 0x0100)         # volume
                 + b"\x00" * 10                      # reserved
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)     # unity matrix
                 + b"\x00" * 24                      # predefined
                 + struct.pack(">I", len(tracks) + 1))  # next track id
    for t in tracks:
        # tkhd duration is expressed in the MOVIE timescale (ISO
        # 14496-12 §8.3.2), unlike mdhd's media-timescale duration —
        # the golden-bytes test caught the builder writing media units.
        # Clamp to the field's uint32 ceiling (all-ones = "unknown
        # duration" per spec) instead of crashing struct.pack, and
        # reject the undefined zero timescale (review r7)
        if t["timescale"] <= 0:
            raise Mp4Error("track timescale must be > 0")
        tk_dur = min(round(t["duration"] * timescale / t["timescale"]),
                     0xFFFFFFFF)
        tkhd = _full(b"tkhd", 0, 7,
                     struct.pack(">II", 0, 0)
                     + struct.pack(">I", t["track_id"])
                     + b"\x00" * 4
                     + struct.pack(">I", tk_dur)
                     + b"\x00" * 8                   # reserved
                     + struct.pack(">HHHH", 0, 0, 0, 0)
                     + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000,
                                   0, 0, 0, 0x40000000)
                     + struct.pack(">II", t["width"] << 16,
                                   t["height"] << 16))
        mdhd = _full(b"mdhd", 0, 0,
                     struct.pack(">II", 0, 0)
                     + struct.pack(">II", t["timescale"], t["duration"])
                     + struct.pack(">HH", 0x55C4, 0))  # 'und', predefined
        hdlr = _full(b"hdlr", 0, 0,
                     b"\x00" * 4 + t["handler"].encode("latin1")
                     + b"\x00" * 12 + b"\x00")
        entry = struct.pack(">I", 16) + t["codec"].encode("latin1") \
            + b"\x00" * 8  # minimal sample entry (reserved + dri)
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
        stsz = _full(b"stsz", 0, 0,
                     struct.pack(">II", 0, t["n_samples"]))
        stbl = _box(b"stbl", stsd + stsz)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        moov += _box(b"trak", tkhd + mdia)
    if fragment_duration is not None:
        mvex = _full(b"mehd", 0, 0, struct.pack(">I", fragment_duration))
        for t in tracks:
            mvex += _full(b"trex", 0, 0, struct.pack(
                ">5I", t["track_id"], 1,
                t.get("default_sample_duration", 0), 0, 0))
        moov += _box(b"mvex", mvex)
    return _box(b"ftyp", brand + struct.pack(">I", 0) + brand) \
        + _box(b"moov", moov)


def mp4_build_fragment(sequence: int, runs) -> bytes:
    """Author one movie fragment: moof(mfhd + traf*) + an empty mdat
    (the probe never reads sample data; the mdat keeps the top-level
    box sequence spec-shaped). Each run is a dict with track_id and
    either ``sample_durations`` (list -> a trun with per-sample
    durations) or ``n_samples`` (+ optional
    ``default_sample_duration`` -> tfhd default, trun counts only).
    tfhd always sets flag 0x020000 (default-base-is-moof, the CMAF/
    DASH convention)."""
    moof = _full(b"mfhd", 0, 0, struct.pack(">I", sequence))
    for r in runs:
        tf_flags = 0x020000
        tf_payload = struct.pack(">I", r["track_id"])
        if r.get("default_sample_duration") is not None:
            tf_flags |= 0x000008
            tf_payload += struct.pack(">I", r["default_sample_duration"])
        tfhd = _full(b"tfhd", 0, tf_flags, tf_payload)
        durs = r.get("sample_durations")
        if durs is not None:
            trun = _full(b"trun", 0, 0x000100,
                         struct.pack(">I", len(durs))
                         + b"".join(struct.pack(">I", d) for d in durs))
        else:
            trun = _full(b"trun", 0, 0,
                         struct.pack(">I", r["n_samples"]))
        moof += _box(b"traf", tfhd + trun)
    return _box(b"moof", moof) + _box(b"mdat", b"")
