"""Pure-stdlib Matroska / WebM (EBML) metadata probe.

WebM is the other half of scraped web video (everything MP4/fMP4
isn't — see functions/mp4.py); VP8/VP9/AV1 DECODE is out of stdlib
reach, but the container is EBML: every element is a
length-marked-varint ID + varint size + payload (RFC 8794), so the
planning metadata walks exactly like the ISO-BMFF box tree — Segment
-> Info (TimecodeScale, Duration) and Tracks (type, codec id, video
dims, audio rate/channels), with Cluster payloads skipped by their
size fields. Validated against hand-derived golden elements
(tests/test_mkv.py — no foreign Matroska reader ships in this
container, the mp4-golden pattern).

Scope: EBML header DocType, Segment (known or unknown/streamed size),
Info, Tracks (all entries), top-level Cluster COUNT (frame counts
would need descending into every cluster's lacing — cluster count is
the cheap progress/fragmentation stat). NOT parsed: cues, chapters,
tags, attachments (skipped by size), block lacing.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class MkvError(ValueError):
    """Malformed or unsupported-by-scope EBML/Matroska input."""


@dataclass(frozen=True)
class MkvTrack:
    number: int
    track_type: int       # 1 video, 2 audio, 17 subtitle, ...
    codec: str            # CodecID ('V_VP9', 'A_OPUS', ...)
    width: int            # video only, else 0
    height: int
    sample_rate: float    # audio only, else 0.0
    n_channels: int       # audio only, else 0


@dataclass(frozen=True)
class MkvMeta:
    doc_type: str         # 'webm' or 'matroska'
    timescale_ns: int     # TimecodeScale (default 1_000_000)
    duration_ticks: float # Info Duration (in timescale units)
    tracks: tuple         # of MkvTrack
    n_clusters: int

    @property
    def duration_s(self) -> float:
        return self.duration_ticks * self.timescale_ns / 1e9


_UNKNOWN = -1  # sentinel for unknown-size elements


def _read_vint(data: bytes, pos: int, keep_marker: bool):
    """(value, new_pos). EBML varints carry their byte length in the
    position of the leading 1 bit; element IDs keep the marker bit,
    sizes strip it (all-ones payload = unknown size)."""
    if pos >= len(data):
        raise MkvError("truncated varint")
    first = data[pos]
    if first == 0:
        raise MkvError("invalid varint (>8 bytes)")
    length = 9 - first.bit_length()
    if pos + length > len(data):
        raise MkvError("truncated varint")
    if keep_marker:
        v = int.from_bytes(data[pos:pos + length], "big")
    else:
        v = first & ((1 << (8 - length)) - 1)
        for b in data[pos + 1:pos + length]:
            v = (v << 8) | b
        if v == (1 << (7 * length)) - 1:
            return _UNKNOWN, pos + length
    return v, pos + length


# Segment-level element IDs an unknown-size element terminates at
# (RFC 8794 §6.2: an unknown-size element ends where a non-descendant
# element starts; for the streamed-WebM case that matters — every
# Cluster written with unknown size, e.g. browser MediaRecorder
# output — the next boundary is one of these)
_SEGMENT_LEVEL_IDS = (b"\x1f\x43\xb6\x75",   # Cluster
                      b"\x15\x49\xa9\x66",   # Info
                      b"\x16\x54\xae\x6b",   # Tracks
                      b"\x1c\x53\xbb\x6b",   # Cues
                      b"\x11\x4d\x9b\x74",   # SeekHead
                      b"\x10\x43\xa7\x70",   # Chapters
                      b"\x12\x54\xc3\x67",   # Tags
                      b"\x19\x41\xa4\x69")   # Attachments


def _plausible_boundary(data: bytes, at: int, end: int) -> bool:
    """A 4-byte segment-level ID found by raw search only counts as an
    element boundary if a well-formed size varint follows it and the
    implied body stays inside the enclosing space (ADVICE r8: the bare
    byte search can false-match inside a cluster's media payload and
    split one streamed cluster into several)."""
    try:
        size, body = _read_vint(data, at + 4, keep_marker=False)
    except MkvError:
        return False
    if size == _UNKNOWN:
        return True
    return body + size <= end


def _unknown_end(data: bytes, pos: int, end: int) -> int:
    """End of an unknown-size NON-Segment element: the earliest
    VALIDATED Segment-level ID at or after ``pos`` (else the enclosing
    end). Candidates whose following bytes do not parse as an in-bounds
    size varint are payload false-matches and are skipped."""
    nxt = end
    for marker in _SEGMENT_LEVEL_IDS:
        start = pos
        while start < nxt:
            at = data.find(marker, start, nxt)
            if at == -1:
                break
            if _plausible_boundary(data, at, end):
                nxt = at
                break
            start = at + 1
    return nxt


def _elements(data: bytes, start: int, end: int, budget: list):
    """Yield (id, body_start, body_end) for the elements in
    data[start:end); an unknown-size Segment extends to the end of its
    enclosing space, and an unknown-size Cluster (or other element)
    ends at the next Segment-level ID — without the resync, the FIRST
    streamed cluster would swallow every following cluster and any
    trailing Segment children (review r8)."""
    pos = start
    while pos < end:
        budget[0] -= 1
        if budget[0] < 0:
            raise MkvError("element budget exceeded (hostile or corrupt)")
        eid, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size == _UNKNOWN:
            body_end = end if eid == 0x18538067 \
                else _unknown_end(data, pos, end)
        else:
            body_end = pos + size
        if body_end > end:
            raise MkvError(f"element 0x{eid:x} overruns container")
        yield eid, pos, body_end
        pos = body_end


def _uint(data: bytes, s: int, e: int) -> int:
    return int.from_bytes(data[s:e], "big")


def _float(data: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", data[s:e])[0]
    if n == 8:
        return struct.unpack(">d", data[s:e])[0]
    if n == 0:
        return 0.0
    raise MkvError(f"float element of {n} bytes")


def _parse_track(data, start, end, budget) -> MkvTrack:
    number = ttype = width = height = channels = 0
    codec = ""
    rate = 0.0
    for eid, s, e in _elements(data, start, end, budget):
        if eid == 0xD7:          # TrackNumber
            number = _uint(data, s, e)
        elif eid == 0x83:        # TrackType
            ttype = _uint(data, s, e)
        elif eid == 0x86:        # CodecID
            codec = data[s:e].decode("latin1")
        elif eid == 0xE0:        # Video settings
            for vid, vs, ve in _elements(data, s, e, budget):
                if vid == 0xB0:
                    width = _uint(data, vs, ve)
                elif vid == 0xBA:
                    height = _uint(data, vs, ve)
        elif eid == 0xE1:        # Audio settings
            for aid, as_, ae in _elements(data, s, e, budget):
                if aid == 0xB5:
                    rate = _float(data, as_, ae)
                elif aid == 0x9F:
                    channels = _uint(data, as_, ae)
    return MkvTrack(number, ttype, codec, width, height, rate, channels)


def mkv_probe(data: bytes, max_elements: int = 1_000_000) -> MkvMeta:
    """Parse container metadata from one EBML/Matroska byte string.
    Reads element headers and the small Info/Tracks leaves — Cluster
    payloads (the media data) are skipped by their size fields, so a
    multi-GB recording probes in O(#elements-at-cluster-level).
    ``max_elements`` bounds total element visits (strictly-forward
    walk, belt-and-braces like the mp4 box budget)."""
    if len(data) < 4 or data[:4] != b"\x1a\x45\xdf\xa3":
        raise MkvError("not an EBML stream (bad magic)")
    budget = [max_elements]
    doc_type = "matroska"  # the EBML default when DocType is absent
    timescale = 1_000_000  # Matroska default, ns per tick
    duration = 0.0
    tracks = []
    n_clusters = 0
    saw_segment = False
    for eid, s, e in _elements(data, 0, len(data), budget):
        if eid == 0x1A45DFA3:          # EBML header
            for hid, hs, he in _elements(data, s, e, budget):
                if hid == 0x4282:      # DocType
                    doc_type = data[hs:he].decode("latin1").rstrip("\x00")
        elif eid == 0x18538067:        # Segment
            saw_segment = True
            for sid, ss, se in _elements(data, s, e, budget):
                if sid == 0x1549A966:  # Info
                    for iid, is_, ie in _elements(data, ss, se, budget):
                        if iid == 0x2AD7B1:
                            timescale = _uint(data, is_, ie)
                        elif iid == 0x4489:
                            duration = _float(data, is_, ie)
                elif sid == 0x1654AE6B:  # Tracks
                    for tid, ts, te in _elements(data, ss, se, budget):
                        if tid == 0xAE:  # TrackEntry
                            tracks.append(
                                _parse_track(data, ts, te, budget))
                elif sid == 0x1F43B675:  # Cluster
                    n_clusters += 1
    if not saw_segment:
        raise MkvError("no Segment element (not a Matroska/WebM file)")
    if timescale <= 0:
        raise MkvError("TimecodeScale must be positive")
    return MkvMeta(doc_type, timescale, duration, tuple(tracks),
                   n_clusters)


# --------------------------------------------------------------- builder
def _vint_size(n: int) -> bytes:
    """Encode a size varint in the fewest bytes (marker bit set)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:  # all-ones is 'unknown'
            return ((1 << (7 * length)) | n).to_bytes(length, "big")
    raise MkvError("size too large for an EBML varint")


def _el(eid: int, payload: bytes) -> bytes:
    id_len = (eid.bit_length() + 7) // 8
    return eid.to_bytes(id_len, "big") + _vint_size(len(payload)) + payload


def _el_uint(eid: int, v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return _el(eid, v.to_bytes(n, "big"))


def mkv_build(doc_type: str, timescale_ns: int, duration_ticks: float,
              tracks, n_clusters: int = 0,
              unknown_segment_size: bool = False) -> bytes:
    """Author a metadata-only Matroska/WebM container: EBML header +
    Segment(Info + Tracks + empty Clusters). Each track is a dict with
    number, track_type, codec, and width/height (video) or
    sample_rate/n_channels (audio). ``unknown_segment_size`` writes
    the streamed-file convention (size varint all-ones)."""
    header = _el(0x1A45DFA3,
                 _el_uint(0x4286, 1)                 # EBMLVersion
                 + _el_uint(0x42F7, 1)               # EBMLReadVersion
                 + _el(0x4282, doc_type.encode("latin1"))
                 + _el_uint(0x4287, 4)               # DocTypeVersion
                 + _el_uint(0x4285, 2))              # DocTypeReadVersion
    info = _el(0x1549A966,
               _el_uint(0x2AD7B1, timescale_ns)
               + _el(0x4489, struct.pack(">d", duration_ticks)))
    tr = b""
    for t in tracks:
        entry = (_el_uint(0xD7, t["number"])
                 + _el_uint(0x83, t["track_type"])
                 + _el(0x86, t["codec"].encode("latin1")))
        if t.get("width"):
            entry += _el(0xE0, _el_uint(0xB0, t["width"])
                         + _el_uint(0xBA, t["height"]))
        if t.get("sample_rate"):
            entry += _el(0xE1,
                         _el(0xB5, struct.pack(">f", t["sample_rate"]))
                         + _el_uint(0x9F, t["n_channels"]))
        tr += _el(0xAE, entry)
    tracks_el = _el(0x1654AE6B, tr)
    clusters = _el(0x1F43B675, _el_uint(0xE7, 0)) * n_clusters
    seg_body = info + tracks_el + clusters
    if unknown_segment_size:
        seg = (0x18538067).to_bytes(4, "big") + b"\xff" + seg_body
    else:
        seg = _el(0x18538067, seg_body)
    return header + seg
