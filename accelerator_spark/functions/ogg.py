"""Pure-stdlib Ogg container (Opus / Vorbis) metadata probe.

Opus/Vorbis DECODE needs external codecs, but — the mp3/mp4/flac probe
pattern — the planning metadata is container-level: Ogg is a sequence
of self-describing pages (RFC 3533: ``OggS`` capture, 64-bit
granule position, stream serial, segment table), the first page of a
logical stream carries the codec identification header (``OpusHead``,
RFC 7845 §5.1; ``\\x01vorbis``, Vorbis I spec §4.2.1), and the LAST
page's granule position encodes the exact stream length in samples —
Ogg's designed-in cheap-duration mechanism. ``ogg_probe`` walks page
headers (never page bodies beyond the id header), sums pages, and
derives duration from the final granule: 48 kHz fixed granule rate
minus pre-skip for Opus, the id-header rate for Vorbis.

Validated against hand-derived golden pages (tests/test_flac_ogg.py — no
foreign Ogg reader ships in this container). Page CRCs are NOT
verified (scope: metadata probe, not integrity checker — the CRC
covers page bodies the probe never reads).

Scope: single logical stream (the first BOS serial; chained/muxed
streams: later serials' pages are counted but don't contribute
granules), Opus and Vorbis id headers (other codecs probe as
codec='unknown' with page/granule stats only).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


class OggError(ValueError):
    """Malformed or unsupported-by-scope Ogg input."""


@dataclass(frozen=True)
class OggMeta:
    codec: str            # 'opus' / 'vorbis' / 'unknown'
    sample_rate: int      # id-header rate (Opus: input rate, info only)
    granule_rate: int     # samples/sec the granule counts in
    n_channels: int
    pre_skip: int         # Opus decode-discard samples (0 otherwise)
    last_granule: int     # final page's granule position
    n_samples: int        # playable samples at granule_rate
    n_pages: int

    @property
    def duration_s(self) -> float:
        return self.n_samples / self.granule_rate \
            if self.granule_rate else 0.0


def ogg_probe(data: bytes, max_pages: int = 1 << 20) -> OggMeta:
    """Walk every Ogg page header in one byte string; reads 27 bytes +
    segment table per page and skips bodies, so a multi-hour recording
    probes in milliseconds. ``max_pages`` bounds crafted inputs (the
    walk is strictly forward)."""
    if data[:4] != b"OggS":
        raise OggError("not an Ogg stream (bad capture pattern)")
    pos = 0
    n_pages = 0
    serial0 = None
    codec = "unknown"
    rate = channels = pre_skip = 0
    granule_rate = 0
    last_granule = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            raise OggError(f"page {n_pages}: bad capture pattern "
                           "(corrupt page chain)")
        n_pages += 1
        if n_pages > max_pages:
            raise OggError("page budget exceeded")
        if data[pos + 4] != 0:
            raise OggError(f"unsupported Ogg version {data[pos + 4]}")
        htype = data[pos + 5]
        granule, serial = struct.unpack_from("<qI", data, pos + 6)
        nseg = data[pos + 26]
        seg_end = pos + 27 + nseg
        if seg_end > len(data):
            raise OggError("truncated segment table")
        body_len = sum(data[pos + 27:seg_end])
        body_end = seg_end + body_len
        if body_end > len(data):
            raise OggError("page body overruns file")
        if htype & 0x02 and serial0 is None:   # first BOS page
            serial0 = serial
            body = data[seg_end:body_end]
            if body[:8] == b"OpusHead":
                if len(body) < 19:
                    raise OggError("truncated OpusHead")
                codec = "opus"
                channels = body[9]
                pre_skip, rate = struct.unpack_from("<HI", body, 10)
                granule_rate = 48000   # fixed by RFC 7845 §4
                if rate == 0:
                    rate = 48000       # 0 = unknown input rate
            elif body[:7] == b"\x01vorbis":
                if len(body) < 30:
                    raise OggError("truncated vorbis id header")
                codec = "vorbis"
                channels = body[11]
                rate = struct.unpack_from("<I", body, 12)[0]
                if rate == 0:
                    raise OggError("vorbis rate 0 is invalid")
                granule_rate = rate
        # granule -1 marks a continuation page with no packet ending
        if serial == serial0 and granule >= 0:
            last_granule = max(last_granule, granule)
        pos = body_end
    if pos != len(data):
        raise OggError("trailing bytes after the last page")
    if serial0 is None:
        raise OggError("no BOS page (not the start of an Ogg stream)")
    n_samples = max(0, last_granule - pre_skip) if codec == "opus" \
        else last_granule
    return OggMeta(codec, rate, granule_rate, channels, pre_skip,
                   last_granule, n_samples, n_pages)


# --------------------------------------------------------------- builder
def _page(htype: int, granule: int, serial: int, seq: int,
          body: bytes) -> bytes:
    """One Ogg page. CRC is written as zero — the probe's scope note
    says CRCs are unverified, and a real CRC needs the whole body the
    gate fixtures don't carry."""
    if len(body) > 254 * 255:
        raise OggError("builder: body too large for one page")
    # RFC 3533 lacing: [255] * (len // 255) then the remainder — which
    # is a REQUIRED terminating 0 when len is a multiple of 255 (a
    # trailing 255 means "packet continues on the next page";
    # review r8)
    full, rem = divmod(len(body), 255)
    segs = bytearray([255] * full)
    segs.append(rem)
    nseg = full + 1
    return (b"OggS\x00" + bytes([htype])
            + struct.pack("<qI", granule, serial)
            + struct.pack("<I", seq) + b"\x00\x00\x00\x00"
            + bytes([nseg]) + bytes(segs) + body)


def ogg_build_opus(channels: int, pre_skip: int, input_rate: int,
                   page_granules, serial: int = 1) -> bytes:
    """Author an Opus-in-Ogg metadata skeleton: BOS page with an
    OpusHead id header, then one empty-body audio page per granule
    (ascending; the last defines the duration)."""
    head = (b"OpusHead\x01" + bytes([channels])
            + struct.pack("<HI", pre_skip, input_rate)
            + b"\x00\x00\x00")   # gain + mapping family 0
    out = _page(0x02, 0, serial, 0, head)
    for i, g in enumerate(page_granules):
        eos = 0x04 if i == len(page_granules) - 1 else 0
        out += _page(eos, g, serial, i + 1, b"")
    return out


def ogg_build_vorbis(channels: int, rate: int, page_granules,
                     serial: int = 1) -> bytes:
    """Author a Vorbis-in-Ogg metadata skeleton (id header + empty
    audio pages)."""
    head = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
            + struct.pack("<I", rate)
            + struct.pack("<iii", -1, -1, -1) + b"\xb8\x01")
    out = _page(0x02, 0, serial, 0, head)
    for i, g in enumerate(page_granules):
        eos = 0x04 if i == len(page_granules) - 1 else 0
        out += _page(eos, g, serial, i + 1, b"")
    return out
