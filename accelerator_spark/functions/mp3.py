"""Pure-stdlib MPEG audio (MP3) frame-header / ID3 METADATA probe.

MP3 DECODE is out of stdlib reach (Layer III entropy coding +
polyphase filterbank), but — exactly like the ISO-BMFF probe in
functions/mp4.py — the planning questions a 100 TB scraped-audio
corpus asks (how long? what sample rate? mono or stereo? CBR or VBR?
how much is ID3 wrapper?) are FRAME HEADER questions: MPEG audio is a
self-describing sequence of frames whose 4-byte headers carry
version/layer/bitrate/samplerate/channel-mode, and whose lengths are
closed-form in those fields (ISO/IEC 11172-3 §2.4.1 / 13818-3).
``mp3_probe`` skips the ID3v2 wrapper (syncsafe size, footer flag),
walks every frame header, and reports exact frame/sample counts, the
duration, the average bitrate and whether the stream is VBR.

Like png/gif/jpeg/avro/mp4: written from the public spec; validated
against hand-derived golden frame bytes (tests/test_mp3.py) — the
container ships no foreign MP3 reader to cross-check against, so the
golden bytes are authored from the spec's bit layouts the same way the
mp4 fixtures are.

Scope: MPEG-1/2/2.5 Layers I/II/III, CBR and VBR, CRC-protected
frames, padding, ID3v2.2/3/4 skip (incl. footer), ID3v1/ID3v1.1 tail
detection, bounded junk resync before the first frame (scraped files
often carry garbage between the tag and the audio). NOT parsed
(fail or stop cleanly): free-format bitrate (index 0), APE tags,
Xing/VBRI headers (the frame walk counts every frame exactly, which is
what those headers merely approximate).
"""

from __future__ import annotations

from dataclasses import dataclass

_VERSIONS = {0b00: "2.5", 0b10: "2", 0b11: "1"}  # 0b01 reserved
_LAYERS = {0b01: 3, 0b10: 2, 0b11: 1}            # 0b00 reserved

# bitrate tables, kbps, index 1..14 (0 = free format, 15 = invalid):
# keyed by (version_is_mpeg1, layer)
_BITRATES = {
    (True, 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
                384, 416, 448),
    (True, 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384),
    (True, 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320),
    (False, 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
                 224, 256),
    # MPEG-2/2.5 Layers II and III share one table
    (False, 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                 160),
    (False, 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                 160),
}

_RATES = {"1": (44100, 48000, 32000),
          "2": (22050, 24000, 16000),
          "2.5": (11025, 12000, 8000)}

_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


class Mp3Error(ValueError):
    """Malformed or unsupported-by-scope MPEG-audio input."""


@dataclass(frozen=True)
class Mp3Meta:
    version: str          # '1', '2', '2.5'
    layer: int            # 1, 2, 3
    sample_rate: int
    channel_mode: str     # stereo / joint_stereo / dual_channel / mono
    n_channels: int       # 2, or 1 for mono
    n_frames: int
    n_samples: int        # per channel (frames x samples-per-frame)
    bitrate_kbps: int     # average over frames (== the CBR rate)
    vbr: bool             # frames carry differing bitrate indexes
    id3v2_size: int       # bytes of leading ID3v2 wrapper (0 if none)
    has_id3v1: bool       # 128-byte 'TAG' trailer present

    @property
    def duration_s(self) -> float:
        return self.n_samples / self.sample_rate if self.sample_rate \
            else 0.0


def _samples_per_frame(version: str, layer: int) -> int:
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576  # Layer III halves in MPEG-2


def _parse_header(h: int):
    """Decode one 32-bit frame header; returns (version, layer,
    bitrate_kbps, sample_rate, padding, mode_bits), the string
    "free" for a free-format header (valid sync but bitrate index 0 —
    out of scope, but it must NOT abort a junk resync: a false sync
    inside garbage or trailing bytes can carry a zero bitrate nibble,
    review r8), or None if the bytes are not a frame header at all."""
    if h >> 21 != 0x7FF:
        return None
    ver_bits = (h >> 19) & 0b11
    layer_bits = (h >> 17) & 0b11
    version = _VERSIONS.get(ver_bits)
    layer = _LAYERS.get(layer_bits)
    if version is None or layer is None:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0b11
    if br_idx == 15 or sr_idx == 3:
        return None
    if br_idx == 0:
        return "free"
    bitrate = _BITRATES[(version == "1", layer)][br_idx - 1]
    rate = _RATES[version][sr_idx]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 0b11
    return version, layer, bitrate, rate, padding, mode


def _frame_length(version: str, layer: int, bitrate_kbps: int,
                  rate: int, padding: int) -> int:
    bps = bitrate_kbps * 1000
    if layer == 1:
        return (12 * bps // rate + padding) * 4
    if layer == 2 or version == "1":
        return 144 * bps // rate + padding
    return 72 * bps // rate + padding  # Layer III, MPEG-2/2.5


def _id3v2_size(data: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (header + syncsafe size +
    footer if flagged), or 0."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    flags = data[5]
    if any(b & 0x80 for b in data[6:10]):
        raise Mp3Error("ID3v2 size bytes must be syncsafe (<0x80)")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    return 10 + size + (10 if flags & 0x10 else 0)


def mp3_probe(data: bytes, max_resync: int = 65536) -> Mp3Meta:
    """Walk every MPEG-audio frame header in one byte string. Reads 4
    bytes per frame and jumps by the closed-form frame length — no
    sample data is touched, so the walk is tens of microseconds per
    megabyte. ``max_resync`` bounds the pre-first-frame junk scan
    (scraped files routinely carry garbage between the ID3v2 tag and
    the first frame; after the first frame, a header that fails to
    parse ends the walk cleanly — trailing tags/junk, the browser-
    tolerant choice the GIF decoder also makes)."""
    if len(data) < 4:
        raise Mp3Error("too short for an MPEG audio frame header")
    pos = id3v2 = _id3v2_size(data)
    if id3v2 > len(data):
        raise Mp3Error("ID3v2 size overruns file")
    end = len(data)
    has_id3v1 = end - pos >= 128 and data[end - 128:end - 125] == b"TAG"
    if has_id3v1:
        end -= 128
    first = version = None
    layer = rate = mode = 0
    n_frames = bitrate_sum = 0
    vbr = False
    saw_free = False
    scan_limit = min(pos + max_resync, end - 4)
    while pos + 4 <= end:
        h = int.from_bytes(data[pos:pos + 4], "big")
        parsed = _parse_header(h)
        if parsed is None or parsed == "free":
            # free-format headers are treated like non-headers during
            # resync and after real frames (a false sync can carry a
            # zero bitrate nibble, review r8) — but remembered, so a
            # genuinely free-format FILE gets the actionable scope
            # error below instead of 'no frames found'
            saw_free = saw_free or parsed == "free"
            if n_frames == 0 and pos <= scan_limit:
                pos += 1  # junk before the first frame: resync
                continue
            break  # trailing junk / tag after real frames: stop
        ver, lay, br, rt, pad, md = parsed
        if first is None:
            first = parsed
            version, layer, rate, mode = ver, lay, rt, md
        elif (ver, lay, rt) != (version, layer, rate):
            # a "header" disagreeing on version/layer/rate is a false
            # sync inside payload bytes, not a format change — stop
            # counting rather than corrupt the totals
            break
        if br != first[2]:
            vbr = True
        n_frames += 1
        bitrate_sum += br
        pos += _frame_length(ver, lay, br, rt, pad)
    if n_frames == 0:
        raise Mp3Error(
            "free-format bitrate (index 0) is out of scope" if saw_free
            else "no MPEG audio frames found")
    spf = _samples_per_frame(version, layer)
    return Mp3Meta(
        version=version, layer=layer, sample_rate=rate,
        channel_mode=_MODES[mode],
        n_channels=1 if mode == 0b11 else 2,
        n_frames=n_frames, n_samples=n_frames * spf,
        bitrate_kbps=bitrate_sum // n_frames, vbr=vbr,
        id3v2_size=id3v2, has_id3v1=has_id3v1)


_ID3_ENCODINGS = {0: "latin1", 1: "utf-16", 2: "utf-16-be", 3: "utf-8"}


def id3v2_tags(data: bytes, max_frames: int = 1024) -> dict:
    """Extract ID3v2.3/2.4 TEXT frames (TIT2 title, TPE1 artist, TALB
    album, TDRC/TYER year, TCON genre, ...) from a leading ID3v2 tag —
    the metadata half of the MP3 probe: at corpus scale, title/artist
    strings drive near-dup grouping and licensing triage the way URL
    canonicalization does for web text. Returns {frame_id: text} for
    the T*** frames (TXXX's user-defined description:value pairs are
    joined with ':'; v2.4 multi-value NUL separators become the '/'
    v2.3 used, so join keys stay NUL-free — review r8); non-text
    frames (APIC art, COMM comments) and frames flagged compressed/
    encrypted/per-frame-unsynced/with-DLI are skipped by their length
    (review r8: their bodies are not encoding-byte+text and would
    decode as garbage strings). Missing/v2.2/corrupt/tag-level-
    unsynchronised tags return {} — tags are bolted-on third-party
    metadata and must never fail a probe, the EXIF rule
    (functions/jpeg._exif_orientation); tag-level unsynchronisation
    (v2.3-era rippers) shifts every stored byte, so parsing it
    without the de-unsync pass would yield corrupted titles, and {}
    is the honest scope boundary (review r8)."""
    try:
        if data[:3] != b"ID3":
            return {}
        ver = data[3]
        if ver not in (3, 4):
            return {}  # v2.2's 3-byte frames are out of scope
        if data[5] & 0x80:
            return {}  # tag-level unsynchronisation: out of scope
        if any(b & 0x80 for b in data[6:10]):
            return {}
        size = ((data[6] << 21) | (data[7] << 14) | (data[8] << 7)
                | data[9])
        end = min(10 + size, len(data))
        pos = 10
        if data[5] & 0x40:  # extended header: skip by its own size
            if pos + 4 > end:
                return {}
            ext = int.from_bytes(data[pos:pos + 4], "big")
            if ver == 4:  # syncsafe in v2.4, includes itself
                ext = ((data[pos] << 21) | (data[pos + 1] << 14)
                       | (data[pos + 2] << 7) | data[pos + 3])
            else:
                ext += 4  # v2.3 size excludes the size field
            pos += ext
        out = {}
        for _ in range(max_frames):
            if pos + 10 > end or data[pos] == 0:
                break  # padding or end of tag
            fid = data[pos:pos + 4].decode("latin1")
            if ver == 4:
                if any(b & 0x80 for b in data[pos + 4:pos + 8]):
                    break  # corrupt syncsafe size: stop, keep parsed
                fsize = ((data[pos + 4] << 21) | (data[pos + 5] << 14)
                         | (data[pos + 6] << 7) | data[pos + 7])
            else:
                fsize = int.from_bytes(data[pos + 4:pos + 8], "big")
            fflags = data[pos + 9]
            body = data[pos + 10:pos + 10 + fsize]
            pos += 10 + fsize
            if pos > end:
                break  # frame overruns tag: stop, keep what parsed
            if not fid.startswith("T") or not body:
                continue
            # frames whose body is NOT encoding-byte+text: v2.3
            # compression(0x80)/encryption(0x40); v2.4 compression
            # (0x08)/encryption(0x04)/per-frame unsync(0x02)/
            # data-length-indicator(0x01) — skip, never emit garbage
            if fflags & (0xC0 if ver == 3 else 0x0F):
                continue
            enc = _ID3_ENCODINGS.get(body[0])
            if enc is None:
                continue
            try:
                text = body[1:].decode(enc)
            except UnicodeDecodeError:
                continue
            text = text.strip("\x00")
            if fid == "TXXX":
                text = text.replace("\x00", ":")
            else:
                # v2.4 multi-value lists are NUL-separated; emit the
                # '/' separator v2.3 documented so no NUL reaches a
                # Spark string column (review r8)
                text = text.replace("\x00", "/")
            if text:
                out[fid] = text
        return out
    except (IndexError, ValueError):
        return {}


# --------------------------------------------------------------- builder
# Test-harness half (the mp4_build pattern): authors spec-layout frame
# sequences with zeroed payloads — headers and lengths are real, audio
# content is not (the probe never reads it).

_VER_BITS = {"1": 0b11, "2": 0b10, "2.5": 0b00}
_LAYER_BITS = {1: 0b11, 2: 0b10, 3: 0b01}
_MODE_BITS = {m: i for i, m in enumerate(_MODES)}


def mp3_build_frames(version: str, layer: int, bitrate_indexes,
                     rate_index: int, channel_mode: str = "mono",
                     paddings=None) -> bytes:
    """Author one zero-payload frame per bitrate index (1..14). The
    header carries protection=1 (no CRC), private/copyright/original
    0, emphasis none."""
    if version not in _VER_BITS:
        raise Mp3Error(f"version must be 1/2/2.5, got {version!r}")
    if layer not in _LAYER_BITS:
        raise Mp3Error(f"layer must be 1/2/3, got {layer!r}")
    if not 0 <= rate_index <= 2:
        raise Mp3Error("rate_index must be 0..2")
    if channel_mode not in _MODE_BITS:
        raise Mp3Error(f"bad channel_mode {channel_mode!r}")
    paddings = paddings or [0] * len(bitrate_indexes)
    if len(paddings) != len(bitrate_indexes):
        raise Mp3Error("paddings must match bitrate_indexes")
    out = bytearray()
    rate = _RATES[version][rate_index]
    for br_idx, pad in zip(bitrate_indexes, paddings):
        if not 1 <= br_idx <= 14:
            raise Mp3Error("bitrate index must be 1..14")
        kbps = _BITRATES[(version == "1", layer)][br_idx - 1]
        h = (0x7FF << 21) | (_VER_BITS[version] << 19) \
            | (_LAYER_BITS[layer] << 17) | (1 << 16) \
            | (br_idx << 12) | (rate_index << 10) | (pad << 9) \
            | (_MODE_BITS[channel_mode] << 6)
        frame = bytearray(_frame_length(version, layer, kbps, rate, pad))
        frame[:4] = h.to_bytes(4, "big")
        out += frame
    return bytes(out)


def id3v2_build_tags(frames: dict, version: int = 4,
                     padding: int = 0) -> bytes:
    """Author a real ID3v2.3/2.4 tag carrying UTF-8 (v4) / UTF-16 (v3)
    text frames — the harness half of id3v2_tags. Returns the complete
    tag bytes; prefix them to an MPEG stream."""
    if version not in (3, 4):
        raise Mp3Error("id3v2_build_tags writes v2.3/v2.4 only")
    body = bytearray()
    for fid, text in frames.items():
        if len(fid) != 4:
            raise Mp3Error(f"bad frame id {fid!r}")
        payload = (b"\x03" + text.encode("utf-8") if version == 4
                   else b"\x01" + text.encode("utf-16"))
        n = len(payload)
        size = (bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
                if version == 4 else n.to_bytes(4, "big"))
        body += fid.encode("latin1") + size + b"\x00\x00" + payload
    body += b"\x00" * padding
    n = len(body)
    if n >= 1 << 28:
        raise Mp3Error("tag too large for syncsafe size")
    size = bytes(((n >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3" + bytes([version, 0, 0]) + size + bytes(body)


def id3v2_wrap(body: bytes, tag_bytes: int, footer: bool = False) -> bytes:
    """Prefix ``body`` with an ID3v2.4 tag carrying ``tag_bytes`` of
    zero padding (a real tag's frames are opaque to the probe anyway)."""
    if not 0 <= tag_bytes < 1 << 28:
        raise Mp3Error("tag_bytes must fit 28 syncsafe bits")
    size = bytes(((tag_bytes >> s) & 0x7F) for s in (21, 14, 7, 0))
    return (b"ID3\x04\x00" + (b"\x10" if footer else b"\x00") + size
            + b"\x00" * tag_bytes + (b"3DI\x04\x00\x10" + size if footer
                                     else b"") + body)


def id3v1_append(body: bytes, title: bytes = b"") -> bytes:
    """Append a 128-byte ID3v1 trailer."""
    tag = b"TAG" + title[:30].ljust(30, b"\x00") + b"\x00" * 95
    return body + tag
