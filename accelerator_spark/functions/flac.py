"""Pure-stdlib FLAC STREAMINFO metadata probe.

FLAC DECODE (rice-coded residuals + LPC) is out of stdlib reach, but —
the mp3/mp4 probe pattern — the planning metadata lives in one
fixed-layout header: every FLAC stream starts with the ``fLaC`` magic
and a STREAMINFO metadata block (format spec: the mandatory first
block) carrying sample rate, channel count, bit depth and the exact
total sample count. ``flac_probe`` reads the block chain headers
(1-byte last-flag+type, 3-byte big-endian length) and unpacks
STREAMINFO's bit fields; it never touches audio frames, so probing is
O(metadata), not O(file).

Like the other codecs/probes: written from the public spec; validated
against hand-derived golden bytes (tests/test_flac_ogg.py — no foreign
FLAC reader ships in this container).

Scope: STREAMINFO (+ counting the other metadata blocks and their
total size, a useful wrapper-overhead stat). NOT parsed: seektables,
vorbis comments, cuesheets, pictures (skipped via their length
fields), audio frames.
"""

from __future__ import annotations

from dataclasses import dataclass


class FlacError(ValueError):
    """Malformed or unsupported-by-scope FLAC input."""


@dataclass(frozen=True)
class FlacMeta:
    sample_rate: int
    n_channels: int
    bits_per_sample: int
    total_samples: int    # per channel; 0 = unknown (live capture)
    min_block: int
    max_block: int
    n_meta_blocks: int    # including STREAMINFO
    meta_bytes: int       # total metadata wrapper size incl. magic

    @property
    def duration_s(self) -> float:
        return self.total_samples / self.sample_rate \
            if self.sample_rate else 0.0


def flac_probe(data: bytes, max_blocks: int = 4096) -> FlacMeta:
    """Parse the metadata-block chain of one FLAC byte string.
    ``max_blocks`` bounds the chain walk against crafted inputs (the
    walk is strictly forward, so it is a belt-and-braces bound)."""
    if data[:4] != b"fLaC":
        raise FlacError("not a FLAC stream (bad magic)")
    pos = 4
    info = None
    n_blocks = 0
    last = False
    while not last:
        n_blocks += 1
        if n_blocks > max_blocks:
            raise FlacError("metadata block budget exceeded")
        if pos + 4 > len(data):
            raise FlacError("truncated metadata block header")
        head = data[pos]
        last = bool(head & 0x80)
        btype = head & 0x7F
        length = int.from_bytes(data[pos + 1:pos + 4], "big")
        pos += 4
        if pos + length > len(data):
            raise FlacError("metadata block overruns file")
        if n_blocks == 1:
            # the spec makes STREAMINFO the mandatory FIRST block
            if btype != 0:
                raise FlacError(f"first metadata block is type {btype}, "
                                "not STREAMINFO")
            if length != 34:
                raise FlacError(f"STREAMINFO must be 34 bytes, "
                                f"got {length}")
            info = data[pos:pos + 34]
        elif btype == 0:
            raise FlacError("duplicate STREAMINFO block")
        pos += length
    # STREAMINFO bit layout: min_block u16, max_block u16, min_frame
    # u24, max_frame u24, then one 64-bit group: sample_rate(20)
    # channels-1(3) bps-1(5) total_samples(36), then md5(16 bytes)
    min_block = int.from_bytes(info[0:2], "big")
    max_block = int.from_bytes(info[2:4], "big")
    group = int.from_bytes(info[10:18], "big")
    rate = group >> 44
    channels = ((group >> 41) & 0x7) + 1
    bps = ((group >> 36) & 0x1F) + 1
    total = group & ((1 << 36) - 1)
    if rate == 0:
        raise FlacError("STREAMINFO sample rate 0 is invalid")
    return FlacMeta(rate, channels, bps, total, min_block, max_block,
                    n_blocks, pos)


# --------------------------------------------------------------- builder
def flac_build(sample_rate: int, n_channels: int, bits_per_sample: int,
               total_samples: int, extra_blocks=()) -> bytes:
    """Author the metadata half of a FLAC stream (magic + STREAMINFO +
    optional (type, payload_bytes) extra blocks) — the test-harness /
    gate half; no audio frames."""
    if not 1 <= n_channels <= 8:
        raise FlacError("channels must be 1..8")
    if not 4 <= bits_per_sample <= 32:
        raise FlacError("bits_per_sample must be 4..32")
    if not 0 < sample_rate < 1 << 20:
        raise FlacError("sample_rate must fit 20 bits and be nonzero")
    if not 0 <= total_samples < 1 << 36:
        raise FlacError("total_samples must fit 36 bits")
    group = (sample_rate << 44) | ((n_channels - 1) << 41) \
        | ((bits_per_sample - 1) << 36) | total_samples
    info = (b"\x10\x00\x10\x00"        # min/max block 4096
            + b"\x00" * 6              # min/max frame unknown
            + group.to_bytes(8, "big")
            + b"\x00" * 16)            # md5 unset
    blocks = [(0, info)] + list(extra_blocks)
    out = bytearray(b"fLaC")
    for i, (btype, payload) in enumerate(blocks):
        head = btype | (0x80 if i == len(blocks) - 1 else 0)
        out.append(head)
        out += len(payload).to_bytes(3, "big")
        out += payload
    return bytes(out)
