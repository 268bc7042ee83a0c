"""Pure-stdlib WAV (RIFF PCM) codec — the audio twin of functions/png.py.

WAV is the second mainstream media format whose codec IS the standard
library (the ``wave`` module parses RIFF framing; PCM samples are plain
little-endian integers), so the multimodal audio path gets a REAL
decoder in this container the same way PNG did for images: decode is
genuinely implemented and oracle-gated; formats that need real codecs
(mp3/aac/opus) stay behind the decoder hook.

Scope: uncompressed PCM, sample widths 1 (unsigned 8-bit) and
2 (signed 16-bit little-endian), any channel count / sample rate.
Width-3/4 PCM and compressed WAV raise WavError.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import NamedTuple


class WavError(ValueError):
    """Malformed or unsupported-by-scope WAV input."""


class WavAudio(NamedTuple):
    """Decoded audio: ``samples`` is a flat frame-major,
    channel-interleaved tuple of integer samples (u8: 0..255,
    s16: -32768..32767)."""

    n_channels: int
    sample_rate: int
    sample_width: int  # bytes per sample: 1 or 2
    n_frames: int
    samples: tuple


def wav_decode(data: bytes) -> WavAudio:
    """Decode a WAV byte string (see module docstring for scope)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getcomptype() != "NONE":
                raise WavError(f"compressed WAV ({w.getcomptype()}) not supported")
            nch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except wave.Error as e:
        raise WavError(f"not a valid WAV: {e}") from None
    except EOFError:
        raise WavError("not a valid WAV: truncated header") from None
    except RuntimeError:
        # CPython's wave/chunk module raises a BARE RuntimeError when a
        # crafted chunk length seeks past an unseekable boundary
        # (wave.py _Chunk.skip -> seek; found by fuzz, round 10) — the
        # executor-task contract is one error type for hostile input
        raise WavError("not a valid WAV: corrupt chunk layout") from None
    if width == 1:
        samples = tuple(raw)
    elif width == 2:
        if len(raw) % 2:
            raise WavError("odd byte count for 16-bit samples")
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    else:
        raise WavError(f"sample width {width} not supported (1 or 2)")
    got_frames = len(samples) // max(nch, 1)
    # a truncated data chunk yields fewer frames than the header claims
    return WavAudio(nch, rate, width, got_frames, samples)


def wav_encode(samples, sample_rate: int, n_channels: int = 1,
               sample_width: int = 1) -> bytes:
    """Encode flat frame-major interleaved integer samples to WAV."""
    samples = list(samples)
    if n_channels < 1:
        raise WavError(f"invalid channel count {n_channels}")
    if len(samples) % n_channels:
        raise WavError(
            f"{len(samples)} samples do not tile {n_channels} channels")
    if sample_width == 1:
        if samples and (min(samples) < 0 or max(samples) > 255):
            raise WavError("u8 sample out of range")
        raw = bytes(samples)
    elif sample_width == 2:
        if samples and (min(samples) < -32768 or max(samples) > 32767):
            raise WavError("s16 sample out of range")
        raw = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raise WavError(f"sample width {sample_width} not supported (1 or 2)")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()
