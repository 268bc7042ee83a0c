"""Pure-stdlib WAV codec tests — the audio twin of tests/test_png.py.

functions/wav.py round-trips against the stdlib wave module's own
reader (encode path) and random payloads (decode path);
real_audio_decoder routes WAV to real features and keeps the
NotImplementedError hook for compressed formats;
decode_audio_features runs the distributed path with containment.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from accelerator_spark.functions.wav import WavError, wav_decode, wav_encode
from accelerator_spark.operators.multimodal import (
    decode_audio_features, real_audio_decoder)

PROP = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


@PROP
@given(st.data())
def test_prop_wav_roundtrip(data):
    width = data.draw(st.sampled_from([1, 2]))
    nch = data.draw(st.integers(1, 3))
    n_frames = data.draw(st.integers(0, 20))
    rate = data.draw(st.sampled_from([8000, 16000, 44100, 48000]))
    lo, hi = (0, 255) if width == 1 else (-32768, 32767)
    samples = data.draw(st.lists(st.integers(lo, hi),
                                 min_size=n_frames * nch,
                                 max_size=n_frames * nch))
    blob = wav_encode(samples, rate, n_channels=nch, sample_width=width)
    a = wav_decode(blob)
    assert (a.n_channels, a.sample_rate, a.sample_width, a.n_frames) == (
        nch, rate, width, n_frames)
    assert a.samples == tuple(samples)


def test_wav_errors():
    with pytest.raises(WavError, match="not a valid WAV"):
        wav_decode(b"RIFF but not really")
    with pytest.raises(WavError, match="not a valid WAV"):
        wav_decode(b"")
    with pytest.raises(WavError, match="tile"):
        wav_encode([0, 1, 2], 8000, n_channels=2)
    with pytest.raises(WavError, match="range"):
        wav_encode([256], 8000)
    with pytest.raises(WavError, match="range"):
        wav_encode([40000], 8000, sample_width=2)
    with pytest.raises(WavError, match="width"):
        wav_encode([0], 8000, sample_width=3)
    with pytest.raises(WavError, match="channel"):
        wav_encode([], 8000, n_channels=0)


def test_real_audio_decoder_routing():
    feat, n, rate, nch = real_audio_decoder(
        wav_encode([0, 255], 16000), "audio/wav")
    assert (n, rate, nch) == (2, 16000, 1)
    assert feat == [pytest.approx(0.5)]
    # RIFF magic sniff without the mime; s16 normalization
    feat2, n2, _, nch2 = real_audio_decoder(
        wav_encode([-32768, 32767], 8000, sample_width=2),
        "application/octet-stream")
    assert (n2, nch2) == (2, 1) and feat2 == [pytest.approx(0.5)]
    # stereo: one mean per channel
    feat3, _, _, nch3 = real_audio_decoder(
        wav_encode([0, 255, 0, 255], 8000, n_channels=2), "audio/wav")
    assert nch3 == 2 and feat3 == [pytest.approx(0.0), pytest.approx(1.0)]
    with pytest.raises(NotImplementedError, match="WAV PCM"):
        real_audio_decoder(b"ID3\x03 mp3 frames", "audio/mpeg")


def test_decode_audio_features_distributed(spark):
    good = wav_encode([10, 20, 30], 8000)
    df = spark.createDataFrame(
        [(1, good, "audio/wav"), (2, b"static noise", "audio/wav")],
        "media_id long, payload binary, mime string")
    out = {r["media_id"]: r for r in decode_audio_features(
        df, on_error="null").collect()}
    assert out[1]["n_frames"] == 3 and out[1]["sample_rate"] == 8000
    assert out[1]["feature"][0] == pytest.approx(20 / 255, rel=1e-6)
    assert out[2]["n_frames"] is None  # contained
    # ADVICE r6: pre-decode n_bytes survives containment for triage
    assert out[2]["n_bytes"] == len(b"static noise")
    with pytest.raises(Exception, match="WavError|not a valid"):
        decode_audio_features(df).collect()


def test_real_audio_decoder_partial_frame_and_riff_sniff():
    """Review r6: a data chunk cut mid-frame must not bias the per-
    channel mean past [0,1] (mean over whole frames only), and a
    non-WAV RIFF container (WEBP/AVI) reaches the NotImplementedError
    hook, not a misleading WavError."""
    import io
    import struct
    import wave

    # stereo u8 with 3 sample bytes = 1 whole frame + 1 trailing sample
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00")
    blob = bytearray(buf.getvalue())
    # splice one extra data byte and patch the data-chunk + RIFF sizes
    data_at = bytes(blob).rindex(b"data")
    blob[data_at + 4:data_at + 8] = struct.pack("<I", 3)
    blob = blob[:data_at + 8] + b"\xff\xff\xff"
    blob[4:8] = struct.pack("<I", len(blob) - 8)
    feat, n, _, nch = real_audio_decoder(bytes(blob), "audio/wav")
    assert (n, nch) == (1, 2)
    assert feat == [pytest.approx(1.0), pytest.approx(1.0)]  # not 2.0
    # RIFF but not WAVE: actionable hook, not WavError
    webp = b"RIFF" + b"\x10\x00\x00\x00" + b"WEBPVP8 "
    with pytest.raises(NotImplementedError, match="WAV PCM"):
        real_audio_decoder(webp, "image/webp")


# --------------------------------------------------- r10: energy hash

def test_ehash_hand_computed_and_volume_invariant():
    """ehash_bits against an independent recompute; volume scaling
    (the loudness analog of dHash brightness robustness) must not
    change a single bit; stereo sums channels; empty clips raise."""
    import pytest

    from accelerator_spark.operators.multimodal import (
        WavHashError, ehash_bits)

    samples = [((i * 37) % 200) + 5 for i in range(130)]  # u8 mono

    def model(vals):
        es = [sum(abs(v - 128) for v in vals[w * 2:w * 2 + 2])
              for w in range(65)]
        bits = 0
        for w in range(64):
            bits = (bits << 1) | (1 if es[w] < es[w + 1] else 0)
        return bits

    assert ehash_bits(samples, 1, 1) == model(samples)
    # s16 volume invariance: gain 7 preserves every comparison
    s16 = [(v - 128) * 20 for v in samples]
    assert ehash_bits(s16, 1, 2) == ehash_bits(
        [v * 7 for v in s16], 1, 2)
    # stereo: per-window energy sums |L| + |R| across both channels
    stereo = []
    for v in s16:
        stereo += [v, -v // 2]

    def model_s16(frames_abs):
        es = [sum(frames_abs[w * 2:w * 2 + 2]) for w in range(65)]
        bits = 0
        for w in range(64):
            bits = (bits << 1) | (1 if es[w] < es[w + 1] else 0)
        return bits

    assert ehash_bits(stereo, 2, 2) == model_s16(
        [abs(v) + abs(-v // 2) for v in s16])
    with pytest.raises(WavHashError):
        ehash_bits([], 1, 1)


def test_audio_near_pairs_end_to_end(spark):
    """audio_near_pairs: a one-sample perturbed copy pairs at small
    Hamming, an unrelated clip does not; brute-force checked."""
    import hashlib

    from accelerator_spark.functions.wav import wav_encode
    from accelerator_spark.operators.multimodal import (
        audio_ehash, audio_near_pairs)

    base = list(b"".join(hashlib.md5(b"clip:%d" % k).digest()
                         for k in range(9))[:130])
    near = base[:]
    near[40] = (near[40] + 99) % 256
    other = list(b"".join(hashlib.md5(b"other:%d" % k).digest()
                          for k in range(9))[:130])
    rows = [(1, bytearray(wav_encode(base, 8000)), "audio/wav"),
            (2, bytearray(wav_encode(near, 8000)), "audio/wav"),
            (3, bytearray(wav_encode(other, 8000)), "audio/wav")]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    hashed = audio_ehash(df)
    hx = {r.media_id: int(r.ehash_hex, 16) for r in hashed.collect()}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in audio_near_pairs(hashed, max_hamming=6).collect()}
    want = {(a, b): bin(hx[a] ^ hx[b]).count("1")
            for a in hx for b in hx
            if a < b and bin(hx[a] ^ hx[b]).count("1") <= 6}
    assert got == want and (1, 2) in got
    assert not any(3 in k for k in got)


def test_ehash_vectorized_matches_scalar_model():
    """The numpy-vectorized ehash_bits (ADVICE r10) must equal the
    scalar reference loop bit-for-bit, including clips SHORTER than
    windows+1 frames (empty windows read energy 0) and multi-channel
    odd-length layouts."""
    import random

    from accelerator_spark.operators.multimodal import ehash_bits

    def scalar(samples, n_channels, sample_width, windows=64):
        n_frames = len(samples) // max(n_channels, 1)
        center = 128 if sample_width == 1 else 0
        nw = windows + 1

        def energy(w):
            lo = w * n_frames // nw
            hi = (w + 1) * n_frames // nw
            e = 0
            for f in range(lo, hi):
                base = f * n_channels
                for c in range(n_channels):
                    e += abs(samples[base + c] - center)
            return e

        bits = 0
        prev = energy(0)
        for w in range(1, nw):
            cur = energy(w)
            bits = (bits << 1) | (1 if prev < cur else 0)
            prev = cur
        return bits

    rng = random.Random(777)
    cases = [
        ([rng.randrange(256) for _ in range(130)], 1, 1),
        ([rng.randrange(-32768, 32768) for _ in range(999)], 1, 2),
        ([rng.randrange(-32768, 32768) for _ in range(2 * 4410)], 2, 2),
        ([rng.randrange(256) for _ in range(40)], 1, 1),   # < nw frames
        ([rng.randrange(-100, 100) for _ in range(3 * 7)], 3, 2),
    ]
    for samples, nch, width in cases:
        assert ehash_bits(tuple(samples), nch, width) \
            == scalar(samples, nch, width), (len(samples), nch, width)


def test_audio_ehash_decoder_hook(spark):
    """VERDICT r10 #4: a non-WAV payload routes through the injectable
    decoder_hook (fake 'mp3' decoder returning the WavAudio layout) and
    hashes identically to the same PCM arriving as a real WAV; without
    a hook the NotImplementedError names the parameter; WAV payloads
    stay on the stdlib path even when a hook is present."""
    import hashlib

    from accelerator_spark.functions.wav import wav_encode
    from accelerator_spark.operators.multimodal import audio_ehash

    pcm = list(hashlib.md5(b"hookclip").digest() * 9)[:130]
    wav = wav_encode(pcm, 8000, 1, 1)
    rows = [(1, bytearray(wav), "audio/wav"),
            (2, bytearray(b"\xff\xfb" + bytes(pcm)), "audio/mpeg")]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")

    def hook(payload, mime, _pcm=tuple(pcm)):
        assert mime == "audio/mpeg"
        return _pcm, 1, 1, 8000

    out = {r.media_id: (r.ehash_hex, r.n_frames, r.sample_rate)
           for r in audio_ehash(df, decoder_hook=hook).collect()}
    assert out[1] == out[2]  # same PCM, either decode path

    # hook present but payload IS wav: stdlib path (hook not called)
    def boom(payload, mime):
        raise AssertionError("hook must not see WAV payloads")

    only_wav = spark.createDataFrame(
        rows[:1], "media_id long, payload binary, mime string")
    assert audio_ehash(only_wav, decoder_hook=boom).count() == 1

    # no hook: the error names the parameter
    import pytest as _pytest
    with _pytest.raises(Exception, match="decoder_hook"):
        audio_ehash(spark.createDataFrame(
            rows[1:], "media_id long, payload binary, mime string")
        ).collect()
