"""Video near-duplicate detection — the fourth modality on the generic
banded-Hamming join: real GIF frame decode (extract_frames) ->
per-frame dHash (frame_dhash) -> first/middle/last temporal
fingerprint (video_fingerprint) -> fp_near_pairs (video_near_pairs).

Fixtures are authored animated GIFs (functions/gif.gif_encode,
grayscale palette) so the whole path is the production decode chain.
"""

from accelerator_spark.functions.gif import gif_encode
from accelerator_spark.operators.multimodal import (
    frame_dhash,
    video_fingerprint,
    video_near_pairs,
)
from accelerator_spark.session import get_spark

W, H = 9, 8
GRAY = bytes(v for i in range(256) for v in (i, i, i))


def _frame(f: int) -> list:
    """Deterministic 72-px frame whose dHash (including its top-21
    gradient bits, the slice the temporal fold samples) differs
    strongly per frame index — verified offline: reversed/rotated
    triples land at Hamming 21-28, unrelated clips at ~29."""
    return [((x + 9 * y + 31 * f) ** 2 * 37 + f * 97) % 256
            for y in range(H) for x in range(W)]


def _gif(frame_ids, perturb=None) -> bytes:
    frames = [_frame(f) for f in frame_ids]
    if perturb is not None:
        fi, pi, v = perturb
        frames[fi] = list(frames[fi])
        frames[fi][pi] = v
    return gif_encode(frames, W, H, GRAY)


def _media(spark, rows):
    return spark.createDataFrame(
        [(i, payload, "image/gif") for i, payload in rows],
        "media_id long, payload binary, mime string")


def test_video_fingerprint_planted_pairs():
    """A perturbed copy (one pixel in a SAMPLED frame) pairs at small
    Hamming; a perturbation in an UNSAMPLED slot pairs at Hamming 0;
    unrelated footage does not pair."""
    spark = get_spark(app_name="accelerator_spark_tests")
    base = [0, 1, 2, 3, 4]
    rows = [
        (1, _gif(base)),
        # pixel in the middle SAMPLED frame, inside its top-21
        # gradient-bit window (offline: flips exactly 1 vfp bit)
        (2, _gif(base, perturb=(2, 0, 130))),
        # pixel change in frame 1 — not first/middle/last: invisible
        (3, _gif(base, perturb=(1, 10, 200))),
        # unrelated clip
        (4, _gif([40, 41, 42, 43, 44])),
    ]
    fps = video_fingerprint(_media(spark, rows))
    got = {r.media_id: r for r in fps.collect()}
    assert set(got) == {1, 2, 3, 4}
    assert all(r.n_frames == 5 and r.n_sampled == 5
               for r in got.values())
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in video_near_pairs(fps, max_hamming=6).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 0
    assert (1, 2) in pairs and 1 <= pairs[(1, 2)] <= 2
    assert not any(4 in p for p in pairs)


def test_video_fingerprint_order_sensitive():
    """Re-ordered (reversed / rotated) cuts of the same frames must
    NOT pair: first/middle/last changes, unlike an order-blind
    majority fold."""
    spark = get_spark(app_name="accelerator_spark_tests")
    rows = [(1, _gif([0, 1, 2, 3, 4])),
            (2, _gif([4, 3, 2, 1, 0])),     # reversed
            (3, _gif([2, 3, 4, 0, 1]))]     # rotated start
    fps = {r.media_id: r.vfp
           for r in video_fingerprint(_media(spark, rows)).collect()}
    assert len(set(fps.values())) == 3
    pairs = video_near_pairs(
        video_fingerprint(_media(spark, rows)), max_hamming=6)
    assert pairs.count() == 0


def test_video_fingerprint_degenerate_lengths():
    """1-frame media fold the same frame into all three slots; 2-frame
    media use middle == last; every_n subsampling changes which frames
    are first/middle/last OF THE SAMPLED sequence."""
    spark = get_spark(app_name="accelerator_spark_tests")
    rows = [(1, _gif([7])), (2, _gif([7, 9]))]
    fps = {r.media_id: r
           for r in video_fingerprint(_media(spark, rows)).collect()}
    assert fps[1].n_frames == 1 and fps[1].n_sampled == 1
    assert fps[2].n_frames == 2 and fps[2].n_sampled == 2
    # every_n=2 over 5 frames samples 0,2,4 -> same triple as the
    # dense sample of [0,2,4]
    a = video_fingerprint(_media(spark, [(1, _gif([0, 1, 2, 3, 4]))]),
                          every_n=2).collect()[0]
    b = video_fingerprint(_media(spark, [(1, _gif([0, 2, 4]))])) \
        .collect()[0]
    assert a.vfp == b.vfp and a.n_sampled == 3 == b.n_sampled


def test_frame_dhash_carries_identity():
    spark = get_spark(app_name="accelerator_spark_tests")
    from accelerator_spark.operators.multimodal import extract_frames
    frames = extract_frames(_media(spark, [(5, _gif([0, 1, 2]))]))
    hashed = frame_dhash(frames)
    rows = sorted(hashed.collect(), key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    assert all(r.media_id == 5 and r.n_frames == 3 and
               len(r.dhash_hex) == 16 for r in rows)
