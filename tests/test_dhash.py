"""Image dHash tests (operators/multimodal.py dhash_bits/image_dhash):
hand-computed bits on exact-size grids, luma reduction, EXIF
orientation composition, PNG/GIF end-to-end, near-dup tolerance."""

from accelerator_spark.functions.png import png_encode
from accelerator_spark.operators.multimodal import dhash_bits, image_dhash


def _expected_bits(grid):
    """Independent recompute from a 9x8 grayscale grid (row-major)."""
    bits = 0
    for y in range(8):
        for x in range(8):
            bits = (bits << 1) | (1 if grid[y][x] < grid[y][x + 1] else 0)
    return bits


def test_hand_computed_exact_size():
    # 9x8 grayscale: identity resample, bits straight off the pairs
    grid = [[(x * 7 + y * 13) % 251 for x in range(9)] for y in range(8)]
    flat = [v for row in grid for v in row]
    assert dhash_bits(flat, 9, 8, 1) == _expected_bits(grid)
    # monotone rows -> all 64 bits set; reversed -> none
    inc = [x for _ in range(8) for x in range(9)]
    assert dhash_bits(inc, 9, 8, 1) == (1 << 64) - 1
    assert dhash_bits(inc[::-1], 9, 8, 1) == 0


def test_luma_reduction_rgb():
    # an RGB image whose luma equals a known gray image hashes the same
    gray = [[(x * 31 + y * 3) % 200 for x in range(9)] for y in range(8)]
    flat_gray = [v for row in gray for v in row]
    flat_rgb = []
    for v in flat_gray:
        flat_rgb += [v, v, v]         # luma(v,v,v) == v
    assert dhash_bits(flat_rgb, 9, 8, 3) == dhash_bits(flat_gray, 9, 8, 1)


def test_orientation_composition():
    # orientation 3 = 180° rotation: composing into the index math must
    # equal hashing the materially rotated pixel grid
    flat = [(x * 11 + y * 29) % 255 for y in range(8) for x in range(9)]
    rotated = flat[::-1]
    assert dhash_bits(flat, 9, 8, 1, orientation=3) == \
        dhash_bits(rotated, 9, 8, 1, orientation=1)


def test_png_end_to_end_and_resample_tolerance(spark):
    # a smooth large image and its 2x downscale should hash identically
    # (dHash's whole point); a noisy unrelated image should differ
    big = [min(255, x // 2 + y // 3) for y in range(64) for x in range(72)]
    small = [min(255, x + y) for y in range(16) for x in range(18)]
    noise = [(x * 97 + y * 53) % 256 for y in range(16) for x in range(18)]
    rows = [
        (1, bytearray(png_encode(big, 72, 64)), "image/png"),
        (2, bytearray(png_encode([big[(2 * y) * 72 + 2 * x]
                                  for y in range(32) for x in range(36)],
                                 36, 32)), "image/png"),
        (3, bytearray(png_encode(small, 18, 16)), "image/png"),
        (4, bytearray(png_encode(noise, 18, 16)), "image/png"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    got = {r.media_id: (r.dhash_hex, r.width, r.height)
           for r in image_dhash(df).collect()}
    assert got[1][1:] == (72, 64)
    assert got[1][0] == got[2][0]          # scale-invariant
    assert got[3][0] != got[4][0]          # distinct content differs
    assert len(got[1][0]) == 16


def test_on_error_null(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not an image"), "image/png")],
        "media_id long, payload binary, mime string")
    out = image_dhash(df, on_error="null").collect()[0]
    assert out.dhash_hex is None and out.width is None


def test_orientation_6_and_8_composition():
    """90° rotations (the portrait-phone cases): composed index math
    must equal hashing the materially rotated grid. Use an 8x9 source
    so the oriented grid is 9x8 (exact, no resample)."""
    from accelerator_spark.functions.jpeg import _EXIF_XFORMS

    w, h = 8, 9
    flat = [(x * 13 + y * 7) % 251 for y in range(h) for x in range(w)]

    def materialize(orient):
        swap, srcfn = _EXIF_XFORMS[orient]
        ow, oh = (h, w) if swap else (w, h)
        out = []
        for oy in range(oh):
            for ox in range(ow):
                sx, sy = srcfn(ox, oy, w, h)
                out.append(flat[sy * w + sx])
        return out, ow, oh

    for orient in (6, 8):
        rot, ow, oh = materialize(orient)
        assert (ow, oh) == (9, 8)
        assert dhash_bits(flat, w, h, 1, orientation=orient) == \
            dhash_bits(rot, ow, oh, 1, orientation=1)


def test_dhash_near_pairs_end_to_end(spark):
    """dhash_near_pairs (VERDICT r9 #3): a perturbed copy pairs with
    its original at small Hamming; a 90-degree ROTATED copy does NOT
    pair (rotation reorders the gradient field — near-dup means
    same-orientation visual similarity); unrelated noise never pairs.
    Verified against per-image brute force."""
    from accelerator_spark.operators.multimodal import dhash_near_pairs

    base = [[(x * 13 + y * 7) % 241 for x in range(18)]
            for y in range(16)]
    near = [row[:] for row in base]
    near[5][5] = (near[5][5] + 120) % 256          # one pixel off
    rot90 = [[base[15 - x][y] for x in range(16)]   # materially rotated
             for y in range(18)]
    noise = [[(x * 97 + y * 53) % 256 for x in range(18)]
             for y in range(16)]

    def png(grid):
        h, w = len(grid), len(grid[0])
        return bytearray(png_encode([v for r in grid for v in r], w, h))

    rows = [(1, png(base), "image/png"), (2, png(near), "image/png"),
            (3, png(rot90), "image/png"), (4, png(noise), "image/png")]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    hashed = image_dhash(df)
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in dhash_near_pairs(hashed, max_hamming=6).collect()}
    # brute-force ground truth from the hex signatures
    hx = {r.media_id: int(r.dhash_hex, 16) for r in hashed.collect()}
    want = {(a, b): bin(hx[a] ^ hx[b]).count("1")
            for a in hx for b in hx if a < b
            and bin(hx[a] ^ hx[b]).count("1") <= 6}
    assert got == want
    assert (1, 2) in got                      # perturbed copy pairs
    assert not any((1, 3) == k or (2, 3) == k for k in got), \
        "rotated copy must not pair"
    assert not any(4 in k for k in got)       # noise never pairs


def test_fp_near_pairs_generic_vs_brute_force():
    """fp_near_pairs over an arbitrary integral column matches brute
    force exactly (recall AND precision) across hamming thresholds,
    including MSB-set (negative long) fingerprints and a bucket_cap
    degenerate-block drop."""
    import itertools
    import random

    from accelerator_spark.operators.dedup import fp_near_pairs
    from accelerator_spark.session import get_spark

    spark = get_spark(app_name="accelerator_spark_tests")
    rng = random.Random(1009)
    fps = []
    for i in range(40):
        v = rng.getrandbits(64)
        fps.append((i, v - (1 << 64) if v >= (1 << 63) else v))
    # plant near clusters around a few seeds
    for i, (seed_id, seed) in enumerate([fps[0], fps[7], fps[13]]):
        for k in range(3):
            v = seed
            for bitpos in rng.sample(range(64), k + 1):
                v ^= 1 << bitpos
                if v >= (1 << 63):
                    v -= 1 << 64
                elif v < -(1 << 63):
                    v += 1 << 64
            fps.append((100 + 10 * i + k, v))
    df = spark.createDataFrame(fps, "doc_id long, fp long")
    uns = {i: v & ((1 << 64) - 1) for i, v in fps}
    for mh in (0, 2, 5):
        got = {(r.doc_a, r.doc_b): r.hamming
               for r in fp_near_pairs(df, "fp", "doc_id", 64,
                                      mh).collect()}
        want = {(a, b): bin(uns[a] ^ uns[b]).count("1")
                for a, b in itertools.combinations(sorted(uns), 2)
                if bin(uns[a] ^ uns[b]).count("1") <= mh}
        assert got == want, f"max_hamming={mh}"
    # guards
    import pytest
    with pytest.raises(ValueError):
        fp_near_pairs(df, "fp", "doc_id", bits=64, max_hamming=64)
    with pytest.raises(ValueError):
        fp_near_pairs(df, "fp", "doc_id", bits=128)
