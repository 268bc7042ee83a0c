"""Regenerate the deterministic PNG fixture corpus (tests/fixtures/png).

Real PNG files, seeded content, covering gray / RGB / RGBA / palette /
gray+alpha and forcing every per-row filter type — the corpus the
ImageIO cross-check test (tests/test_png.py) decodes with BOTH codecs.
Committed to the repo so the test needs no generation step; rerun this
only if the corpus needs to change.
"""

import os
import random

import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from accelerator_spark.functions.png import _CHANNELS, png_encode  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "png")


def main():
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(20260815)
    specs = [
        ("gray_filters", 0, 8, 8, 6, list(range(5)) + [3]),
        ("gray_1x1", 0, 8, 1, 1, [0]),
        ("rgb_filters", 2, 8, 7, 5, [4, 3, 2, 1, 0]),
        ("rgba_mixed", 6, 8, 5, 5, [0, 4, 2, 3, 1]),
        ("graya", 4, 8, 9, 3, [1, 4, 2]),
        ("palette4", 3, 4, 10, 4, [0, 1, 0, 1]),
        ("rgb_heuristic", 2, 8, 12, 9, None),
        ("rgba_adam7", 6, 8, 11, 7, None),
        ("gray_adam7", 0, 8, 9, 10, None),
    ]
    for name, ct, depth, w, h, filters in specs:
        ch = _CHANNELS[ct]
        maxv = (1 << depth) - 1
        palette = None
        if ct == 3:
            palette = bytes(rnd.randrange(256) for _ in range(3 * (maxv + 1)))
        px = [rnd.randrange(maxv + 1) for _ in range(w * h * ch)]
        blob = png_encode(px, w, h, color_type=ct, bit_depth=depth,
                          palette=palette, filters=filters,
                          interlace=name.endswith("adam7"))
        path = os.path.join(OUT, f"{name}.png")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{path}: {len(blob)} bytes ({w}x{h} ct={ct} depth={depth})")

    # tRNS fixtures (r7: transparency applied on decode, VERDICT r6 #6)
    # palette: per-entry alpha, deliberately SHORTER than the palette so
    # the entries-past-the-end-are-opaque rule is exercised
    pal = bytes(rnd.randrange(256) for _ in range(3 * 8))
    px = [rnd.randrange(8) for _ in range(6 * 5)]
    alphas = bytes([0, 64, 128, 255, 7])  # 5 of 8 entries
    trns_specs = [
        ("trns_palette", px, 6, 5, dict(color_type=3, bit_depth=4,
                                        palette=pal, trns=alphas)),
        # gray: key value 3 at depth 8 -> those pixels fully transparent
        ("trns_gray", [3, 9, 3, 200, 0, 3], 3, 2,
         dict(color_type=0, bit_depth=8, trns=bytes([0, 3]))),
        # RGB: key (10, 20, 30)
        ("trns_rgb", [10, 20, 30, 10, 20, 31, 99, 98, 97, 10, 20, 30],
         2, 2, dict(color_type=2, bit_depth=8,
                    trns=bytes([0, 10, 0, 20, 0, 30]))),
    ]
    for name, px, w, h, kw in trns_specs:
        blob = png_encode(px, w, h, **kw)
        path = os.path.join(OUT, f"{name}.png")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{path}: {len(blob)} bytes ({w}x{h} tRNS)")


if __name__ == "__main__":
    main()
