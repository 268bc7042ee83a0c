"""Regenerate the deterministic GIF fixture corpus (tests/fixtures/gif).

Real GIF files, seeded content, covering palette sizes 2..256,
interlace, and an animated multi-frame file — the corpus the ImageIO
cross-check test (tests/test_gif.py) decodes with BOTH codecs.
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from accelerator_spark.functions.gif import gif_encode  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures", "gif")


def main():
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(20260815)
    specs = [
        ("mono2", 2, 9, 7, 1, False),
        ("pal16_interlaced", 16, 12, 10, 1, True),
        ("full256", 256, 20, 15, 1, False),
        ("anim3", 16, 8, 6, 3, False),
        ("pal4", 4, 5, 5, 1, False),
    ]
    for name, ncol, w, h, nframes, inter in specs:
        pal = bytes(rnd.randrange(256) for _ in range(3 * ncol))
        frames = [[rnd.randrange(ncol) for _ in range(w * h)]
                  for _ in range(nframes)]
        blob = gif_encode(frames, w, h, pal,
                          delays_cs=[10] * nframes, interlace=inter)
        path = os.path.join(OUT, f"{name}.gif")
        with open(path, "wb") as f:
            f.write(blob)
        print(f"{path}: {len(blob)} bytes ({w}x{h} ncol={ncol} "
              f"frames={nframes} interlace={inter})")


if __name__ == "__main__":
    main()
