"""Regenerate the deterministic JPEG fixture corpus (tests/fixtures/jpeg).

Two provenances, both committed so the cross-check test needs no
generation step:
- ours_*.jpg — written by functions/jpeg.py (grayscale + 4:4:4 color,
  several qualities, odd dimensions, restart markers): files a FOREIGN
  decoder (Java ImageIO through Spark's image source) must accept.
- imageio_*.jpg — written by the JVM's ImageIO (its default encoder
  emits 4:2:0 subsampling and its own table choices): files from a
  FOREIGN encoder our decoder must read. This is the direction that
  catches encoder+decoder-both-wrong bugs (the r6 GIF LZW lesson).

Rerun only if the corpus needs to change (starts a local SparkSession
for the ImageIO half).
"""

import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from accelerator_spark.functions.jpeg import jpeg_encode  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                   "jpeg")


def smooth_rgb(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 255) // max(w - 1, 1),
                         (y * 255) // max(h - 1, 1),
                         ((x + y) * 255) // max(w + h - 2, 1)])
    return bytes(px)


def main():
    os.makedirs(OUT, exist_ok=True)
    rnd = random.Random(20260815)

    # ---- written by OUR encoder ------------------------------------
    gray = bytes(rnd.randrange(256) for _ in range(24 * 17))
    specs = {
        "ours_gray_q85.jpg": jpeg_encode(gray, 24, 17, channels=1,
                                         quality=85),
        "ours_gray_q100.jpg": jpeg_encode(gray, 24, 17, channels=1,
                                          quality=100),
        "ours_rgb_q95.jpg": jpeg_encode(smooth_rgb(21, 13), 21, 13,
                                        channels=3, quality=95),
        "ours_rgb_q60.jpg": jpeg_encode(smooth_rgb(32, 24), 32, 24,
                                        channels=3, quality=60),
        "ours_gray_restart.jpg": jpeg_encode(gray, 24, 17, channels=1,
                                             quality=90,
                                             restart_interval=2),
        # r7: our own 4:2:0 output (2x2 box-averaged chroma) — the
        # foreign decoder must accept our subsampled files too
        "ours_rgb_420_q90.jpg": jpeg_encode(smooth_rgb(22, 14), 22, 14,
                                            channels=3, quality=90,
                                            subsampling="4:2:0"),
    }
    # constant 8x8 blocks + unit quant: byte-exact round-trip
    w, h = 32, 16
    px = bytearray(w * h)
    for by in range(h // 8):
        for bx in range(w // 8):
            c = rnd.randrange(256)
            for y in range(8):
                for x in range(8):
                    px[(by * 8 + y) * w + bx * 8 + x] = c
    specs["ours_gray_blocks_unitq.jpg"] = jpeg_encode(
        bytes(px), w, h, channels=1, quant=([1] * 64, [1] * 64))
    # r8: OUR progressive (SOF2 spectral selection) output — the
    # foreign decoder must accept our multi-scan files too, closing
    # the ours->foreign direction r7 left single-provenance
    from accelerator_spark.functions.jpeg import jpeg_encode_progressive
    specs["ours_prog_gray_q90.jpg"] = jpeg_encode_progressive(
        gray, 24, 17, channels=1, quality=90)
    specs["ours_prog_rgb_q90.jpg"] = jpeg_encode_progressive(
        smooth_rgb(21, 13), 21, 13, channels=3, quality=90)
    specs["ours_prog_blocks_unitq.jpg"] = jpeg_encode_progressive(
        bytes(px), w, h, channels=1, quant=([1] * 64, [1] * 64),
        bands=((1, 5), (6, 20), (21, 63)))
    for name, blob in specs.items():
        with open(os.path.join(OUT, name), "wb") as f:
            f.write(blob)
        print(name, len(blob), "bytes")

    # ---- written by Java ImageIO (foreign encoder, 4:2:0) ----------
    from accelerator_spark import get_spark

    spark = get_spark()
    jvm = spark._jvm

    def write_java(name, px, w, h):
        bi = jvm.java.awt.image.BufferedImage(
            w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                bi.setRGB(x, y, (px[3 * i] << 16) | (px[3 * i + 1] << 8)
                          | px[3 * i + 2])
        f = jvm.java.io.File(os.path.join(OUT, name))
        assert jvm.javax.imageio.ImageIO.write(bi, "jpg", f)
        print(name, f.length(), "bytes (ImageIO)")

    write_java("imageio_smooth.jpg", smooth_rgb(24, 16), 24, 16)
    write_java("imageio_odd.jpg", smooth_rgb(19, 11), 19, 11)
    blocky = bytearray()
    for y in range(16):
        for x in range(16):
            v = 220 if (x // 8 + y // 8) % 2 else 40
            blocky += bytes([v, v, v])
    write_java("imageio_blocky.jpg", bytes(blocky), 16, 16)

    # PROGRESSIVE (SOF2, ~10 scans: spectral selection + successive
    # approximation), ImageIO's encoder — r7 decode-scope extension
    def write_java_prog(name, px, w, h, gray=False):
        t = (jvm.java.awt.image.BufferedImage.TYPE_BYTE_GRAY if gray
             else jvm.java.awt.image.BufferedImage.TYPE_INT_RGB)
        bi = jvm.java.awt.image.BufferedImage(w, h, t)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                bi.setRGB(x, y, (px[3 * i] << 16) | (px[3 * i + 1] << 8)
                          | px[3 * i + 2])
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
            "jpg").next()
        param = writer.getDefaultWriteParam()
        param.setProgressiveMode(
            jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        f = jvm.java.io.File(os.path.join(OUT, name))
        out = jvm.javax.imageio.ImageIO.createImageOutputStream(f)
        writer.setOutput(out)
        writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None),
                     param)
        out.close()
        writer.dispose()
        print(name, f.length(), "bytes (ImageIO progressive)")

    write_java_prog("imageio_prog_smooth.jpg", smooth_rgb(24, 16), 24, 16)
    write_java_prog("imageio_prog_odd.jpg", smooth_rgb(19, 11), 19, 11)
    write_java_prog("imageio_prog_gray.jpg", smooth_rgb(16, 16), 16, 16,
                    gray=True)


if __name__ == "__main__":
    main()
