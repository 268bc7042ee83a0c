"""Binary media ingestion via Spark's built-in ``binaryFile`` source.

The multimodal front door (SURVEY north-star: image/audio/video as
opaque binary columns with typed metadata): raw asset files become rows
of (media_id, ext, length, mod_time, content) ready for the
operators/multimodal.py decode/feature pipeline. Distributed read — one
task per file split, no driver involvement; the ``pathGlobFilter``
option prunes by extension at listing time, and
``spark.sql.files.maxPartitionBytes`` spreads many small assets across
tasks.

Parity note: this is ``csvimport_zip``'s role for media — enumerate a
container of files into a dataset with provenance columns
(/root/reference/standard_methods/a_csvimport_zip.py:62-80 does it for
zipped CSVs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def binary_import(spark: SparkSession, path: str,
                  glob: str | None = None) -> DataFrame:
    """Read a directory of binary assets (recursively) into
    (media_id, ext, length, mod_time, content).

    ``media_id`` is the file stem taken from binaryFile's path column
    AS-IS — that column is NOT percent-encoded (verified live: '+' and
    '%' arrive literally), so url-decoding it crashed on '%' filenames
    and corrupted '+' to space (review r4). ``media_path`` keeps the
    full path so same-stem files in different subdirectories
    ('train/001.jpg' vs 'val/001.jpg') stay distinguishable — join
    sidecar metadata on the stem only when stems are unique, else on
    the path. ``glob`` maps to pathGlobFilter (e.g. ``*.jpg``).

    Hidden files (names starting with ``.`` or ``_``) never reach this
    reader — Spark's file index drops them at listing time as metadata
    candidates. The dotfile-aware stem/ext split below still matters
    for names like ``archive.tar.gz`` and is kept splitext-exact so a
    future listing path that DOES surface dotfiles can't mint empty
    media_ids (review r5)."""
    reader = (spark.read.format("binaryFile")
              # the subdirectory contract the docstring promises
              .option("recursiveFileLookup", "true"))
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return media_columns(reader.load(path))


def _stem(base):
    """os.path.splitext-exact stem of a basename column: the lookbehind
    keeps dotfile semantics ('.DS_Store' is a stem with NO extension,
    not an empty stem — empty media_ids collided in sidecar joins,
    review r5). ONE definition shared by binary_import and image_import
    (review r6: a second copy had crept in)."""
    return F.regexp_replace(base, r"(?<=.)\.[^.]*$", "")


def media_columns(df: DataFrame) -> DataFrame:
    """Project binaryFile-shaped rows (path, length, modificationTime,
    content) to the media schema. Split out so the stem/ext expressions
    are testable without a filesystem listing."""
    decoded = F.col("path")
    base = F.element_at(F.split(decoded, "/"), -1)
    return df.select(
        _stem(base).alias("media_id"),
        decoded.alias("media_path"),
        F.lower(F.regexp_extract(base, r"(?<=.)\.([^.]*)$", 1)).alias("ext"),
        F.col("length"),
        F.col("modificationTime").alias("mod_time"),
        F.col("content"),
    )


def image_import(spark: SparkSession, path: str,
                 glob: str | None = None,
                 drop_invalid: bool = False) -> DataFrame:
    """Read a directory of images through Spark's built-in ``image``
    source (JVM ImageIO decode — no Python in the scan) into
    (media_id, media_path, width, height, n_channels, mode, data).

    Complements binary_import: use THIS when the JVM should decode at
    scan time (jpeg/png/gif/bmp via ImageIO, one task per file, pixel
    data lands as an OpenCV-style BGR(A)/gray byte column); use
    binary_import + decode_features when decode policy lives in Python
    (custom codecs, on_error containment, formats ImageIO lacks).
    Undecodable files surface as width -1 rows unless
    ``drop_invalid=True`` (the source's dropInvalid option prunes them
    at scan time).

    The stdlib PNG codec (functions/png.py) is cross-checked against
    exactly this source in tests/test_png.py, so the two decode paths
    agree byte-for-byte on PNG."""
    reader = spark.read.format("image").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if drop_invalid:
        reader = reader.option("dropInvalid", "true")
    img = F.col("image")
    base = F.element_at(F.split(img["origin"], "/"), -1)
    return reader.load(path).select(
        _stem(base).alias("media_id"),
        img["origin"].alias("media_path"),
        img["width"].alias("width"),
        img["height"].alias("height"),
        img["nChannels"].alias("n_channels"),
        img["mode"].alias("mode"),
        img["data"].alias("data"),
    )
