"""csvimport_zip: import CSV members of a zip archive as a chain.

Reference (/root/reference/accelerator/standard_methods/a_csvimport_zip.py:
62-80): include/exclude regex over member names, per-member rename map,
members chained in zip order (or filename order), strip_dirs.

Spark mapping (SURVEY §2.1): the zip is extracted driver-side (zip is not
a splittable format — at scale you'd land members on shared storage
first; the extraction is IO-bound metadata work, the member *parsing* is
distributed csvimport). Members become an ordered union with a
``_zip_member`` provenance column — the chain contract.
"""

from __future__ import annotations

import hashlib
import os
import re
import tempfile
import zipfile
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .csv import CsvImportResult, csvimport


@dataclass
class ZipImportResult:
    members: dict[str, CsvImportResult] = field(default_factory=dict)
    chain: DataFrame | None = None  # ordered union with _zip_member column


def csvimport_zip(
    spark: SparkSession,
    zip_path: str,
    include_re: str | None = None,
    exclude_re: str | None = None,
    strip_dirs: bool = False,
    chain_by: str = "zip",  # "zip" (archive order) or "filename"
    extract_to: str | None = None,
    **csv_kwargs,
) -> ZipImportResult:
    out = ZipImportResult()
    tmp = extract_to or tempfile.mkdtemp(prefix="csvimport_zip_")
    with zipfile.ZipFile(zip_path) as zf:
        names = [n for n in zf.namelist() if not n.endswith("/")]
        if include_re:
            names = [n for n in names if re.search(include_re, n)]
        if exclude_re:
            names = [n for n in names if not re.search(exclude_re, n)]
        if chain_by == "filename":
            names = sorted(names)
        paths = {}
        for n in names:
            # extract() sanitizes hostile member names (../, /abs) — use
            # ITS path, then copy to a glob-safe name: spark.read treats
            # [] {} * ? in paths as Hadoop glob metacharacters. The
            # original extension chain is preserved (sanitized) so
            # extension-driven transparent decompression (.gz members)
            # keeps working (review r4).
            extracted = zf.extract(n, tmp)
            suffix = re.sub(r"[^A-Za-z0-9.]", "",
                            "".join(re.findall(r"\.[^./]+", os.path.basename(n))))
            safe = os.path.join(
                tmp, "m_" + hashlib.md5(n.encode()).hexdigest() + suffix)
            os.replace(extracted, safe)
            paths[n] = safe
    frames = []
    labels = {}
    for n in names:
        label = os.path.basename(n) if strip_dirs else n
        # strip_dirs basename collisions must stay distinct members, not
        # silently overwrite (reference dedupes colliding names the same
        # way — accelerator/standard_methods/a_csvimport_zip.py); the
        # trailing-underscore rename keeps archive order stable
        while label in labels:
            label += "_"
        labels[label] = n
        res = csvimport(spark, paths[n], **csv_kwargs)
        out.members[label] = res
        frames.append(res.default.withColumn("_zip_member", F.lit(label)))
    if frames:
        chain = frames[0]
        for fdf in frames[1:]:
            chain = chain.unionByName(fdf, allowMissingColumns=True)
        out.chain = chain
    return out
