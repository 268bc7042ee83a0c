"""JSONL (newline-delimited JSON) import/export — new surface beyond the
reference (its closest analogue is the ``json`` column type,
/root/reference/accelerator/dsutil.py:84-137, which round-trips JSON
values inside a dataset; a JSONL *file* source/sink is what a modern
corpus pipeline actually ingests — web-crawl shards, API dumps).

Design mirrors csvimport's contract (SURVEY §2.1):
- explicit schema in, no inference by default (import stays
  reproducible; typing is a deliberate choice, not a guess);
- bad-record capture: PERMISSIVE parse routes unparseable lines into a
  ``bad`` DataFrame (raw line text) instead of failing the job —
  csvimport's ``allow_bad``;
- gzip transparent (Spark's text/json sources decompress by extension).

Scale: both directions are plain distributed file scans/writes; JSONL is
splittable line-wise, so a 100 TB ingest parallelizes per-block with no
coordination. Schema-explicit reads also skip Spark's sampling pass over
the data (inference reads everything once before the real scan).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

_CORRUPT = "_corrupt_record"


@dataclass
class JsonlImportResult:
    """default = parsed rows; bad = raw text of unparseable lines."""

    default: DataFrame
    bad: DataFrame | None = None


def jsonlimport(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    allow_bad: bool = False,
) -> JsonlImportResult:
    """Read JSONL with an explicit schema. With ``allow_bad``, lines that
    fail to parse land in ``result.bad`` (column ``data``: the raw line)
    and are excluded from ``result.default`` — the reference's bad-line
    dataset, JSON flavor."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if not allow_bad:
        # FAILFAST: without bad capture a malformed line FAILS the
        # import (csvimport's contract) — default PERMISSIVE would
        # silently emit an all-null row instead
        df = spark.read.schema(schema).option("mode", "FAILFAST").json(path)
        return JsonlImportResult(default=df)
    # bad-capture path: read lines as text and parse with from_json.
    # Spark forbids filtering a json SCAN on only its corrupt-record
    # column (SPARK-21610); parsing from a text scan has no such
    # restriction, costs the same single pass, and keeps the raw line
    # for the bad dataset.
    full = StructType(list(schema.fields) + [StructField(_CORRUPT, StringType())])
    # blank/whitespace-only lines are record separators, not records —
    # from_json("") yields a NULL struct with a NULL corrupt column,
    # which would otherwise pass the good filter as a spurious all-null
    # row (review r3)
    parsed = spark.read.text(path).filter(F.col("value").rlike(r"\S")).select(
        F.col("value"),
        F.from_json(
            "value", full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT},
        ).alias("r"),
    )
    good = parsed.filter(F.col(f"r.{_CORRUPT}").isNull()) \
                 .select("r.*").drop(_CORRUPT)
    bad = parsed.filter(F.col(f"r.{_CORRUPT}").isNotNull()) \
                .select(F.col("value").alias("data"))
    return JsonlImportResult(default=good, bad=bad)


def jsonlexport(
    df: DataFrame,
    path: str,
    gzip: bool = False,
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as JSONL. ``single_file`` coalesces to one
    partition (csvexport's non-``sliced`` mode) — driver-friendly for
    small exports, deliberately NOT the default: at scale you want one
    shard per partition."""
    w = df.coalesce(1) if single_file else df
    writer = w.write.mode(mode)
    if gzip:
        writer = writer.option("compression", "gzip")
    writer.json(path)


__all__ = ["jsonlimport", "jsonlexport", "JsonlImportResult"]
