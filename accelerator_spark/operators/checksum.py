"""Order-insensitive dataset checksum.

Reference: ``dataset_checksum`` / ``dataset_checksum_chain`` — md5 per line,
xor-folded across lines and slices so the digest is independent of row order
and slicing (/root/reference/accelerator/standard_methods/
a_dataset_checksum.py:24-52, a_dataset_checksum_chain.py:36-50).

Spark-first design: hash each row with xxhash64 (JVM-side, codegen'd) and
fold with bit_xor + sum in one distributed agg — no row ever reaches the
driver, so this works unchanged at 100 TB. We fold with BOTH xor and sum of
the 64-bit hashes: xor alone is blind to duplicate-row parity, the pair is
a much stronger equality check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def checksum(df: DataFrame, columns: list[str] | None = None) -> dict:
    """Order/partitioning-insensitive digest of selected columns.

    Returns {"lines": n, "xor": int, "sum": int}.
    """
    cols = columns or df.columns
    # Null-safe canonical text form per row; the \x1f separator prevents
    # ("ab","c") colliding with ("a","bc"). Known ambiguity (accepted,
    # shared bit-for-bit with the DuckDB oracles that replicate this
    # encoding): a VALUE containing \x1f, or equal to the "\x00NULL"
    # sentinel, can collide with a differently-split row — impossible
    # for the numeric/clean-text columns this digests, and the encoding
    # cannot change without breaking recorded oracle parity.
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    h = F.xxhash64(F.concat_ws("\x1f", *parts))
    row = (
        df.select(h.alias("h"))
        .agg(
            F.count(F.lit(1)).alias("lines"),
            F.bit_xor("h").alias("xor"),
            # sum as decimal: exact and overflow-free under ANSI mode
            F.sum(F.col("h").cast("decimal(38,0)")).alias("sum"),
        )
        .collect()[0]
    )
    return {"lines": row["lines"], "xor": row["xor"] or 0, "sum": int(row["sum"] or 0)}


def checksum_df(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Same digest but returned as a 1-row DataFrame (for the query/oracle
    harness)."""
    cols = columns or df.columns
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL")) for c in cols]
    h = F.xxhash64(F.concat_ws("\x1f", *parts))
    return df.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("lines"),
        F.bit_xor("h").alias("checksum_xor"),
    )


def checksum_chain(dataset, spark, columns: list[str] | None = None,
                   length: int = -1) -> dict:
    """Chain-wide digest (the reference's dataset_checksum_chain,
    a_dataset_checksum_chain.py:36-50: per-dataset checksums xor-folded).
    Equivalent to checksumming the chain union — xor/sum fold over rows
    is associative across datasets."""
    return checksum(dataset.chain_df(spark, length=length), columns)


def datasets_equal(a: DataFrame, b: DataFrame, columns: list[str] | None = None) -> bool:
    """Order-insensitive equality of two DataFrames on shared columns —
    the reference's test_compare_datasets idiom (SURVEY §5)."""
    cols = columns or sorted(set(a.columns) & set(b.columns))
    return checksum(a, cols) == checksum(b, cols)
