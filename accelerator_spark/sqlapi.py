"""SQL-string surface.

The reference has no query language at all (SURVEY §0) — relational work
is hand-written per-slice Python. On Spark the SQL surface is free, so we
expose it as a first-class entry point: register the standard tables as
temp views once, then ``spark.sql(...)`` anything. Catalyst plans SQL and
DataFrame code identically, so everything in SCALE.md (pushdown,
broadcast, AQE) applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "documents", "embeddings"]


def register_views(spark: SparkSession, sf_dir: str,
                   tables: list[str] | None = None) -> None:
    """Register each parquet table as a session temp view named after
    the table. Idempotent; cheap (no scan — just the catalog entry)."""
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an SQL string against the registered standard tables."""
    register_views(spark, sf_dir)
    return spark.sql(query)
