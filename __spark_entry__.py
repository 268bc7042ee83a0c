"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H-Q1-shaped pricing summary) on
  /root/testdata/sf0.001.
- ``queries()``: one entry per implemented operator from SURVEY.md §2 +
  the north-star extensions (dedup / similarity / text / multimodal).
- ``oracle_sql()``: matching DuckDB SQL per query (column aliases match
  exactly; float aggregates rounded identically on both sides).

Implementations live in accelerator_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from accelerator_spark import queries as _q
from accelerator_spark.session import tune_for_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_for_session(spark)
    return _q.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys without an entry get the
    driver's weaker rows-only check."""
    return dict(_q.ORACLES)
