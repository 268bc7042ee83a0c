"""Grouped-map escape hatch: the reference's analysis-per-hashlabel-group
idiom (SURVEY §2.10).

In the reference, a method's ``analysis(sliceno)`` runs arbitrary Python
per slice, and hashlabel guarantees a key's rows are all in that slice —
so "per-key Python" is the core custom-logic pattern. The Spark twin is
``applyInPandas``: one shuffle on the key, then an Arrow-batched pandas
function per group. Use ONLY when the logic genuinely can't be expressed
as DataFrame ops (it leaves whole-stage codegen and ships data through
Python).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def analysis_per_key(
    df: DataFrame,
    key: str | list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: T.StructType | str,
) -> DataFrame:
    """Run ``fn`` once per key group (pandas in, pandas out).

    Equivalent of: hashpart on ``key`` + per-slice Python over that key's
    rows. One shuffle; group must fit one executor's memory (same
    constraint as the reference's per-slice dict)."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def fit_per_group_linear(df: DataFrame, key: str, x_col: str, y_col: str) -> DataFrame:
    """Worked example: least-squares fit per group — the kind of
    model-per-key step the reference writes as analysis() + numpy."""
    import numpy as np

    schema = T.StructType([
        # key keeps ITS OWN type (a hardcoded LongType broke string keys)
        T.StructField(key, df.schema[key].dataType),
        T.StructField("slope", T.DoubleType()),
        T.StructField("intercept", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[x_col].to_numpy(dtype=float)
        y = pdf[y_col].to_numpy(dtype=float)
        if len(x) < 2 or np.ptp(x) == 0:
            slope, intercept = 0.0, float(y.mean()) if len(y) else 0.0
        else:
            slope, intercept = np.polyfit(x, y, 1)
        return pd.DataFrame([{
            key: pdf[key].iloc[0],
            "slope": float(slope),
            "intercept": float(intercept),
            "n": len(pdf),
        }])

    return df.groupBy(key).applyInPandas(fit, schema=schema)


def grouped_agg_udaf(y_col: str):
    """Worked example of the pandas GROUPED_AGG UDAF path (the third
    Python escape hatch besides grouped-map and mapInPandas): a median
    aggregator usable inside ``groupBy().agg()`` and over windows.

    Arrow ships each group's column to Python once; the result slots
    into the normal agg plan. Prefer native ``F.median``/``F.percentile``
    in real code — this exists to keep the UDAF surface exercised
    end-to-end (SURVEY §2.10 UDAF row)."""
    from pyspark.sql import functions as F

    @F.pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        m = v.median()
        # all-null group: Series.median() yields NaN — return NULL like
        # native F.median / SQL median, not a NaN double (review r5)
        return None if pd.isna(m) else float(m)

    return median_udaf(y_col)


def grouped_count_udaf(y_col: str):
    """Companion pandas UDAF: Spark disallows mixing GROUPED_AGG pandas
    UDFs with JVM aggregates in one ``agg()`` — so a query wanting
    median + count through the pandas path needs both as pandas."""
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def count_udaf(v: pd.Series) -> int:
        return int(len(v))

    return count_udaf(y_col)
