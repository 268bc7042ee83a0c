"""Pickle columns (opt-in).

Reference: the ``pickle`` column type stores arbitrary Python objects,
one pickled blob per cell (/root/reference/accelerator/dsutil.py:139-177,
WritePickle/ReadPickle, pickle protocol 4). SURVEY §7.4 keeps this OUT of
the DuckDB correctness gate (no SQL engine can unpickle); this module is
the documented opt-in surface for users who need it.

Spark mapping: ``BinaryType`` cells written by an Arrow-batched pandas
UDF. Parquet stores them as plain byte arrays, so the dataset remains a
normal dataset (manifest, chains, hashlabel all work); only the pickle
payload itself is opaque to SQL. Reading back is either:

- ``unpickle_col(col, return_type)``: a typed projection (the common
  "I stored a dict, give me field x" case), or
- ``iterate_objects``: mapInPandas with real Python objects in the
  batch, the closest analog of the reference's ReadPickle iterator.

Scale note: pickle cells are opaque blobs — no pushdown, no pruning
inside the blob, Python on both ends. Use typed columns / ArrayType /
StructType wherever the shape is known (the reference docs give the
same advice). This is an escape hatch, not a data model.
"""

from __future__ import annotations

import pickle
from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

PROTOCOL = 4  # matches the reference (dsutil.py:146 pickle_dumps(o, 4))


def pickle_col(col: Column | str) -> Column:
    """Pickle each cell into a BinaryType column (WritePickle analog).
    The input column can be any Arrow-representable type (struct, map,
    array, scalar); the cell value is pickled as its Python form.

    The UDF is built here, not at module level: pandas_udf eagerly
    resolves its return type against the ACTIVE SparkSession, so a
    module-level decorator crashed any import that ran before
    get_spark() (review r4). A second NULL-flag argument rides along
    because a NULL struct reaches the UDF as a row of NaNs with no
    other indicator — without it NULL structs pickled as NaN dicts."""
    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("binary")
    def _dumps(s: pd.Series, isnull: pd.Series) -> pd.Series:
        # the pd.Series hint satisfies the UDF type checker; at runtime
        # a StructType input still arrives as a pd.DataFrame (verified)
        # StructType input arrives as a pandas DataFrame (one column per
        # field) — pickle each row as a dict, like the reference pickles
        # whatever object the method wrote
        if isinstance(s, pd.DataFrame):
            if len(s) == 0:
                return pd.Series([], dtype=object)
            out = s.apply(lambda r: pickle.dumps(r.to_dict(), PROTOCOL),
                          axis=1).astype(object)
            out[isnull.to_numpy(dtype=bool)] = None
            return out
        # na_action: a NULL cell stays NULL (not a pickled None)
        return s.map(lambda v: pickle.dumps(v, PROTOCOL), na_action="ignore")

    return _dumps(c, c.isNull())


def unpickle_col(col: Column | str, return_type: str,
                 transform: Callable[[Any], Any] | None = None) -> Column:
    """Unpickle a BinaryType column into ``return_type`` (ReadPickle
    analog, typed projection). ``transform`` maps the unpickled object
    before Arrow conversion (e.g. ``lambda o: o["x"]``)."""
    t = transform or (lambda o: o)

    @pandas_udf(return_type)
    def _loads(s: pd.Series) -> pd.Series:
        return s.map(lambda b: t(pickle.loads(bytes(b))) if b is not None
                     else None)

    return _loads(F.col(col) if isinstance(col, str) else col)


def iterate_objects(df: DataFrame, pickle_cols: list[str],
                    fn: Callable[[pd.DataFrame], pd.DataFrame],
                    schema: str) -> DataFrame:
    """mapInPandas over batches where ``pickle_cols`` hold live Python
    objects — the reference's ``ds.iterate`` over pickle columns. ``fn``
    receives each Arrow batch as a pandas frame with those columns
    already unpickled and must return frames matching ``schema``."""
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for c in pickle_cols:
                pdf[c] = pdf[c].map(
                    lambda b: pickle.loads(bytes(b)) if b is not None
                    else None)
            yield fn(pdf)

    return df.mapInPandas(_run, schema=schema)
