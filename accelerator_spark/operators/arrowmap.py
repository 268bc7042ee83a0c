"""Shared Arrow-batched text-map scaffold.

The string twin of multimodal._map_media_rows (which exists because
its two hand-rolled copies 'had already diverged once' — review r6):
one place for the id-type-preserving mapInPandas plumbing the per-row
text operators (html_extract, fix_mojibake, ...) share, so the copies
can't drift (review r8)."""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def map_text_rows(
    df: DataFrame,
    per_row: Callable,          # (text_or_None) -> tuple of outputs
    out_fields: list,           # StructFields AFTER the id column
    text_col: str,
    id_col: str,
    id_out_name: str | None = None,
    batch_partitions: int | None = None,
) -> DataFrame:
    """One Arrow map stage over (id, text): output schema is
    (id_out_name-or-id_col with the id's OWN type, *out_fields). The
    per-row callable owns None handling — text operators have
    per-format ideas of what a NULL document means."""
    slim = df.select(id_col, text_col)
    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [T.StructField(id_out_name or id_col, id_type, False)]
        + list(out_fields))
    if batch_partitions:
        slim = slim.repartition(batch_partitions)
    cols = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [(did,) + tuple(per_row(text))
                   for did, text in zip(pdf[id_col], pdf[text_col])]
            yield pd.DataFrame(out, columns=cols)

    return slim.mapInPandas(run, schema=schema)
