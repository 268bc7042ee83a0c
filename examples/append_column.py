"""Worked example: append a column to an existing dataset WITHOUT
rewriting it — the reference's ``dw = job.datasetwriter(parent=...)``
pattern (/root/reference/accelerator/examples/a_dsexample_appendcolumn.py)
re-expressed as a zero-copy overlay.

Run:  python -m accelerator_spark.cli run /tmp/example_ovl examples/append_column.py

The reference appends a column by writing new column files next to the
parent's; this engine does the same with ``Dataset.write_overlay``: only
``key + new column`` parquet is written (or zero bytes for an expression
column), the parent's files are untouched, and the overlay dataset reads
as parent ⨝ overlay with scan-time expressions.
"""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def import_parts(spark, datasets, options):
    """The 'source' dataset: part, written once as a normal dataset."""
    return spark.read.parquet(f"{SF_DIR}/part.parquet")


def append_price_band(spark, datasets, options):
    """a_dsexample_appendcolumn analog: derive a new column and overlay
    it — the parent dataset's files stay byte-identical."""
    from accelerator_spark.dataset import Dataset

    src = datasets["source"]
    banded = src.df(spark).select(
        "p_partkey",
        (F.col("p_retailprice") * 3.14).alias("scaled_price"))
    return lambda path: Dataset.write_overlay(
        path, src, new_cols=banded, key="p_partkey",
        virtual={"is_premium": "p_retailprice > 1500"})


def report(spark, datasets, options):
    """Read through the overlay: parent columns + written column +
    virtual column, one DataFrame."""
    ds = datasets["banded"]
    return {
        "default": ds.df(spark).groupBy("is_premium").agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("scaled_price"), 2).alias("avg_scaled")),
    }


def main(urd):
    src = urd.build(import_parts)
    banded = urd.build(append_price_band,
                       datasets={"source": src.dataset()})
    ds = banded.dataset()
    print(f"overlay dataset: {ds.path} parent={ds.manifest['parent']} "
          f"columns={sorted(ds.columns)}")
    rep = urd.build(report, datasets={"banded": ds})
    print("premium report rows:", rep.dataset().lines)
