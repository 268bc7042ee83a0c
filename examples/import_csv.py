"""Worked example: import, type, sort, and hash-partition a CSV file —
the reference's dsexample-import_csv / tutorial02
(/root/reference/accelerator/examples/build_dsexample-import_csv.py)
on this engine, including bad-row capture at both stages.

Run:  python -m accelerator_spark.cli run /tmp/example_csv examples/import_csv.py
"""

import os

from pyspark.sql import functions as F

FILENAME = os.path.join(os.path.dirname(__file__), "data.csv")


def import_file(spark, datasets, options):
    """csvimport: all-string dataset; the malformed line is captured,
    not fatal (allow_bad)."""
    from accelerator_spark.sources.csv import csvimport

    res = csvimport(spark, FILENAME, allow_bad=True,
                    lineno_label="lineno")
    return {"default": res.default, "bad": res.bad}


def type_it(spark, datasets, options):
    """dataset_type: explicit typing pass with bad capture (the
    'not-a-date' row fails date+number and routes to bad)."""
    from accelerator_spark.functions.conversions import dataset_type

    src = datasets["source"].df(spark)
    typed, bad = dataset_type(
        src,
        {"Date": "date:%Y-%m-%d", "String": "unicode",
         "Int": "number", "Float": "float64"},
        filter_bad=True,
    )
    return {"default": typed, "bad": bad}


def sort_it(spark, datasets, options):
    from accelerator_spark.operators.sort import dataset_sort

    return dataset_sort(datasets["source"].df(spark), "Date")


def hashpart_it(spark, datasets, options):
    from accelerator_spark.operators.partition import hashpart

    return hashpart(datasets["source"].df(spark), "String")


def main(urd):
    imp = urd.build(import_file)
    print("imported lines:", imp.dataset().lines,
          "bad:", imp.dataset("bad").lines)
    typed = urd.build(type_it, datasets={"source": imp.dataset()})
    print("typed lines:", typed.dataset().lines,
          "bad:", typed.dataset("bad").lines)
    srt = urd.build(sort_it, datasets={"source": typed.dataset()})
    hp = urd.build(hashpart_it, datasets={"source": srt.dataset()},
                   hashlabel="String")
    ds = hp.dataset()
    print("final:", ds.lines, "hashlabel:", ds.hashlabel,
          "date range:", ds.min("Date"), "..", ds.max("Date"))
