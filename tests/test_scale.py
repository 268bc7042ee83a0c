"""Opt-in scale stress (SPARK_GRAFT_SCALE=1): run headline shapes on a
16x-replicated lineitem (~9.6M rows locally) to catch designs that only
work at bench scale — driver-side materialization, unbounded group
expansion, plans that lose pushdown after a union.

    SPARK_GRAFT_SCALE=1 python -m pytest tests/test_scale.py -q
"""

import os

import pytest
from pyspark.sql import functions as F

from conftest import load

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SCALE"),
    reason="scale stress is opt-in: set SPARK_GRAFT_SCALE=1",
)

SF_DIR = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def li16(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = li
    for _ in range(4):  # 2^4 = 16x
        out = out.unionByName(out)
    return out


def test_q1_shape_at_16x(spark, li16):
    res = (
        li16.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    base = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"),
             F.count(F.lit(1)).alias("n"))
        .collect()
    )
    b = {(r["l_returnflag"], r["l_linestatus"]): r for r in base}
    for r in res:
        want = b[(r["l_returnflag"], r["l_linestatus"])]
        assert r["n"] == want["n"] * 16
        assert abs(r["sum_qty"] - want["sum_qty"] * 16) < 1e-4 * want["sum_qty"]


def test_join_agg_at_16x(spark, li16):
    orders = load(spark, SF_DIR, "orders")
    out = (
        li16.join(orders, li16.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sum(r["n"] for r in out) == li16.count()


def test_checksum_at_16x_partition_invariant(spark, li16):
    from accelerator_spark.operators.checksum import checksum
    cols = ["l_orderkey", "l_linenumber", "l_returnflag"]
    a = checksum(li16, cols)
    b = checksum(li16.repartition(64), cols)
    assert a == b
