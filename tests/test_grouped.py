"""Grouped-map escape hatch (applyInPandas) + fused typing/rehash."""

import pandas as pd
from pyspark.sql import functions as F, types as T

from accelerator_spark.functions.conversions import dataset_type
from accelerator_spark.operators.grouped import analysis_per_key, fit_per_group_linear

from conftest import load


def test_analysis_per_key(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")

    schema = T.StructType([
        T.StructField("o_custkey", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("spend", T.DoubleType()),
    ])

    def per_customer(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            "o_custkey": pdf["o_custkey"].iloc[0],
            "n": len(pdf),
            "spend": float(pdf["o_totalprice"].sum()),
        }])

    out = analysis_per_key(orders, "o_custkey", per_customer, schema)
    # cross-check against the declarative twin
    ref = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("spend"))
    j = out.join(ref, "o_custkey")
    assert j.count() == ref.count()
    assert j.filter(
        (F.col("out.n") if False else out["n"]) != ref["n"]).count() == 0


def test_fit_per_group_linear(spark):
    rows = [(1, float(x), 2.0 * x + 1.0) for x in range(10)] + \
           [(2, float(x), -0.5 * x + 3.0) for x in range(10)] + \
           [(3, 1.0, 7.0)]  # degenerate single point
    df = spark.createDataFrame(rows, "g long, x double, y double")
    got = {r["g"]: r for r in fit_per_group_linear(df, "g", "x", "y").collect()}
    assert abs(got[1]["slope"] - 2.0) < 1e-9 and abs(got[1]["intercept"] - 1.0) < 1e-9
    assert abs(got[2]["slope"] + 0.5) < 1e-9
    assert got[3]["slope"] == 0.0 and got[3]["intercept"] == 7.0


def test_dataset_type_fused_rehash(spark, sf_dir):
    src = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_custkey").cast("string").alias("c"))
    typed, _ = dataset_type(src, {"k": "int64_10", "c": "int64_10"},
                            hashlabel="c", partitions=8)
    assert dict(typed.dtypes)["c"] == "bigint"
    spread = (
        typed.withColumn("pid", F.spark_partition_id())
        .groupBy("c").agg(F.countDistinct("pid").alias("np"))
        .agg(F.max("np")).collect()[0][0]
    )
    assert spread == 1


def test_fit_per_group_linear_string_key(spark, sf_dir):
    """Review r3: the output schema must keep the key column's own type
    (was hardcoded LongType, breaking string keys)."""
    from accelerator_spark.operators.grouped import fit_per_group_linear
    from conftest import load
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice")
    out = fit_per_group_linear(li, "l_returnflag",
                               "l_quantity", "l_extendedprice")
    rows = out.collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "N", "R"}
    # the point is the key survives with its own type; fits are finite
    assert all(r["n"] > 0 and r["slope"] == r["slope"] for r in rows)


def test_median_udaf_all_null_group_returns_null(spark):
    """Review r5: pandas Series.median() on an all-null group yields
    NaN; the UDAF must return NULL like native F.median / SQL median,
    or the oracle comparison breaks the moment such a group appears."""
    from accelerator_spark.operators.grouped import grouped_agg_udaf

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", None), ("b", None)],
        "k string, y double")
    got = {r["k"]: r["m"] for r in
           df.groupBy("k").agg(grouped_agg_udaf("y").alias("m")).collect()}
    assert got["a"] == 2.0
    assert got["b"] is None  # not NaN
