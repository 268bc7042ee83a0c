"""Unit tests for the round-2 sketch / graph / analytics operators.

Each operator's distributed answer is checked against a straightforward
driver-side recomputation on small data (plus invariance properties:
partitioning must not change results)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from accelerator_spark.operators.analytics import skyline, winsorize
from accelerator_spark.operators.graph import (
    cooccurrence_edges, degree_histogram, pagerank, triangle_count,
)
from accelerator_spark.operators.sketches import (
    bitmap_distinct, heavy_hitters, hll_rollup,
)


# ---------------------------------------------------------------- sketches

def test_bitmap_distinct_exact_and_mergeable(spark):
    rows = [Row(g="a", day=d, k=k) for d in (1, 2) for k in range(100)]
    rows += [Row(g="b", day=1, k=k) for k in range(40000, 40050)]  # 2 buckets
    df = spark.createDataFrame(rows).repartition(7)
    direct = bitmap_distinct(df, "k", ["g"]).collect()
    merged = bitmap_distinct(df, "k", ["g"], merge_cols=["day"]).collect()
    want = {"a": 100, "b": 50}
    assert {r["g"]: r["distinct_count"] for r in direct} == want
    assert {r["g"]: r["distinct_count"] for r in merged} == want


def test_hll_rollup_close_to_exact(spark):
    df = spark.range(0, 5000).withColumn("g", (F.col("id") % 2).cast("string"))
    est = {r["g"]: r["approx_distinct"]
           for r in hll_rollup(df, "id", ["g"], lgk=12).collect()}
    for g in ("0", "1"):
        assert abs(est[g] - 2500) <= 0.05 * 2500


def test_heavy_hitters_exact_and_partition_invariant(spark):
    rows = ([Row(k="hot")] * 50 + [Row(k="warm")] * 10
            + [Row(k=f"cold{i}") for i in range(30)])
    for nparts in (1, 4, 13):
        df = spark.createDataFrame(rows).repartition(nparts)
        got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 10).collect()}
        assert got == {"hot": 50, "warm": 10}


def test_heavy_hitters_threshold_edge(spark):
    df = spark.createDataFrame([Row(k="x")] * 9 + [Row(k="y")] * 3)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 4).collect()}
    assert got == {"x": 9}


# ------------------------------------------------------------------- graph

@pytest.fixture(scope="module")
def small_graph(spark):
    # triangle {1,2,3} + edge to 4; group 99 too big if cap is tiny
    rows = [
        Row(grp=10, item=1), Row(grp=10, item=2), Row(grp=10, item=3),
        Row(grp=11, item=1), Row(grp=11, item=2), Row(grp=11, item=3),
        Row(grp=12, item=2), Row(grp=12, item=3),
        Row(grp=13, item=3), Row(grp=13, item=4),
        Row(grp=14, item=3), Row(grp=14, item=4),
    ]
    return spark.createDataFrame(rows)


def test_cooccurrence_edges(spark, small_graph):
    e = {(r["src"], r["dst"]): r["weight"]
         for r in cooccurrence_edges(small_graph, "grp", "item",
                                     min_weight=2).collect()}
    assert e == {(1, 2): 2, (1, 3): 2, (2, 3): 3, (3, 4): 2}


def test_cooccurrence_group_cap(spark):
    rows = [Row(grp=1, item=i) for i in range(10)] + [
        Row(grp=2, item=1), Row(grp=2, item=2)]
    e = cooccurrence_edges(spark.createDataFrame(rows), "grp", "item",
                           group_cap=5).collect()
    assert {(r["src"], r["dst"]) for r in e} == {(1, 2)}


def test_triangle_count(spark, small_graph):
    edges = cooccurrence_edges(small_graph, "grp", "item", min_weight=2)
    row = triangle_count(edges).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) == (4, 4, 1)


def test_pagerank_conserves_mass_and_orders_hub_first(spark, small_graph):
    edges = cooccurrence_edges(small_graph, "grp", "item", min_weight=2)
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, 3).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling mass lost
    assert max(ranks, key=ranks.get) == 3  # node 3 touches everything
    assert min(ranks, key=ranks.get) == 4  # leaf


def test_degree_histogram(spark, small_graph):
    edges = cooccurrence_edges(small_graph, "grp", "item", min_weight=2)
    h = {r["degree"]: r["n_nodes"] for r in degree_histogram(edges).collect()}
    assert h == {1: 1, 2: 2, 3: 1}


# --------------------------------------------------------------- analytics

def test_skyline_exact_and_partition_invariant(spark):
    rows = [
        Row(pk=1, price=10.0, size=5),   # kept
        Row(pk=2, price=10.0, size=5),   # duplicate of 1 — also kept
        Row(pk=3, price=12.0, size=5),   # dominated by 1
        Row(pk=4, price=9.0, size=1),    # kept (cheapest)
        Row(pk=5, price=50.0, size=9),   # kept (biggest)
        Row(pk=6, price=50.0, size=8),   # dominated by 5
    ]
    for nparts in (1, 3, 6):
        df = spark.createDataFrame(rows).repartition(nparts)
        got = {r["pk"] for r in
               skyline(df, minimize=["price"], maximize=["size"]).collect()}
        assert got == {1, 2, 4, 5}


def test_winsorize_clamps_to_exact_percentiles(spark):
    vals = [float(v) for v in range(1, 101)]  # 1..100
    df = spark.createDataFrame([Row(g="a", v=v) for v in vals])
    out = winsorize(df, "v", ["g"], 0.05, 0.95)
    r = out.agg(F.min("v_winsor"), F.max("v_winsor")).collect()[0]
    # PERCENTILE_CONT(0.05) over 1..100 = 5.95; 0.95 -> 95.05
    assert r[0] == pytest.approx(5.95)
    assert r[1] == pytest.approx(95.05)


def test_heavy_hitters_counts_null_keys(spark):
    """SQL GROUP BY semantics: a NULL key above threshold is reported
    (ADVICE r2: value_counts dropped NaN and the semi-join dropped
    nulls)."""
    rows = [("x",)] * 20 + [(None,)] * 15 + [("y",)] * 3
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 10).collect()}
    assert got == {"x": 20, None: 15}


def test_heavy_hitters_large_int64_keys_with_nulls(spark):
    """Review r3: Arrow->pandas coerces int64-with-nulls to float64,
    rounding ids above 2^53. The string-projection candidate pass must
    keep them exact."""
    big_key = (1 << 53) + 1  # 9007199254740993: float64 rounds it
    rows = [(big_key,)] * 20 + [(None,)] * 12 + [(7,)] * 3
    df = spark.createDataFrame(rows, "k long").repartition(4)
    got = {r["k"]: r["cnt"] for r in heavy_hitters(df, "k", 10).collect()}
    assert got == {big_key: 20, None: 12}


def test_winsorize_preserves_rows_with_null_group_key(spark):
    """ADVICE r3 / VERDICT r4 item 6: a NULL group key must neither
    drop rows (the old equi-join bug) nor escape clamping — NULL keys
    form their own group via the null-safe join."""
    rows = ([("a", float(v)) for v in range(100)]
            + [(None, float(v)) for v in range(1000, 1100)]
            + [("a", None), (None, None)])
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", ["g"], 0.10, 0.90)
    assert out.count() == df.count()  # add-a-column, never drop-rows
    got = {(r["g"], r["v"]): r["v_winsor"] for r in out.collect()}
    # NULL-keyed group clamped against ITS OWN percentiles (1000..1099)
    assert got[(None, 1000.0)] == 1009.9
    assert got[(None, 1099.0)] == 1089.1
    # 'a' group untouched by the NULL group's range
    assert got[("a", 0.0)] == 9.9
    # NULL values stay NULL in every group
    assert got[("a", None)] is None
    assert got[(None, None)] is None
