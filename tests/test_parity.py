"""Parity fixtures: the all-types round-trip table (FIXTURES.md §1 /
reference test_data.py:41-74), job artifacts, equivalent_hashes, subjobs,
chain checksum, zip import."""

import datetime
import os
import zipfile

import pytest
from pyspark.sql import functions as F, types as T

from accelerator_spark.build import BuildContext, Urd
from accelerator_spark.dataset import Dataset
from accelerator_spark.operators.checksum import checksum, checksum_chain, datasets_equal
from accelerator_spark.sources.zip import csvimport_zip

from conftest import load

D = datetime.datetime
NAN = float("nan")


@pytest.fixture(scope="module")
def alltypes(spark):
    """All-types fixture with extreme values (FIXTURES.md §1): int64/32
    bounds, 1e100, ±0.0, NaN, µs-precision timestamps incl. 1916, NULLs,
    38-digit decimal, bytes, unicode, json."""
    schema = T.StructType([
        T.StructField("lineno", T.LongType(), False),
        T.StructField("c_int64", T.LongType(), True),
        T.StructField("c_int32", T.IntegerType(), True),
        T.StructField("c_bits64", T.DecimalType(20, 0), False),
        T.StructField("c_float64", T.DoubleType(), True),
        T.StructField("c_float32", T.FloatType(), True),
        T.StructField("c_number", T.DecimalType(38, 0), True),
        T.StructField("c_bool", T.BooleanType(), True),
        T.StructField("c_datetime", T.TimestampType(), True),
        T.StructField("c_date", T.DateType(), True),
        T.StructField("c_time_us", T.LongType(), True),
        T.StructField("c_bytes", T.BinaryType(), True),
        T.StructField("c_unicode", T.StringType(), True),
        T.StructField("c_json", T.StringType(), True),
    ])
    from decimal import Decimal
    rows = [
        (0, 9223372036854775807, 2147483647, Decimal(18446744073709551615),
         1e100, 100.0, Decimal(10**38 - 1), True,
         D(1916, 2, 29, 23, 59, 59, 999999), datetime.date(2016, 2, 29),
         43200999999, b"foo", "blå", '{"a":[1,2,{"b":{}}]}'),
        (1, -9223372036854775808, -2147483647, Decimal(0),
         -0.0, -0.0, Decimal(13578058080989382), False,
         D(1970, 1, 1, 0, 0, 0, 1), datetime.date(2016, 2, 28),
         62000003, b"", "blä", "null"),
        (2, 100, -1, Decimal(0x55AA55AA55AA55AA),
         1 / 3, 2.0, Decimal(42), None,
         None, None, None, None, None, None),
        (3, None, None, Decimal(1),
         NAN, NAN, None, True,
         D(2024, 6, 1, 12, 0), datetime.date(2017, 6, 27),
         0, b"blutti", "bla", '"blä"'),
    ]
    return spark.createDataFrame(rows, schema)


def test_alltypes_roundtrip(spark, alltypes, tmp_path):
    ds = Dataset.write(alltypes, str(tmp_path / "alltypes"))
    back = ds.df(spark)
    assert ds.lines == 4
    assert datasets_equal(alltypes, back)
    # exact value round-trip incl. µs precision and NaN
    orig = {r["lineno"]: r for r in alltypes.collect()}
    got = {r["lineno"]: r for r in back.collect()}
    assert got[0]["c_datetime"] == D(1916, 2, 29, 23, 59, 59, 999999)
    assert got[0]["c_number"] == orig[0]["c_number"]
    assert got[3]["c_float64"] != got[3]["c_float64"]  # NaN preserved
    assert got[1]["c_int64"] == -9223372036854775808
    assert got[0]["c_unicode"] == "blå"
    # manifest minmax for orderable columns
    assert ds.min("c_int32") == -2147483647 and ds.max("c_int32") == 2147483647


def test_alltypes_sort_and_checksum_stability(spark, alltypes, tmp_path):
    from accelerator_spark.operators.sort import dataset_sort
    out = dataset_sort(alltypes, "c_float64", across_slices=True).collect()
    # -0.0, 1/3, 1e100, NaN last (a_dataset_sort.py NaN==+inf rule)
    assert [r["lineno"] for r in out] == [1, 2, 0, 3]
    assert checksum(alltypes) == checksum(alltypes.orderBy(F.rand(seed=5)))


def test_job_artifacts(spark, sf_dir, tmp_path):
    ctx = BuildContext(spark, str(tmp_path / "wd"))

    def stats_step(spark, datasets, options):
        df = spark.read.parquet(options["path"])
        row = df.agg(F.count(F.lit(1)).alias("n"), F.max("o_totalprice").alias("mx")).collect()[0]
        return {"default": df.limit(10),
                "stats": {"n": row["n"], "max_price": row["mx"]}}

    j = ctx.build(stats_step, options={"path": f"{sf_dir}/orders.parquet"})
    assert j.artifact_names == ["stats"]
    stats = j.load("stats")
    assert stats["n"] == load(spark, sf_dir, "orders").count()
    # memo-hit returns the same artifacts
    j2 = ctx.build(stats_step, options={"path": f"{sf_dir}/orders.parquet"})
    assert j2.cached and j2.load("stats") == stats


def test_equivalent_hashes(spark, sf_dir, tmp_path):
    from accelerator_spark.build import source_hash
    ctx = BuildContext(spark, str(tmp_path / "wd"))

    def step_v1(spark, datasets, options):
        return spark.read.parquet(f"{sf_dir}/nation.parquet")

    j1 = ctx.build(step_v1)
    old_hash = source_hash(step_v1)

    def step_v2(spark, datasets, options):
        # cosmetically different source
        return spark.read.parquet(f"{sf_dir}/nation.parquet")  # comment

    step_v2.__name__ = "step_v1"
    # WITHOUT the equivalence claim a changed source rebuilds...
    j2 = ctx.build(step_v2, options={"probe": 1})
    assert not j2.cached
    # ...WITH it, the old job is reused despite the new source
    step_v2.equivalent = [old_hash]
    j3 = ctx.build(step_v2)
    assert j3.cached and j3.jobid == j1.jobid


def test_subjobs(spark, sf_dir, tmp_path):
    """Methods building other methods (reference subjobs.py:33-60):
    a step calls ctx.build recursively."""
    ctx = BuildContext(spark, str(tmp_path / "wd"))

    def inner(spark, datasets, options):
        return spark.read.parquet(f"{sf_dir}/region.parquet")

    def outer(spark, datasets, options):
        sub = ctx.build(inner)  # subjob
        return sub.df().withColumn("doubled", F.col("r_regionkey") * 2)

    j = ctx.build(outer)
    assert j.df().filter(F.col("doubled") == F.col("r_regionkey") * 2).count() == 5
    # inner job memoized independently
    assert ctx.build(inner).cached


def test_checksum_chain(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region")
    a = Dataset.write(src.filter("r_regionkey < 2"), str(tmp_path / "a"))
    b = Dataset.write(src.filter("r_regionkey >= 2"), str(tmp_path / "b"), previous=a)
    assert checksum_chain(b, spark) == checksum(src)


def test_csvimport_zip(spark, tmp_path):
    zp = str(tmp_path / "data.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("dir/a.csv", "x,y\n1,2\n3,4\n")
        zf.writestr("dir/b.csv", "x,y\n5,6\n")
        zf.writestr("skip.txt", "not,csv\n")
    res = csvimport_zip(spark, zp, include_re=r"\.csv$", strip_dirs=True,
                        allow_bad=True)
    assert set(res.members) == {"a.csv", "b.csv"}
    rows = {(r["x"], r["y"], r["_zip_member"]) for r in res.chain.collect()}
    assert rows == {("1", "2", "a.csv"), ("3", "4", "a.csv"), ("5", "6", "b.csv")}


def test_typed_then_hashed_equals_hashed_then_typed(spark, sf_dir):
    """Reference a_test_dataset_type_hashing: typing then hashing must
    equal hashing then typing — content identical, co-location identical."""
    from accelerator_spark.functions.conversions import dataset_type
    from accelerator_spark.operators.partition import hashpart

    src = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("k"),
        F.col("o_custkey").cast("string").alias("c"))
    spec = {"k": "int64_10", "c": "int64_10"}

    a, _ = dataset_type(src, spec, hashlabel="c", partitions=8)  # type->hash
    b, _ = dataset_type(hashpart(src, "c", partitions=8), spec)  # hash->type
    assert datasets_equal(a, b)
    for df in (a, b):
        spread = (df.withColumn("pid", F.spark_partition_id())
                  .groupBy("c").agg(F.countDistinct("pid").alias("n"))
                  .agg(F.max("n")).collect()[0][0])
        assert spread == 1


def test_chain_stop_and_length(spark, sf_dir, tmp_path):
    """Reference a_test_selfchain/rechain: chain(length=), stop_ds."""
    src = load(spark, sf_dir, "region")
    d1 = Dataset.write(src.limit(1), str(tmp_path / "c1"))
    d2 = Dataset.write(src.limit(2), str(tmp_path / "c2"), previous=d1)
    d3 = Dataset.write(src.limit(3), str(tmp_path / "c3"), previous=d2)
    assert [d.path for d in d3.chain(length=2)] == [d2.path, d3.path]
    assert [d.path for d in d3.chain(stop_ds=d1)] == [d2.path, d3.path]
    assert [d.path for d in d3.chain(stop_ds=d1.path)] == [d2.path, d3.path]
    assert d3.chain_df(spark, length=1).count() == 3
    # full chain: 1 + 2 + 3 rows
    assert d3.chain_df(spark).count() == 6


def test_typed_options_resolution(spark, tmp_path):
    from accelerator_spark.build import (
        BuildContext, OptionEnum, RequiredOption)
    import pytest as _pytest

    calls = []

    def step(spark, datasets, options):
        calls.append(dict(options))
        return spark.range(options["n"])

    step.options = {
        "n": RequiredOption(int),
        "mode": OptionEnum("fast", "exact"),
        "sep": ",",
        "note": None,
    }
    ctx = BuildContext(spark, str(tmp_path / "wd"))
    j1 = ctx.build(step, options={"n": 3})
    assert calls[-1] == {"n": 3, "mode": "fast", "sep": ",", "note": None}
    # explicit defaults memo-hit the same job as implicit ones
    j2 = ctx.build(step, options={"n": 3, "mode": "fast", "sep": ","})
    assert j2.cached and j2.jobid == j1.jobid
    # different enum value = different job
    j3 = ctx.build(step, options={"n": 3, "mode": "exact"})
    assert not j3.cached
    with _pytest.raises(TypeError, match="required"):
        ctx.build(step, options={})
    with _pytest.raises(TypeError, match="one of"):
        ctx.build(step, options={"n": 1, "mode": "wrong"})
    with _pytest.raises(TypeError, match="unknown"):
        ctx.build(step, options={"n": 1, "typo": True})
    with _pytest.raises(TypeError, match="must be int"):
        ctx.build(step, options={"n": "3"})
    with _pytest.raises(TypeError, match="must be str"):
        ctx.build(step, options={"n": 1, "sep": 5})


def test_binary_import_media_ingest(spark, tmp_path):
    """binaryFile media ingestion (sources/media.binary_import): asset
    files -> (media_id, ext, length, content) rows, glob-filtered at
    listing time, content byte-exact."""
    import os
    from accelerator_spark.sources.media import binary_import

    d = str(tmp_path / "assets")
    os.makedirs(d)
    payloads = {f"img_{i}": bytes([i]) * (100 + i) for i in range(4)}
    for mid, data in payloads.items():
        with open(f"{d}/{mid}.jpg", "wb") as f:
            f.write(data)
    with open(f"{d}/notes.txt", "w") as f:
        f.write("not media")

    rows = binary_import(spark, d, glob="*.jpg").collect()
    assert len(rows) == 4
    got = {r["media_id"]: (r["ext"], r["length"], bytes(r["content"]))
           for r in rows}
    for mid, data in payloads.items():
        assert got[mid] == ("jpg", len(data), data)


def test_parquet_codec_matrix_roundtrip(spark, sf_dir, tmp_path):
    """Per-write codec choice (reference: pluggable compression registry,
    SURVEY §1.2): gzip/snappy/zstd/uncompressed writes all round-trip
    byte-identically."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{sf_dir}/nation.parquet")
    want = sorted(map(str, src.collect()))
    for codec in ("gzip", "snappy", "zstd", "uncompressed"):
        p = str(tmp_path / f"codec_{codec}")
        src.write.option("compression", codec).parquet(p)
        assert sorted(map(str, spark.read.parquet(p).collect())) == want


def test_csvimport_zip_hostile_member_names(spark, tmp_path):
    """Review r3: members with glob metacharacters (and absolute-ish
    names) must import — the read path is the sanitized, renamed file,
    never the raw member name."""
    import zipfile
    zp = str(tmp_path / "weird.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data[1].csv", "a,b\n1,2\n")
        zf.writestr("sub/dir/esc.csv", "a,b\n3,4\n")
    from accelerator_spark.sources.zip import csvimport_zip
    res = csvimport_zip(spark, zp, strip_dirs=True)
    assert set(res.members) == {"data[1].csv", "esc.csv"}
    rows = sorted(tuple(r) for r in
                  res.chain.select("a", "b").collect())
    assert rows == [("1", "2"), ("3", "4")]
