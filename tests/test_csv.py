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
    assert bad == {(3, "only_one_field"), (5, "x,y,z")}  # 1-based file linenos


def test_skip_comment_empty(spark, tmp_path):
    p = _write(tmp_path, "t.csv", "#banner\na,b\n#note\n1,2\n\n3,4\n")
    res = csvimport(spark, p, comment="#", skip_lines=1, skip_empty_lines=True,
                    allow_bad=True, lineno_label="lineno")
    rows = {(r["lineno"], r["a"], r["b"]) for r in res.default.collect()}
    assert rows == {(4, "1", "2"), (6, "3", "4")}  # 1-based file linenos
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
        # 1-based linenos: header is line 1; data lines are 2..n+1
        got = sorted((r["lineno"], r["a"]) for r in rows)
        assert got == [(i + 2, f"v{i}") for i in range(n)]
        # plan check: the only sort/window single-partition exchange is on
        # the counts aggregate, never on the full text scan
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "row_number" not in plan.lower()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# ---------------------------------------------------------------------------
# Reference corner-case parity (ported from the reference's own tests:
# test_methods/a_test_csvimport_separators.py and
# a_test_csvimport_corner_cases.py — VERDICT r2 next-step #3).
# ---------------------------------------------------------------------------

import pytest

from accelerator_spark.sources.csv import CsvImportError


def _write_bytes(tmp_path, name, data: bytes):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(data)
    return p


def _verify(spark, path, d, d_bad=None, d_skipped=None, **options):
    """Port of the reference's verify_ds: data keyed by the ix column,
    bad/skipped keyed by 1-based lineno."""
    options.setdefault("labels", ["ix", "0", "1"])
    options.setdefault("allow_bad", bool(d_bad))
    res = csvimport(spark, path, **options)
    got = {}
    for r in res.default.collect():
        ix = r["ix"]
        try:
            ix = int(ix)
        except (TypeError, ValueError):
            pass
        assert r["0"] == r["1"], f"columns disagree for ix={ix!r}"
        got[ix] = r["0"]
    assert got == d, f"data mismatch: {got} != {d}"
    if d_bad is not None:
        got_bad = {r["lineno"]: r["data"] for r in res.bad.collect()}
        assert got_bad == d_bad, f"bad mismatch: {got_bad} != {d_bad}"
    if d_skipped is not None:
        got_sk = {r["lineno"]: r["data"] for r in res.skipped.collect()}
        assert got_sk == d_skipped, f"skipped mismatch: {got_sk} != {d_skipped}"
    return res


SEPARATOR_MATRIX = [0, 1, 9, 30, 32, 34, 39, 44, 92, 160, 255]


@pytest.mark.parametrize("sep_i", SEPARATOR_MATRIX)
@pytest.mark.parametrize("quotes", [None, '"', "'"])
def test_separator_quote_matrix(spark, tmp_path, sep_i, quotes):
    """Any iso-8859-1 byte as separator × unquoted/double/single quoting
    (reference a_test_csvimport_separators.py synthesis loop)."""
    if quotes is not None and ord(quotes) == sep_i:
        pytest.skip("separator == quote char (reference skips too)")
    sep = chr(sep_i)
    data = [["a", "b", "c", "d"],
            ["a b", "", "c,d", ""],
            ['a"b"', "'cd", "e\tf", ""]]
    if not quotes:
        data = [[el.replace(sep, "") for el in row] for row in data]
    enc = "iso-8859-1" if sep_i >= 128 else "utf-8"
    out = []
    for row in data:
        if quotes:
            row = [quotes + el.replace(quotes, quotes + quotes) + quotes
                   for el in row]
        out.append(sep.join(row))
    p = _write_bytes(tmp_path, f"sep{sep_i}.csv",
                     ("\n".join(out) + "\n").encode(enc))
    res = csvimport(spark, p, separator=sep, quotes=quotes, encoding=enc)
    assert res.default.columns == data[0]
    got = sorted(tuple(r) for r in res.default.collect())
    assert got == sorted(tuple(row) for row in data[1:])


def test_cc_ignored_quotes(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"ix,0,1\n1,'a,'a\n2,'b','b'\n3,\"c\",\"c\"\n4,d',d'\n")
    _verify(spark, p, {1: "'a", 2: "'b'", 3: '"c"', 4: "d'"},
            labels=None, quotes=None)


def test_cc_spaces_and_quotes(spark, tmp_path):
    p = _write_bytes(
        tmp_path, "t.csv",
        b"ix,0,1\none,a,a\ntwo, b, b\n three,c,c\n4,\"d\"\"\",d\"\n5, 'e',\" 'e'\"\n")
    _verify(spark, p,
            {"one": "a", "two": " b", " three": "c", 4: 'd"', 5: " 'e'"},
            labels=None, quotes=True)


def test_cc_empty_fields(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv", b"ix,0,1\n1,,''\n2,,\n3,'',\n4,\"\",")
    _verify(spark, p, {1: "", 2: "", 3: "", 4: ""},
            labels=None, quotes=True)


def test_cc_bad_quotes(spark, tmp_path):
    p = _write_bytes(
        tmp_path, "t.csv",
        b"ix,0,1\n1,a,a\n2,\"b,\"b\n\n3,'c'c','c'c'\n4,\"d\",'d'\n")
    _verify(spark, p, {1: "a", 4: "d"},
            d_bad={3: '2,"b,"b', 4: "", 5: "3,'c'c','c'c'"},
            labels=None, quotes=True, allow_bad=True)


def test_cc_comments(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"# blah\nix,0,1\n1,a,a\n2,b,b\n#3,c,c\n4,#d,#d\n")
    _verify(spark, p, {1: "a", 2: "b", 4: "#d"},
            d_skipped={1: "# blah", 2: "ix,0,1", 5: "#3,c,c"},
            labels=None, comment="#")


def test_cc_not_comments(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"ix,0,1\n1,a,a\n2,b,b\n#3,c,c\n4,#d,#d\n")
    _verify(spark, p, {1: "a", 2: "b", "#3": "c", 4: "#d"}, labels=None)


def test_cc_skipped_and_bad_lines(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"not data here\nnor here\nix,0,1\n1,a,a\n2,b\n3,c,c")
    _verify(spark, p, {1: "a", 3: "c"},
            d_bad={5: "2,b"},
            d_skipped={1: "not data here", 2: "nor here", 3: "ix,0,1"},
            labels=None, skip_lines=2, allow_bad=True)


def test_cc_only_labels_and_empty_file(spark, tmp_path):
    p = _write_bytes(tmp_path, "only_labels.csv", b"ix,0,1")
    _verify(spark, p, {}, labels=None)
    p2 = _write_bytes(tmp_path, "empty.csv", b"")
    _verify(spark, p2, {})


def test_cc_lineno_with_bad_lines(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"ix,0,1\n2,a,a\n3,b\nc\n5,d,d\n6,e,e\n7\n8,g,g\n\n")
    res = _verify(spark, p, {2: "a", 5: "d", 6: "e", 8: "g"},
                  d_bad={3: "3,b", 4: "c", 7: "7", 9: ""},
                  labels=None, allow_bad=True, lineno_label="num")
    # reference invariant: the planted ix equals the 1-based file lineno
    for r in res.default.collect():
        assert int(r["ix"]) == r["num"]


def test_cc_strip_labels(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv", b" ix , 0 , 1 \n1,a,a\n2,b ,b ")
    _verify(spark, p, {1: "a", 2: "b "}, labels=None, strip_labels=True)


def test_cc_allow_extra_empty(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"ix,0,1,,,,\n1,a,a\n2,b,b,,\n3,,,")
    _verify(spark, p, {1: "a", 2: "b", 3: ""},
            labels=None, allow_extra_empty=True)


def test_cc_allow_extra_empty_quoted(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"ix,_0_,1,,,__,\n1,a,a\n_2_,b,b,__,\n3,c,c,__")
    _verify(spark, p, {1: "a", 2: "b", 3: "c"},
            labels=None, allow_extra_empty=True, quotes="_")


def test_cc_skip_empty_lines_and_comments(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv",
                     b"\r\nix,0,1\n\n\n5,a,a\n#6,b,b\n7,c,c\n#")
    _verify(spark, p, {5: "a", 7: "c"},
            d_skipped={1: "", 2: "ix,0,1", 3: "", 4: "", 6: "#6,b,b", 8: "#"},
            labels=None, skip_empty_lines=True, comment="#",
            lineno_label="line")


def test_cc_mixed_line_endings(spark, tmp_path):
    p = _write_bytes(tmp_path, "t.csv", b"ix,0,1\r\n1,a,a\n2,b,b\r\n3,c,c")
    _verify(spark, p, {1: "a", 2: "b", 3: "c"}, labels=None)


def test_cc_strange_values(spark, tmp_path):
    """The reference's 'strange values' array: quoting pathology both
    good and bad, quotes=True (either kind)."""
    bad_lines = ["bad,bad", ",", "bad,", ",bad", "',',",
                 "'lo there broken line", "'nope\"", "'bad quotes''",
                 '"bad quote " inside"', '"more ""bad"" quotes """ inside"']
    good_lines = [
        "\x00",
        ("'good, good'", "good, good"),
        ('"also good, yeah!"', "also good, yeah!"),
        ("'single quote''s inside'", "single quote's inside"),
        ("'single quote at end: '''", "single quote at end: '"),
        ('"""double quotes around"""', '"double quotes around"'),
        ('"double quote at end: """', 'double quote at end: "'),
        ('" I\'m special "', " I'm special "),
        "I'm not",
        " unquoted but with spaces around ",
        ("','", ","),
        ("'lot''s of ''quotes'' around here: '''''''' '",
         "lot's of 'quotes' around here: '''' "),
    ]
    d, d_bad, lines = {}, {}, []
    for ix, data in enumerate(bad_lines, 1):
        d_bad[ix] = f"{ix},{data},{data}"
        lines.append(d_bad[ix])
    for ix, data in enumerate(good_lines, len(bad_lines) + 1):
        if isinstance(data, tuple):
            data, d[ix] = data
        else:
            d[ix] = data
        lines.append(f"{ix},{data},{data}")
    p = _write_bytes(tmp_path, "strange.csv",
                     ("\n".join(lines) + "\n").encode("utf-8"))
    _verify(spark, p, d, d_bad=d_bad, quotes=True, allow_bad=True)


def test_cc_strict_failures(spark, tmp_path):
    """Without allow_bad the import fails (reference check_bad_file)."""
    for name, data in [("extra", b"foo,bar\nwith,extra,field\nok,here\n"),
                       ("missing", b"foo,bar\nmissing\nok,here\n"),
                       ("novalid", b"foo\nc,\n")]:
        p = _write_bytes(tmp_path, name + ".csv", data)
        with pytest.raises(CsvImportError):
            # comment forces the text path, like the reference's default
            csvimport(spark, p, comment="\x01")


def test_native_labels_failfast_on_wrong_count(spark, tmp_path):
    """Native path with explicit labels must FAIL on wrong field count
    (reference contract), not silently pad/truncate."""
    p = _write(tmp_path, "t.csv", "1,2,3\n4,5\n")
    res = csvimport(spark, p, labels=["a", "b", "c"])
    with pytest.raises(Exception):
        # collect, not count: Spark's CSV count() fast-path skips field
        # parsing entirely and would never hit the malformed record
        res.default.collect()


def test_header_all_empty_labels_raises(spark, tmp_path):
    p = _write(tmp_path, "t.csv", ",,,\n1,2,3,4\n")
    with pytest.raises(CsvImportError):
        csvimport(spark, p, allow_extra_empty=True, allow_bad=True)


def test_multifile_latin1_dense_linenos(spark, tmp_path):
    """Non-UTF8 multi-file import: linenos are globally dense across
    files in path order, so skip/header/bad linenos stay unambiguous."""
    d = tmp_path / "many"
    d.mkdir()
    for i, name in enumerate(["a.csv", "b.csv"]):
        with open(d / name, "wb") as f:
            body = "".join(f"f{i}r{j}\xff{j}\n" for j in range(3))
            f.write(body.encode("iso-8859-1"))
    res = csvimport(spark, str(d / "*.csv"), separator="\xff",
                    labels=["x", "y"], encoding="iso-8859-1",
                    lineno_label="ln", allow_bad=True)
    rows = sorted((r["ln"], r["x"]) for r in res.default.collect())
    assert [ln for ln, _ in rows] == [1, 2, 3, 4, 5, 6]
    assert [x for _, x in rows] == [
        "f0r0", "f0r1", "f0r2", "f1r0", "f1r1", "f1r2"]


def test_quote_free_lines_stay_jvm(spark, tmp_path):
    """Hybrid dispatch: with default quotes, a quote-free file's plan
    has a Python stage only on the (empty) quote-bearing branch — the
    split branch is JVM-side."""
    p = _write(tmp_path, "t.csv", "a,b\n1,2\n3,4\n")
    res = csvimport(spark, p, allow_bad=True)
    plan = res.default._jdf.queryExecution().executedPlan().toString()
    # the union has exactly one Arrow stage (the quoted branch);
    # the plain branch shows the JVM split
    assert plan.count("MapInPandas") == 1
    assert "split(" in plan
    assert res.default.count() == 2


def test_export_roundtrip_pathological_values(spark, tmp_path):
    """csvexport quoting parity (reference a_test_csvexport_quoting.py):
    embedded separators, quotes, and newlines survive an export->import
    round trip under lazy quoting."""
    rows = [("a,b", 'he said "hi"', "line1\nline2"),
            ("", "plain", "trailing,comma,"),
            ("'single'", '""', ",")]
    src = spark.createDataFrame(rows, "x string, y string, z string")
    out = str(tmp_path / "rt")
    csvexport(src, out)
    # embedded newlines make records span lines: multiline import
    back = csvimport(spark, out + "/*.csv", multiline=True).default
    got = sorted(tuple(r) for r in back.collect())
    assert got == sorted(rows)


def test_export_chain_roundtrip(spark, sf_dir, tmp_path):
    """Chain export (reference csvexport chains): a 3-batch chain unions
    through chain_df and exports as one CSV whose re-import equals the
    union."""
    from accelerator_spark.dataset import Dataset

    src = load(spark, sf_dir, "nation")
    prev = None
    for i in range(3):
        part = src.filter(F.col("n_nationkey") % 3 == i)
        prev = Dataset.write(part, str(tmp_path / f"b{i}"), previous=prev)
    chain = prev.chain_df(spark)
    out = str(tmp_path / "chain_csv")
    csvexport(chain, out)
    back = csvimport(spark, out + "/*.csv").default
    typed = back.select(F.col("n_nationkey").cast("bigint"), "n_name",
                        F.col("n_regionkey").cast("bigint"))
    assert datasets_equal(src, typed)


@pytest.mark.parametrize("nl_i,sep_i", [(0xfe, 44), (0x00, 9), (0xff, 0)])
def test_custom_newline_bytes(spark, tmp_path, nl_i, sep_i):
    """Reference csvimport newline= option: ANY byte terminates records
    (a_test_csvimport_separators.py sweeps \\n, \\r\\n, \\r, 0xfe);
    real \\n inside values is then ordinary data."""
    nl, sep = chr(nl_i), chr(sep_i)
    data = [["a", "b"], ["1", "x\ny"], ["2", "z"]]
    text = nl.join(sep.join(r) for r in data) + nl
    p = _write_bytes(tmp_path, f"nl{nl_i}.csv", text.encode("iso-8859-1"))
    res = csvimport(spark, p, separator=sep, newline=nl,
                    encoding="iso-8859-1", allow_bad=True, quotes=None)
    assert res.default.columns == ["a", "b"]
    got = sorted(tuple(r) for r in res.default.collect())
    assert got == [("1", "x\ny"), ("2", "z")]
    assert res.bad.count() == 0


def test_multifile_text_path_skips_each_header(spark, tmp_path):
    """Review r3: on a directory import the text path must skip EVERY
    file's header line, not just the globally first one (native reader
    parity)."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(2):
        _write(d, f"f{i}.csv", f"a,b\nx{i},1\ny{i},2\n")
    res = csvimport(spark, str(d / "*.csv"), allow_bad=True)
    vals = sorted(r["a"] for r in res.default.collect())
    assert vals == ["x0", "x1", "y0", "y1"]  # no 'a' data row


def test_native_path_rejects_malformed_quotes(spark, tmp_path):
    """Review r3: univocity's lenient unescaped-quote recovery would
    silently import what the text-path tokenizer calls bad.
    (unescapedQuoteHandling=RAISE_ERROR; univocity's one remaining
    lenient case — an unterminated quote at end-of-file — is accepted
    there but bad on the text path.)"""
    p = _write(tmp_path, "t.csv", 'a,b\n1,"mid"dle\n')
    res = csvimport(spark, p)
    with pytest.raises(Exception):
        res.default.collect()


def test_header_identical_data_row_imports_single_file(spark, tmp_path):
    """ADVICE r3 (medium): in a SINGLE-file import, a data row
    byte-identical to the header line is data — the reference imports
    it; only the header's own lineno is skipped."""
    p = _write(tmp_path, "t.csv", "a,b\n1,2\na,b\n3,4\n")
    res = csvimport(spark, p, allow_bad=True, lineno_label="ln")
    rows = {(int(r["ln"]), r["a"], r["b"]) for r in res.default.collect()}
    assert rows == {(2, "1", "2"), (3, "a", "b"), (4, "3", "4")}
    assert {r["lineno"] for r in res.skipped.collect()} == {1}


def test_multifile_linenos_path_ordered(spark, tmp_path):
    """ADVICE r3 (low): multi-file UTF-8 linenos must follow PATH order
    with per-file density, even though Spark packs input splits by size
    descending (sizes here are chosen so size order != path order).
    Later files' byte-identical header lines are skipped (multi-file
    semantics), and their linenos still count."""
    d = tmp_path / "many"
    d.mkdir()
    sizes = {"f0.csv": 2, "f1.csv": 500, "f2.csv": 50}
    for name, n in sizes.items():
        body = "".join(f"{name}_{i},{i}\n" for i in range(1, n + 1))
        _write(d, name, "a,b\n" + body)
    res = csvimport(spark, str(d) + "/*.csv", allow_bad=True,
                    lineno_label="ln")
    got = {r["a"]: int(r["ln"]) for r in res.default.collect()}
    expected, lineno = {}, 0
    for name in sorted(sizes):  # path order
        lineno += 1  # that file's header line
        for i in range(1, sizes[name] + 1):
            lineno += 1
            expected[f"{name}_{i}"] = lineno
    assert got == expected
    # the three headers: f0's by position, f1/f2's by text equality
    assert sorted(r["lineno"] for r in res.skipped.collect()) == \
        [1, sizes["f0.csv"] + 2, sizes["f0.csv"] + sizes["f1.csv"] + 3]


def test_zip_strip_dirs_basename_collision_keeps_both(spark, tmp_path):
    """Review r4: colliding basenames under strip_dirs must stay
    distinct members (reference dedupes with trailing underscores,
    a_csvimport_zip.py), not silently overwrite."""
    import zipfile

    from accelerator_spark.sources.zip import csvimport_zip

    zp = str(tmp_path / "t.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("a/x.csv", "k,v\n1,a\n")
        zf.writestr("b/x.csv", "k,v\n2,b\n")
    res = csvimport_zip(spark, zp, strip_dirs=True)
    assert set(res.members) == {"x.csv", "x.csv_"}
    got = {(r["_zip_member"], r["k"]) for r in res.chain.collect()}
    assert got == {("x.csv", "1"), ("x.csv_", "2")}


def test_zip_duplicate_member_names_keep_own_data(spark, tmp_path):
    """Review r5: a zip may legally contain several members with the
    SAME name (appended update). Name-based extraction read the LAST
    occurrence's bytes for all of them — each member must import its
    own data (reference extracts per ZipInfo)."""
    import zipfile

    from accelerator_spark.sources.zip import csvimport_zip

    zp = str(tmp_path / "dup.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("data.csv", "k,v\n1,first\n")
        zf.writestr("data.csv", "k,v\n2,second\n")
    res = csvimport_zip(spark, zp)
    assert set(res.members) == {"data.csv", "data.csv_"}
    got = {(r["_zip_member"], r["k"], r["v"]) for r in res.chain.collect()}
    assert got == {("data.csv", "1", "first"), ("data.csv_", "2", "second")}


def test_zip_chain_order_and_option_validation(spark, tmp_path):
    """Review r5: by_filename under strip_dirs sorts by the STRIPPED
    name (reference sorts the already-stripped fn); attr-marked
    directory entries (external_attr bit, no trailing slash) are
    skipped; unknown chain_by raises instead of silently using archive
    order."""
    import zipfile

    import pytest

    from accelerator_spark.sources.zip import csvimport_zip

    zp = str(tmp_path / "ord.zip")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("b/a.csv", "k\n1\n")
        zf.writestr("a/z.csv", "k\n2\n")
        info = zipfile.ZipInfo("phantomdir")  # no trailing slash
        info.external_attr = 0x40000000
        zf.writestr(info, b"")
    res = csvimport_zip(spark, zp, strip_dirs=True,
                        chain_by="by_filename")
    # stripped-name order: a.csv (from b/) before z.csv (from a/)
    assert list(res.members) == ["a.csv", "z.csv"]
    assert [r["k"] for r in res.chain.collect()] == ["1", "2"]
    with pytest.raises(ValueError, match="chain_by"):
        csvimport_zip(spark, zp, chain_by="by_fliename")


def test_zip_gzipped_member_transparent_decompression(spark, tmp_path):
    """Review r4: the glob-safe rename must keep the member's extension
    chain so Spark's extension-driven .gz decompression still fires."""
    import gzip
    import zipfile

    from accelerator_spark.sources.zip import csvimport_zip

    zp = str(tmp_path / "g.zip")
    payload = gzip.compress(b"k,v\n7,z\n")
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("shard.csv.gz", payload)
    res = csvimport_zip(spark, zp)
    rows = res.chain.collect()
    assert [(r["k"], r["v"]) for r in rows] == [("7", "z")]


def test_binary_import_recursive_and_literal_names(spark, tmp_path):
    """Review r4: binaryFile paths are NOT percent-encoded — '%'/'+'
    names import literally — and subdirectories are included."""
    from accelerator_spark.sources.media import binary_import

    (tmp_path / "train").mkdir()
    (tmp_path / "val").mkdir()
    (tmp_path / "train" / "001.jpg").write_bytes(b"a")
    (tmp_path / "val" / "001.jpg").write_bytes(b"b")
    (tmp_path / "100%.jpg").write_bytes(b"c")
    (tmp_path / "a+b.jpg").write_bytes(b"d")
    (tmp_path / ".DS_Store").write_bytes(b"e")
    (tmp_path / ".hidden.jpg").write_bytes(b"f")
    rows = binary_import(spark, str(tmp_path)).collect()
    ids = sorted(r["media_id"] for r in rows)
    # Spark's file index drops dot-prefixed names at listing time —
    # hidden files never become rows (documented in binary_import)
    assert ids == ["001", "001", "100%", "a+b"]
    paths = {r["media_path"].rsplit("/", 2)[-2] for r in rows
             if r["media_id"] == "001"}
    assert paths == {"train", "val"}
    # the stem/ext expressions themselves keep os.path.splitext
    # semantics for dotfile-ish names (review r5 — an empty media_id
    # would collide in sidecar joins if a listing path surfaced them):
    # exercise the same select on a synthetic path column
    probe = spark.createDataFrame(
        [("x/.DS_Store",), ("x/.hidden.jpg",), ("x/archive.tar.gz",)],
        "path string").withColumn("length", F.lit(0)) \
        .withColumn("modificationTime", F.current_timestamp()) \
        .withColumn("content", F.lit(b""))
    from accelerator_spark.sources.media import media_columns
    got = {r["media_id"]: r["ext"] for r in media_columns(probe).collect()}
    assert got == {".DS_Store": "", ".hidden": "jpg", "archive.tar": "gz"}


def test_multifile_differing_header_formats_skipped(spark, tmp_path):
    """Review r4: later files' headers are identified by POSITION (first
    non-comment/non-empty line per file), so a header with different
    quoting than file 1's is still skipped, not imported as data."""
    d = tmp_path / "hdrs"
    d.mkdir()
    _write(d, "f0.csv", "a,b\n1,x\n")
    _write(d, "f1.csv", '"a","b"\n2,y\n')
    res = csvimport(spark, str(d) + "/*.csv", allow_bad=True)
    rows = sorted((r["a"], r["b"]) for r in res.default.collect())
    assert rows == [("1", "x"), ("2", "y")]
    assert sorted(r["data"] for r in res.skipped.collect()) == \
        ['"a","b"', "a,b"]


def test_multifile_comment_before_header(spark, tmp_path):
    """Per-file header detection honors the comment rule: a later file
    starting with comment lines skips its real header, not the comment."""
    d = tmp_path / "cmt"
    d.mkdir()
    _write(d, "f0.csv", "a,b\n1,x\n")
    _write(d, "f1.csv", "#note\na,b\n2,y\n")
    res = csvimport(spark, str(d) + "/*.csv", allow_bad=True, comment="#")
    rows = sorted((r["a"], r["b"]) for r in res.default.collect())
    assert rows == [("1", "x"), ("2", "y")]


def test_driver_head_lines_matches_distributed_scan(spark, tmp_path):
    """Review r5: the auto-header head read moved driver-side; its line
    splitting (universal \\n/\\r\\n/\\r, custom terminators, gzip, final
    line without terminator, chunk-boundary \\r\\n) must agree exactly
    with the distributed _read_lines order it replaced."""
    import gzip

    from accelerator_spark.sources.csv import (
        _driver_head_lines, _read_lines,
    )

    d = tmp_path / "multi"
    d.mkdir()
    # file order is path-sorted; mix terminators and a gz member
    (d / "a.txt").write_bytes(b"h1,h2\r\nr1,x\rr2,y\nlast-no-term")
    with gzip.open(d / "b.txt.gz", "wb") as f:
        f.write(b"g1\ng2\n\ng4")
    (d / "c.txt").write_bytes(b"")
    got = _driver_head_lines(spark, str(d), "utf-8", "", 50)
    want = [r["value"] for r in
            _read_lines(spark, str(d), "utf-8")
            .orderBy("_lineno").collect()]
    assert got == want
    # custom single-byte terminator
    (d2 := tmp_path / "custom").mkdir()
    (d2 / "x.txt").write_bytes(b"a|b|c|")
    got2 = _driver_head_lines(spark, str(d2), "utf-8", "|", 50)
    want2 = [r["value"] for r in
             _read_lines(spark, str(d2), "utf-8", newline="|")
             .orderBy("_lineno").collect()]
    assert got2 == want2
    # n truncates
    assert _driver_head_lines(spark, str(d), "utf-8", "", 2) == want[:2]


def test_review_r5b_edges(spark, tmp_path):
    """Second-pass review fixes: (a) non-single-byte encodings skip the
    driver head probe (BOM'd separators silently mis-split); (b)
    strip_labels duplicate pairs rejected on the native path; (c)
    csvimport_zip creates a not-yet-existing extract_to; (d) a
    user-created temp view is NOT destroyed by sql()'s skip-missing
    registration."""
    import zipfile

    import pytest

    from accelerator_spark.sources.csv import (
        CsvImportError, _driver_head_lines, csvimport,
    )
    from accelerator_spark.sources.zip import csvimport_zip

    # (a) utf-16 input: probe declines, distributed path parses fine
    p16 = tmp_path / "u16.csv"
    p16.write_bytes("a;b\n1;2\n".encode("utf-16"))
    assert _driver_head_lines(spark, str(p16), "utf-16", "", 5) is None
    res = csvimport(spark, str(p16), separator=";", encoding="utf-16",
                    allow_bad=True)
    assert [tuple(r) for r in res.default.collect()] == [("1", "2")]

    # (b) post-strip duplicates rejected on the native path
    pd = tmp_path / "d.csv"
    pd.write_text("1,2\n")
    with pytest.raises(CsvImportError, match="duplicate labels"):
        csvimport(spark, str(pd), labels=["a ", "a"], strip_labels=True)

    # (c) extract_to that does not exist yet
    zp = tmp_path / "z.zip"
    with zipfile.ZipFile(zp, "w") as zf:
        zf.writestr("m.csv", "k\n7\n")
    dest = tmp_path / "extract" / "deep"
    r = csvimport_zip(spark, str(zp), extract_to=str(dest))
    assert [row["k"] for row in r.chain.collect()] == ["7"]

    # (d) user-created view survives a skip-missing registration
    from accelerator_spark.sqlapi import sql

    spark.createDataFrame([(1,)], "n int").createOrReplaceTempView("part")
    empty = tmp_path / "nodata"
    empty.mkdir()
    out = sql(spark, str(empty), "SELECT n FROM part")
    assert out.collect()[0]["n"] == 1
    spark.catalog.dropTempView("part")
