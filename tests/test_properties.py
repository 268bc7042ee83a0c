"""Property-based tests (hypothesis) — model-checked semantics.

The reference has no randomized testing (SURVEY §5 'Absent'); these
close that gap. Each property compares a Spark operator against an
independent pure-Python model on arbitrary generated inputs.
``derandomize=True`` keeps CI deterministic; examples are small because
each one runs a real (local) Spark job.
"""

import re

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from accelerator_spark.functions.conversions import convert_expr
from accelerator_spark.operators.checksum import checksum
from accelerator_spark.operators.partition import salted_join
from accelerator_spark.operators.sort import dataset_sort

PROP = settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)

I64_MIN, I64_MAX = -(2**63), 2**63 - 1

int_strings = st.one_of(
    st.integers(min_value=-(2**70), max_value=2**70).map(str),
    st.text(alphabet="0123456789+- .xeAf", max_size=10),
    st.just(""),
)


def _model_int64_10(s: str):
    t = s.strip()
    if t == "":
        return 0  # strtol(""): no digits, endptr at NUL -> accepted as 0
    if not re.fullmatch(r"[+-]?[0-9]+", t):
        return None
    v = int(t)
    return v if I64_MIN <= v <= I64_MAX else None


@PROP
@given(st.lists(int_strings, max_size=12))
def test_prop_int64_10_matches_python_model(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["o"] for r in
           df.select(convert_expr("s", "int64_10").alias("o")).collect()]
    assert sorted(got, key=repr) == sorted(
        (_model_int64_10(v) for v in vals), key=repr)


bool_strings = st.one_of(
    st.sampled_from(["false", "0", "no", "off", "nil", "null", "", "true",
                     "1", "yes", "ON", "  False ", "NULL", "x"]),
    st.text(max_size=6),
)


@PROP
@given(st.lists(bool_strings, max_size=12))
def test_prop_strbool_matches_python_model(spark, vals):
    false_set = {"false", "0", "no", "off", "nil", "null", ""}
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["o"] for r in
           df.select(convert_expr("s", "strbool").alias("o")).collect()]
    want = [v.strip().lower() not in false_set for v in vals]
    assert sorted(got) == sorted(want)


rows = st.lists(
    st.tuples(st.integers(min_value=-3, max_value=3), st.integers(0, 10**6)),
    max_size=20,
)


@PROP
@given(rows, st.booleans())
def test_prop_sort_is_stable(spark, data, descending):
    data = [(k, i) for i, (k, _) in enumerate(data)]  # lineno = input order
    df = spark.createDataFrame(data or [], "k int, lineno long")
    got = [(r["k"], r["lineno"]) for r in
           dataset_sort(df, "k", descending=descending, across_slices=True,
                        stable_col="lineno").collect()]
    want = sorted(data, key=lambda t: t[0], reverse=descending)
    assert got == want  # equal keys keep input order on both sides


@PROP
@given(rows, st.randoms())
def test_prop_checksum_order_invariant(spark, data, rnd):
    df1 = spark.createDataFrame(data or [], "k int, v long")
    shuffled = list(data)
    rnd.shuffle(shuffled)
    df2 = spark.createDataFrame(shuffled or [], "k int, v long").repartition(3)
    assert checksum(df1) == checksum(df2)
    if data:
        extra = spark.createDataFrame([(99, 12345)], "k int, v long")
        assert checksum(df1.union(extra)) != checksum(df1)


join_rows = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-100, 100)), max_size=15)


@PROP
@given(join_rows, join_rows, st.integers(1, 5),
       st.sampled_from(["inner", "left"]))
def test_prop_salted_join_equals_plain_join(spark, big, small, salts, how):
    bdf = spark.createDataFrame(big or [], "k int, v long")
    # dedup small-side keys (lookup-table shape)
    seen, srows = set(), []
    for k, w in small:
        if k not in seen:
            seen.add(k)
            srows.append((k, w))
    sdf = spark.createDataFrame(srows or [], "k int, w long")
    plain = sorted(map(tuple, bdf.join(sdf, "k", how).collect()))
    salted = sorted(map(tuple, salted_join(bdf, sdf, "k", how, salts).collect()))
    assert plain == salted


@PROP
@given(join_rows)
def test_prop_hashpart_agg_invariant(spark, data):
    from accelerator_spark.operators.partition import hashpart
    df = spark.createDataFrame(data or [], "k int, v long")
    plain = sorted(map(tuple,
        df.groupBy("k").agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()))
    parted = sorted(map(tuple,
        hashpart(df, "k", 5).groupBy("k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")).collect()))
    assert plain == parted


cdc_base = st.lists(
    st.tuples(st.integers(0, 9), st.integers(-100, 100)),
    max_size=10, unique_by=lambda t: t[0])
cdc_changes = st.lists(
    st.tuples(st.integers(0, 12), st.sampled_from(["U", "D"]),
              st.integers(-100, 100)),
    max_size=8, unique_by=lambda t: t[0])


@PROP
@given(cdc_base, cdc_changes)
def test_prop_apply_changes_matches_dict_model(spark, base, changes):
    """apply_changes ≡ the obvious dict fold: upserts replace/insert,
    deletes remove, untouched keys survive."""
    from accelerator_spark.operators.merge import apply_changes

    bdf = spark.createDataFrame(base or [], "k int, v long")
    cdf = spark.createDataFrame(
        [(k, v, op) for k, op, v in changes] or [], "k int, v long, op string")
    model = dict(base)
    for k, op, v in changes:
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    got = {r.k: r.v for r in apply_changes(bdf, cdf, "k").collect()}
    assert got == model


# ---------------------------------------------------------------- round-2b

@given(rows=st.lists(
    st.tuples(st.floats(min_value=0, max_value=100, allow_nan=False),
              st.integers(min_value=0, max_value=50)),
    min_size=1, max_size=40))
@PROP
def test_skyline_matches_bruteforce_model(spark, rows):
    """skyline() == the O(n²) definition, on arbitrary (price, size)
    sets including duplicates."""
    from accelerator_spark.operators.analytics import skyline

    df = spark.createDataFrame(
        [(i, float(p), int(s)) for i, (p, s) in enumerate(rows)],
        "pk long, price double, size long").repartition(3)
    got = {r["pk"] for r in
           skyline(df, minimize=["price"], maximize=["size"]).collect()}
    want = set()
    for i, (p, s) in enumerate(rows):
        dominated = any(
            (q <= p and t >= s and (q < p or t > s))
            for j, (q, t) in enumerate(rows) if j != i)
        if not dominated:
            want.add(i)
    assert got == want


@given(keys=st.lists(st.integers(min_value=0, max_value=9),
                     min_size=1, max_size=60),
       threshold=st.integers(min_value=1, max_value=12))
@PROP
def test_heavy_hitters_matches_counter_model(spark, keys, threshold):
    from collections import Counter

    from accelerator_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(4)
    got = {r["k"]: r["cnt"] for r in
           heavy_hitters(df, "k", threshold).collect()}
    want = {k: c for k, c in Counter(keys).items() if c >= threshold}
    assert got == want


@given(vals=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=50, unique=True))
@PROP
def test_assign_global_ids_matches_sorted_enumeration(spark, vals):
    from accelerator_spark.operators.partition import assign_global_ids

    df = spark.createDataFrame([(v,) for v in vals], "k long").repartition(3)
    got = {r["k"]: r["rid"] for r in
           assign_global_ids(df, "k", "rid", num_partitions=4).collect()}
    want = {v: i for i, v in enumerate(sorted(vals))}
    assert got == want


@given(vals=st.lists(st.floats(min_value=-100, max_value=100,
                               allow_nan=False),
                     min_size=3, max_size=40))
@PROP
def test_winsorize_bounds_and_interior_identity(spark, vals):
    """Winsorized values stay inside [p05, p95] and interior values are
    untouched (clamp-only, never rescales)."""
    from accelerator_spark.operators.analytics import winsorize

    df = spark.createDataFrame([("g", float(v)) for v in vals],
                               "g string, v double")
    rows = winsorize(df, "v", ["g"], 0.05, 0.95).collect()
    assert len(rows) == len(vals)
    lo = min(r["v_winsor"] for r in rows)
    hi = max(r["v_winsor"] for r in rows)
    for r in rows:
        assert lo <= r["v_winsor"] <= hi
        if lo < r["v"] < hi:
            assert r["v_winsor"] == r["v"]


# --- csv tokenizer round-trip (pure Python, no Spark job per example) ---

_field_chars = st.text(
    alphabet=list("abc,;'\"| \t0\xff"), min_size=0, max_size=8)


@settings(max_examples=300, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(fields=st.lists(_field_chars, min_size=1, max_size=5),
       sep=st.sampled_from([",", ";", "|", "\t", "\x00", "\xff"]),
       quote=st.sampled_from(["'", '"', True]))
def test_tokenizer_quote_roundtrip(fields, sep, quote):
    """Writing fields with reference quoting (wrap + double internal
    quotes) then tokenizing must reproduce them exactly — for any
    separator, either quote kind, and quotes=True (both kinds)."""
    from accelerator_spark.sources.csv import _tokenize

    q = "'" if quote is True else quote
    qchars = "'\"" if quote is True else quote
    line = sep.join(q + f.replace(q, q + q) + q for f in fields)
    got = _tokenize(line, sep, qchars)
    assert got == fields, (line, got, fields)


@settings(max_examples=300, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(fields=st.lists(
    st.text(alphabet=list("abc 0xyz.-"), min_size=0, max_size=8)
    .filter(lambda s: not s.startswith(("'", '"'))),
    min_size=1, max_size=5),
    sep=st.sampled_from([",", ";", "|", "\x00"]))
def test_tokenizer_unquoted_roundtrip(fields, sep):
    """Unquoted fields (no leading quote char, no separator inside)
    split exactly, matching the JVM split branch's semantics."""
    from accelerator_spark.sources.csv import _tokenize

    line = sep.join(fields)
    got = _tokenize(line, sep, "'\"")
    assert got == fields, (line, got, fields)


@settings(max_examples=200, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(junk=st.text(alphabet=list("a'\",;x"), min_size=1, max_size=12),
       sep=st.sampled_from([",", ";"]))
def test_tokenizer_never_crashes_and_bad_is_none(junk, sep):
    """Arbitrary quote soup either tokenizes or returns None (bad line)
    — never raises, never returns a non-list."""
    from accelerator_spark.sources.csv import _tokenize

    got = _tokenize(junk, sep, "'\"")
    assert got is None or isinstance(got, list)


@PROP
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=1,
             max_size=60),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=2, max_value=9),
)
def test_prop_exact_ntile_matches_python_model(spark, vals, n_tiles,
                                               n_buckets):
    """exact_ntile == the textbook ntile over (v, k) for arbitrary tie
    patterns, tile counts, and bucket counts (incl. n_buckets > rows
    and heavily-tied domains that trigger the de-skew sub-bucketing)."""
    from accelerator_spark.operators.partition import exact_ntile

    rows = [(float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "v double, k long")
    got = {(r["v"], r["k"]): r["tile"]
           for r in exact_ntile(df, "v", n_tiles, "k", "tile",
                                n_buckets=n_buckets).collect()}
    order = sorted(rows)
    n, q, rmod = len(order), len(order) // n_tiles, len(order) % n_tiles
    want = {}
    for rank, (v, k) in enumerate(order, start=1):
        if q == 0:
            want[(v, k)] = rank
        elif rank <= rmod * (q + 1):
            want[(v, k)] = -(-rank // (q + 1))
        else:
            want[(v, k)] = rmod + -(-(rank - rmod * (q + 1)) // q)
    assert got == want


# --- canonicalize_url vs an independent Python model (VERDICT r4 #4) ---

def _model_canon_url(s: str) -> str:
    """Straight-Python re-implementation of the canonicalize_url spec
    (operators/text.py): trim spaces, drop #fragment, lowercase
    scheme+authority with default-port strip, remove tracking params,
    sort survivors, drop empty query and trailing path slash. Kept
    deliberately structure-free (plain string surgery) so it cannot
    share bugs with the Spark expression chain."""
    u = s.strip(" ")  # F.trim strips ASCII spaces only
    u = re.sub(r"#.*$", "", u)
    m = re.match(r"([a-zA-Z][a-zA-Z0-9+.-]*://[^/?]*)", u)
    head = m.group(1) if m else ""
    rest = u[len(head):]
    h = head.lower()
    if h.startswith("http://"):
        h = re.sub(r":80$", "", h)
    if h.startswith("https://"):
        h = re.sub(r":443$", "", h)
    path = re.match(r"([^?]*)", rest).group(1)
    query = rest[len(path) + 1:] if len(rest) > len(path) else ""
    params = sorted(
        p for p in query.split("&")
        if p and not re.match(r"(utm_[^=]*|ref|fbclid|gclid)=", p))
    # unconditional (review r5): 'http://x.com' and 'http://x.com/'
    # must share one canonical form
    path = re.sub(r"/$", "", path)
    q = "&".join(params)
    return h + path + (("?" + q) if q else "")


_EDGE_URLS = [
    # repeated params / sort stability
    "http://a.com/p?b=2&a=1&b=1",
    # %-encoded separators stay opaque (no decode before filtering)
    "https://A.COM/x?a=%26b%3D2&utm_source=x",
    # a param NAMED exactly utm_ / ref — filtered only with '='
    "http://h/?utm_=1&utm_&ref=r&ref&refx=1",
    # empty query / bare '?'
    "http://host/path?",
    "http://host/?&&",
    # userinfo@ is part of the authority (lowercased!)
    "http://User:Pw@Host.Com:80/Keep/Case/",
    # IPv6 authorities with default and non-default ports
    "http://[2001:DB8::1]:80/a",
    "https://[::1]:443/",
    "https://[::1]:8443/x?z=1&y=2",
    # uppercase %-escapes preserved verbatim
    "HTTP://EX.COM/%2F%2f?A=%2B",
    # trailing slash rules: '/' alone AND '/x/' lose it (review r5:
    # bare-domain vs root-slash is the most common duplicate pair)
    "http://e.com/",
    "http://e.com",
    "http://e.com/x/",
    # fragment before query, fragment only
    "http://e.com/p#frag?notaquery=1",
    "#onlyfrag",
    # scheme-less and garbage inputs still canonicalize structurally
    "no scheme here?utm_a=1&keep=2",
    "",
    "   ",
    "ftp://Mixed.Case:21/f/",
]

url_strings = st.one_of(
    st.sampled_from(_EDGE_URLS),
    # random soup over URL-significant chars (no raw newlines — out of
    # spec for URLs and Java/Python $ semantics differ there)
    st.text(alphabet=list("abXZ09:/?#&=%[]@._-~+ "), max_size=40),
)


@PROP
@given(st.lists(url_strings, min_size=1, max_size=18))
def test_prop_canonicalize_url_matches_python_model(spark, vals):
    from accelerator_spark.operators.text import canonicalize_url

    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = [r["o"] for r in
           df.select(canonicalize_url(F.col("s")).alias("o")).collect()]
    want = [_model_canon_url(v) for v in vals]
    assert sorted(got) == sorted(want), list(zip(vals, want))


# --- datetime conversion vs Python's own strptime (review r5) ---

_DT_FORMATS = [
    # literal words were the round-5 bug ('at' quoted as a't); sweep
    # multi-letter literals, month names, 12h clock, day-of-year.
    # Only FULL-DATE formats: for date-less inputs Python strptime
    # defaults to 1900-01-01 while Spark defaults to 1970-01-01 — a
    # documented engine seam, not a parse bug (found by this test).
    "%Y-%m-%d %H:%M:%S",
    "%d %B %Y at %H:%M",
    "%d/%b/%Y",
    "%Y.%j",
    "%d %B %Y %I %p",
    "%Y-%m-%d %H hours %M minutes",
    "%Y%m%dT%H%M%S",
]


@PROP
@given(
    st.lists(
        st.tuples(
            st.sampled_from(_DT_FORMATS),
            st.datetimes(
                min_value=__import__("datetime").datetime(1905, 1, 2),
                max_value=__import__("datetime").datetime(2261, 12, 30)),
        ),
        min_size=1, max_size=6,
    )
)
def test_prop_datetime_parse_matches_python_strptime(spark, cases):
    """Format a random datetime with Python strftime, parse the string
    back through convert_expr('datetime:<fmt>'), and require Python's
    own strptime answer. Formats that drop fields (e.g. date-only)
    round-trip to strptime's result, not the original value."""
    import datetime as dt

    rows = []
    for i, (fmt, d) in enumerate(cases):
        d = d.replace(microsecond=0)
        s = d.strftime(fmt)
        want = dt.datetime.strptime(s, fmt)
        rows.append((i, fmt, s, want))
    df = spark.createDataFrame(
        [(i, s) for i, _, s, _ in rows], "i long, raw string")
    got = {}
    for i, fmt, s, want in rows:
        one = df.filter(F.col("i") == i).select(
            convert_expr("raw", f"datetime:{fmt}").alias("v")).collect()
        got[i] = one[0]["v"]
    for i, fmt, s, want in rows:
        assert got[i] == want, (fmt, s, got[i], want)


# --- csvexport -> csvimport round trip on hostile cell content ---

_cell = st.text(
    alphabet=list("ab,;\"'|\t %&=\\") + ["é"], max_size=8)


@PROP
@given(cells=st.lists(st.tuples(_cell, _cell), min_size=1, max_size=10))
def test_prop_csv_roundtrip_preserves_cells(spark, tmp_path_factory, cells):
    """Arbitrary cell content — embedded separators, both quote kinds,
    backslashes, unicode — must survive csvexport -> csvimport exactly
    (quote-doubling escape; all-string schema)."""
    from accelerator_spark.operators.checksum import datasets_equal
    from accelerator_spark.sources.csv import csvexport, csvimport

    out = str(tmp_path_factory.mktemp("csv_prop"))
    df = spark.createDataFrame(cells, "x string, y string")
    csvexport(df, out)
    back = csvimport(spark, out + "/*.csv").default
    assert datasets_equal(df, back, ["x", "y"])


# --- exact_ntile vs the single-task window form on arbitrary data ---

@PROP
@given(
    st.lists(st.integers(min_value=0, max_value=4), min_size=2,
             max_size=60),
    st.integers(min_value=1, max_value=7),
)
def test_prop_exact_ntile_matches_window(spark, order_vals, n_tiles):
    """exact_ntile (bucketed, no global window) must be row-identical
    to ntile() OVER (ORDER BY v, id) for arbitrary tie patterns and
    tile counts."""
    from pyspark.sql import Window

    from accelerator_spark.operators.partition import exact_ntile

    rows = [(i, v) for i, v in enumerate(order_vals)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(4)
    got = {(r["id"], r["tile"]) for r in
           exact_ntile(df, "v", n_tiles, "id", "tile",
                       n_buckets=8).collect()}
    want = {(r["id"], r["t"]) for r in
            df.withColumn("t", F.ntile(n_tiles).over(
                Window.orderBy("v", "id"))).collect()}
    assert got == want


# --- corpus line dedup vs a pure-Python first-occurrence model ---

_line_txt = st.text(alphabet=list("ab é"), max_size=6)


@PROP
@given(
    docs=st.lists(
        st.one_of(st.none(),
                  st.lists(_line_txt, max_size=5).map("\n".join)),
        min_size=1, max_size=8),
    min_len=st.integers(min_value=1, max_value=4),
)
def test_prop_dedup_lines_corpus_matches_model(spark, docs, min_len):
    """dedup_lines_corpus ≡ the obvious model: every line whose TRIMMED
    length >= min_len survives only at its first (doc_id, position)
    occurrence corpus-wide; shorter lines always survive; NULL text is
    one empty line; every input doc appears exactly once."""
    from accelerator_spark.operators.text import dedup_lines_corpus

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {r["doc_id"]: (r["lines_in"], r["lines_kept"], r["text_dedup"])
           for r in dedup_lines_corpus(df, min_line_len=min_len).collect()}

    seen = set()
    want = {}
    for i, t in enumerate(docs):
        lines = (t if t is not None else "").split("\n")
        kept = []
        for ln in lines:
            if len(ln.strip()) < min_len:
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        want[i] = (len(lines), len(kept), "\n".join(kept))
    assert got == want


# --- chunk_tokens vs the published chunking formula ---

_doc_txt = st.one_of(
    st.none(), st.just(""), st.just("   "),
    st.lists(st.text(alphabet="abc", min_size=1, max_size=3),
             max_size=30).map(" ".join))


@PROP
@given(docs=st.lists(_doc_txt, min_size=1, max_size=6),
       size=st.integers(min_value=1, max_value=7),
       stride_off=st.integers(min_value=0, max_value=6))
def test_prop_chunk_tokens_matches_model(spark, docs, size, stride_off):
    """chunk_tokens ≡ the model: n_chunks = 0 for empty docs, else
    1 + ceil((n-size)/stride) for n > size else 1; chunk i holds tokens
    [i*stride, i*stride+size); every token lands in >= 1 chunk."""
    import math

    from accelerator_spark.operators.text import chunk_tokens

    stride = max(1, size - stride_off)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = {}
    for r in chunk_tokens(df, size=size, stride=stride).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_index"]] = list(r["chunk_toks"])
    want = {}
    for i, t in enumerate(docs):
        toks = (t or "").split() or None
        if not toks:
            continue
        n = len(toks)
        nc = 1 if n <= size else 1 + math.ceil((n - size) / stride)
        want[i] = {c: toks[c * stride:c * stride + size] for c in range(nc)}
    assert got == want


@PROP
@given(st.lists(st.integers(min_value=0, max_value=10**6),
                min_size=1, max_size=25, unique=True),
       st.integers(min_value=1, max_value=20))
def test_prop_pack_sequences_partition_invariant(spark, ids, budget):
    """Sequence packing must assign the SAME (bucket, seq_id) to every
    doc regardless of physical partitioning — the reproducibility
    contract that makes rebuilt corpora byte-identical."""
    from accelerator_spark.operators.text import pack_sequences

    rows = [(i, "tok " * (i % 5 + 1)) for i in ids]
    a = spark.createDataFrame(rows, "doc_id long, text string").repartition(2)
    b = spark.createDataFrame(rows, "doc_id long, text string").repartition(9)
    pa = {(r["doc_id"], r["bucket"], r["seq_id"]) for r in
          pack_sequences(a, "doc_id", "text", budget=budget, buckets=4).collect()}
    pb = {(r["doc_id"], r["bucket"], r["seq_id"]) for r in
          pack_sequences(b, "doc_id", "text", budget=budget, buckets=4).collect()}
    assert pa == pb


# --- as-of join vs the obvious per-row model ---

@PROP
@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
                  min_size=1, max_size=12),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20),
                             st.integers(-50, 50)),
                   max_size=12),
)
def test_prop_asof_join_matches_model(spark, left, right):
    """asof_join ≡ per left row, the value of the LATEST right row with
    right.on <= left.on in the same group (ties on `on` broken by the
    tiebreak column, highest wins via last-in-order)."""
    from accelerator_spark.operators.merge import asof_join

    ldf = spark.createDataFrame(
        [(i, g, t) for i, (g, t) in enumerate(left)],
        "lid long, g int, ts long")
    rdf = spark.createDataFrame(
        [(g, t, v, j) for j, (g, t, v) in enumerate(right)],
        "g int, ts long, v long, rid long")
    got = {r["lid"]: r["val"] for r in
           asof_join(ldf, rdf, by="g", on="ts",
                     carry={"v": "val"}, tiebreak="rid").collect()}
    want = {}
    for i, (g, t) in enumerate(left):
        cands = [(rt, j, v) for j, (rg, rt, v) in enumerate(right)
                 if rg == g and rt <= t]
        want[i] = max(cands)[2] if cands else None
    assert got == want


@PROP
@given(st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 5), st.integers(-99, 99)),
    min_size=1, max_size=15))
def test_prop_compact_latest_matches_model(spark, rows):
    """compact_latest ≡ keep the row with max (order, tiebreak) per
    key."""
    from accelerator_spark.operators.merge import compact_latest

    df = spark.createDataFrame(
        [(k, o, v, i) for i, (k, o, v) in enumerate(rows)],
        "k int, ord int, v long, tb long")
    got = {(r["k"], r["ord"], r["v"], r["tb"]) for r in
           compact_latest(df, ["k"], "ord", ["tb"]).collect()}
    best = {}
    for i, (k, o, v) in enumerate(rows):
        if k not in best or (o, i) > (best[k][1], best[k][3]):
            best[k] = (k, o, v, i)
    assert got == set(best.values())


# --- graph / sketch invariants on random inputs ---

_edges = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(
        lambda t: t[0] != t[1]).map(lambda t: (min(t), max(t))),
    min_size=1, max_size=20)


@PROP
@given(_edges)
def test_prop_triangle_count_matches_bruteforce(spark, pairs):
    """triangle_count ≡ counting {a<b<c} with all three edges present,
    on arbitrary small graphs (duplicate edges deduped)."""
    from itertools import combinations

    from accelerator_spark.operators.graph import triangle_count

    uniq = sorted(set(pairs))
    df = spark.createDataFrame(uniq, "src int, dst int")
    row = triangle_count(df).collect()[0]
    es = set(uniq)
    nodes = sorted({n for e in uniq for n in e})
    want = sum(1 for a, b, c in combinations(nodes, 3)
               if (a, b) in es and (b, c) in es and (a, c) in es)
    assert row["n_triangles"] == want
    assert row["n_nodes"] == len(nodes) and row["n_edges"] == len(es)


@PROP
@given(_edges)
def test_prop_connected_components_matches_union_find(spark, pairs):
    """connected_components ≡ union-find with min-id labels."""
    from accelerator_spark.operators.dedup import connected_components

    df = spark.createDataFrame(pairs, "doc_a int, doc_b int")
    got = {(r["node"], r["component"]) for r in
           connected_components(df).collect()}
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


@PROP
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 10**6)),
                min_size=1, max_size=40))
def test_prop_bitmap_distinct_is_exact(spark, rows):
    """bitmap_distinct ≡ len(set) per group, merged or not."""
    from accelerator_spark.operators.sketches import bitmap_distinct

    df = spark.createDataFrame(
        [(g, k, k % 3) for g, k in rows], "g int, k long, day int")
    want = {}
    for g, k in rows:
        want.setdefault(g, set()).add(k)
    got1 = {r["g"]: r["distinct_count"] for r in
            bitmap_distinct(df, "k", ["g"]).collect()}
    got2 = {r["g"]: r["distinct_count"] for r in
            bitmap_distinct(df, "k", ["g"], merge_cols=["day"]).collect()}
    assert got1 == got2 == {g: len(s) for g, s in want.items()}


# --- curation operators vs Python models ---

_word = st.text(alphabet="abA.@0-", min_size=1, max_size=4)
_short_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)


@PROP
@given(train=st.lists(_short_doc, min_size=1, max_size=8),
       held=st.lists(_short_doc, min_size=1, max_size=4),
       n=st.integers(min_value=2, max_value=4))
def test_prop_decontaminate_matches_model(spark, train, held, n):
    """decontaminate ≡ the model: drop a train doc iff it shares any
    word n-gram with the held-out set, OR (short held-out item) the
    whitespace-collapsed item appears token-aligned inside it."""
    from accelerator_spark.operators.dedup import decontaminate

    tdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train)], "doc_id long, text string")
    hdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(held)],
        "doc_id long, text string")
    got = {r["doc_id"] for r in
           decontaminate(tdf, hdf, n=n).select("doc_id").collect()}

    def grams(t):
        toks = t.split()
        return {" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)} if len(toks) >= n else set()

    def norm(t):
        return " ".join(t.split())

    hg = set().union(*(grams(t) for t in held)) if held else set()
    shorts = {norm(t) for t in held
              if len(t.split()) < n and norm(t) != ""}
    want = set()
    for i, t in enumerate(train):
        contaminated = bool(grams(t) & hg)
        padded = f" {norm(t)} "
        if not contaminated:
            contaminated = any(f" {s} " in padded for s in shorts)
        if not contaminated:
            want.add(i)
    assert got == want


@PROP
@given(st.lists(st.one_of(st.none(), _short_doc), min_size=1, max_size=12))
def test_prop_exact_dedup_matches_model(spark, docs):
    """exact_dedup ≡ min-id + count per normalized text; NULL rows
    excluded."""
    from accelerator_spark.operators.dedup import exact_dedup, norm_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    # the operator groups on fingerprint(norm_text); model groups on the
    # Spark-computed normalized form so only the dedup LOGIC is at test
    normed = {r["doc_id"]: r["nt"] for r in df.filter(F.col("text").isNotNull())
              .select("doc_id", norm_text(F.col("text")).alias("nt")).collect()}
    groups = {}
    for i, t in sorted(normed.items()):
        groups.setdefault(t, []).append(i)
    want = {(min(ids), len(ids)) for ids in groups.values()}
    got = {(r["keep_doc_id"], r["n_copies"]) for r in exact_dedup(df).collect()}
    assert got == want


_pii_tok = st.sampled_from(
    ["a@ex.co", "1.2.3.4", "555-123-4567", "a.b", "x@y", "999.999.999.999",
     "a", "..", "@", "-", "0"])


@PROP
@given(st.lists(st.lists(_pii_tok, max_size=5).map(" ".join), max_size=8))
def test_prop_redact_pii_matches_python_re(spark, texts):
    """redact_pii ≡ applying the SAME RE2-safe patterns with Python re
    in PII_ORDER."""
    import re as _re

    from accelerator_spark.operators.text import (
        PII_ORDER, PII_PATTERNS, redact_pii,
    )

    df = spark.createDataFrame([(t,) for t in texts] or [("",)], "t string")
    got = [r["o"] for r in df.select(redact_pii(F.col("t")).alias("o")).collect()]
    def model(t):
        for k in PII_ORDER:
            t = _re.sub(PII_PATTERNS[k], f"<{k.upper()}>", t)
        return t
    want = [model(t) for t in (texts or [""])]
    assert sorted(got) == sorted(want)


# --- planted-duplicate guarantees for the signature dedup tiers ---

@PROP
@given(st.lists(st.lists(st.sampled_from("abcdef"), min_size=4,
                          max_size=12).map(" ".join),
                min_size=2, max_size=6),
       st.integers(min_value=0, max_value=2))
def test_prop_identical_docs_always_pair(spark, texts, dup_idx):
    """Soundness floor for minhash LSH and simhash blocking: two docs
    with IDENTICAL text must always surface as a candidate pair, for
    any corpus around them."""
    from accelerator_spark.operators.dedup import (
        minhash_lsh_candidates, simhash_near_pairs,
    )

    dup_idx = dup_idx % len(texts)
    rows = [(i, t) for i, t in enumerate(texts)]
    rows.append((900, texts[dup_idx]))  # the planted twin
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mh = {(r["doc_a"], r["doc_b"]) for r in
          minhash_lsh_candidates(df, num_hashes=8, bands=4).collect()}
    assert (dup_idx, 900) in mh
    sh = {(r["doc_a"], r["doc_b"]) for r in
          simhash_near_pairs(df, bits=16, max_hamming=1).collect()}
    assert (dup_idx, 900) in sh


@PROP
@given(st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
                max_size=30, unique=True),
       st.integers(min_value=1, max_value=3))
def test_prop_hash_split_total_and_invariant(spark, ids, seed_shift):
    """hash_split: every row lands in exactly one split, placement
    depends only on the id value (same id -> same split across
    partitionings and corpus compositions)."""
    from accelerator_spark.operators.partition import hash_split

    w = {"train": 0.7, "val": 0.2, "test": 0.1}
    df = spark.createDataFrame([(i,) for i in ids], "id long")
    a = {r["id"]: r["split"] for r in
         hash_split(df.repartition(2), "id", w).collect()}
    assert set(a) == set(ids)  # exactly one split per row
    # same ids inside a DIFFERENT corpus + partitioning: placement fixed
    extra = spark.createDataFrame(
        [(i + 2_000_000,) for i in range(seed_shift * 5)], "id long")
    b = {r["id"]: r["split"] for r in
         hash_split(df.unionByName(extra).repartition(7), "id", w).collect()
         if r["id"] in a}
    assert b == a
    assert set(a.values()) <= set(w)


# --- sampling / layout invariants ---

@PROP
@given(st.lists(st.tuples(st.integers(0, 2),
                          st.integers(0, 10**6)),
                min_size=1, max_size=30,
                unique_by=lambda t: t[1]),
       st.integers(min_value=1, max_value=4))
def test_prop_per_key_sample_cap_and_determinism(spark, rows, n):
    """per_key_sample: at most n rows per key, kept ⊆ input, and the
    kept set depends only on the ids present — identical across
    partitionings."""
    from accelerator_spark.operators.partition import per_key_sample

    df = spark.createDataFrame(rows, "k int, id long")
    a = {(r["k"], r["id"]) for r in
         per_key_sample(df.repartition(2), "k", n, "id").collect()}
    b = {(r["k"], r["id"]) for r in
         per_key_sample(df.repartition(9), "k", n, "id").collect()}
    assert a == b
    assert a <= set(rows)
    from collections import Counter
    per_k = Counter(k for k, _ in a)
    want_k = Counter(k for k, _ in rows)
    for k, c in want_k.items():
        assert per_k[k] == min(n, c)


@PROP
@given(st.lists(st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
                min_size=1, max_size=40))
def test_prop_zorder_preserves_content(spark, rows):
    """zorder_layout is a pure REORDERING: content (multiset of rows)
    is untouched for arbitrary value distributions incl. all-equal."""
    from accelerator_spark.operators.checksum import checksum
    from accelerator_spark.operators.partition import zorder_layout

    df = spark.createDataFrame(rows, "x int, y int").repartition(3)
    out = zorder_layout(df, ["x", "y"], bits=3, num_partitions=2)
    assert checksum(out) == checksum(df)


@PROP
@given(st.lists(st.lists(st.sampled_from("abc"), max_size=4).map(" ".join),
                max_size=5).map("\n".join),
       st.integers(min_value=1, max_value=3))
def test_prop_clean_lines_matches_model(spark, text, min_words):
    """clean_lines ≡ keep lines with >= min_words whitespace words."""
    from accelerator_spark.operators.text import clean_lines

    df = spark.createDataFrame([(text,)], "text string")
    r = clean_lines(df, min_words=min_words).collect()[0]
    lines = text.split("\n")
    kept = [ln for ln in lines if len(ln.split()) >= min_words]
    assert r["lines_in"] == len(lines)
    assert r["lines_kept"] == len(kept)
    assert r["text_clean"] == "\n".join(kept)


# -- CSV tokenizer vs Python's csv module (VERDICT r5 #6) ---------------

_CSV_SEPS = [",", ";", "\t", "|", ":", "~"]
_CSV_QUOTES = ['"', "'", "`"]
_field_text = st.text(
    alphabet=st.sampled_from(list("ab,;|:~'\"` \t\r")), max_size=8)


def _encode_line(row, sep, quote, quoting):
    import csv
    import io

    buf = io.StringIO()
    csv.writer(buf, delimiter=sep, quotechar=quote, doublequote=True,
               quoting=quoting, lineterminator="\n").writerow(row)
    return buf.getvalue().rstrip("\n")


@PROP
@given(st.data())
def test_prop_csv_tokenizer_matches_csv_module(data):
    """_tokenize ≡ csv.reader on properly-encoded single-line records:
    random sep x quote x payloads containing separators, quotes (so
    quote-doubling), and whitespace, encoded by csv.writer under both
    QUOTE_ALL and QUOTE_MINIMAL. Locks the last hand-written parser in
    the repo to an independent implementation."""
    import csv

    from accelerator_spark.sources.csv import _tokenize

    sep = data.draw(st.sampled_from(_CSV_SEPS))
    quote = data.draw(st.sampled_from(_CSV_QUOTES))
    row = data.draw(st.lists(_field_text, min_size=1, max_size=6))
    # \r\n inside a field would need the multiline reassembly layer
    # (covered by the csvimport matrix); the tokenizer itself is
    # line-scoped, so strip record terminators from the payload
    row = [f.replace("\n", " ").replace("\r", " ") for f in row]
    for quoting in (csv.QUOTE_ALL, csv.QUOTE_MINIMAL):
        if quoting == csv.QUOTE_MINIMAL and row == [""]:
            # Python's own writer/reader disagree here: writerow([""])
            # minimal-quotes to an empty line, which reader returns as
            # []. The reference tokenizer (like the reference engine)
            # reads an empty line as one empty field.
            continue
        line = _encode_line(row, sep, quote, quoting)
        mine = _tokenize(line, sep, quote)
        theirs = next(csv.reader([line], delimiter=sep, quotechar=quote,
                                 doublequote=True))
        assert mine == theirs == row, (sep, quote, quoting, line)


@PROP
@given(st.data())
def test_prop_csv_tokenizer_unquoted_is_split(data):
    """Without quote chars in play, the tokenizer is exactly str.split
    on the separator (including empty fields and trailing separators)."""
    from accelerator_spark.sources.csv import _tokenize

    sep = data.draw(st.sampled_from(_CSV_SEPS))
    parts = data.draw(st.lists(
        st.text(alphabet=st.sampled_from("abc \t"), max_size=5),
        min_size=1, max_size=6))
    line = sep.join(parts)
    assert _tokenize(line, sep, "") == line.split(sep)
    # with quoting enabled but no quote char present, same answer
    assert _tokenize(line, sep, '"') == line.split(sep)


@PROP
@given(st.data())
def test_prop_csv_tokenizer_rejects_malformed_quoting(data):
    """Lines the reference calls malformed (unterminated quote; closing
    quote not followed by sep/EOL) return None — and csv.reader in
    strict mode also refuses the closing-quote case."""
    import csv

    from accelerator_spark.sources.csv import _tokenize

    sep = data.draw(st.sampled_from(_CSV_SEPS))
    mid = data.draw(st.text(alphabet=st.sampled_from("ab"), max_size=4))
    # unterminated: opening quote never closed
    assert _tokenize(f'"{mid}', sep, '"') is None
    # closing quote followed by junk (not sep/EOL)
    bad = f'"{mid}"x'
    assert _tokenize(bad, sep, '"') is None
    try:
        next(csv.reader([bad], delimiter=sep, quotechar='"', strict=True))
        raised = False
    except csv.Error:
        raised = True
    assert raised


# ------------------------------------------------------- r9b containers

_member_names = st.lists(
    st.from_regex(r"[A-Za-z0-9_][A-Za-z0-9_.\-]{0,30}(/[A-Za-z0-9_.]{1,20}){0,2}",
                  fullmatch=True),
    min_size=1, max_size=8, unique=True)


@settings(deadline=None, max_examples=40)
@given(_member_names, st.data())
def test_prop_tar_build_iter_roundtrip(names, data):
    """Hand-rolled ustar writer vs stdlib-backed reader: arbitrary
    member names/payloads survive byte-exact, plain and gzipped."""
    from accelerator_spark.sources.tar import tar_build, tar_iter_members

    members = [(n, data.draw(st.binary(max_size=200))) for n in names]
    for gz in (False, True):
        out = [(r[1], r[2]) for r in
               tar_iter_members(tar_build(members, gzip_compress=gz))]
        assert out == members


_rtf_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\r"),
    max_size=60)


@settings(deadline=None, max_examples=60)
@given(st.lists(_rtf_text, min_size=1, max_size=5))
def test_prop_rtf_build_text_roundtrip(paras):
    """Escaper vs parser: arbitrary unicode paragraphs (braces,
    backslashes, cp1252-able and not, tabs, embedded newlines)
    round-trip through real RTF bytes."""
    from accelerator_spark.functions.rtf import rtf_build, rtf_text

    got, _n = rtf_text(rtf_build(paras))
    assert got == "\n".join(paras).rstrip("\n")


_body_line = st.from_regex(r"(>{0,3}From )?[ -~]{0,40}", fullmatch=True)


@settings(deadline=None, max_examples=60)
@given(st.lists(st.lists(_body_line, max_size=6), min_size=1,
                max_size=4))
def test_prop_mbox_build_split_roundtrip(bodies):
    """mboxrd framing: bodies full of From-lines and >From-lines (the
    quoting-sensitive class) survive build -> split byte-exact."""
    from accelerator_spark.sources.mail import mbox_build, mbox_split

    raws = [b"H: v\n\n" + "\n".join(lines).encode("ascii")
            for lines in bodies]
    assert list(mbox_split(mbox_build(raws))) == raws


_st_dtype = st.sampled_from(
    ["F64", "F32", "I64", "I32", "I16", "I8", "U8", "BOOL"])


@settings(deadline=None, max_examples=40)
@given(st.lists(st.tuples(_st_dtype,
                          st.integers(0, 4), st.integers(1, 5)),
                min_size=1, max_size=4), st.data())
def test_prop_safetensors_roundtrip(specs, data):
    """safetensors writer/reader pair over random dtypes and 1/2-D
    shapes; integer values chosen inside each dtype's range."""
    from accelerator_spark.sources.tensors import (
        safetensors_build, safetensors_parse)

    rng = {"I8": (-128, 127), "U8": (0, 255), "I16": (-2**15, 2**15-1),
           "I32": (-2**31, 2**31-1), "I64": (-2**53, 2**53),
           "BOOL": (0, 1), "F32": (-2**20, 2**20), "F64": (-2**50, 2**50)}
    tensors = {}
    for k, (dtype, nr, dim) in enumerate(specs):
        shape = [nr, dim] if nr else [dim]
        n = (nr or 1) * dim
        lo, hi = rng[dtype]
        tensors[f"t{k}"] = (dtype, shape, [
            data.draw(st.integers(lo, hi)) for _ in range(n)])
    got = {n: (d, s, v) for n, d, s, v in
           safetensors_parse(safetensors_build(tensors))}
    for name, (dtype, shape, vals) in tensors.items():
        gd, gs, gv = got[name]
        assert (gd, gs) == (dtype, shape)
        assert gv == [float(x) for x in vals]


@settings(deadline=None, max_examples=30)
@given(st.lists(st.tuples(st.integers(0, 200), st.integers(1, 30)),
                min_size=1, max_size=25),
       st.lists(st.tuples(st.integers(0, 200), st.integers(1, 30)),
                min_size=1, max_size=15),
       st.integers(1, 64))
def test_prop_interval_join_matches_brute_force(spark, ls, rs, width):
    """Owner-bin pair-once dedup vs the O(n*m) reference at random
    widths — duplicates of the same pair must never appear."""
    from accelerator_spark.operators.merge import interval_join

    L = [(i, s, s + d) for i, (s, d) in enumerate(ls)]
    R = [(j, s, s + d) for j, (s, d) in enumerate(rs)]
    ldf = spark.createDataFrame(L, "id long, start long, end long")
    rdf = spark.createDataFrame(R, "id long, start long, end long")
    got = sorted((r.l_id, r.r_id) for r in
                 interval_join(ldf, rdf, bin_width=width).collect())
    ref = sorted((a[0], b[0]) for a in L for b in R
                 if a[1] < b[2] and b[1] < a[2])
    assert got == ref


# ----------------------------------------------------------- round 10

@settings(max_examples=300, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(uri=st.text(max_size=80))
def test_surt_never_corrupts_a_cdx_line(uri):
    """surt() must map ANY string (crawls carry garbage URIs) to a
    CDX-safe urlkey: non-empty field, no whitespace/braces/quotes/
    backslashes (the characters that would break the space-delimited
    line or the brace scan of cdx_offsets), and fully lowercase."""
    from accelerator_spark.sources.warc import surt

    key = surt(uri)
    assert isinstance(key, str)
    for ch in ' \t\n\r{}"\\':
        assert ch not in key, (uri, key)
    assert key == key.lower()


@settings(max_examples=60, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(members=st.lists(
    st.tuples(
        st.text(alphabet="abcdefghij0123456789",
                min_size=1, max_size=8),                  # key stem
        st.integers(min_value=0, max_value=200),          # name pad
        st.sampled_from(["txt", "cap.json", "png", ""]),  # ext
        st.binary(max_size=600)),                         # payload
    min_size=1, max_size=12), gz=st.booleans())
def test_tar_member_roundtrip_model(members, gz, tmp_path_factory):
    """Writer/reader identity for the streamed sink's byte layout
    across name lengths (ustar, prefix-split, GNU longname), exts,
    empty and block-boundary payloads, gzip on/off — via the exact
    block sequence tar_export streams, read back by the stdlib-backed
    production reader."""
    import gzip as _gzip
    import io

    from accelerator_spark.sources.tar import (
        _member_blocks, tar_iter_members)

    blobs = []
    want = []
    seen = set()
    for stem, pad, ext, payload in members:
        key = f"d{'x' * pad}/{stem}"
        name = f"{key}.{ext}" if ext else key
        if name in seen:        # duplicate names: last-wins ambiguity
            continue            # out of scope for the identity check
        seen.add(name)
        for blk in _member_blocks(name, len(payload), mtime=7):
            blobs.append(blk)
        blobs.append(payload)
        blobs.append(b"\0" * (-len(payload) % 512))
        want.append((name, payload))
    blobs.append(b"\0" * 1024)
    raw = b"".join(blobs)
    if gz:
        buf = io.BytesIO()
        with _gzip.GzipFile(filename="", fileobj=buf, mode="wb",
                            mtime=0) as g:
            g.write(raw)
        raw = buf.getvalue()
    rows = list(tar_iter_members(raw))
    assert [(name, payload) for _, name, payload, _, _ in rows] == want
    assert all(mt == 7 for *_x, mt in rows)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(clip=st.lists(st.integers(min_value=-1000, max_value=1000),
                     min_size=1, max_size=300),
       gain=st.integers(min_value=1, max_value=30))
def test_ehash_volume_invariance_property(clip, gain):
    """ehash_bits(clip * gain) == ehash_bits(clip) for ANY positive
    integer gain — the volume-invariance contract the audio near-dup
    front depends on (a louder re-encode of the same clip must land
    at Hamming 0)."""
    from accelerator_spark.operators.multimodal import ehash_bits

    assert ehash_bits(clip, 1, 2) == ehash_bits(
        [v * gain for v in clip], 1, 2)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(vals=st.lists(st.integers(min_value=0, max_value=(1 << 64) - 1),
                     min_size=1, max_size=12, unique=True))
def test_dhash_hex_to_long_bijection_property(spark, vals):
    """hex -> signed-long conversion is the exact two's-complement
    bijection for arbitrary 64-bit values (MSB-set values map
    negative), so xor/bit_count Hamming over the longs equals Hamming
    over the hex signatures."""
    from accelerator_spark.operators.multimodal import dhash_hex_to_long

    df = spark.createDataFrame(
        [(f"{v:016x}",) for v in vals], "h string")
    got = {r.h: r.v for r in
           df.select("h", dhash_hex_to_long("h").alias("v")).collect()}
    for v in vals:
        want = v - (1 << 64) if v >= (1 << 63) else v
        assert got[f"{v:016x}"] == want
