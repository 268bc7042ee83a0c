"""The dataset_type conversion menu as Spark expressions.

Reference: ``dataset_type`` converts bytes/ascii/unicode columns to typed
columns via generated C parser loops (/root/reference/accelerator/
standard_methods/a_dataset_type.py:40-54, dataset_type.py:730-810). Menu
and semantics reproduced here declaratively; Catalyst/codegen replaces the
reference's cffi-compiled loops (SURVEY §2.8 mapping table).

Semantics preserved:
- parse failure => NULL unless a ``default`` is given (reference:
  per-column ``defaults`` option);
- ``filter_bad`` drops a row when any column fails without a default —
  the reference's two-pass mmap'd badmap becomes a single-pass
  conjunction of null-checks (SURVEY §7.4);
- ``i``-suffixed types ignore trailing garbage (strtol-style prefix
  parse). The ``whole=0`` C templates never check ``*endptr``, so a cell
  with NO parseable prefix at all ("abc") stores strtol/strtod's 0 — it
  is 0, not bad (reference dataset_type.py _c_conv_int_template /
  _c_conv_float_template with whole=0);
- int bases 0/8/10/16; base 0 auto-detects 0x/0/decimal prefixes;
  empty/whitespace-only cells are 0, not bad (strtol("") consumes no
  digits and leaves *endptr at NUL — same for strtod and float types);
- ``strbool``: false/0/f/no/off/nil/null/"" (case-insens) => False,
  all else True (dataset_type.py _c_conv_strbool);
- ``floatint{e,s}``: float text to int, truncating toward zero like the
  C assignment; e(xact) fails beyond ±2^53 (64-bit) / ±INT32_MAX,
  s(aturating) clamps at ±INT_MAX (not INT_MIN);
- strptime-style datetime/date/time formats incl. %f; ``javadatetime`` =
  ms-since-epoch; ``unixtime`` = s-since-epoch;
- ``number``: int-if-integral-else-float (reference's ±2^1007 varint is
  capped to int64/double — documented divergence SURVEY §7.4);
- ``time``: µs-since-midnight LongType (no Spark TimeType — SURVEY §7.4).

All expressions are JVM-side (try_cast / regexp / conv) — no Python UDFs
anywhere, so conversion runs inside whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..identifiers import qcol as _qcol

# ---------------------------------------------------------------------
# strptime -> Spark datetime pattern translation
# ---------------------------------------------------------------------

_STRPTIME = {
    "%Y": "yyyy", "%y": "yy", "%m": "MM", "%d": "dd",
    "%H": "HH", "%M": "mm", "%S": "ss", "%f": "SSSSSS",
    "%j": "DDD", "%b": "MMM", "%B": "MMMM", "%a": "EEE", "%A": "EEEE",
    "%p": "a", "%I": "hh", "%z": "xx", "%%": "%",
}


def strptime_to_spark(fmt: str) -> str:
    # Known engine seam (property-tested, tests/test_properties.py):
    # for DATE-LESS formats ('%H:%M') Spark's to_timestamp defaults the
    # missing date to 1970-01-01 where Python strptime uses 1900-01-01.
    # Full-date formats agree exactly.
    # literal alpha chars are quoted as ONE '...' block per run: quoting
    # each char separately emitted '' between letters ("'a''t'"), which
    # Java's DateTimeFormatter reads as an ESCAPED QUOTE — "at" became
    # the literal a't and every multi-letter literal word silently
    # failed to match (review r5). A literal ' itself escapes as ''.
    out, lit = [], []
    i = 0

    def _flush():
        if lit:
            out.append("'" + "".join(lit) + "'")
            del lit[:]

    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            tok = fmt[i:i + 2]
            if tok in _STRPTIME:
                _flush()
                out.append(_STRPTIME[tok])
                i += 2
                continue
            raise ValueError(f"unsupported strptime token {tok!r} in {fmt!r}")
        c = fmt[i]
        if c.isalpha():
            lit.append(c)
        else:
            _flush()
            out.append("''" if c == "'" else c)
        i += 1
    _flush()
    return "".join(out)


# ---------------------------------------------------------------------
# per-type parse expressions (string column -> typed column, NULL on bad)
# ---------------------------------------------------------------------

_INT_RX = {
    10: r"[+-]?[0-9]+",
    16: r"[+-]?(0[xX])?[0-9a-fA-F]+",
    8: r"[+-]?[0-7]+",
    # strtol base-0 prefix: hex, octal (0 + octal digits), or decimal —
    # ordered so '019' extracts '01' (octal prefix) like strtol does
    0: r"[+-]?(?:0[xX][0-9a-fA-F]+|0[0-7]*|[1-9][0-9]*)",
}


def _trimmed(col: Column) -> Column:
    return F.trim(col)


def _signed_conv(mag: Column, base: int, neg: Column) -> Column:
    """Magnitude string in ``base`` -> signed bigint, overflow-safe.

    Two hazards (review r4): under ANSI (Spark 4 default) ``conv``
    THROWS on inputs beyond uint64 — one garbage cell killed the whole
    job — and a plain bigint cast of the unsigned decimal string lost
    -2^63 (its magnitude exceeds int64 until the sign applies). Guard
    the digit count so conv never sees > uint64, then apply the sign in
    decimal(20,0) space (holds uint64) before the final integral cast;
    out-of-range values become NULL — the reference's ERANGE -> bad."""
    stripped = F.regexp_replace(mag, r"^0+", "")
    max_digits = {16: 16, 8: 22, 10: 20}[base]
    ok_len = F.length(stripped) <= max_digits
    if base == 8:
        # 22 octal digits span past uint64 (8^22 = 2^66): lexical
        # compare is valid at equal length
        ok_len = ok_len & ((F.length(stripped) < 22)
                           | (stripped <= "1777777777777777777777"))
    if base == 10:
        ok_len = ok_len & ((F.length(stripped) < 20)
                           | (stripped <= "18446744073709551615"))
    val = F.when(stripped == "", F.lit(0).cast("decimal(20,0)")).otherwise(
        F.when(ok_len, F.conv(stripped, base, 10)).try_cast("decimal(20,0)"))
    return F.when(neg, -val).otherwise(val).try_cast("bigint")


def _int_base(col: Column, bits: int, base: int, ignore_trailing: bool) -> Column:
    s = _trimmed(col)
    empty = s == ""
    if ignore_trailing:
        s = F.regexp_extract(s, f"^({_INT_RX.get(base, _INT_RX[10])})", 1)
        # no parseable prefix ("abc", bare "-"): strtol consumes nothing
        # and returns 0; whole=0 skips the *endptr check so the 0 is
        # STORED, not bad (reference _c_conv_int_template)
        s = F.when(s == "", F.lit("0")).otherwise(s)
    tgt = "bigint" if bits == 64 else "int"

    def with_empty_zero(expr: Column) -> Column:
        # reference strtol(""): no digits consumed, *endptr == NUL, so
        # empty/whitespace-only cells convert to 0, not bad (review r4)
        return F.when(empty, F.lit(0).cast(tgt)).otherwise(expr)

    if base == 10:
        ok = s.rlike(r"^[+-]?[0-9]+$")
        return with_empty_zero(F.when(ok, s.try_cast(tgt)))
    if base == 16:
        body = F.regexp_replace(s, r"^([+-]?)0[xX]", r"$1")
        ok = body.rlike(r"^[+-]?[0-9a-fA-F]+$")
        neg = body.startswith("-")
        mag = F.regexp_replace(body, r"^[+-]", "")
        return with_empty_zero(
            F.when(ok, _signed_conv(F.upper(mag), 16, neg)).try_cast(tgt))
    if base == 8:
        ok = s.rlike(r"^[+-]?[0-7]+$")
        neg = s.startswith("-")
        mag = F.regexp_replace(s, r"^[+-]", "")
        return with_empty_zero(
            F.when(ok, _signed_conv(mag, 8, neg)).try_cast(tgt))
    if base == 0:
        # strtol base-0: 0x... hex, 0... octal, else decimal
        hexish = s.rlike(r"^[+-]?0[xX][0-9a-fA-F]+$")
        octish = s.rlike(r"^[+-]?0[0-7]*$")
        decish = s.rlike(r"^[+-]?[1-9][0-9]*$|^[+-]?0$")
        return (
            F.when(empty, F.lit(0))
            .when(s.rlike(r"^[+-]?0$"), F.lit(0))
            .when(hexish, _int_base(s, 64, 16, False))
            .when(octish, _int_base(F.regexp_replace(s, r"^([+-]?)0", r"$1"),
                                    64, 8, False))
            .when(decish, s.try_cast("bigint"))
            .try_cast(tgt)
        )
    raise ValueError(f"unsupported int base {base}")


def _float(col: Column, bits: int, ignore_trailing: bool, numeric_comma: bool) -> Column:
    s = _trimmed(col)
    if numeric_comma:
        s = F.regexp_replace(s, ",", ".")
    # reference strtod(""): no digits consumed, *endptr == NUL — empty/
    # whitespace-only cells convert to 0.0, not bad (review r4)
    empty = s == ""
    if ignore_trailing:
        s = F.regexp_extract(
            s, r"^([+-]?(?:[0-9]*\.?[0-9]+(?:[eE][+-]?[0-9]+)?|[iI][nN][fF](?:[iI][nN][iI][tT][yY])?|[nN][aA][nN]))", 1)
        # no parseable prefix: strtod consumes nothing and returns 0.0;
        # whole=0 skips the *endptr check so 0.0 is STORED, not bad
        # (reference _c_conv_float_template)
        s = F.when(s == "", F.lit("0")).otherwise(s)
    tgt = "double" if bits == 64 else "float"
    return F.when(empty, F.lit(0.0).cast(tgt)).otherwise(s.try_cast(tgt))


def _floatint(col: Column, bits: int, mode: str, ignore_trailing: bool,
              numeric_comma: bool) -> Column:
    """Reference floatint semantics (dataset_type.py
    _c_conv_floatint_{exact,saturate}_template, review r4):

    - fractional values TRUNCATE toward zero (C ``*p = value``), they
      are not bad;
    - exact mode bounds: ±2^53 for 64-bit (beyond that a double no
      longer holds integers exactly), ±INT32_MAX for 32-bit;
    - saturating mode clamps at ±INT_MAX (note: -INT_MAX, not INT_MIN),
      comparing against INT_MAX-as-double exactly like the C code."""
    f = _float(col, 64, ignore_trailing, numeric_comma)
    tgt = "bigint" if bits == 64 else "int"
    if mode == "e":
        big = 2.0 ** 53 if bits == 64 else 2147483647.0
        ok = (f >= -big) & (f <= big)  # NaN compares false -> bad
        return F.when(ok, f.cast(tgt))  # double->int cast truncates
    # saturating: C compares value >=/<= ±INT_MAX after double
    # promotion (INT64_MAX rounds up to 2^63 as a double)
    hi_cmp = 2.0 ** 63 if bits == 64 else 2147483647.0
    hi_val = 2 ** (bits - 1) - 1
    return (
        F.when(F.isnan(f) | f.isNull(), F.lit(None))
        .when(f >= hi_cmp, F.lit(hi_val))
        .when(f <= -hi_cmp, F.lit(-hi_val))
        .otherwise(f.cast(tgt))
        .try_cast(tgt)
    )


# reference _c_conv_strbool (dataset_type.py:506-513): 'f' IS false
# (review r4 — it was missing here and in the module docstring)
_FALSE_SET = ["false", "0", "f", "no", "off", "nil", "null", ""]


def _strbool(col: Column) -> Column:
    s = F.lower(_trimmed(col))
    return F.when(col.isNull(), None).otherwise(~s.isin(*_FALSE_SET))


def _floatbool(col: Column, ignore_trailing: bool) -> Column:
    f = _float(col, 64, ignore_trailing, False)
    return F.when(f.isNotNull(), f != 0.0)


_STRPTIME_PREFIX_RX = {
    "Y": r"\d{4}", "y": r"\d{2}", "m": r"\d{1,2}", "d": r"\d{1,2}",
    "H": r"\d{1,2}", "M": r"\d{1,2}", "S": r"\d{1,2}", "j": r"\d{1,3}",
    "f": r"\d{1,6}", "s": r"[+-]?\d+", "b": r"[A-Za-z]{3}",
    "B": r"[A-Za-z]+", "a": r"[A-Za-z]{3}", "A": r"[A-Za-z]+",
    "p": r"[AaPp][Mm]", "%": "%",
}


def _strptime_prefix(col: Column, fmt: str) -> Column:
    """Extract the leading substring of ``col`` that a strptime parse of
    ``fmt`` would consume, for the reference's ignore-trailing temporal
    types (datetimei:/datei:/timei:) — strptime stops at the format's
    end and ignores the rest of the line. Built as a regex from the
    format's directives; no match -> NULL (bad)."""
    import re as _re

    parts, i = [], 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            rx = _STRPTIME_PREFIX_RX.get(fmt[i + 1])
            if rx is None:
                raise ValueError(
                    f"ignore-trailing parse unsupported for directive "
                    f"%{fmt[i + 1]} in format {fmt!r}")
            parts.append(rx)
            i += 2
        else:
            parts.append(_re.escape(ch))
            i += 1
    extracted = F.regexp_extract(F.trim(col), "^(" + "".join(parts) + ")", 1)
    return F.when(extracted == "", None).otherwise(extracted)


def _datetime(col: Column, fmt: str, timezone: str | None) -> Column:
    if fmt == "%s" or fmt == "unixtime":
        # epoch seconds are ABSOLUTE instants: timezone never applies
        # (to_utc_timestamp here would shift every value by the offset)
        secs = _trimmed(col).try_cast("double")
        return F.timestamp_micros((secs * 1_000_000).try_cast("long"))
    if fmt == "javadatetime":  # ms since epoch (dataset_type.py:812-820)
        ms = _trimmed(col).try_cast("long")
        return F.timestamp_millis(ms)
    # wall-clock formats: timezone= names the zone the TEXT is in
    ts = F.try_to_timestamp(_trimmed(col), F.lit(strptime_to_spark(fmt)))
    if timezone:
        ts = F.to_utc_timestamp(ts, timezone)
    return ts


def _date(col: Column, fmt: str) -> Column:
    return F.try_to_timestamp(_trimmed(col), F.lit(strptime_to_spark(fmt))).cast("date")


def _time_us(col: Column, fmt: str) -> Column:
    """time-of-day -> µs since midnight (LongType; SURVEY §7.4)."""
    ts = F.try_to_timestamp(_trimmed(col), F.lit(strptime_to_spark(fmt)))
    return (
        F.hour(ts).cast("long") * 3_600_000_000
        + F.minute(ts).cast("long") * 60_000_000
        + F.second(ts).cast("long") * 1_000_000
        + F.pmod(F.unix_micros(ts), F.lit(1_000_000))
    )


def _ascii(col: Column, strip: bool, errors: str) -> Column:
    s = F.trim(col) if strip else col
    is_ascii = s.rlike(r"^[\x00-\x7F]*$")
    if errors == "strict":
        return F.when(is_ascii, s)
    if errors == "replace":
        return F.when(is_ascii, s).otherwise(F.regexp_replace(s, r"[^\x00-\x7F]", "?"))
    # encode: backslash-escape non-ascii (approximation of the reference's
    # \xNN escaping)
    return F.when(is_ascii, s).otherwise(F.regexp_replace(s, r"[^\x00-\x7F]", "\\\\x?"))


def _json_valid(col: Column) -> Column:
    # valid JSON round-trips through a permissive parse; invalid -> NULL
    parsed = F.try_parse_json(col)
    return F.when(parsed.isNotNull() | (F.lower(F.trim(col)) == "null"), col)


def _number(col: Column, numeric_comma: bool) -> Column:
    """int-if-integral-else-float, capped to int64/double (divergence from
    the reference's ±2^1007 documented in SURVEY §7.4). Returned as
    DOUBLE (lossless for |v| < 2^53, the practical range)."""
    return _float(col, 64, False, numeric_comma)


def _number_int(col: Column, numeric_comma: bool) -> Column:
    # "Never float, but accepts int.0 (or int.00 and so on)"
    # (reference dataset_type.py:805) — fractional values are BAD here,
    # unlike floatint which truncates; '' -> 0 like the reference's
    # convert_number_do zero-length path
    s = _trimmed(col)
    if numeric_comma:
        s = F.regexp_replace(s, ",", ".")
    as_int = s.try_cast("bigint")
    f = _float(col, 64, False, numeric_comma)
    integral = F.when((f == F.floor(f)) & (F.abs(f) <= F.lit(2.0 ** 53)), f)
    return F.coalesce(as_int, integral.try_cast("bigint"))


# ---------------------------------------------------------------------
# the menu
# ---------------------------------------------------------------------

def convert_expr(
    col: Column | str,
    typename: str,
    numeric_comma: bool = False,
    timezone: str | None = None,
) -> Column:
    """Return the typed expression for one reference conversion name.
    NULL where the reference would mark the value bad."""
    c = _qcol(col) if isinstance(col, str) else col
    t = typename
    ignore = t.endswith("i") and not t.startswith(("ascii", "unicode")) and ":" not in t
    base_t = t[:-1] if ignore else t

    if base_t in ("float64", "float32"):
        return _float(c, 64 if base_t == "float64" else 32, ignore, numeric_comma)
    if base_t.startswith("floatint"):
        rest = base_t[len("floatint"):]
        bits = int(rest[:2])
        mode = rest[2:] or "e"
        return _floatint(c, bits, mode, ignore, numeric_comma)
    if base_t.startswith(("int32_", "int64_", "bits32_", "bits64_")):
        kind, base = base_t.split("_")
        bits = int(kind[-2:])
        if kind.startswith("bits"):
            # unsigned: parse at 64-bit then range-check, so bits32
            # accepts its full uint32 range (a signed int target would
            # NULL the upper half). bits64 values in [2^63, 2^64) have
            # no Spark integral home — documented divergence.
            v = _int_base(c, 64, int(base), ignore)
            hi = F.lit(2 ** 32 - 1) if bits == 32 else None
            v = F.when((v >= 0) & (v <= hi) if hi is not None else v >= 0,
                       v)
            # the unsigned template rejects any minus-led cell BEFORE
            # strtoul (reference dataset_type.py:477-480), so '-0',
            # '-abc' and bare '-' are all bad — even where the signed
            # parse yields >=0 or the no-prefix fallback would store 0
            return F.when(~_trimmed(c).startswith("-"), v)
        return _int_base(c, bits, int(base), ignore)
    if base_t in ("int32", "int64"):
        return _int_base(c, int(base_t[-2:]), 10, ignore)
    if base_t == "strbool":
        return _strbool(c)
    if base_t == "floatbool":
        return _floatbool(c, ignore)
    if t.startswith("datetime:"):
        return _datetime(c, t.split(":", 1)[1], timezone)
    if t in ("javadatetime", "unixtime"):
        return _datetime(c, t, timezone)
    if t.startswith("date:"):
        return _date(c, t.split(":", 1)[1])
    if t.startswith("time:"):
        return _time_us(c, t.split(":", 1)[1])
    # ignore-trailing temporal variants: the reference names put the
    # i-suffix BEFORE the colon ('datetimei:*', dataset_type.py:784-786)
    # — strptime parses the format's prefix and ignores the rest
    if t.startswith(("datetimei:", "datei:", "timei:")):
        kind, fmt = t.split(":", 1)
        prefix = _strptime_prefix(c, fmt)
        if kind == "datetimei":
            return _datetime(prefix, fmt, timezone)
        if kind == "datei":
            return _date(prefix, fmt)
        return _time_us(prefix, fmt)
    if t == "number":
        return _number(c, numeric_comma)
    if t == "number:int":
        return _number_int(c, numeric_comma)
    if t == "json":
        return _json_valid(c)
    if t.startswith("ascii"):
        strip = "strip" in t
        errors = t.split(":", 1)[1] if ":" in t else "encode"
        return _ascii(c, strip, errors)
    if t.startswith("unicode"):
        strip = "strip" in t
        return F.trim(c) if strip else c
    if t.startswith("bytes"):
        strip = "strip" in t
        s = F.trim(c) if strip else c
        return F.encode(s, "utf-8")
    raise ValueError(f"unknown conversion type {typename!r}")


CONVERSION_MENU = [
    "float64", "float32", "float64i", "float32i",
    "floatint64e", "floatint64s", "floatint32e", "floatint32s",
    "int64_0", "int64_8", "int64_10", "int64_16",
    "int32_0", "int32_8", "int32_10", "int32_16",
    "bits64_0", "bits64_8", "bits64_10", "bits64_16",
    "bits32_0", "bits32_8", "bits32_10", "bits32_16",
    "strbool", "floatbool",
    "datetime:<fmt>", "date:<fmt>", "time:<fmt>",
    "datetimei:<fmt>", "datei:<fmt>", "timei:<fmt>",
    "javadatetime", "unixtime",
    "number", "number:int", "json",
    "ascii", "ascii:strict", "ascii:replace", "asciistrip",
    "unicode", "unicodestrip", "bytes", "bytesstrip",
]


# ---------------------------------------------------------------------
# the dataset_type operator
# ---------------------------------------------------------------------

def dataset_type(
    df: DataFrame,
    column_types: dict[str, str],
    defaults: dict[str, object] | None = None,
    filter_bad: bool = False,
    rename: dict[str, str] | None = None,
    discard_untyped: bool = False,
    numeric_comma: bool = False,
    timezone: str | None = None,
    hashlabel: str | None = None,
    partitions: int | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Type string columns; returns (typed_df, bad_df_or_None).

    Mirrors a_dataset_type.py options: rename happens before typing;
    ``defaults[col]`` substitutes on parse failure (None default means
    "allow null"); ``filter_bad`` drops rows where an un-defaulted column
    failed and returns them as bad_df (original values + failed column
    names) — the reference's ``bad`` dataset.

    One pass, no badmap: every conversion and the bad-row predicate are
    columns in the same projection (SURVEY §7.4)."""
    defaults = defaults or {}
    if rename:
        for old, new in rename.items():
            if new is None:
                df = df.drop(old)
            else:
                df = df.withColumnRenamed(old, new)

    converted: dict[str, Column] = {}
    fail_flags: list[Column] = []
    fail_names: list[Column] = []
    for name, typ in column_types.items():
        expr = convert_expr(name, typ, numeric_comma=numeric_comma, timezone=timezone)
        failed = expr.isNull() & _qcol(name).isNotNull()
        if name in defaults:
            # default substitutes on PARSE FAILURE only; a NULL input is
            # not a failure and stays NULL (same rule as the bad-row
            # predicate below — a defaulted and an un-defaulted column
            # must agree on what "failed" means)
            dv = defaults[name]
            if dv is not None:
                expr = F.when(failed, F.lit(dv)).otherwise(expr)
        else:
            fail_flags.append(failed)
            fail_names.append(F.when(failed, F.lit(name)))
        converted[name] = expr

    any_bad = None
    if fail_flags:
        any_bad = fail_flags[0]
        for f_ in fail_flags[1:]:
            any_bad = any_bad | f_

    if discard_untyped:
        out_cols = [converted[c].alias(c) for c in df.columns if c in converted]
    else:
        out_cols = [converted[c].alias(c) if c in converted else _qcol(c)
                    for c in df.columns]

    bad_df = None
    typed = df
    if filter_bad and any_bad is not None:
        bad_df = df.filter(any_bad).withColumn(
            "bad_columns",
            F.array_compact(F.array(*fail_names)) if fail_names else F.array(),
        )
        typed = df.filter(~F.coalesce(any_bad, F.lit(False)))
    out = typed.select(*out_cols)
    if hashlabel:
        # typed+rehash fused in one Spark job — the reference's
        # dataset_type hashlabel option (a_dataset_type.py:343-363 builds
        # a slicemap; here the repartition rides the same plan)
        n = partitions or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        out = out.repartition(n, F.col(hashlabel))
    return out, bad_df
