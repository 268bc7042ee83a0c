"""RTF extraction tests (functions/rtf.py): hand-laid golden tokens,
builder/reader cross-check, codepage + unicode-fallback semantics,
destination skipping, hostile inputs, extract_document_text routing."""

import pytest

from accelerator_spark.functions.rtf import RtfError, rtf_build, rtf_text

U8470 = b"\\" + b"u8470"  # literal 葰 (assembled: editors mangle it)


def test_golden_tokens():
    g = rb"{\rtf1\ansi{\fonttbl{\f0 X;}}a\'e9b\par d\tab e\line f}"
    assert rtf_text(g) == ("aéb\nd\te\nf", 3)
    # escapes, nbsp (faithful U+00A0), em/en dashes, quotes — note a
    # control word consumes ONE trailing space as its delimiter
    g2 = rb"{\rtf1 \{x\} \\ y\~z \emdash q\endash \lquote w\rquote }"
    assert rtf_text(g2)[0] == "{x} \\ y z —q–‘w’"


def test_unicode_fallback_skipping():
    # default \uc1: one fallback char after \uN is swallowed
    g = b"{\\rtf1 pre{\\*\\sekret hidden}post " + U8470 + b"AB visible}"
    assert rtf_text(g) == ("prepost №B visible", 1)
    # \uc2 swallows two; fallback may be an \'hh byte too
    g2 = b"{\\rtf1\\uc2 x" + U8470 + b"\\'3fB visible}"
    assert rtf_text(g2) == ("x№ visible", 1)
    # negative codepoint wraps (signed 16-bit)
    g3 = b"{\\rtf1 " + b"\\" + b"u-245?}"
    assert rtf_text(g3)[0] == chr(65536 - 245)


def test_codepage_switch():
    # \'e9 is U+0439 in cp1251
    g = rb"{\rtf1\ansi\ansicpg1251 a\'e9b}"
    assert rtf_text(g)[0] == "aйb"
    # unknown codepage keeps cp1252
    g2 = rb"{\rtf1\ansicpg99999 \'e9}"
    assert rtf_text(g2)[0] == "é"


def test_destination_and_bin_skipping():
    g = (rb"{\rtf1{\fonttbl{\f0 F;}}{\info{\author A}}"
         rb"{\*\generator G;}body{\pict\bin4 " + bytes([0x7B] * 4)
         + rb"}end}")
    assert rtf_text(g) == ("bodyend", 1)
    # field instruction skipped, result kept
    g2 = rb"{\rtf1{\field{\fldinst HYPERLINK x}{\fldrslt shown}}}"
    assert rtf_text(g2)[0] == "shown"


def test_build_read_roundtrip():
    paras = ["Hello {world}", "café — № ok",
             "tabs\tand\nbreaks", "plain"]
    text, n = rtf_text(rtf_build(paras))
    assert text == "Hello {world}\ncafé — № ok\n" \
                   "tabs\tand\nbreaks\nplain"
    assert n == 5  # the \line inside para 3 counts as a break


def test_hostile_inputs():
    with pytest.raises(RtfError):
        rtf_text(b"not rtf at all")
    with pytest.raises(RtfError):
        rtf_text(b"{\\rtf1 " + b"{" * 200 + b"}")
    with pytest.raises(RtfError):
        rtf_text(rb"{\rtf1 " + b"a" * 100, max_chars=50)
    # truncated mid-control-word: returns what was seen, no raise
    assert rtf_text(rb"{\rtf1 ok\pa")[0] == "ok"
    # malformed hex escape is dropped, scan continues
    assert rtf_text(rb"{\rtf1 a\'zzb}")[0] == "ab"


def test_document_router(spark):
    from accelerator_spark.operators.multimodal import extract_document_text

    df = spark.createDataFrame(
        [(1, bytearray(rtf_build(["body one", "two"])),
          "application/rtf")],
        "media_id long, payload binary, mime string")
    r = extract_document_text(df).collect()[0]
    assert (r.kind, r.text, r.n_units) == ("rtf", "body one\ntwo", 2)


def test_optional_hyphen_and_trailing_lone_surrogate():
    """ADVICE r9: \\- is a zero-width hyphenation point (no literal
    '-' injected mid-word); \\_ stays the visible non-breaking hyphen;
    a lone high surrogate at END of input flushes as U+FFFD instead of
    vanishing."""
    from accelerator_spark.functions.rtf import rtf_text

    assert rtf_text(rb"{\rtf1 hy\-phen}")[0] == "hyphen"
    assert rtf_text(rb"{\rtf1 a\_b}")[0] == "a‑b"
    # \u-10179 = 0xD83D: a high surrogate with no low half, at EOF
    assert rtf_text(rb"{\rtf1 x\u-10179}")[0] == "x�"
    # ...but a complete pair still combines (regression guard):
    # U+1F600 = D83D DE00 = \u-10179 \u-8704
    assert rtf_text(rb"{\rtf1 \u-10179?\u-8704?}")[0] == "\U0001F600"
    # a lone high followed by a NON-surrogate \uN still flushes FFFD
    # mid-stream then emits the scalar
    assert rtf_text(rb"{\rtf1 \u-10179?\u65?}")[0] == "�A"
