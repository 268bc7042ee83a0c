"""Charset-aware payload decoding (operators/charset.py, VERDICT r8 #1):
the hop between warc_import's BinaryType payload and html_extract's
string column. Precedence chain, WHATWG label promotions, BOM
handling, strict fall-through on lying declarations, and the full
warc -> decode_payload -> html_extract pipeline over mixed-charset
golden WARC bytes."""

import codecs

from accelerator_spark.operators.charset import (
    decode_bytes, decode_payload, normalize_charset_label)


def test_header_charset_wins():
    text, used, src, ok = decode_bytes(
        "日本語ページ".encode("shift_jis"),
        "text/html; charset=Shift_JIS")
    assert (text, used, src, ok) == ("日本語ページ", "shift_jis",
                                     "header", True)
    # quoted label, extra params, case-insensitive
    text, used, src, ok = decode_bytes(
        "русский".encode("koi8-r"),
        'Text/HTML; CHARSET="KOI8-R"; boundary=x')
    assert (text, used, src, ok) == ("русский", "koi8-r", "header", True)


def test_lying_header_falls_through():
    # header says utf-8 but the bytes are cp1252-only: strict utf-8
    # fails, no BOM/meta, utf-8 tier fails again -> cp1252 fallback
    payload = "café — déjà".encode("cp1252")
    text, used, src, ok = decode_bytes(payload,
                                       "text/html; charset=utf-8")
    assert (text, used, src, ok) == ("café — déjà", "cp1252",
                                     "fallback", False)


def test_bom_variants():
    for codec, bom in [("utf-8", codecs.BOM_UTF8),
                       ("utf-16-le", codecs.BOM_UTF16_LE),
                       ("utf-16-be", codecs.BOM_UTF16_BE),
                       ("utf-32-le", codecs.BOM_UTF32_LE),
                       ("utf-32-be", codecs.BOM_UTF32_BE)]:
        payload = bom + "héllo".encode(codec)
        text, used, src, ok = decode_bytes(payload, "text/html")
        assert (text, used, src, ok) == ("héllo", codec, "bom", True), \
            codec
    # BOM surviving a header-tier whole-payload decode is stripped
    text, used, src, ok = decode_bytes(
        codecs.BOM_UTF8 + "x".encode(), "text/html; charset=utf-8")
    assert (text, used, src) == ("x", "utf-8", "header")


def test_meta_prescan():
    page = (b'<html><head><meta charset=windows-1252></head><body>'
            + "smart — quote".encode("cp1252"))
    text, used, src, ok = decode_bytes(page, "text/html")
    assert ("smart — quote" in text and used == "cp1252"
            and src == "meta" and ok)
    # the http-equiv form
    page = (b'<META HTTP-EQUIV="Content-Type" '
            b'CONTENT="text/html; charset=EUC-JP">'
            + "日本".encode("euc-jp"))
    text, used, src, ok = decode_bytes(page, None)
    assert ("日本" in text and used == "euc_jp"
            and src == "meta" and ok)
    # a meta OUTSIDE the 1024-byte prescan window is not consulted
    page = b"<p>" + b"x" * 1100 + b"<meta charset=koi8-r>"
    assert decode_bytes(page, None)[2] == "utf8"


def test_label_normalization_whatwg():
    # latin-1-family and ascii labels mean the cp1252 superset on the
    # web; gb2312 labels gbk; unknown labels resolve to None
    assert normalize_charset_label("ISO-8859-1") == "cp1252"
    assert normalize_charset_label(" Latin1 ") == "cp1252"
    assert normalize_charset_label("US-ASCII") == "cp1252"
    assert normalize_charset_label("GB2312") == "gbk"
    assert normalize_charset_label("UTF8") == "utf-8"
    assert normalize_charset_label("no-such-charset-9") is None
    assert normalize_charset_label(None) is None
    # the promotion changes results: 0x97 is em-dash in cp1252
    text, used, _, ok = decode_bytes(
        b"a\x97b", "text/html; charset=iso-8859-1")
    assert (text, used, ok) == ("a—b", "cp1252", True)


def test_unknown_label_and_plain_ascii():
    text, used, src, ok = decode_bytes(
        b"plain ascii", "text/html; charset=UNKNOWN-99")
    assert (text, used, src, ok) == ("plain ascii", "utf-8", "utf8",
                                     True)


def test_cp1252_hole_bytes_fall_to_latin1():
    # 0x81 is undefined in cp1252; strict cp1252 raises, latin-1 wins
    text, used, src, ok = decode_bytes(b"a\x81\xe9", None)
    assert (used, src, ok) == ("iso8859-1", "fallback", False)
    assert text == "a\x81é"


def test_decode_payload_distributed(spark):
    rows = [
        (1, "déjà vu".encode("utf-8"), "text/html"),
        (2, "日本".encode("shift_jis"), "text/html; charset=shift_jis"),
        (3, "café—".encode("cp1252"), "text/html"),
        (4, None, "text/html"),
    ]
    df = spark.createDataFrame(
        rows, "rec_id long, payload binary, content_type string")
    got = {r["rec_id"]: r for r in decode_payload(
        df, id_col="rec_id").collect()}
    assert (got[1]["text"], got[1]["charset_used"],
            got[1]["is_valid"]) == ("déjà vu", "utf-8", True)
    assert (got[2]["text"], got[2]["charset_source"]) == ("日本", "header")
    assert (got[3]["text"], got[3]["is_valid"]) == ("café—", False)
    assert got[4]["text"] is None and got[4]["is_valid"] is None


def test_warc_decode_html_pipeline(spark, tmp_path):
    """VERDICT r8 #1 done-criterion: warc_import -> decode_payload ->
    html_extract over a mixed-charset golden WARC — the non-UTF-8
    slice must come through with its characters intact."""
    from pyspark.sql import functions as F

    from accelerator_spark.operators.charset import decode_payload
    from accelerator_spark.operators.html import html_extract
    from accelerator_spark.sources.warc import warc_build, warc_import

    pages = [
        ("utf-8", None,
         "<title>U</title><p>déjà — naïve</p>"),
        ("shift_jis", "text/html; charset=Shift_JIS",
         "<title>J</title><p>日本語のページ</p>"),
        ("cp1252", None,
         '<meta charset=windows-1252><title>W</title><p>café — déjà</p>'),
        ("koi8-r", "text/html; charset=koi8-r",
         "<title>R</title><p>русский текст</p>"),
    ]
    recs = [dict(warc_type="warcinfo", payload=b"ci")]
    for i, (codec, ctype, html) in enumerate(pages):
        recs.append(dict(
            warc_type="response", target_uri=f"http://x/{i}",
            payload=html.encode(codec),
            http=(200, ctype or "text/html")))
    (tmp_path / "mixed.warc.gz").write_bytes(
        warc_build(recs, gzip_members=True))

    raw = warc_import(spark, str(tmp_path)) \
        .filter(F.col("warc_type") == "response")
    decoded = decode_payload(raw, id_col="record_idx")
    ex = {r["doc_id"]: r for r in html_extract(
        decoded, html_col="text", id_col="record_idx",
    ).collect()}
    got_valid = {r["record_idx"]: r for r in decoded.collect()}
    # record_idx 0 is warcinfo; responses are 1..4
    assert ex[1]["title"] == "U" and "déjà — naïve" in ex[1]["text"]
    assert ex[2]["title"] == "J" and "日本語のページ" in ex[2]["text"]
    assert ex[3]["title"] == "W" and "café — déjà" in ex[3]["text"]
    assert ex[4]["title"] == "R" and "русский текст" in ex[4]["text"]
    assert got_valid[2]["charset_used"] == "shift_jis"
    assert got_valid[3]["charset_source"] == "meta"
    assert all(got_valid[i]["is_valid"] for i in (1, 2, 3, 4))


def test_review_r9_meta_utf16_label_means_utf8():
    """Review r9 / WHATWG prescan: a meta-declared utf-16/utf-32 label
    is always wrong (the byte-regex finding it proves ASCII-compatible
    bytes) and means utf-8."""
    page = b"<meta charset=utf-16><p>hello world</p>\n"
    text, used, src, ok = decode_bytes(page, "text/html")
    assert "hello world" in text
    assert (used, src, ok) == ("utf-8", "meta", True)
    page32 = b'<meta charset="UTF-32LE"><p>x</p>'
    assert decode_bytes(page32, None)[1] == "utf-8"
    # a HEADER-declared utf-16 with real utf-16 bytes still works
    wide = "wide".encode("utf-16")
    assert decode_bytes(wide, "text/html; charset=utf-16")[0] == "wide"
