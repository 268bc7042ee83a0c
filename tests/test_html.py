"""HTML text-extraction tests (operators/html.py).

Hand-authored pages for the real-parser tier (title, dropped
subtrees, entities, link density, malformed markup), agreement
between the JVM fast tier and the parser tier on simple markup, and
the distributed integration."""

import pytest

from accelerator_spark.operators.html import (
    _extract_one, html_extract, strip_tags_fast)


def test_extract_one_golden():
    html = ("<html><head><title>The &amp; Title</title>"
            "<style>p{color:red}</style>"
            "<script>var x = '<p>not text</p>';</script></head>"
            "<body><h1>Head&#33;</h1>"
            "<p>First para with <a href='/x'>a link</a> inside.</p>"
            "<p>Second   para.</p>"
            "<div>Block<br>break</div>"
            "<noscript>hidden</noscript>"
            "</body></html>")
    title, text, n_links, density, n_p, n_h = _extract_one(html)
    assert title == "The & Title"
    lines = text.split("\n")
    assert lines[0] == "Head!"
    assert lines[1] == "First para with a link inside."
    assert lines[2] == "Second para."
    assert lines[3] == "Block"
    assert lines[4] == "break"
    assert "not text" not in text and "hidden" not in text
    assert (n_links, n_p, n_h) == (1, 2, 1)
    n_text = len(text.replace("\n", ""))
    assert density == pytest.approx(len("a link") / n_text)


def test_extract_one_malformed_and_empty():
    # unclosed tags, stray brackets, nested drops: best-effort, no raise
    title, text, n_links, *_ = _extract_one(
        "<p>open <b>bold <a href=x>link text")
    assert "open" in text and "link text" in text and n_links == 1
    assert _extract_one("")[1] == ""
    assert _extract_one(None)[1] == ""
    t, text, *_ = _extract_one("plain no markup & raw amp < oops")
    assert t is None and "plain no markup" in text
    # script containing a fake closing-ish tag stays dropped up to the
    # real terminator
    _, text2, *_ = _extract_one(
        "<script>if (a<b) { x = '</div>'; }</script><p>visible</p>")
    assert "visible" in text2 and "x =" not in text2


def test_strip_tags_fast_agrees_on_simple_markup(spark):
    docs = [
        "<p>Hello &amp; goodbye</p><script>drop() &lt; this</script>",
        "<div>a<br/>b</div><!-- comment -->",
        "<STYLE>p{}</STYLE><b>bold</b> text &lt;tag&gt;",
        None,
    ]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               "doc_id long, text string")
    from pyspark.sql import functions as F
    fast = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", strip_tags_fast(F.col("text")).alias("s")).collect()}
    assert fast[0] == "Hello & goodbye"
    assert fast[1] == "a b"
    assert fast[2] == "bold text <tag>"
    assert fast[3] is None
    # parser tier agrees modulo line structure
    for i, d in enumerate(docs[:3]):
        _, text, *_ = _extract_one(d)
        assert " ".join(text.split()) == fast[i]


def test_html_extract_distributed(spark):
    rows = [(1, "<title>T1</title><p>one <a href=x>l</a></p><p>two</p>"),
            (2, "<h2>H</h2>no paragraphs"),
            (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in html_extract(df).collect()}
    assert got[1]["title"] == "T1"
    assert got[1]["text"] == "one l\ntwo"
    assert (got[1]["n_links"], got[1]["n_paragraphs"]) == (1, 2)
    assert got[2]["title"] is None and got[2]["n_headings"] == 1
    assert got[3]["text"] == "" and got[3]["n_links"] == 0
    # id column keeps its own type (string ids)
    df2 = spark.createDataFrame([("a", "<p>x</p>")],
                                "doc_id string, text string")
    assert html_extract(df2).collect()[0]["doc_id"] == "a"


def test_review_r8_visible_counts_and_density_bound():
    """Review r8: counts describe VISIBLE content only, and pretty-
    printed anchor whitespace doesn't inflate link_density past 1."""
    _, text, n_links, density, n_p, n_h = _extract_one(
        "<noscript><p>enable <a>js</a></p><h1>x</h1></noscript>"
        "<p>real</p>")
    assert text == "real"
    assert (n_links, n_p, n_h) == (0, 1, 0)
    _, text, n_links, density, *_ = _extract_one(
        "<p><a href=x>a      b</a></p>")
    assert text == "a b" and density <= 1.0
    assert density == pytest.approx(1.0)


def test_extract_main_content_unit_and_distributed(spark):
    """r9: block-level boilerplate classification — nav/aside/footer
    subtrees drop whole, short stubs drop by length, link farms drop
    by density, the article body survives with block accounting."""
    from accelerator_spark.operators.html import (
        _main_content_one, extract_main_content)

    page = ("<html><head><title>T</title>"
            "<script>var x='<p>never</p>';</script></head><body>"
            "<nav><a href='/'>Home</a> <a href='/a'>About page</a></nav>"
            "<aside><p>A long enough sidebar promo paragraph that "
            "would otherwise pass the length floor.</p></aside>"
            "<div>(c) 2026</div>"
            "<p>First real article paragraph with plenty of text.</p>"
            "<p>Second article paragraph, also long enough, with an "
            "inline <a href='x'>link</a> inside.</p>"
            "<div><a href='r'>A long related-links anchor text "
            "block</a></div>"
            "<footer>Contact | Terms | Privacy | Sitemap page</footer>"
            "</body></html>")
    text, n_blocks, n_kept = _main_content_one(page, 25, 0.5)
    assert text == ("First real article paragraph with plenty of text."
                    "\nSecond article paragraph, also long enough, "
                    "with an inline link inside.")
    assert (n_blocks, n_kept) == (7, 2)
    # threshold knobs: a zero density cap drops the inline-link para
    text2, _, kept2 = _main_content_one(page, 25, 0.0)
    assert kept2 == 1 and "inline" not in text2
    # malformed markup never raises (each unclosed <p> is its own
    # 2-char block; the unclosed nav block stays boilerplate)
    assert _main_content_one("<p>ok " * 5 + "<nav><a>x", 2, 0.5) == \
        ("ok\nok\nok\nok\nok", 6, 5)
    assert _main_content_one("", 25, 0.5) == ("", 0, 0)
    assert _main_content_one(None, 25, 0.5) == ("", 0, 0)

    df = spark.createDataFrame(
        [(1, page), (2, None)], "doc_id long, text string")
    rows = {r["doc_id"]: r
            for r in extract_main_content(df).collect()}
    assert rows[1]["n_kept"] == 2 and "First real" in rows[1]["main_text"]
    assert rows[2]["main_text"] == "" and rows[2]["n_blocks"] == 0
