"""HTML -> Markdown conversion tests (operators/markdown.py)."""

from accelerator_spark.operators.markdown import (
    html_to_markdown, html_to_markdown_one as one)


def test_headings_paragraphs_inline():
    assert one("<h1>T</h1><h3>S</h3><p>a <b>b</b> <em>c</em> "
               "<code>f(x)</code> d</p>") == \
        "# T\n\n### S\n\na **b** *c* `f(x)` d"


def test_links_images():
    assert one('<p><a href="/u?a=1&amp;b=2">go</a></p>') == "[go](/u?a=1&b=2)"
    assert one('<p><img src="/i.png" alt="pic"> tail</p>') == \
        "![pic](/i.png) tail"
    assert one("<p><a>bare</a></p>") == "[bare]()"


def test_lists_nested_and_ordered():
    assert one("<ul><li>one</li><li>two<ul><li>sub</li></ul></li>"
               "<li>three</li></ul>") == "- one\n- two\n  - sub\n- three"
    assert one("<ol><li>a</li><li>b</li><li>c</li></ol>") == \
        "1. a\n2. b\n3. c"
    # unclosed <li> (the common scrape form) and text after a sublist
    assert one("<ul><li>x<li>y</ul>") == "- x\n- y"
    assert one("<ul><li>two<ul><li>sub</li></ul>tail</li></ul>") == \
        "- two\n  - sub\n- tail"
    # ordered counters are per level
    assert one("<ol><li>a<ol><li>i</li></ol></li><li>b</li></ol>") == \
        "1. a\n  1. i\n2. b"


def test_pre_blockquote_hr_br():
    assert one("<pre>  raw\n  kept </pre>") == "```\n  raw\n  kept \n```"
    assert one("<blockquote><p>q</p><blockquote><p>d</p></blockquote>"
               "</blockquote>") == "> q\n\n> > deep".replace("deep", "d")
    assert one("<p>x<br>y</p><hr><p>z</p>") == "x\ny\n\n---\n\nz"
    # nested <pre> inside <pre> stays one fence
    assert one("<pre>a<pre>b</pre>c</pre>") == "```\nabc\n```"


def test_tables():
    assert one("<table><tr><th>A</th><th>B</th></tr>"
               "<tr><td>1</td><td>2</td></tr></table>") == \
        "| A | B |\n| --- | --- |\n| 1 | 2 |"
    # no header row -> no separator; empty cell padded
    assert one("<table><tr><td>1</td><td></td></tr></table>") == \
        "| 1 |   |"


def test_drops_and_entities():
    assert one("<script>var x='<p>n</p>';</script><style>p{}</style>"
               "<p>vis &lt;tag&gt; &amp; more</p>") == "vis <tag> & more"
    assert one("<noscript><p>hidden</p></noscript><p>shown</p>") == "shown"


def test_malformed_tolerance():
    # unclosed everything: tolerant tokenizer, never raises
    assert one("<p>open <b>bold <i>both") == "open **bold *both"
    assert one("") == ""
    assert one("plain text only") == "plain text only"
    assert one("<td>stray cell</td>") == "| stray cell |"


def test_whitespace_collapse():
    assert one("<p>  a\n   b\t c  </p>") == "a b c"
    assert one("<div>a</div>\n\n<div>b</div>") == "a\n\nb"


def test_dataframe_operator(spark):
    df = spark.createDataFrame(
        [(1, "<h1>T</h1><p>body</p>"), (2, None)], "doc_id long, text string")
    rows = {r.doc_id: (r.markdown, r.n_chars)
            for r in html_to_markdown(df).collect()}
    assert rows[1] == ("# T\n\nbody", 9)
    assert rows[2] == (None, None)
