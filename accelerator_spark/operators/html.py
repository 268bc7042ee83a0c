"""HTML -> training text extraction (the CommonCrawl step).

A 100 TB web scrape arrives as HTML; every downstream curation
operator in this package (quality, dedup, lang-id, packing) wants the
ARTICLE TEXT. Two extraction tiers, because the scale trade is real:

- ``strip_tags_fast``: pure JVM expression (regexp chain) — drops
  script/style/comment blocks, strips tags, decodes the ubiquitous
  named entities, collapses whitespace. Runs inside whole-stage
  codegen at full scan speed; the right default for bulk quality
  scoring where per-tag fidelity doesn't matter.
- ``html_extract``: real parse via stdlib ``html.parser`` in an
  Arrow-batched mapInPandas stage — title, visible text (script/
  style/noscript/template subtrees dropped, block boundaries
  normalized to newlines), link count and link-character density
  (the classic boilerplate signal), heading/paragraph counts. The
  fidelity tier: entity-exact (numeric + the full HTML5 named set via
  html.unescape), malformed-markup tolerant (HTMLParser is a
  tolerant tokenizer, not a validator — unclosed tags cannot raise).

Both are per-row map-only — no shuffle, scales with the scan. The
oracle gate (queries.html_extract_report) authors md5-derived pages
and replays title/text/link arithmetic in DuckDB.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the entities worth decoding JVM-side (the full named set needs the
# real parser tier); ORDER MATTERS: &amp; last, or '&amp;lt;' would
# double-decode
_FAST_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                  ("&#39;", "'"), ("&apos;", "'"), ("&nbsp;", " "),
                  ("&amp;", "&")]


def strip_tags_fast(col: Column) -> Column:
    """JVM-side tag stripping: script/style/comment subtrees removed,
    tags dropped, common entities decoded, whitespace collapsed.
    Regex-based — a crude tier by design (CDATA, conditional comments
    and pathological nesting go to ``html_extract``); (?is) = dotall +
    case-insensitive."""
    c = F.regexp_replace(col, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _FAST_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(c, r"\s+", " "))


HTML_EXTRACT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("title", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("n_links", T.IntegerType(), True),
    T.StructField("link_density", T.DoubleType(), True),
    T.StructField("n_paragraphs", T.IntegerType(), True),
    T.StructField("n_headings", T.IntegerType(), True),
])

# subtrees whose text is never visible
_DROP = {"script", "style", "noscript", "template"}
# elements that imply a block boundary in the extracted text
_BLOCK = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
          "h5", "h6", "tr", "table", "section", "article", "header",
          "footer", "blockquote", "pre", "hr"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}
# void elements never get closing tags — they must not be treated as
# "unclosed drop/title starts" by the stack logic
_VOID = {"br", "hr", "img", "input", "meta", "link", "area", "base",
         "col", "embed", "source", "track", "wbr"}


class _Extractor(HTMLParser):
    """Module-level parser class (review r8: a per-call class
    definition paid MRO/descriptor construction per DOCUMENT in the
    hot path); one instance per document — HTMLParser keeps tokenizer
    state that is not safely reusable after malformed input."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list = []
        self.title_parts: list = []
        self.drop_depth = 0
        self.in_title = False
        self.link_depth = 0
        self.link_chars = 0
        self.n_links = 0
        self.n_paragraphs = 0
        self.n_headings = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
            return
        if self.drop_depth:
            # counts must describe VISIBLE content, like the text and
            # the density numerator do — a <p><a> inside noscript/
            # template is invisible boilerplate (review r8)
            return
        if tag == "title":
            self.in_title = True
        elif tag == "a":
            self.link_depth += 1
            self.n_links += 1
        elif tag == "p":
            self.n_paragraphs += 1
        elif tag in _HEADINGS:
            self.n_headings += 1
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_startendtag(self, tag, attrs):
        if self.drop_depth:
            return
        if tag in _BLOCK:
            self.parts.append("\n")
        if tag == "a":
            self.n_links += 1

    def handle_endtag(self, tag):
        if tag in _DROP and self.drop_depth:
            self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "title":
            self.in_title = False
        elif tag == "a" and self.link_depth:
            self.link_depth -= 1
        if tag in _BLOCK and tag not in _VOID:
            self.parts.append("\n")

    def handle_data(self, data):
        if self.drop_depth:
            return
        if self.in_title:
            self.title_parts.append(data)
            return
        self.parts.append(data)
        if self.link_depth:
            # collapsed length, matching the denominator's whitespace
            # normalization — pretty-printed anchors otherwise inflate
            # the density past 1.0 (review r8)
            self.link_chars += len(" ".join(data.split()))


def _extract_one(raw: str):
    """(title, text, n_links, link_density, n_paragraphs, n_headings)
    for one HTML string. html.parser is a tolerant tokenizer: broken
    markup yields best-effort text, never an exception."""
    x = _Extractor()
    x.feed(raw or "")
    x.close()
    # normalize: collapse intra-line whitespace, drop blank lines
    lines = []
    for chunk in "".join(x.parts).split("\n"):
        line = " ".join(chunk.split())
        if line:
            lines.append(line)
    text = "\n".join(lines)
    title = " ".join("".join(x.title_parts).split())
    n_text = len(text.replace("\n", ""))
    density = x.link_chars / n_text if n_text else 0.0
    return (title or None, text, x.n_links, density, x.n_paragraphs,
            x.n_headings)


def html_extract(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Arrow-batched real-parser extraction: one row per document with
    title / visible text / link stats / structure counts. Map-only, no
    shuffle — the Python parse IS the operator (the fast JVM tier is
    strip_tags_fast). html.parser never raises on malformed markup, so
    there is no on_error mode to need."""
    from .arrowmap import map_text_rows

    return map_text_rows(
        df, _extract_one,
        [f for f in HTML_EXTRACT_SCHEMA.fields if f.name != "doc_id"],
        html_col, id_col, id_out_name="doc_id",
        batch_partitions=batch_partitions)


# ----------------------------------------------------- main content
# HTML5 semantic containers whose subtrees are boilerplate by
# construction (the article body never lives in them)
_BOILER = {"nav", "aside", "footer"}

MAIN_CONTENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("main_text", T.StringType(), True),
    T.StructField("n_blocks", T.IntegerType(), True),
    T.StructField("n_kept", T.IntegerType(), True),
])


class _BlockExtractor(HTMLParser):
    """Segments visible text into BLOCKS at block-element boundaries,
    tracking per-block link-character mass and whether the block sits
    inside a semantic boilerplate container — the inputs the
    justext-style paragraph classifier needs (html_extract's
    _Extractor keeps only page-global link stats)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list = []   # (collapsed_text, link_chars, boiler)
        self._parts: list = []
        self._link_chars = 0
        self.drop_depth = 0
        self.boiler_depth = 0
        self.link_depth = 0
        self.in_title = False

    def _flush(self):
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars,
                                self.boiler_depth > 0))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _DROP:
            self.drop_depth += 1
            return
        if self.drop_depth:
            return
        if tag == "title":
            self.in_title = True
        elif tag == "a":
            self.link_depth += 1
        if tag in _BLOCK or tag in _BOILER:
            self._flush()
        if tag in _BOILER:
            self.boiler_depth += 1

    def handle_startendtag(self, tag, attrs):
        if not self.drop_depth and tag in _BLOCK:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP and self.drop_depth:
            self.drop_depth -= 1
            return
        if self.drop_depth:
            return
        if tag == "title":
            self.in_title = False
        elif tag == "a" and self.link_depth:
            self.link_depth -= 1
        if (tag in _BLOCK or tag in _BOILER) and tag not in _VOID:
            self._flush()
        if tag in _BOILER and self.boiler_depth:
            self.boiler_depth -= 1

    def handle_data(self, data):
        if self.drop_depth or self.in_title:
            return
        self._parts.append(data)
        if self.link_depth:
            self._link_chars += len(" ".join(data.split()))


def _main_content_one(raw: str, min_chars: int, max_link_density: float):
    """(main_text, n_blocks, n_kept) for one page: a block survives if
    it is outside nav/aside/footer, carries at least ``min_chars`` of
    collapsed text, and its link-character density is at most
    ``max_link_density`` — the justext/trafilatura-lite rule."""
    x = _BlockExtractor()
    x.feed(raw or "")
    x.close()
    x._flush()
    kept = []
    for text, link_chars, boiler in x.blocks:
        n = len(text)
        density = link_chars / n if n else 1.0
        if not boiler and n >= min_chars and density <= max_link_density:
            kept.append(text)
    return "\n".join(kept), len(x.blocks), len(kept)


def extract_main_content(
    df: DataFrame,
    html_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 25,
    max_link_density: float = 0.5,
    batch_partitions: int | None = None,
) -> DataFrame:
    """Boilerplate removal at corpus scale (r9): navigation chrome,
    footers, link farms and copyright stubs poison quality scores and
    dedup keys, so the training-text pipeline wants the ARTICLE BODY,
    not the page. Block-level classification (the justext family):
    text segments between block-element boundaries keep their own
    link-character mass; a block survives outside semantic boilerplate
    containers (nav/aside/footer subtrees drop whole) when it has
    >= ``min_chars`` of text at <= ``max_link_density`` link density.
    One Arrow map stage emits (id, main_text, n_blocks, n_kept). No
    shuffle — scales with the scan."""
    from .arrowmap import map_text_rows

    return map_text_rows(
        df, lambda s: _main_content_one(s, min_chars, max_link_density),
        [f for f in MAIN_CONTENT_SCHEMA.fields if f.name != "doc_id"],
        html_col, id_col, id_out_name="doc_id",
        batch_partitions=batch_partitions)
