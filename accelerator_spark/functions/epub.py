"""Pure-stdlib EPUB text extraction.

EPUB is ZIP + XHTML: ``META-INF/container.xml`` names the OPF package
file, whose ``<manifest>`` maps ids to hrefs and whose ``<spine>``
lists the reading order. Each spine document is XHTML — extracted
with the SAME real-parser tier the crawl front uses
(operators/html._extract_one), so entity handling, block boundaries
and script/style dropping behave identically across the web and
ebook corpora.

Scope: EPUB 2 and 3 container layout, spine-ordered text, ``dc:title``
metadata. NOT handled: DRM'd books (they keep their ZIP layout but
encrypt the spine documents — extraction yields the loud XML/zip
errors, never silent garbage), fixed-layout rendition metadata.
Budgets mirror functions/docx.py (shared zip reader).
"""

from __future__ import annotations

import io
import posixpath
import zipfile
from xml.etree import ElementTree

from .docx import OfficeError, zip_read_members

_CNT = "{urn:oasis:names:tc:opendocument:xmlns:container}"
_OPF = "{http://www.idpf.org/2007/opf}"
_DC = "{http://purl.org/dc/elements/1.1/}"


class EpubError(OfficeError):
    """Malformed, DRM'd, or unsupported-by-scope EPUB input."""


def _opf_path(members: dict) -> str:
    blob = members.get("META-INF/container.xml")
    if blob is None:
        raise EpubError("no META-INF/container.xml (not an EPUB)")
    try:
        root = ElementTree.fromstring(blob)
    except ElementTree.ParseError as e:
        raise EpubError(f"malformed container.xml: {e}") from None
    for rf in root.iter(_CNT + "rootfile"):
        path = rf.get("full-path")
        if path:
            return path
    raise EpubError("container.xml names no rootfile")


def epub_text(data: bytes, max_docs: int = 10_000) -> tuple:
    """(title, text, n_docs): spine-ordered visible text of every
    content document, extracted with the crawl front's real HTML
    parser; documents joined by newline."""
    from ..operators.html import _extract_one

    # three targeted passes (container -> OPF -> spine docs), never
    # the whole archive: an image/font/audio-heavy but legitimate
    # book must not blow the decompressed-size budget on members the
    # text path never needs (review r9); each pass decompresses only
    # the selected members
    members = zip_read_members(
        data, lambda n: n == "META-INF/container.xml")
    opf_at = _opf_path(members)
    opf_blob = zip_read_members(
        data, lambda n: n == opf_at).get(opf_at)
    if opf_blob is None:
        raise EpubError(f"rootfile {opf_at} missing from archive")
    try:
        opf = ElementTree.fromstring(opf_blob)
    except ElementTree.ParseError as e:
        raise EpubError(f"malformed OPF: {e}") from None
    title = None
    for t in opf.iter(_DC + "title"):
        title = (t.text or "").strip() or None
        break
    hrefs = {}
    for item in opf.iter(_OPF + "item"):
        iid, href = item.get("id"), item.get("href")
        if iid and href:
            hrefs[iid] = href
    base = posixpath.dirname(opf_at)
    spine_paths = []
    for ref in opf.iter(_OPF + "itemref"):
        idref = ref.get("idref")
        href = hrefs.get(idref)
        if href is None:
            raise EpubError(f"spine idref {idref!r} not in manifest")
        spine_paths.append(
            posixpath.normpath(posixpath.join(base, href)))
        if len(spine_paths) > max_docs:
            raise EpubError("spine document budget exceeded")
    wanted = set(spine_paths)
    docs = zip_read_members(data, lambda n: n in wanted)
    texts = []
    n_docs = 0
    for path in spine_paths:
        blob = docs.get(path)
        if blob is None:
            raise EpubError(f"spine document {path} missing")
        n_docs += 1
        # XHTML decodes as UTF-8 by spec; tolerate the odd latin-1 book
        try:
            html = blob.decode("utf-8")
        except UnicodeDecodeError:
            html = blob.decode("latin-1")
        _title, text, *_ = _extract_one(html)
        if text:
            texts.append(text)
    if n_docs == 0:
        raise EpubError("empty spine")
    return title, "\n".join(texts), n_docs


# --------------------------------------------------------------- builder
def epub_build(title: str, chapters) -> bytes:
    """Author a minimal EPUB (the gate half): one XHTML chapter per
    entry (lines become <p> paragraphs), spine in list order."""
    from .docx import _xml_escape

    manifest = []
    spine = []
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr(
            "META-INF/container.xml",
            '<?xml version="1.0"?><container version="1.0" xmlns='
            '"urn:oasis:names:tc:opendocument:xmlns:container">'
            '<rootfiles><rootfile full-path="OEBPS/content.opf" '
            'media-type="application/oebps-package+xml"/></rootfiles>'
            '</container>')
        for i, ch in enumerate(chapters):
            body = "".join(f"<p>{_xml_escape(line)}</p>"
                           for line in ch.split("\n"))
            zf.writestr(
                f"OEBPS/ch{i}.xhtml",
                "<?xml version='1.0' encoding='utf-8'?><html><head>"
                f"<title>c{i}</title></head><body>{body}</body></html>")
            manifest.append(f'<item id="c{i}" href="ch{i}.xhtml" '
                            'media-type="application/xhtml+xml"/>')
            spine.append(f'<itemref idref="c{i}"/>')
        zf.writestr(
            "OEBPS/content.opf",
            '<?xml version="1.0"?><package xmlns="http://www.idpf.org/'
            '2007/opf" version="3.0" unique-identifier="id"><metadata '
            'xmlns:dc="http://purl.org/dc/elements/1.1/"><dc:title>'
            f"{_xml_escape(title)}</dc:title></metadata><manifest>"
            f"{''.join(manifest)}</manifest><spine>{''.join(spine)}"
            "</spine></package>")
    return buf.getvalue()
