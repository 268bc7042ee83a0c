"""Pure-stdlib OOXML (DOCX / PPTX) text extraction.

Office documents are the second-biggest text carrier in scraped
corpora after HTML and PDF, and the modern formats are ZIP + XML —
``zipfile`` + ``xml.etree`` all the way down:

- **DOCX** (WordprocessingML): ``word/document.xml``, text in
  ``w:p`` paragraphs -> ``w:r`` runs -> ``w:t`` text nodes, with
  ``w:tab``/``w:br``/``w:cr`` as tab/linebreak; tables walk the same
  way (``w:tc`` cells hold paragraphs).
- **PPTX** (PresentationML): one ``ppt/slides/slideN.xml`` per slide
  (numeric order), text in ``a:t`` nodes grouped by ``a:p``
  paragraphs.

Hostile-input posture: per-member and total decompressed-size budgets
before any member is read (zip bombs advertise their sizes in the
central directory — a lying local header fails zipfile's CRC check),
element-count budget on the XML walk, and loud errors for
not-a-zip / missing-part / malformed-XML payloads so the operator's
``on_error`` containment (operators/multimodal.py) can do its job.

XLSX is NOT text-extracted (a spreadsheet's meaning is tabular — the
right ingestion is a table source, not a prose string); the probe
still identifies it so corpora can route it.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree


class OfficeError(ValueError):
    """Malformed, hostile, or unsupported-by-scope OOXML input."""


_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"


def zip_read_members(data: bytes, want, member_budget: int = 64 << 20,
                     total_budget: int = 256 << 20) -> dict:
    """{name: bytes} for the archive members ``want(name)`` selects,
    with decompressed-size budgets enforced from the central directory
    BEFORE any byte is inflated."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile as e:
        raise OfficeError(f"not a zip container: {e}") from None
    out = {}
    total = 0
    with zf:
        for info in zf.infolist():
            if not want(info.filename):
                continue
            if info.file_size > member_budget:
                raise OfficeError(
                    f"member {info.filename} declares "
                    f"{info.file_size} bytes (budget {member_budget})")
            total += info.file_size
            if total > total_budget:
                raise OfficeError("archive decompressed-size budget "
                                  "exceeded")
            try:
                out[info.filename] = zf.read(info.filename)
            except (zipfile.BadZipFile, NotImplementedError) as e:
                raise OfficeError(
                    f"cannot read member {info.filename}: {e}") from None
    return out


def _parse_xml(blob: bytes, what: str) -> ElementTree.Element:
    try:
        return ElementTree.fromstring(blob)
    except ElementTree.ParseError as e:
        raise OfficeError(f"malformed XML in {what}: {e}") from None


def _walk_budget(root, budget: int = 2_000_000):
    n = 0
    for el in root.iter():
        n += 1
        if n > budget:
            raise OfficeError("XML element budget exceeded")
        yield el


def docx_text(data: bytes) -> tuple:
    """(text, n_paragraphs) from a DOCX: paragraphs joined by newline,
    runs concatenated in document order, tabs and breaks preserved."""
    members = zip_read_members(
        data, lambda n: n == "word/document.xml")
    blob = members.get("word/document.xml")
    if blob is None:
        raise OfficeError("no word/document.xml (not a DOCX)")
    root = _parse_xml(blob, "word/document.xml")
    paras = []
    for el in _walk_budget(root):
        if el.tag == _W + "p":
            parts = []
            for node in el.iter():
                if node.tag == _W + "t":
                    parts.append(node.text or "")
                elif node.tag == _W + "tab":
                    parts.append("\t")
                elif node.tag in (_W + "br", _W + "cr"):
                    parts.append("\n")
            paras.append("".join(parts))
    text = "\n".join(p for p in paras if p.strip())
    return text, len(paras)


_SLIDE_RE = re.compile(r"^ppt/slides/slide(\d+)\.xml$")


def pptx_text(data: bytes) -> tuple:
    """(text, n_slides): slide texts in numeric slide order, one line
    per a:p paragraph, slides separated by newline."""
    members = zip_read_members(
        data, lambda n: _SLIDE_RE.match(n) is not None)
    if not members:
        raise OfficeError("no ppt/slides/*.xml (not a PPTX)")
    slides = sorted(members,
                    key=lambda n: int(_SLIDE_RE.match(n).group(1)))
    out = []
    for name in slides:
        root = _parse_xml(members[name], name)
        lines = []
        for el in _walk_budget(root):
            if el.tag == _A + "p":
                run = "".join(node.text or "" for node in el.iter()
                              if node.tag == _A + "t")
                if run.strip():
                    lines.append(run)
        out.append("\n".join(lines))
    text = "\n".join(s for s in out if s)
    return text, len(slides)


def office_kind(data: bytes) -> str | None:
    """'docx' / 'pptx' / 'xlsx' / None by the zip's member names (the
    MIME-independent sniff — scraped files lie about extensions)."""
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return None
    with zf:
        names = set(zf.namelist())
    if "word/document.xml" in names:
        return "docx"
    if any(_SLIDE_RE.match(n) for n in names) \
            or "ppt/presentation.xml" in names:
        return "pptx"
    if "xl/workbook.xml" in names:
        return "xlsx"
    return None


def office_extract_text(data: bytes) -> tuple:
    """(kind, text, n_units) with kind-appropriate routing; XLSX is
    identified but not prose-extracted (module scope note)."""
    kind = office_kind(data)
    if kind == "docx":
        text, n = docx_text(data)
    elif kind == "pptx":
        text, n = pptx_text(data)
    elif kind == "xlsx":
        raise OfficeError("xlsx is tabular, not prose (route to a "
                          "table source)")
    else:
        raise OfficeError("not an OOXML container")
    return kind, text, n


# --------------------------------------------------------------- builder
_CT_DOCX = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types"><Default Extension="xml" ContentType="application/'
    'xml"/><Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.'
    'document.main+xml"/></Types>')


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def docx_build(paragraphs) -> bytes:
    """Author a minimal DOCX (the test-harness/gate half): one w:p per
    entry, each newline inside an entry becoming a w:br, tabs w:tab."""
    body = []
    for p in paragraphs:
        runs = []
        for i, seg in enumerate(p.split("\n")):
            if i:
                runs.append(f"<w:br/>")
            parts = seg.split("\t")
            for j, piece in enumerate(parts):
                if j:
                    runs.append("<w:tab/>")
                runs.append('<w:t xml:space="preserve">'
                            f"{_xml_escape(piece)}</w:t>")
        body.append(f"<w:p><w:r>{''.join(runs)}</w:r></w:p>")
    doc = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           '<w:document xmlns:w="http://schemas.openxmlformats.org/'
           'wordprocessingml/2006/main"><w:body>'
           + "".join(body) + "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CT_DOCX)
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def pptx_build(slides) -> bytes:
    """Author a minimal PPTX: one slide XML per entry, each newline
    inside an entry becoming its own a:p paragraph."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("ppt/presentation.xml",
                    '<?xml version="1.0"?><p:presentation xmlns:p='
                    '"http://schemas.openxmlformats.org/presentationml/'
                    '2006/main"/>')
        for i, slide in enumerate(slides, start=1):
            paras = "".join(
                f"<a:p><a:r><a:t>{_xml_escape(line)}</a:t></a:r></a:p>"
                for line in slide.split("\n"))
            zf.writestr(
                f"ppt/slides/slide{i}.xml",
                '<?xml version="1.0"?><p:sld xmlns:p="http://schemas.'
                'openxmlformats.org/presentationml/2006/main" xmlns:a='
                '"http://schemas.openxmlformats.org/drawingml/2006/'
                f'main"><p:txBody>{paras}</p:txBody></p:sld>')
    return buf.getvalue()
