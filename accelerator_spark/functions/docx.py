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

XLSX is tabular, not prose: ``xlsx_cells`` reads it as a CELL TABLE
(sheet, row, column, value, kind — sharedStrings resolved, workbook
rels walked, inline/formula/boolean cells typed), which is what
``operators/multimodal.extract_table_cells`` distributes; the prose
extractors refuse it by design.
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
    except Exception as e:
        # the central-directory parse raises beyond BadZipFile on
        # crafted archives (NotImplementedError "zip file version",
        # negative-seek ValueError; fuzz round 10)
        raise OfficeError(f"not a zip container: {e}") from None
    out = {}
    total = 0
    try:
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
                out[info.filename] = zf.read(info.filename)
    except OfficeError:
        raise
    except Exception as e:
        # crafted central directories surface zlib.error, EOFError,
        # negative-seek ValueError, NotImplementedError (unsupported
        # compression), BadZipFile... from zipfile's member machinery
        # (fuzz round 10) — the executor-task contract is ONE error
        # type for hostile input
        raise OfficeError(f"cannot read zip member: {e}") from None
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
        with zf:
            names = set(zf.namelist())
    except Exception:
        # a sniff answers "is this OOXML?" — any central-directory
        # parse failure (BadZipFile, but also NotImplementedError
        # "zip file version", negative-seek ValueError on crafted
        # offsets; fuzz round 10) means NO, never an exception
        return None
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


# ------------------------------------------------------------- xlsx
_R = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
      "relationships}")
_PKG_R = ("{http://schemas.openxmlformats.org/package/2006/"
          "relationships}")
_CELL_REF_RE = re.compile(r"^([A-Z]{1,3})(\d+)$")


def _si_text(si) -> str:
    """One <si> shared-string item: plain <t> or rich-text <r> runs."""
    return "".join(node.text or "" for node in si.iter(_W_NONE + "t"))


_W_NONE = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def xlsx_cells(data: bytes):
    """Yield (sheet_name, row, col_letters, value_str, kind) for every
    value-carrying cell of an XLSX workbook, sheets in workbook order.
    ``kind``: 's' shared/inline/formula string, 'n' number, 'b'
    boolean, 'e' error. Values stay STRINGS (the file stores them as
    text; typing them is the caller's schema decision — the tabular
    route the prose extractor points spreadsheets at). Formulas yield
    their cached <v> result."""
    # any xl/**.xml can be a rels target (POI-style absolute targets
    # included) — the non-xml members (media, vml) stay unread
    members = zip_read_members(
        data, lambda n: n.startswith("xl/") and n.endswith(
            (".xml", ".rels")))
    wb = members.get("xl/workbook.xml")
    if wb is None:
        raise OfficeError("no xl/workbook.xml (not an XLSX)")
    wb_root = _parse_xml(wb, "xl/workbook.xml")
    rels = {}
    rels_blob = members.get("xl/_rels/workbook.xml.rels")
    if rels_blob is not None:
        for rel in _parse_xml(rels_blob, "workbook rels").iter(
                _PKG_R + "Relationship"):
            rels[rel.get("Id")] = rel.get("Target", "")
    shared = []
    sst = members.get("xl/sharedStrings.xml")
    if sst is not None:
        shared = [_si_text(si) for si in
                  _parse_xml(sst, "sharedStrings").iter(_W_NONE + "si")]
    sheets = []
    for sh in wb_root.iter(_W_NONE + "sheet"):
        name = sh.get("name") or f"sheet{len(sheets) + 1}"
        target = rels.get(sh.get(_R + "id"), "")
        if not target:  # no rels part: fall back to position order
            target = f"worksheets/sheet{len(sheets) + 1}.xml"
        # normalize AFTER stripping the leading '/': an absolute
        # '/xl/worksheets/sheet1.xml' target must not double the
        # prefix (review r9b)
        t = target.lstrip("/")
        path = t if t.startswith("xl/") else "xl/" + t
        sheets.append((name, path))
    if not sheets:
        raise OfficeError("workbook declares no sheets")
    for name, path in sheets:
        blob = members.get(path)
        if blob is None:
            raise OfficeError(f"worksheet {path} missing from archive")
        root = _parse_xml(blob, path)
        for row_el in root.iter(_W_NONE + "row"):
            for c in row_el:
                if c.tag != _W_NONE + "c":
                    continue
                ref = c.get("r") or ""
                m = _CELL_REF_RE.match(ref)
                t = c.get("t", "n")
                if t == "inlineStr":
                    val = "".join(
                        n.text or "" for n in c.iter(_W_NONE + "t"))
                    kind = "s"
                else:
                    v = c.find(_W_NONE + "v")
                    if v is None or v.text is None:
                        continue  # style-only cell carries no value
                    val = v.text
                    if t == "s":
                        try:
                            idx = int(val)
                            if idx < 0:
                                raise IndexError  # no negative wrap
                            val = shared[idx]
                        except (ValueError, IndexError):
                            raise OfficeError(
                                "bad sharedStrings index") from None
                        kind = "s"
                    elif t == "str":
                        kind = "s"
                    elif t == "b":
                        kind = "b"
                        val = "true" if val.strip() == "1" else "false"
                    elif t == "e":
                        kind = "e"
                    else:
                        kind = "n"
                row_num = (int(m.group(2)) if m
                           else int(row_el.get("r", 0) or 0))
                if not 0 <= row_num <= 1_048_576:
                    # the xlsx row ceiling; an absurd reference would
                    # otherwise escape per-row containment as an Arrow
                    # int32 cast error at batch-yield time (review r9b)
                    raise OfficeError(f"cell row {row_num} out of the "
                                      "xlsx range")
                yield (name, row_num, m.group(1) if m else "",
                       val, kind)


def xlsx_build(sheets: dict) -> bytes:
    """Author a minimal XLSX (the gate half): {sheet_name: rows},
    each row a list of cell values — str cells go through
    sharedStrings (the real-writer path), bools as t=\"b\", numbers
    inline."""
    shared: list = []
    shared_at: dict = {}

    def col_letters(j: int) -> str:
        out = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            out = chr(65 + r) + out
        return out

    sheet_xmls = []
    for rows in sheets.values():
        body = []
        for i, row in enumerate(rows, start=1):
            cells = []
            for j, v in enumerate(row):
                ref = f"{col_letters(j)}{i}"
                if isinstance(v, bool):
                    cells.append(f'<c r="{ref}" t="b"><v>'
                                 f"{1 if v else 0}</v></c>")
                elif isinstance(v, str):
                    if v not in shared_at:
                        shared_at[v] = len(shared)
                        shared.append(v)
                    cells.append(f'<c r="{ref}" t="s"><v>'
                                 f"{shared_at[v]}</v></c>")
                elif v is None:
                    continue
                else:
                    cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            body.append(f'<row r="{i}">{"".join(cells)}</row>')
        ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        sheet_xmls.append(
            f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
            f'<sheetData>{"".join(body)}</sheetData></worksheet>')

    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = ("http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships")
    pkg = ("http://schemas.openxmlformats.org/package/2006/"
           "relationships")
    wb_sheets = "".join(
        f'<sheet name="{_xml_escape(nm)}" sheetId="{i + 1}" '
        f'r:id="rId{i + 1}"/>'
        for i, nm in enumerate(sheets))
    workbook = (f'<?xml version="1.0"?><workbook xmlns="{ns}" '
                f'xmlns:r="{rns}"><sheets>{wb_sheets}</sheets>'
                "</workbook>")
    rels = "".join(
        f'<Relationship Id="rId{i + 1}" Type="{rns}/worksheet" '
        f'Target="worksheets/sheet{i + 1}.xml"/>'
        for i in range(len(sheets)))
    sst = ('<?xml version="1.0"?><sst xmlns="%s" count="%d" '
           'uniqueCount="%d">%s</sst>'
           % (ns, len(shared), len(shared),
              "".join(f"<si><t xml:space=\"preserve\">"
                      f"{_xml_escape(s)}</t></si>" for s in shared)))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels",
                    f'<?xml version="1.0"?><Relationships '
                    f'xmlns="{pkg}">{rels}</Relationships>')
        zf.writestr("xl/sharedStrings.xml", sst)
        for i, xml in enumerate(sheet_xmls):
            zf.writestr(f"xl/worksheets/sheet{i + 1}.xml", xml)
    return buf.getvalue()
