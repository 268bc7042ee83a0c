"""OOXML (DOCX/PPTX) and EPUB text extraction tests
(functions/docx.py, functions/epub.py) plus the unified
extract_document_text operator's byte-sniff routing."""

import io
import zipfile

import pytest

from accelerator_spark.functions.docx import (
    OfficeError, docx_build, docx_text, office_extract_text,
    office_kind, pptx_build, pptx_text, zip_read_members)
from accelerator_spark.functions.epub import (
    EpubError, epub_build, epub_text)


def test_docx_roundtrip_and_structure():
    blob = docx_build(["Plain paragraph", "tab\there", "break\nhere",
                       "entities & <angles>"])
    text, n = docx_text(blob)
    assert n == 4
    assert text == ("Plain paragraph\ntab\there\nbreak\nhere\n"
                    "entities & <angles>")
    assert office_kind(blob) == "docx"


def test_docx_tables_and_empty_paragraphs():
    """Hand-authored document.xml: table cells walk like body
    paragraphs; empty w:p count but don't emit blank lines."""
    doc = ('<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
           'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
           "<w:p><w:r><w:t>before</w:t></w:r></w:p>"
           "<w:p/>"
           "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell</w:t></w:r></w:p>"
           "</w:tc></w:tr></w:tbl>"
           "<w:p><w:r><w:t>after</w:t></w:r></w:p>"
           "</w:body></w:document>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    text, n = docx_text(buf.getvalue())
    assert text == "before\ncell\nafter"
    assert n == 4  # the empty paragraph still counts


def test_pptx_slide_order():
    """Slides come back in NUMERIC order even when the archive stores
    slide10 before slide2 (string order would interleave them)."""
    blob = pptx_build([f"slide {i}" for i in range(1, 12)])
    text, n = pptx_text(blob)
    assert n == 11
    assert text.split("\n") == [f"slide {i}" for i in range(1, 12)]


def test_epub_roundtrip_spine_order():
    blob = epub_build("Title & Co", ["c0 line a\nc0 line b", "c1", "c2"])
    title, text, n = epub_text(blob)
    assert (title, n) == ("Title & Co", 3)
    assert text == "c0 line a\nc0 line b\nc1\nc2"


def test_epub_hostile():
    good = epub_build("t", ["x"])
    # not an epub: zip without container.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<d/>")
    with pytest.raises(EpubError, match="container.xml"):
        epub_text(buf.getvalue())
    # spine pointing at a missing document
    buf = io.BytesIO(good)
    with zipfile.ZipFile(buf) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    del names["OEBPS/ch0.xhtml"]
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for k, v in names.items():
            zf.writestr(k, v)
    with pytest.raises(EpubError, match="missing"):
        epub_text(out.getvalue())
    # DRM'd/garbled spine doc: malformed bytes still extract
    # best-effort via the tolerant HTML tier (no crash) — but a
    # malformed OPF is loud
    bad_opf = good.replace(b"<spine>", b"<spine")
    # same-length not possible; rebuild with corrupt opf instead
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for k, v in names.items():
            zf.writestr(k, v if k != "OEBPS/content.opf"
                        else v[: len(v) // 2])
    with pytest.raises(EpubError, match="malformed OPF"):
        epub_text(out.getvalue())
    del bad_opf


def test_zip_budgets_and_malformed():
    with pytest.raises(OfficeError, match="not a zip"):
        docx_text(b"PK\x03\x04 but truncated")
    # member-size budget read from the central directory
    big = docx_build(["x" * 1000])
    with pytest.raises(OfficeError, match="budget"):
        zip_read_members(big, lambda n: True, member_budget=10)
    with pytest.raises(OfficeError, match="budget"):
        zip_read_members(big, lambda n: True, total_budget=10)
    # zip without the docx part
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("other.txt", "hi")
    with pytest.raises(OfficeError, match="not a DOCX"):
        docx_text(buf.getvalue())
    assert office_kind(buf.getvalue()) is None
    assert office_kind(b"\x00\x01") is None
    # malformed XML is loud
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", "<w:document>")
    with pytest.raises(OfficeError, match="malformed XML"):
        docx_text(buf.getvalue())
    # xlsx identifies but refuses prose extraction
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", "<workbook/>")
    assert office_kind(buf.getvalue()) == "xlsx"
    with pytest.raises(OfficeError, match="tabular"):
        office_extract_text(buf.getvalue())


def test_extract_document_text_distributed(spark):
    from accelerator_spark.functions.pdf import pdf_build
    from accelerator_spark.operators.multimodal import (
        extract_document_text)

    rows = [
        (1, pdf_build(["pdf page"]), "application/pdf"),
        (2, docx_build(["word text"]), "application/msword"),  # lying mime
        (3, pptx_build(["deck text"]), None),
        (4, epub_build("Book T", ["chapter text"]), "application/epub+zip"),
        (5, b"neither pdf nor zip", "application/pdf"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, mime string")
    got = {r["media_id"]: r for r in
           extract_document_text(df, on_error="null").collect()}
    assert (got[1]["kind"], got[1]["text"], got[1]["n_units"]) == \
        ("pdf", "pdf page", 1)
    assert (got[2]["kind"], got[2]["text"]) == ("docx", "word text")
    assert (got[3]["kind"], got[3]["text"]) == ("pptx", "deck text")
    assert (got[4]["kind"], got[4]["title"], got[4]["text"]) == \
        ("epub", "Book T", "chapter text")
    assert got[5]["kind"] is None and got[5]["n_bytes"] == 19


def test_review_r9_epub_skips_media_members():
    """Review r9: epub_text reads container/OPF/spine docs only — a
    book with heavy media members never decompresses them (and a
    repeated spine entry still extracts per occurrence)."""
    good = epub_build("t", ["chapter body"])
    buf = io.BytesIO(good)
    with zipfile.ZipFile(buf) as zf:
        names = {n: zf.read(n) for n in zf.namelist()}
    names["OEBPS/video.bin"] = b"\x00" * 100_000
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for k, v in names.items():
            zf.writestr(k, v)
    title, text, n = epub_text(out.getvalue())
    assert (title, text, n) == ("t", "chapter body", 1)


def test_xlsx_cells_and_builder():
    from accelerator_spark.functions.docx import xlsx_build, xlsx_cells

    blob = xlsx_build({"Data": [["name", "qty"], ["apple", 3],
                                [None, 2.5]],
                       "Flags": [[True, False, "x & <y>"]]})
    assert office_kind(blob) == "xlsx"
    cells = list(xlsx_cells(blob))
    assert ("Data", 1, "A", "name", "s") in cells
    assert ("Data", 2, "B", "3", "n") in cells
    assert ("Data", 3, "B", "2.5", "n") in cells          # None skipped
    assert ("Flags", 1, "A", "true", "b") in cells
    assert ("Flags", 1, "B", "false", "b") in cells
    assert ("Flags", 1, "C", "x & <y>", "s") in cells     # entity round-trip
    assert not any(c[0] == "Data" and c[1] == 3 and c[2] == "A"
                   for c in cells)
    # sheets come back in workbook order
    assert [c[0] for c in cells] == ["Data"] * 5 + ["Flags"] * 3


def test_xlsx_hostile_and_variants():
    import pytest

    from accelerator_spark.functions.docx import xlsx_build, xlsx_cells

    # inline strings, formula-cached strings, error cells, 27+ columns
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
             '<row r="1">'
             '<c r="A1" t="inlineStr"><is><t>inline</t></is></c>'
             '<c r="AB1" t="str"><v>cached</v></c>'
             '<c r="AC1" t="e"><v>#DIV/0!</v></c>'
             '<c r="AD1"/>'                     # style-only, no value
             "</row></sheetData></worksheet>")
    wb = (f'<?xml version="1.0"?><workbook xmlns="{ns}"><sheets>'
          '<sheet name="S" sheetId="1"/></sheets></workbook>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)       # no rels: fallback path
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    cells = list(xlsx_cells(buf.getvalue()))
    assert ("S", 1, "A", "inline", "s") in cells
    assert ("S", 1, "AB", "cached", "s") in cells
    assert ("S", 1, "AC", "#DIV/0!", "e") in cells
    assert len(cells) == 3
    # bad sharedStrings index is loud (hand-authored: the builder's
    # zip is deflated, so a byte-replace can't reach the XML)
    bad_sheet = (f'<?xml version="1.0"?><worksheet xmlns="{ns}">'
                 '<sheetData><row r="1"><c r="A1" t="s"><v>9</v></c>'
                 "</row></sheetData></worksheet>")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
        zf.writestr("xl/worksheets/sheet1.xml", bad_sheet)
    with pytest.raises(OfficeError, match="sharedStrings index"):
        list(xlsx_cells(buf.getvalue()))
    # missing worksheet part is loud
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", wb)
    with pytest.raises(OfficeError, match="missing"):
        list(xlsx_cells(buf.getvalue()))
    # not an xlsx at all
    with pytest.raises(OfficeError, match="not an XLSX"):
        list(xlsx_cells(docx_build(["x"])))


def test_extract_table_cells_distributed(spark):
    from accelerator_spark.functions.docx import xlsx_build
    from accelerator_spark.operators.multimodal import (
        extract_table_cells)

    df = spark.createDataFrame(
        [(1, xlsx_build({"S": [["a", 1], ["b", 2]]})),
         (2, None), (3, b"PK garbage")],
        "media_id long, payload binary")
    with pytest.raises(Exception):
        extract_table_cells(df).collect()
    rows = extract_table_cells(df, on_error="null").collect()
    got = {(r["media_id"], r["sheet"], r["row"], r["col"]): r["value"]
           for r in rows}
    assert got[(1, "S", 1, "A")] == "a" and got[(1, "S", 2, "B")] == "2"
    assert got[(2, None, None, None)] is None
    assert got[(3, None, None, None)] is None
    # pivot-to-columns works downstream (the caller's schema decision)
    wide = (extract_table_cells(df.limit(1))
            .groupBy("media_id", "row").pivot("col", ["A", "B"])
            .agg({"value": "first"}).collect())
    assert {(r["row"], r["A"], r["B"]) for r in wide} == \
        {(1, "a", "1"), (2, "b", "2")}


def test_review_r9b_xlsx_hardening():
    """Review r9 pass 2: absolute rels targets resolve, negative
    sharedStrings indices and out-of-range rows are loud."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = ("http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships")
    pkg = ("http://schemas.openxmlformats.org/package/2006/"
           "relationships")
    from accelerator_spark.functions.docx import xlsx_cells

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml",
                    f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
                    '<sheet name="S" sheetId="1" r:id="rId1"/>'
                    "</sheets></workbook>")
        zf.writestr("xl/_rels/workbook.xml.rels",
                    f'<Relationships xmlns="{pkg}"><Relationship '
                    'Id="rId1" Type="x" '
                    'Target="/xl/worksheets/sheet1.xml"/>'
                    "</Relationships>")
        zf.writestr("xl/worksheets/sheet1.xml",
                    f'<worksheet xmlns="{ns}"><sheetData><row r="1">'
                    '<c r="A1"><v>7</v></c></row></sheetData>'
                    "</worksheet>")
    assert list(xlsx_cells(buf.getvalue())) == [("S", 1, "A", "7", "n")]

    def one_sheet(cell_xml, sst=None):
        b = io.BytesIO()
        with zipfile.ZipFile(b, "w") as zf:
            zf.writestr("xl/workbook.xml",
                        f'<workbook xmlns="{ns}"><sheets>'
                        '<sheet name="S" sheetId="1"/></sheets>'
                        "</workbook>")
            if sst:
                zf.writestr("xl/sharedStrings.xml", sst)
            zf.writestr("xl/worksheets/sheet1.xml",
                        f'<worksheet xmlns="{ns}"><sheetData>'
                        f'<row r="1">{cell_xml}</row></sheetData>'
                        "</worksheet>")
        return b.getvalue()

    with pytest.raises(OfficeError, match="sharedStrings index"):
        list(xlsx_cells(one_sheet(
            '<c r="A1" t="s"><v>-1</v></c>',
            f'<sst xmlns="{ns}"><si><t>SECRET</t></si></sst>')))
    with pytest.raises(OfficeError, match="out of the xlsx range"):
        list(xlsx_cells(one_sheet('<c r="A99999999999"><v>1</v></c>')))
