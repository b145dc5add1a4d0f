"""Built-in DOCX/XLSX extraction tests (stdlib zip+XML path)."""

import io
import zipfile

import pytest

from triple_hybrid_rag_tpu.loader import DocumentLoader, UnsupportedFormatError
from triple_hybrid_rag_tpu.office_text import extract_docx_text, extract_xlsx_tables
from triple_hybrid_rag_tpu.types import FileType, Modality


def make_docx(document_xml: str) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("word/document.xml", document_xml)
    return buf.getvalue()


DOCX_XML = """<?xml version="1.0"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
<w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t>Payment Policy</w:t></w:r></w:p>
<w:p><w:r><w:t>Invoices settle within </w:t></w:r><w:r><w:t>thirty days.</w:t></w:r></w:p>
<w:tbl>
  <w:tr><w:tc><w:p><w:r><w:t>item</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>price</w:t></w:r></w:p></w:tc></w:tr>
  <w:tr><w:tc><w:p><w:r><w:t>setup</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>100 &amp; up</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
<w:p><w:r><w:t>Closing paragraph.</w:t></w:r></w:p>
</w:body></w:document>"""


def make_xlsx(shared, sheet_rows) -> bytes:
    buf = io.BytesIO()
    shared_xml = "<sst>" + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>"
    rows_xml = []
    for r, cells in enumerate(sheet_rows, start=1):
        cs = []
        for i, (ctype, val) in enumerate(cells):
            ref = f"{chr(65 + i)}{r}"
            if ctype == "s":
                cs.append(f'<c r="{ref}" t="s"><v>{val}</v></c>')
            else:
                cs.append(f'<c r="{ref}"><v>{val}</v></c>')
        rows_xml.append(f'<row r="{r}">{"".join(cs)}</row>')
    sheet_xml = f"<worksheet><sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("[Content_Types].xml", "<Types/>")
        zf.writestr("xl/sharedStrings.xml", shared_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def test_docx_extraction():
    text = extract_docx_text(make_docx(DOCX_XML))
    assert "# Payment Policy" in text
    assert "Invoices settle within thirty days." in text
    assert "| item | price |" in text
    assert "| setup | 100 & up |" in text  # entity unescaped
    assert "Closing paragraph." in text


def test_docx_loader_end_to_end(tmp_path):
    p = tmp_path / "policy.docx"
    p.write_bytes(make_docx(DOCX_XML))
    doc = DocumentLoader().load(p)
    assert doc.file_type == FileType.DOCX
    assert "Payment Policy" in doc.full_text


def test_xlsx_extraction():
    data = make_xlsx(
        ["item", "price", "setup", "monthly"],
        [[("s", 0), ("s", 1)], [("s", 2), ("n", 100)], [("s", 3), ("n", 40)]],
    )
    tables = extract_xlsx_tables(data)
    assert len(tables) == 1
    assert "| item | price |" in tables[0]
    assert "| setup | 100 |" in tables[0]


def test_xlsx_loader_end_to_end(tmp_path):
    p = tmp_path / "prices.xlsx"
    p.write_bytes(make_xlsx(["a", "b"], [[("s", 0), ("s", 1)], [("n", 1), ("n", 2)]]))
    doc = DocumentLoader().load(p)
    assert doc.file_type == FileType.XLSX
    assert doc.pages[0].modality == Modality.TABLE
    assert "| a | b |" in doc.pages[0].text


def test_corrupt_office_raises(tmp_path):
    p = tmp_path / "bad.docx"
    p.write_bytes(b"PK\x03\x04 not a zip")
    with pytest.raises(UnsupportedFormatError):
        DocumentLoader().load(p)


def test_office_ingest_to_query(tmp_path, small_config):
    from triple_hybrid_rag_tpu.facade import RAG

    cfg = small_config.replace(graph_enabled=False, embedding_dtype="float32",
                               safety_threshold=0.2)
    p = tmp_path / "policy.docx"
    p.write_bytes(make_docx(DOCX_XML))
    rag = RAG(config=cfg)
    assert rag.ingest(p).status.value == "completed"
    r = rag.query("invoice settlement thirty days")
    assert not r.refused and "Invoices" in r.results[0].parent_text
