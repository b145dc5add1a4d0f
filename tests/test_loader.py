"""Document loader tests (type detection, text-family formats, gating)."""

import json

import pytest

from triple_hybrid_rag_tpu.loader import (
    DocumentLoader,
    UnsupportedFormatError,
    detect_file_type,
)
from triple_hybrid_rag_tpu.types import FileType, Modality


def test_detect_by_extension():
    assert detect_file_type("a.pdf") == FileType.PDF
    assert detect_file_type("a.md") == FileType.MD
    assert detect_file_type("a.csv") == FileType.CSV
    assert detect_file_type("a.PNG") == FileType.IMAGE
    assert detect_file_type("a.xyz") == FileType.UNKNOWN


def test_detect_by_magic():
    assert detect_file_type("noext", b"%PDF-1.7 rest") == FileType.PDF
    assert detect_file_type("noext", b"\x89PNG\r\n\x1a\nxxxx") == FileType.IMAGE
    assert detect_file_type("a.xlsx", b"PK\x03\x04zip") == FileType.XLSX


def test_load_text(tmp_path):
    p = tmp_path / "doc.md"
    p.write_text("# Title\n\nSome content here.")
    doc = DocumentLoader().load(p)
    assert doc.file_type == FileType.MD
    assert doc.pages[0].text.startswith("# Title")
    assert "Some content" in doc.full_text


def test_load_long_text_paginates(tmp_path):
    p = tmp_path / "big.txt"
    p.write_text("\n\n".join(f"Paragraph {i} " + "word " * 100 for i in range(30)))
    doc = DocumentLoader().load(p)
    assert len(doc.pages) > 1
    assert doc.pages[0].page_number == 1
    assert doc.pages[1].page_number == 2


def test_load_csv_as_markdown_table(tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("name,price\nwidget,10\ngadget,20\n")
    doc = DocumentLoader().load(p)
    assert doc.pages[0].modality == Modality.TABLE
    assert "| name | price |" in doc.pages[0].text
    assert "| widget | 10 |" in doc.pages[0].text


def test_load_json_flattened(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"a": {"b": 1}, "items": ["x", "y"]}))
    doc = DocumentLoader().load(p)
    text = doc.full_text
    assert "a.b: 1" in text
    assert "items.0: x" in text


def test_load_html_strips_tags(tmp_path):
    p = tmp_path / "page.html"
    p.write_text(
        "<html><head><style>.x{color:red}</style></head>"
        "<body><h1>Main Title</h1><p>Hello <b>world</b></p>"
        "<script>alert(1)</script></body></html>"
    )
    doc = DocumentLoader().load(p)
    text = doc.full_text
    assert "# Main Title" in text
    assert "Hello" in text and "world" in text
    assert "alert" not in text and "color:red" not in text


def test_image_without_ocr_raises(tmp_path):
    p = tmp_path / "img.png"
    p.write_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(UnsupportedFormatError):
        DocumentLoader().load(p)


def test_image_with_ocr(tmp_path):
    from triple_hybrid_rag_tpu.types import OCRResult

    class StubOCR:
        def process_image(self, data, mode=None):
            return OCRResult(text="extracted text", confidence=0.9, mode="base")

    # minimal valid PNG header with 10x10 dims
    import struct

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 10, 10) + b"\x00" * 16
    p = tmp_path / "img.png"
    p.write_bytes(png)
    doc = DocumentLoader(ocr_processor=StubOCR()).load(p)
    assert doc.pages[0].text == "extracted text"
    assert doc.pages[0].modality == Modality.IMAGE
    assert doc.pages[0].ocr_confidence == 0.9


def test_pdf_gated_without_deps(tmp_path):
    p = tmp_path / "f.pdf"
    p.write_bytes(b"%PDF-1.4 fake")
    with pytest.raises(UnsupportedFormatError, match="no text extractable"):
        DocumentLoader().load(p)


def test_load_html_tables_to_markdown(tmp_path):
    p = tmp_path / "page.html"
    p.write_text(
        "<html><body><h2>Prices</h2>"
        "<table><tr><th>item</th><th>price</th></tr>"
        "<tr><td>setup</td><td><b>100</b></td></tr>"
        "<tr><td>monthly</td><td>40</td></tr></table>"
        "<p>After the table.</p></body></html>"
    )
    doc = DocumentLoader().load(p)
    text = doc.full_text
    assert "## Prices" in text
    assert "| item | price |" in text
    assert "| setup | 100 |" in text  # nested tags stripped
    assert "After the table." in text
