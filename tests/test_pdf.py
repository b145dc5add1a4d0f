"""Built-in minimal PDF text extraction tests (stdlib-only path)."""

import zlib

import pytest

from triple_hybrid_rag_tpu.loader import DocumentLoader, UnsupportedFormatError
from triple_hybrid_rag_tpu.pdf_text import extract_pdf_text


def make_pdf(content_streams, compress=True) -> bytes:
    """Assemble a minimal but structurally-plausible PDF around content streams."""
    parts = [b"%PDF-1.4\n"]
    for i, content in enumerate(content_streams):
        body = zlib.compress(content) if compress else content
        filt = b"/Filter /FlateDecode " if compress else b""
        parts.append(
            b"%d 0 obj\n<< %s/Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (i + 4, filt, len(body), body)
        )
    parts.append(b"trailer\n<< /Root 1 0 R >>\n%%EOF\n")
    return b"".join(parts)


CONTENT_1 = (
    b"BT /F1 12 Tf 72 720 Td (Payment terms require settlement) Tj "
    b"0 -14 Td (within thirty days of invoice.) Tj ET"
)
CONTENT_2 = (
    b"BT 72 720 Td [(Termination) -300 (clause) -300 (requires notice.)] TJ ET"
)


def test_extract_flate_literal_strings():
    pages = extract_pdf_text(make_pdf([CONTENT_1]))
    assert len(pages) == 1
    assert "Payment terms require settlement" in pages[0]
    assert "within thirty days" in pages[0]
    # Td positioning produced a line break
    assert "settlement\nwithin" in pages[0].replace(" \n", "\n")


def test_extract_tj_array_with_kerning_spaces():
    pages = extract_pdf_text(make_pdf([CONTENT_2]))
    assert pages and "Termination clause requires notice." in pages[0]


def test_extract_uncompressed_and_multipage():
    pages = extract_pdf_text(make_pdf([CONTENT_1, CONTENT_2], compress=False))
    assert len(pages) == 2


def test_extract_hex_strings():
    content = b"BT <5061796d656e74> Tj ET"  # "Payment"
    assert "Payment" in extract_pdf_text(make_pdf([content]))[0]


def test_escapes_and_octal():
    content = rb"BT (paren \( close \) and \164ab) Tj ET"
    out = extract_pdf_text(make_pdf([content]))[0]
    assert "paren ( close )" in out and "tab" in out


def test_encrypted_returns_empty():
    data = make_pdf([CONTENT_1])
    data = data.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R")
    assert extract_pdf_text(data) == []


def test_garbage_returns_empty():
    assert extract_pdf_text(b"%PDF-1.4 not really") == []


def test_loader_pdf_end_to_end(tmp_path):
    p = tmp_path / "doc.pdf"
    p.write_bytes(make_pdf([CONTENT_1, CONTENT_2]))
    doc = DocumentLoader().load(p)
    assert doc.pages[0].page_number == 1
    assert "Payment terms" in doc.full_text
    assert "Termination clause" in doc.full_text


def test_loader_unextractable_pdf_raises(tmp_path):
    p = tmp_path / "scan.pdf"
    p.write_bytes(b"%PDF-1.4\n1 0 obj\n<<>>\nendobj\ntrailer\n%%EOF")
    with pytest.raises(UnsupportedFormatError, match="no text extractable"):
        DocumentLoader().load(p)


def test_pdf_ingest_to_query(tmp_path, small_config):
    from triple_hybrid_rag_tpu.facade import RAG

    cfg = small_config.replace(graph_enabled=False, embedding_dtype="float32",
                               safety_threshold=0.2)
    p = tmp_path / "policy.pdf"
    p.write_bytes(make_pdf([CONTENT_1]))
    rag = RAG(config=cfg)
    res = rag.ingest(p)
    assert res.status.value == "completed" and res.n_children >= 1
    r = rag.query("invoice settlement days")
    assert not r.refused
    assert "settlement" in r.results[0].text.lower()
