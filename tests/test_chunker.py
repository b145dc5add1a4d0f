"""Hierarchical chunker tests (reference test_rag2_chunker.py coverage model)."""

from triple_hybrid_rag_tpu.chunker import (
    HierarchicalChunker,
    RecursiveSplitter,
    extract_tables,
    restore_tables,
)
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.types import Modality, content_hash

DOC_HASH = "f" * 64


def _mk(cfg=None):
    return HierarchicalChunker(cfg or RAGConfig())


def test_short_doc_single_parent_child():
    parents, children = _mk().chunk_document("Hello world. This is a tiny document.", DOC_HASH)
    assert len(parents) == 1
    assert len(children) == 1
    assert parents[0].parent_id == f"{DOC_HASH[:16]}:0"
    assert children[0].chunk_id == f"{DOC_HASH[:16]}:0:0"
    assert children[0].parent_id == parents[0].parent_id


def test_stable_ids_and_hashes_deterministic():
    text = "word " * 3000
    p1, c1 = _mk().chunk_document(text, DOC_HASH)
    p2, c2 = _mk().chunk_document(text, DOC_HASH)
    assert [p.parent_id for p in p1] == [p.parent_id for p in p2]
    assert [c.chunk_id for c in c1] == [c.chunk_id for c in c2]
    assert [c.hash for c in c1] == [c.hash for c in c2]
    assert c1[0].hash == content_hash(c1[0].text)


def test_parent_and_child_size_limits():
    text = "\n\n".join(
        " ".join(f"Sentence number {p}-{s} has some filler words here." for s in range(40))
        for p in range(60)
    )
    cfg = RAGConfig()
    parents, children = _mk(cfg).chunk_document(text, DOC_HASH)
    assert len(parents) > 1
    assert all(p.token_count <= cfg.parent_chunk_tokens * 1.05 for p in parents)
    child_budget = cfg.child_chunk_tokens * (1 + cfg.child_token_buffer_pct)
    # overlap prefix can push a child slightly over its budget
    assert all(c.token_count <= child_budget + cfg.child_chunk_overlap_tokens + 16 for c in children)
    assert len(children) >= len(parents)


def test_children_have_overlap():
    text = ". ".join(f"unique{i} sentence {i} content here" for i in range(400))
    cfg = RAGConfig()
    _, children = _mk(cfg).chunk_document(text, DOC_HASH)
    same_parent = [c for c in children if c.parent_idx == 0]
    assert len(same_parent) >= 2
    # the head of child i+1 should repeat the tail of child i
    tail = same_parent[0].text[-30:].split()
    assert any(w in same_parent[1].text[:300] for w in tail if len(w) > 3)


def test_table_atomicity():
    table = "\n".join(["| col_a | col_b |", "|---|---|"] + [f"| r{i} | v{i} |" for i in range(30)])
    text = ("Paragraph before. " * 100) + "\n\n" + table + "\n\n" + ("Paragraph after. " * 100)
    cfg = RAGConfig(parent_chunk_tokens=120, child_chunk_tokens=40)
    parents, children = _mk(cfg).chunk_document(text, DOC_HASH)
    holders = [c for c in children if "| r0 | v0 |" in c.text]
    assert len(holders) == 1  # the whole table lives in exactly one child
    assert "| r29 | v29 |" in holders[0].text
    assert holders[0].modality == Modality.TABLE


def test_heading_tracking():
    text = (
        "# Introduction\n" + "Intro text. " * 200
        + "\n## Payment Terms\n" + "Payment detail. " * 200
    )
    cfg = RAGConfig(parent_chunk_tokens=150, child_chunk_tokens=60)
    parents, _ = _mk(cfg).chunk_document(text, DOC_HASH)
    assert parents[0].section_heading == "Introduction"
    assert any(p.section_heading == "Payment Terms" for p in parents)


def test_page_provenance():
    page1 = "First page content. " * 100
    page2 = "Second page content. " * 100
    text = page1 + page2
    page_map = [(0, len(page1), 1), (len(page1), len(text), 2)]
    cfg = RAGConfig(parent_chunk_tokens=200, child_chunk_tokens=80)
    parents, children = _mk(cfg).chunk_document(text, DOC_HASH, page_map)
    assert parents[0].page_start == 1
    assert parents[-1].page_end == 2
    assert all(1 <= c.page_start <= c.page_end <= 2 for c in children)


def test_page_provenance_after_table():
    """Page attribution stays correct past a table (placeholder offset shift).

    A long table shrinks to a short placeholder in the masked text; offsets after it
    shift by (table length - placeholder length). Content on page 3 (after the table)
    must still be attributed to page 3, not dragged back into the table's pages.
    """
    page1 = "Alpha page content. " * 60
    table = "\n".join(f"| row {i} | value {i} | more details {i} |" for i in range(80))
    page2 = table + "\n"
    page3 = "Gamma page content. " * 60
    text = page1 + page2 + page3
    page_map = [
        (0, len(page1), 1),
        (len(page1), len(page1) + len(page2), 2),
        (len(page1) + len(page2), len(text), 3),
    ]
    cfg = RAGConfig(parent_chunk_tokens=120, child_chunk_tokens=60)
    parents, _ = _mk(cfg).chunk_document(text, DOC_HASH, page_map)
    # the parent containing the tail text must be attributed to page 3
    tail_parents = [p for p in parents if "Gamma page content" in p.text and "| row" not in p.text]
    assert tail_parents, "expected a pure page-3 parent"
    assert all(p.page_start == 3 and p.page_end == 3 for p in tail_parents)
    # the parent holding the table must cover page 2
    table_parents = [p for p in parents if "| row 5 |" in p.text]
    assert table_parents and all(p.page_start <= 2 <= p.page_end for p in table_parents)


def test_extract_restore_tables_roundtrip():
    text = "before\n| a | b |\n|---|---|\n| 1 | 2 |\nafter"
    masked, tables = extract_tables(text)
    assert len(tables) == 1
    assert "| a | b |" not in masked
    assert restore_tables(masked, tables) == text


def test_recursive_splitter_hard_split():
    s = RecursiveSplitter(chunk_tokens=10, separators=("",))
    chunks = s.split_text("x" * 500)
    assert all(len(c) <= 40 for c in chunks)
    assert "".join(chunks) == "x" * 500


def test_empty_document():
    parents, children = _mk().chunk_document("", DOC_HASH)
    assert parents == [] and children == []


def test_image_chunk():
    c = _mk().create_image_chunk(DOC_HASH, 2, 5, "a chart of revenue", page=3)
    assert c.modality == Modality.IMAGE
    assert c.chunk_id.endswith(":2:5")
    assert c.page_start == 3
