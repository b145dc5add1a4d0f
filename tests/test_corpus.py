"""Corpus store tests (idempotency, dedup, row assignment)."""

import pytest

from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.types import (
    ChildChunk,
    Document,
    IngestionStatus,
    ParentChunk,
)


def _parent(i, doc="d" * 16):
    return ParentChunk(parent_id=f"{doc}:{i}", doc_id=doc, parent_idx=i, text=f"parent {i} text")


def _child(p, c, text=None, doc="d" * 16):
    return ChildChunk(
        chunk_id=f"{doc}:{p}:{c}",
        parent_id=f"{doc}:{p}",
        doc_id=doc,
        parent_idx=p,
        child_idx=c,
        text=text or f"child {p}-{c} text",
    )


def test_row_assignment_and_lookup():
    s = CorpusStore()
    res = s.add_chunks([_parent(0), _parent(1)], [_child(0, 0), _child(0, 1), _child(1, 0)])
    assert res.added_parents == 2 and res.added_children == 3
    assert s.child_by_row(1).chunk_id.endswith(":0:1")
    assert s.parent_rows() == [0, 0, 1]
    assert s.parent_row_of_child(2) == 1


def test_content_dedup():
    s = CorpusStore()
    s.add_chunks([_parent(0)], [_child(0, 0, text="same text")])
    res = s.add_chunks([_parent(1)], [_child(1, 0, text="same text")])
    assert res.deduped_children == 1
    assert len(s) == 1


def test_chunk_id_dedup_reingest():
    s = CorpusStore()
    s.add_chunks([_parent(0)], [_child(0, 0)])
    res = s.add_chunks([_parent(0)], [_child(0, 0)])
    assert res.added_parents == 0 and res.added_children == 0
    assert res.deduped_children == 1


def test_orphan_child_rejected():
    s = CorpusStore()
    with pytest.raises(KeyError):
        s.add_chunks([], [_child(9, 0)])


def test_document_idempotency():
    s = CorpusStore()
    doc = Document(doc_id="abc", filename="a.txt", status=IngestionStatus.COMPLETED)
    assert s.register_document(doc) is True
    assert s.register_document(doc) is False  # already completed
    assert s.register_document(doc, force=True) is True


def test_state_roundtrip():
    s = CorpusStore()
    s.register_document(Document(doc_id="abc", filename="a.txt"))
    s.add_chunks([_parent(0)], [_child(0, 0), _child(0, 1)])
    s2 = CorpusStore.from_state(s.to_state())
    assert s2.stats() == s.stats()
    assert s2.parent_rows() == s.parent_rows()


def test_dirty_tracking():
    s = CorpusStore()
    assert not s.dirty
    s.add_chunks([_parent(0)], [_child(0, 0)])
    assert s.dirty
    s.mark_clean()
    assert not s.dirty
