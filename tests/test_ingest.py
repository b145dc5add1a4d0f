"""Ingestion pipeline tests (idempotency, dedup, retry ladder, end-to-end —
reference test_rag2_ingest.py coverage model, 19 tests per COMPLETION_REPORT)."""

import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.ingest import Ingestor, hash_file
from triple_hybrid_rag_tpu.types import IngestionStatus


@pytest.fixture
def cfg(small_config):
    return small_config.replace(graph_enabled=True, embedding_dtype="float32",
                                safety_threshold=0.2)


@pytest.fixture
def doc_file(tmp_path):
    p = tmp_path / "policy.md"
    p.write_text(
        "# Payment Policy\n\nAcme Corp requires settlement within thirty days. "
        "Invoices route through Beta Logistics for approval. "
        + " ".join(f"Clause {i} covers billing case {i}." for i in range(60))
    )
    return p


def test_hash_file_stable(doc_file):
    assert hash_file(doc_file) == hash_file(doc_file)
    assert len(hash_file(doc_file)) == 64


def test_ingest_end_to_end(cfg, doc_file):
    ing = Ingestor(config=cfg)
    res = ing.ingest_file(doc_file)
    assert res.status == IngestionStatus.COMPLETED
    assert not res.skipped
    assert res.n_parents >= 1 and res.n_children >= 1
    assert res.n_entities >= 1  # Acme Corp / Beta Logistics extracted
    assert res.n_mentions >= 1
    for stage in ("hash_ms", "load_ms", "chunk_ms", "embed_ms", "store_ms", "total_ms"):
        assert stage in res.timings
    assert ing.corpus.stats()["documents"] == 1


def test_ingest_idempotent(cfg, doc_file):
    ing = Ingestor(config=cfg)
    r1 = ing.ingest_file(doc_file)
    r2 = ing.ingest_file(doc_file)
    assert not r1.skipped and r2.skipped
    assert len(ing.corpus) == r1.n_children  # nothing added twice
    r3 = ing.ingest_file(doc_file, force=True)
    assert not r3.skipped
    assert r3.n_deduped >= r1.n_children  # content dedup caught everything


def test_ingest_failure_marks_status(cfg, tmp_path):
    p = tmp_path / "bad.pdf"
    p.write_bytes(b"%PDF-1.4 not really a pdf")
    ing = Ingestor(config=cfg)
    res = ing.ingest_file(p)
    assert res.status == IngestionStatus.FAILED
    assert "no text extractable" in (res.error or "")
    assert ing.corpus.documents[res.doc_id].status == IngestionStatus.FAILED


def test_ner_retry_then_skip(cfg, doc_file):
    class FlakyExtractor:
        def __init__(self):
            self.calls = 0

        def extract(self, parent, children):
            self.calls += 1
            raise RuntimeError("NER down")

    ext = FlakyExtractor()
    ing = Ingestor(config=cfg, extractor=ext)
    res = ing.ingest_file(doc_file)
    # pipeline continues despite NER failure (reference ingest.py:575-596)
    assert res.status == IngestionStatus.COMPLETED
    assert res.n_entities == 0
    assert "NER failed" in (res.error or "")
    assert ext.calls >= 3  # retried per parent


def test_ner_disabled(cfg, doc_file):
    ing = Ingestor(config=cfg.replace(ner_enabled=False))
    res = ing.ingest_file(doc_file)
    assert res.n_entities == 0 and res.error is None


def test_progress_callback(cfg, doc_file):
    stages = []
    ing = Ingestor(config=cfg)
    ing.ingest_file(doc_file, progress=lambda s, f: stages.append((s, f)))
    names = [s for s, _ in stages]
    assert names[0] == "registered" and names[-1] == "completed"
    fracs = [f for _, f in stages]
    assert fracs == sorted(fracs)


def test_ingest_text_convenience(cfg):
    ing = Ingestor(config=cfg)
    res = ing.ingest_text("Hello world content for testing purposes.", name="note.md")
    assert res.status == IngestionStatus.COMPLETED
    assert res.filename == "note.md"


def test_ingest_directory(cfg, tmp_path):
    for i in range(3):
        (tmp_path / f"d{i}.txt").write_text(f"Document {i} content about topic {i}.")
    ing = Ingestor(config=cfg)
    results = ing.ingest_directory(tmp_path)
    assert len(results) == 3
    assert all(r.status == IngestionStatus.COMPLETED for r in results)


def test_make_retriever_round_trip(cfg, doc_file, tmp_path):
    (tmp_path / "other.md").write_text("# Wildlife\n\nFoxes inhabit the northern forest.")
    ing = Ingestor(config=cfg)
    ing.ingest_file(doc_file)
    ing.ingest_file(tmp_path / "other.md")
    ret = ing.make_retriever()
    r = ret.retrieve("invoice settlement thirty days")
    assert not r.refused
    assert "settlement" in r.results[0].parent_text.lower()
    r2 = ret.retrieve("foxes in the forest")
    assert "fox" in r2.results[0].text.lower()


def test_embedding_failure_degrades_to_zero_vectors(cfg, doc_file):
    class BrokenEmbedder:
        dim = cfg.embedding_dim_full

        def embed_texts(self, texts):
            raise RuntimeError("embedding server down")

        def embed_query(self, text):
            raise RuntimeError("down")

    ing = Ingestor(config=cfg, embedder=BrokenEmbedder())
    res = ing.ingest_file(doc_file)
    assert res.status == IngestionStatus.COMPLETED  # graceful degradation
    assert ing.embedder.last_errors  # failures recorded


def test_embedder_dim_differs_from_config_full_dim(cfg):
    """Regression: the staging matrix must size to the embedder's ACTUAL width.

    The packaged trained encoder is 1024-native while embedding_dim_full
    defaults to 2048 (the reference's API model); sizing the matrix from config
    crashed `RAG()` out of the box with a broadcast error (round 2)."""

    class NarrowEmbedder:
        dim = cfg.embedding_dim  # narrower than cfg.embedding_dim_full

        def embed_texts(self, texts):
            import numpy as np

            out = np.zeros((len(texts), self.dim), np.float32)
            out[:, 0] = 1.0
            return out

        def embed_query(self, text):
            import numpy as np

            v = np.zeros(self.dim, np.float32)
            v[0] = 1.0
            return v

    assert cfg.embedding_dim < cfg.embedding_dim_full
    ing = Ingestor(config=cfg, embedder=NarrowEmbedder())
    ing.ingest_text("Payment invoices settle within thirty days.", name="pay.md")
    ret = ing.make_retriever()  # crashed before the fix
    assert ret.dense_index is not None
    assert ret.dense_index.dim == cfg.embedding_dim
