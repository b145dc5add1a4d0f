"""Tool layer, RAG 1.0 legacy path, and multimodal embedding tests."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.facade import RAG
from triple_hybrid_rag_tpu.legacy import FlatChunker, HybridSearcher, LegacySearchConfig
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder, HashEmbedder
from triple_hybrid_rag_tpu.tools import make_knowledge_tools


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        graph_enabled=True, embedding_dtype="float32", safety_threshold=0.2
    )


@pytest.fixture
def rag(cfg):
    r = RAG(config=cfg)
    r.ingest_text(
        "# Payments\n\nAcme Corp settles invoices within thirty days. "
        "Maria Silva works for Acme Corp.", name="pay.md",
    )
    r.ingest_text("# Wildlife\n\nRed foxes inhabit the northern forest.", name="wild.md")
    return r


# ---------------------------------------------------------------------------
# tool layer (reference crm_knowledge.py / tools/server.py parity)
# ---------------------------------------------------------------------------


def test_tool_definitions(rag):
    reg = make_knowledge_tools(rag)
    assert set(reg.names()) == {"search_knowledge_base", "lookup_entity", "ingest_document"}
    defs = reg.definitions()
    skb = next(d for d in defs if d["function"]["name"] == "search_knowledge_base")
    assert skb["function"]["parameters"]["required"] == ["query"]


def test_search_knowledge_base_tool(rag):
    reg = make_knowledge_tools(rag)
    out = reg.call("search_knowledge_base", query="invoice settlement days")
    assert out["success"] is True
    assert out["sources"]
    assert "invoices" in out["context"].lower()
    assert "timings_ms" in out
    assert out["sources"][0]["channels"]


def test_tool_refusal_shape(rag, cfg):
    rag.ingestor.config = cfg.replace(safety_threshold=0.999)
    rag._retriever = None  # force rebuild with strict threshold
    rag.ingestor.corpus._dirty = True
    reg = make_knowledge_tools(rag)
    out = reg.call("search_knowledge_base", query="zzz qqq nothing")
    assert out["success"] is False
    assert out.get("no_suitable_context") is True


def test_lookup_entity_tool(rag):
    reg = make_knowledge_tools(rag)
    out = reg.call("lookup_entity", name="Acme Corp")
    assert out["success"] and out["entities"]
    assert out["entities"][0]["name"] == "Acme Corp"


def test_unknown_tool_and_error(rag):
    reg = make_knowledge_tools(rag)
    assert reg.call("nope")["success"] is False
    out = reg.call("search_knowledge_base")  # missing required arg
    assert out["success"] is False


# ---------------------------------------------------------------------------
# legacy RAG 1.0 path
# ---------------------------------------------------------------------------


def test_flat_chunker():
    text = "Sentence one here. " * 200
    parents, children = FlatChunker().chunk_document(text, "a" * 64)
    assert len(parents) == len(children) > 1
    assert all(p.parent_id == c.parent_id for p, c in zip(parents, children))
    assert all(len(c.text) <= 1400 for c in children)  # ~1000 chars + overlap slack


def test_hybrid_searcher_unweighted_rrf(cfg):
    store = CorpusStore()
    fc = FlatChunker()
    import hashlib

    for name, text in {
        "a": "payment invoice settlement billing quarterly penalty terms",
        "b": "forest foxes wildlife habitat bears hibernation winter",
        "c": "password security portal authentication rotation access",
    }.items():
        p, c = fc.chunk_document(text * 3, hashlib.sha256(name.encode()).hexdigest())
        store.add_chunks(p, c)
    hs = HybridSearcher(store, cfg, LegacySearchConfig(top_k=2))
    results = hs.search_query("invoice payment")
    assert results
    assert "invoice" in results[0].text
    # un-weighted rrf: both-channel hit -> 2/(60+rank+1) ballpark
    assert 0 < results[0].rrf_score <= 2 / 61 + 1e-9
    assert set(results[0].source_channels) <= {"bm25", "vector"}


# ---------------------------------------------------------------------------
# multimodal embeddings
# ---------------------------------------------------------------------------


def test_image_embeddings_deterministic():
    e = HashEmbedder(dim=32)
    a = e.embed_images([b"imagebytes1", b"imagebytes2"])
    b = e.embed_images([b"imagebytes1"])
    np.testing.assert_array_equal(a[0], b[0])
    assert abs(float(a[0] @ a[1])) < 0.6  # distinct images ~orthogonal
    np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, rtol=1e-5)


def test_embed_mixed(small_config):
    e = BowHashEmbedder(dim=64, config=small_config)
    out = e.embed_mixed([("text", "payment invoice"), ("image", b"pngbytes"), ("text", "the a")])
    assert out.shape == (3, 64)
    assert np.any(out[0]) and np.any(out[1])
    assert not np.any(out[2])  # stopword-only text -> zero (fail-soft)
