"""End-to-end retriever tests on an in-memory corpus (mirrors the coverage model of
reference tests/test_rag2_triple_hybrid.py:22-70 — channel fusion, isolation, weights —
and test_rag2_e2e.py — deterministic embeddings, refusal)."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder
from triple_hybrid_rag_tpu.retrieval import Retriever

DOCS = {
    "payments.md": (
        "# Payment Policy\n\n"
        "Invoices must be settled within thirty days. Payment schedules follow the "
        "quarterly billing cycle. Late payment incurs a two percent penalty fee. "
        "All invoice disputes must be raised within ten business days."
    ),
    "contracts.md": (
        "# Contract Terms\n\n"
        "The termination clause requires ninety days written notice. Contract renewal "
        "is automatic unless either party objects. Breach of contract voids the "
        "renewal provision immediately."
    ),
    "wildlife.md": (
        "# Forest Wildlife\n\n"
        "Red foxes inhabit the northern forest alongside brown bears. The fox is a "
        "small omnivorous mammal. Bears hibernate during the winter months."
    ),
}


def build_corpus(cfg):
    store = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    for name, text in DOCS.items():
        import hashlib

        doc_id = hashlib.sha256(name.encode()).hexdigest()
        parents, children = chunker.chunk_document(text, doc_id)
        store.add_chunks(parents, children)
    return store


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        graph_enabled=False,
        embedding_dtype="float32",
        safety_threshold=0.3,
    )


@pytest.fixture
def retriever(cfg):
    return Retriever(build_corpus(cfg), cfg)


def test_dual_hybrid_end_to_end(retriever):
    r = retriever.retrieve("invoice payment penalty")
    assert not r.refused
    assert r.results
    top = r.results[0]
    assert "payment" in top.text.lower() or "invoice" in top.text.lower()
    assert top.parent_text  # parent expansion happened
    assert set(top.source_channels) <= {"lexical", "semantic"}
    assert len(top.source_channels) >= 1
    # stage timings recorded (reference retrieval.py:139-191 parity)
    for stage in ("planning_ms", "retrieval_ms", "fusion_ms", "expansion_ms",
                  "rerank_ms", "safety_ms", "total_ms"):
        assert stage in r.timings


def test_channel_isolation_lexical_only(cfg):
    c = cfg.replace(semantic_enabled=False)
    r = Retriever(build_corpus(c), c).retrieve("termination notice")
    assert not r.refused
    assert all(res.source_channels == ("lexical",) for res in r.results)
    assert all(res.semantic_score == 0.0 for res in r.results)


def test_channel_isolation_semantic_only(cfg):
    c = cfg.replace(lexical_enabled=False)
    r = Retriever(build_corpus(c), c).retrieve("termination notice for contracts")
    assert not r.refused
    assert all(res.source_channels == ("semantic",) for res in r.results)


def test_multi_channel_results_rank_higher(retriever):
    """A chunk found by both channels should beat single-channel chunks (RRF property)."""
    r = retriever.retrieve("fox forest")
    both = [res for res in r.results if len(res.source_channels) == 2]
    one = [res for res in r.results if len(res.source_channels) == 1]
    if both and one:
        assert max(b.rrf_score for b in both) >= max(o.rrf_score for o in one)


def test_refusal_on_garbage_query(cfg):
    c = cfg.replace(safety_threshold=0.99, rerank_backend="dot")
    r = Retriever(build_corpus(c), c).retrieve("zzz qqq xyzzy")
    assert r.refused
    assert r.results == []
    assert r.refusal_reason


def test_denoise_drops_weak_tail(cfg):
    c = cfg.replace(denoise_alpha=0.95, safety_threshold=0.0)
    r = Retriever(build_corpus(c), c).retrieve("invoice payment")
    assert not r.refused
    scores = [res.final_score for res in r.results]
    if len(scores) > 1:
        assert min(scores) >= 0.95 * max(scores) - 1e-6


def test_plan_weights_respected(cfg):
    """Zero semantic weight -> semantic-only chunks get rrf 0 (still candidates)."""
    store = build_corpus(cfg)
    ret = Retriever(store, cfg)

    class FixedPlanner:
        def plan(self, q, collection=None):
            from triple_hybrid_rag_tpu.types import QueryPlan

            return QueryPlan(
                original_query=q,
                keywords=["invoice", "payment"],
                semantic_query_text=q,
                weights={"lexical": 1.0, "semantic": 0.0, "graph": 0.0},
            )

    ret.planner = FixedPlanner()
    r = ret.retrieve("invoice payment")
    for res in r.results:
        if res.source_channels == ("semantic",):
            assert res.rrf_score == 0.0


def test_relational_blend_uses_fused_ranks(cfg):
    """A relational plan switches the ordering blend to rerank_blend_rrf_relational:
    at 1.0 the final ordering must equal the rerank-disabled (pure fused-RRF)
    ordering even though rerank runs."""
    from triple_hybrid_rag_tpu.types import QueryPlan

    class RelationalPlanner:
        def plan(self, q, collection=None):
            return QueryPlan(
                original_query=q, keywords=["invoice", "payment"],
                semantic_query_text=q, requires_graph=True, intent="relational",
                weights={"lexical": 1.0, "semantic": 0.8, "graph": 0.0},
            )

    c_rrf = cfg.replace(rerank_enabled=False)
    ret_rrf = Retriever(build_corpus(c_rrf), c_rrf)
    ret_rrf.planner = RelationalPlanner()
    want = [r.chunk_id for r in ret_rrf.retrieve("invoice payment").results]

    c_blend = cfg.replace(rerank_blend_rrf_relational=1.0)
    ret_blend = Retriever(build_corpus(c_blend), c_blend)
    ret_blend.planner = RelationalPlanner()
    got = [r.chunk_id for r in ret_blend.retrieve("invoice payment").results]
    assert got == want


def test_final_top_k_respected(retriever, cfg):
    r = retriever.retrieve("payment invoice days", top_k=2)
    assert len(r.results) <= 2


def test_deterministic_across_runs(cfg):
    r1 = Retriever(build_corpus(cfg), cfg).retrieve("contract renewal")
    r2 = Retriever(build_corpus(cfg), cfg).retrieve("contract renewal")
    assert [x.chunk_id for x in r1.results] == [x.chunk_id for x in r2.results]
    np.testing.assert_allclose(
        [x.final_score for x in r1.results], [x.final_score for x in r2.results]
    )


def test_context_text_property(retriever):
    r = retriever.retrieve("payment schedule billing")
    if r.results:
        ctx = r.context_text
        assert ctx
        assert r.results[0].parent_text.split("\n")[0] in ctx or r.results[0].text in ctx


def test_rerank_disabled_uses_rrf(cfg):
    c = cfg.replace(rerank_enabled=False, safety_enabled=False, denoise_enabled=False)
    r = Retriever(build_corpus(c), c).retrieve("invoice payment")
    assert r.results
    # final scores equal rrf scores when rerank+gates disabled
    for res in r.results:
        assert res.final_score == pytest.approx(res.rrf_score, rel=1e-5)


def test_module_level_retrieve_accepts_collection(small_config):
    """retrieve(corpus, q, collection=...) routes collection to the QUERY, not
    Retriever.__init__ (regression: TypeError)."""
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.retrieval import retrieve
    from triple_hybrid_rag_tpu.types import Document, IngestionStatus

    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="float32", safety_threshold=0.0
    )
    corpus = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    doc_id = hashlib.sha256(b"d").hexdigest()
    corpus.register_document(Document(
        doc_id=doc_id, filename="d.md", collection="sales",
        status=IngestionStatus.COMPLETED,
    ))
    p, c = chunker.chunk_document("Invoices settle in thirty days.", doc_id)
    corpus.add_chunks(p, c)
    r = retrieve(corpus, "invoices settle", top_k=3, collection="sales", config=cfg)
    assert r.results
    r2 = retrieve(corpus, "invoices settle", collection="other", config=cfg)
    assert r2.refused or not r2.results


def test_dot_reranker_parent_embeddings_dequantized(small_config):
    """int8 dense rows + dot rerank: parent embeddings must be dequantized unit
    vectors (regression: raw-int mean cast back to int8 collapsed every rerank
    score to the 0.5 neutral point and the gate refused everything)."""
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker

    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="int8", rerank_backend="dot",
        safety_threshold=0.2, denoise_enabled=False,
    )
    corpus = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    for i, t in enumerate([
        "Payment invoices settle in thirty days.",
        "Foxes live in the northern forest.",
    ]):
        p, c = chunker.chunk_document(t, hashlib.sha256(str(i).encode()).hexdigest())
        corpus.add_chunks(p, c)
    ret = Retriever(corpus, cfg)
    import jax.numpy as jnp

    emb = ret.reranker.parent_embeddings
    assert emb is not None and emb.dtype == jnp.float32
    norms = np.linalg.norm(np.asarray(emb)[: corpus.n_parents], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=5e-2)  # unit-ish, NOT zero
    r = ret.retrieve("payment invoices settle")
    assert r.results and not r.refused
    assert r.results[0].rerank_score is not None and r.results[0].rerank_score > 0.5
