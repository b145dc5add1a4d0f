"""Structured graph-query executor + CallableReranker adapter tests."""

import hashlib

import numpy as np
import pytest

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
from triple_hybrid_rag_tpu.models.entity_extractor import EntityStore, RuleBasedExtractor
from triple_hybrid_rag_tpu.models.reranker import CallableReranker, NoopReranker, get_reranker
from triple_hybrid_rag_tpu.retrieval import Retriever

DOCS = {
    "acme.md": ("# Acme\n\nAcme Corp is located in Lisbon. John Smith works for Acme Corp. "
                "Acme Corp uses CloudStack Systems."),
    "cloud.md": "# Cloud\n\nCloudStack Systems provides hosting. CloudStack Systems is located in Porto.",
}


@pytest.fixture
def gidx(small_config):
    cfg = small_config.replace(embedding_dtype="float32")
    corpus, store = CorpusStore(), EntityStore()
    ck, ex = HierarchicalChunker(cfg), RuleBasedExtractor(cfg)
    for name, text in DOCS.items():
        p, c = ck.chunk_document(text, hashlib.sha256(name.encode()).hexdigest())
        corpus.add_chunks(p, c)
        for parent in p:
            store.store_extraction(ex.extract(parent, [x for x in c if x.parent_id == parent.parent_id]))
    return build_graph_index(store, corpus, cfg), corpus


def test_execute_lookup(gidx):
    g, _ = gidx
    out = g.execute_query({"op": "lookup", "entity": "Acme Corp"})
    assert out["nodes"][0]["name"] == "Acme Corp"


def test_execute_related(gidx):
    g, _ = gidx
    out = g.execute_query({"op": "related", "entity": "Acme Corp"})
    assert any(n["name"] == "John Smith" for n in out["nodes"])


def test_execute_path(gidx):
    g, _ = gidx
    out = g.execute_query({"op": "path", "from": "John Smith", "to": "CloudStack Systems"})
    assert out["found"]
    assert [n["name"] for n in out["nodes"]][0] == "John Smith"


def test_execute_neighborhood_returns_chunks(gidx):
    g, corpus = gidx
    out = g.execute_query({"op": "neighborhood", "entity": "John Smith", "hops": 2})
    assert out["chunk_rows"]
    assert len(out["chunk_rows"]) == len(out["chunk_scores"])
    texts = [corpus.child_by_row(r).text for r in out["chunk_rows"]]
    assert any("Acme" in t for t in texts)


def test_execute_keywords(gidx):
    g, _ = gidx
    out = g.execute_query({"op": "keywords", "keywords": ["CloudStack"], "limit": 4})
    assert out["chunk_rows"]


def test_execute_unknown_op(gidx):
    g, _ = gidx
    with pytest.raises(ValueError):
        g.execute_query({"op": "drop table"})


# ---------------------------------------------------------------------------
# CallableReranker
# ---------------------------------------------------------------------------


def test_callable_reranker_scores_and_fallback(small_config):
    import jax.numpy as jnp

    cfg = small_config
    ids = jnp.asarray(np.array([0, 1, -1], np.int32))
    fused = jnp.asarray(np.array([0.03, 0.02, 0.0], np.float32))
    texts = {0: "relevant text", 1: "irrelevant"}

    def llm(query, docs):
        return [0.9 if d.startswith("relevant") else 0.2 for d in docs]

    rr = CallableReranker(llm, lambda i: texts[i], NoopReranker(cfg), cfg)
    out = np.asarray(rr.score({"query_text": "q"}, ids, fused))
    assert out[0] == pytest.approx(0.9) and out[1] == pytest.approx(0.2)
    assert out[2] == 0.0  # invalid slot

    def broken(query, docs):
        raise RuntimeError("llm down")

    rr2 = CallableReranker(broken, lambda i: texts[i], NoopReranker(cfg), cfg)
    out2 = np.asarray(rr2.score({"query_text": "q"}, ids, fused))
    assert out2[0] == pytest.approx(1.0)  # noop fallback: minmax-normalized fused


def test_callable_reranker_candidate_cap(small_config):
    """rerank_max_candidates truncates the pool sent to the model (reference
    reranker.py:383 caps at 50); uncapped slots keep score 0 (unreranked tail)."""
    import jax.numpy as jnp

    cfg = small_config.replace(rerank_max_candidates=2)
    ids = jnp.asarray(np.array([3, 1, 4, -1], np.int32))
    fused = jnp.asarray(np.array([0.04, 0.03, 0.02, 0.0], np.float32))
    texts = {1: "b", 3: "a", 4: "c"}
    seen = []

    def llm(query, docs):
        seen.append(list(docs))
        return [0.5] * len(docs)

    rr = CallableReranker(llm, lambda i: texts[i], NoopReranker(cfg), cfg)
    out = np.asarray(rr.score({"query_text": "q"}, ids, fused))
    assert seen == [["a", "b"]]  # only the top-2 fused candidates hit the model
    assert out[0] == out[1] == pytest.approx(0.5)
    assert out[2] == 0.0 and out[3] == 0.0


def test_retriever_with_llm_reranker(small_config):
    cfg = small_config.replace(graph_enabled=False, embedding_dtype="float32",
                               safety_threshold=0.2)
    corpus = CorpusStore()
    ck = HierarchicalChunker(cfg)
    for name, text in {
        "a.md": "Invoices settle within thirty days.",
        "b.md": "Foxes inhabit the northern forest.",
    }.items():
        p, c = ck.chunk_document(text, hashlib.sha256(name.encode()).hexdigest())
        corpus.add_chunks(p, c)
    retr = Retriever(corpus, cfg)

    calls = []

    def llm(query, docs):
        calls.append(query)
        return [0.95 if "Invoices" in d else 0.1 for d in docs]

    retr.reranker = get_reranker(
        cfg, maxsim_index=retr.maxsim_index,
        llm_fn=llm, texts_of=lambda row: retr.corpus.parent_by_row(row).text,
    )
    r = retr.retrieve("invoice settlement")
    assert calls and calls[0] == "invoice settlement"
    assert r.results[0].rerank_score == pytest.approx(0.95)
