"""Quality-harness tests: metric math vs oracles, config ladder sanity."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.eval import (
    evaluate_baseline_configs,
    make_eval_corpus,
    mrr,
    ndcg_at_k,
    recall_at_k,
)


def test_recall_at_k():
    assert recall_at_k(["a", "b", "c"], {"a", "c"}, k=2) == 0.5
    assert recall_at_k(["a", "b", "c"], {"a", "c"}, k=3) == 1.0
    assert recall_at_k([], {"a"}, k=5) == 0.0
    assert recall_at_k(["a"], set(), k=5) == 0.0


def test_ndcg_at_k():
    # perfect ranking
    assert ndcg_at_k(["a", "b"], {"a", "b"}, k=2) == pytest.approx(1.0)
    # relevant item at rank 2 only: dcg = 1/log2(3), idcg = 1/log2(2)
    got = ndcg_at_k(["x", "a"], {"a"}, k=2)
    assert got == pytest.approx((1 / np.log2(3)) / 1.0)
    assert ndcg_at_k(["x", "y"], {"a"}, k=2) == 0.0


def test_mrr():
    assert mrr(["x", "a"], {"a"}) == 0.5
    assert mrr(["a"], {"a"}) == 1.0
    assert mrr(["x"], {"a"}) == 0.0


def test_eval_corpus_structure(small_config):
    cfg = small_config.replace(embedding_dtype="float32")
    data = make_eval_corpus(cfg, docs_per_topic=2, distractors=5)
    assert len(data.corpus) > 10
    assert data.queries
    kinds = {q.kind for q in data.queries}
    assert kinds == {"keyword", "paraphrase", "entity"}
    for q in data.queries:
        assert q.relevant_chunk_ids  # every query has labeled relevant chunks


@pytest.mark.slow
def test_baseline_config_ladder():
    """Hybrid fusion must not be worse than the weakest single channel, and the full
    pipeline must retrieve meaningfully (recall@10 well above random)."""
    # bowhash: this test checks the LADDER MACHINERY with the historical embedder;
    # trained-encoder quality has its own tests (test_pretrain.py)
    results = evaluate_baseline_configs(
        RAGConfig(
            capacity_round=64, embedding_dim=256, embedding_dim_full=512,
            embedding_dtype="float32", safety_threshold=0.0, final_top_k=10,
            rerank_top_k=20, denoise_alpha=0.0, embedder_backend="bowhash",
        ),
        k=10,
    )
    r = {name: m["recall@10"] for name, m in results.items()}
    n = {name: m["ndcg@10"] for name, m in results.items()}
    # all configs must be far above random (distractors >> relevant)
    assert r["1_lexical_only"] > 0.3
    assert r["3_dual_hybrid_rrf"] > 0.3
    assert r["5_full_pipeline"] > 0.3
    # dual hybrid at least as good as the weaker single channel
    assert r["3_dual_hybrid_rrf"] >= min(r["1_lexical_only"], r["2_dense_only"]) - 1e-6
    # ndcg sane
    assert 0.0 < n["5_full_pipeline"] <= 1.0


@pytest.mark.slow
def test_engine_quality_matches_staged():
    """Retrieval quality through the batched engine equals the staged path."""
    from triple_hybrid_rag_tpu.eval import evaluate, make_eval_corpus
    from triple_hybrid_rag_tpu.index.graph_index import build_graph_index
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = RAGConfig(
        capacity_round=64, embedding_dim=128, embedding_dim_full=256,
        embedding_dtype="float32", safety_threshold=0.0, final_top_k=10,
        rerank_top_k=20, denoise_alpha=0.0, embedder_backend="bowhash",
    )
    data = make_eval_corpus(cfg, docs_per_topic=2, distractors=10)
    gidx = build_graph_index(data.entity_store, data.corpus, cfg)
    ret = Retriever(data.corpus, cfg, graph_index=gidx)
    eng = ShardedEngine(ret, corpus_mesh())
    m_staged = evaluate(lambda q: ret.retrieve(q, top_k=10), data.queries, k=10)
    m_engine = evaluate(lambda q: eng.retrieve(q, top_k=10), data.queries, k=10)
    assert m_engine["recall@10"] == pytest.approx(m_staged["recall@10"], abs=1e-9)
    assert m_engine["ndcg@10"] == pytest.approx(m_staged["ndcg@10"], abs=1e-9)
    assert m_staged["recall@10"] > 0.5


def test_hard_negative_corpus_quality(small_config):
    """Quality holds when distractors REUSE topic vocabulary (ranking stress)."""
    from triple_hybrid_rag_tpu.eval import evaluate, make_eval_corpus
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = RAGConfig(
        capacity_round=64, embedding_dim=128, embedding_dim_full=256,
        embedding_dtype="float32", safety_threshold=0.0, final_top_k=10,
        rerank_top_k=20, denoise_alpha=0.0, graph_enabled=False,
        embedder_backend="bowhash",
    )
    data = make_eval_corpus(cfg, docs_per_topic=2, distractors=10, hard_negatives=3)
    # hard negatives exist and are NOT labeled relevant
    hard = [c for c in data.corpus.children if "Office Memo" in c.text]
    assert hard
    all_relevant = set().union(*(q.relevant_chunk_ids for q in data.queries))
    assert not any(h.chunk_id in all_relevant for h in hard)
    ret = Retriever(data.corpus, cfg)
    m = evaluate(lambda q: ret.retrieve(q, top_k=10), data.queries, k=10)
    assert m["recall@10"] > 0.5  # ranking survives lexical-overlap decoys


def test_stdlib_eval_corpus_is_independent():
    """Inverse-cloze eval over stdlib docstrings: text the builder did not write.
    The held-out query sentence must be REMOVED from its indexed document."""
    from triple_hybrid_rag_tpu.eval import evaluate, make_stdlib_eval

    cfg = RAGConfig(
        capacity_round=64, embedding_dim=64, embedding_dim_full=128,
        embedding_dtype="float32", safety_threshold=0.0, graph_enabled=False,
        embedder_backend="bowhash",
    )
    data = make_stdlib_eval(cfg, n_docs=60, n_queries=20, seed=3)
    assert len(data.queries) >= 10
    by_id = {c.chunk_id: c for c in data.corpus.children}
    for q in data.queries[:5]:
        assert q.kind == "cloze"
        for cid in q.relevant_chunk_ids:
            assert q.text not in by_id[cid].text  # genuinely held out
    from triple_hybrid_rag_tpu.retrieval import Retriever

    ret = Retriever(data.corpus, cfg)
    m = evaluate(lambda q: ret.retrieve(q, top_k=10), data.queries, k=10)
    assert m["recall@10"] > 0.5  # real-text retrieval works at all


def test_multi_source_docstring_harvest():
    """Package-docstring sources (numpy/jax/...) extend the independent corpus;
    the budget splits across sources so stdlib cannot crowd them out."""
    from triple_hybrid_rag_tpu.eval import _stdlib_documents

    docs = _stdlib_documents(max_docs=60, sources=("stdlib", "numpy", "einops"))
    assert len(docs) == 60
    tops = {d[0].split(".")[0] for d in docs}
    assert "numpy" in tops and "einops" in tops
    assert any(t not in ("numpy", "einops") for t in tops)  # stdlib present
    # deterministic given the installed versions
    again = _stdlib_documents(max_docs=60, sources=("stdlib", "numpy", "einops"))
    assert [d[0] for d in docs] == [d[0] for d in again]


def test_maxsim_query_weights_downweight_function_words():
    from triple_hybrid_rag_tpu.analyzer import Analyzer
    from triple_hybrid_rag_tpu.retrieval import FUNCTION_WORD_WEIGHT, maxsim_query_weights

    an = Analyzer(RAGConfig())
    w = maxsim_query_weights("when do invoices get settled", an, max_tokens=8)
    toks = an.tokenize("when do invoices get settled")
    assert toks[:3] == ["invoice", "get", "settled"]
    assert w[0] == 1.0 and w[1] == FUNCTION_WORD_WEIGHT and w[2] == 1.0
    assert np.all(w[len(toks):] == 0.0)  # padding slots


def test_rerank_blend_rrf_staged_engine_parity():
    """rerank_blend_rrf folds fused RRF evidence into the rerank score the same
    way in the staged retriever and the batched engine."""
    import jax

    from triple_hybrid_rag_tpu.facade import RAG
    from triple_hybrid_rag_tpu.parallel.engine import ShardedEngine

    cfg = RAGConfig(
        capacity_round=64, embedding_dim=64, embedding_dim_full=128,
        embedding_dtype="float32", safety_threshold=0.0, graph_enabled=False,
        embedder_backend="bowhash", rerank_blend_rrf=0.3, denoise_alpha=0.0,
    )
    rag = RAG(config=cfg)
    rag.ingest_text("invoices are settled within thirty days", name="a.md")
    rag.ingest_text("employees accrue twenty days of leave", name="b.md")
    rag.ingest_text("the cluster uses a leaf spine topology", name="c.md")
    staged = rag.query("when are invoices settled")
    eng = ShardedEngine(rag.retriever)
    batched = eng.retrieve_batch(["when are invoices settled"])[0]
    assert staged.results and batched.results
    assert staged.results[0].chunk_id == batched.results[0].chunk_id
    # engine ships query payloads f16 (host->device wire format): small skew ok
    np.testing.assert_allclose(
        staged.results[0].rerank_score, batched.results[0].rerank_score, atol=1e-3
    )
