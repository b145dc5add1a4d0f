"""MaxSim late-interaction tests: op vs NumPy oracle, index, reranker wiring."""

import numpy as np
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.index.maxsim_index import build_maxsim_index
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder
from triple_hybrid_rag_tpu.ops.maxsim import maxsim_scores


def numpy_maxsim_oracle(doc_tokens, doc_mask, q_tokens, q_mask):
    """Independent implementation: mean over query tokens of clamp(max over doc tokens)."""
    K = doc_tokens.shape[0]
    out = np.zeros(K)
    qs = [q_tokens[j] for j in range(len(q_mask)) if q_mask[j]]
    for k in range(K):
        ds = [doc_tokens[k, t] for t in range(doc_mask.shape[1]) if doc_mask[k, t]]
        if not ds or not qs:
            out[k] = 0.0
            continue
        total = 0.0
        for q in qs:
            total += max(0.0, max(float(q @ d) for d in ds))
        out[k] = total / len(qs)
    return out


def test_maxsim_matches_oracle(rng):
    K, Td, Tq, D = 4, 6, 3, 8
    doc = rng.standard_normal((K, Td, D)).astype(np.float32)
    doc /= np.linalg.norm(doc, axis=-1, keepdims=True)
    q = rng.standard_normal((Tq, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    doc_mask = rng.random((K, Td)) > 0.3
    q_mask = np.array([True, True, False])
    valid = np.array([True, True, True, False])

    got = np.asarray(
        maxsim_scores(jnp.asarray(doc), jnp.asarray(doc_mask), jnp.asarray(q),
                      jnp.asarray(q_mask), jnp.asarray(valid))
    )
    want = numpy_maxsim_oracle(doc, doc_mask, q, q_mask)
    want[3] = 0.0  # invalid candidate
    want[~doc_mask.any(axis=1)] = 0.0
    np.testing.assert_allclose(got, want, atol=2e-2)  # bf16 einsum tolerance


def test_maxsim_exact_token_match_wins(small_config):
    cfg = small_config.replace(embedding_dtype="float32")
    emb = BowHashEmbedder(dim=64, config=cfg)
    texts = [
        "payment invoice settlement schedule",
        "fox forest wildlife habitat",
        "contract termination notice period",
    ]
    idx = build_maxsim_index(texts, emb, cfg)
    q = emb.token_embeddings(["invoice payment"], max_tokens=cfg.maxsim_query_tokens)[0]
    q_mask = np.any(q != 0, axis=-1)
    ids = jnp.asarray(np.array([0, 1, 2], np.int32))
    scores = np.asarray(
        idx.score_candidates(ids, jnp.asarray(q), jnp.asarray(q_mask))
    )
    assert scores[0] > scores[1] and scores[0] > scores[2]
    assert scores[0] > 0.95  # exact token matches -> cos 1 -> score ~1


def test_maxsim_invalid_rows_zero(small_config):
    cfg = small_config.replace(embedding_dtype="float32")
    emb = BowHashEmbedder(dim=64, config=cfg)
    idx = build_maxsim_index(["alpha beta"], emb, cfg)
    q = emb.token_embeddings(["alpha"], max_tokens=cfg.maxsim_query_tokens)[0]
    ids = jnp.asarray(np.array([0, -1], np.int32))
    scores = np.asarray(
        idx.score_candidates(ids, jnp.asarray(q), jnp.asarray(np.any(q != 0, -1)))
    )
    assert scores[1] == 0.0 and scores[0] > 0.9


def test_retriever_with_maxsim_backend(small_config):
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="float32",
        rerank_backend="maxsim", safety_threshold=0.3,
    )
    store = CorpusStore()
    ck = HierarchicalChunker(cfg)
    for name, text in {
        "a.md": "Invoices must be settled within thirty days of the billing date.",
        "b.md": "Red foxes inhabit the northern forest alongside brown bears.",
    }.items():
        p, c = ck.chunk_document(text, hashlib.sha256(name.encode()).hexdigest())
        store.add_chunks(p, c)
    ret = Retriever(store, cfg)
    assert ret.maxsim_index is not None
    r = ret.retrieve("invoice settled billing")
    assert not r.refused
    assert "Invoices" in r.results[0].text
    assert r.results[0].rerank_score is not None
    assert r.results[0].rerank_score > 0.8  # strong token overlap


def test_sharded_engine_with_maxsim(small_config):
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="float32",
        rerank_backend="maxsim", safety_threshold=0.3, capacity_round=8,
    )
    store = CorpusStore()
    ck = HierarchicalChunker(cfg)
    for i in range(6):
        text = f"Document {i} about topic{i % 3} with detail{i} content words here."
        p, c = ck.chunk_document(text, hashlib.sha256(str(i).encode()).hexdigest())
        store.add_chunks(p, c)
    ret = Retriever(store, cfg)
    eng = ShardedEngine(ret, corpus_mesh())
    r_staged = ret.retrieve("topic1 detail1")
    r_eng = eng.retrieve("topic1 detail1")
    assert [x.chunk_id for x in r_staged.results] == [x.chunk_id for x in r_eng.results]
    np.testing.assert_allclose(
        [x.final_score for x in r_staged.results],
        [x.final_score for x in r_eng.results],
        atol=2e-2,
    )


def test_int8_token_store_matches_float(small_config):
    """int8 token storage (static x127 scale): 4x smaller, scores within 2%."""
    texts = [
        "payment invoice settlement schedule",
        "fox forest wildlife habitat",
        "contract termination notice period",
    ]
    cfg_f = small_config.replace(embedding_dtype="float32")
    cfg_q = small_config.replace(embedding_dtype="int8")
    emb = BowHashEmbedder(dim=64, config=cfg_f)
    idx_f = build_maxsim_index(texts, emb, cfg_f)
    idx_q = build_maxsim_index(texts, emb, cfg_q)
    assert idx_q.tokens.dtype == jnp.int8
    assert idx_q.tokens.nbytes * 4 == idx_f.tokens.nbytes

    q = emb.token_embeddings(["invoice payment"], max_tokens=cfg_f.maxsim_query_tokens)[0]
    q_mask = np.any(q != 0, axis=-1)
    ids = jnp.asarray(np.array([0, 1, 2], np.int32))
    s_f = np.asarray(idx_f.score_candidates(ids, jnp.asarray(q), jnp.asarray(q_mask)))
    s_q = np.asarray(idx_q.score_candidates(ids, jnp.asarray(q), jnp.asarray(q_mask)))
    np.testing.assert_allclose(s_q, s_f, atol=0.02)
    assert list(np.argsort(-s_q)) == list(np.argsort(-s_f))

    # append re-quantizes float rows into the int8 store
    extra = emb.token_embeddings(
        ["invoice settlement payment follow-up"], max_tokens=cfg_q.maxsim_doc_tokens,
        dim=cfg_q.maxsim_dim,
    )
    idx_q2 = idx_q.append(extra)
    assert idx_q2.tokens.dtype == jnp.int8 and idx_q2.n_parents == 4
    s2 = np.asarray(
        idx_q2.score_candidates(
            jnp.asarray(np.array([3], np.int32)), jnp.asarray(q), jnp.asarray(q_mask)
        )
    )
    assert s2[0] > 0.9  # exact token matches survive quantization
