"""Incremental index updates + facade batch API + profiling helpers."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.facade import RAG
from triple_hybrid_rag_tpu.index.dense_index import build_dense_index, truncate_matryoshka
from triple_hybrid_rag_tpu.index.maxsim_index import build_maxsim_index
from triple_hybrid_rag_tpu.ingest import Ingestor
from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        graph_enabled=False, embedding_dtype="float32", safety_threshold=0.2
    )


def test_dense_append_within_capacity(cfg, hash_embedder):
    vecs = np.stack([hash_embedder(f"doc {i}", cfg.embedding_dim_full) for i in range(3)])
    idx = build_dense_index(vecs, cfg)
    assert idx.n_pad >= 8  # spare capacity
    new = np.stack([hash_embedder(f"new {i}", cfg.embedding_dim_full) for i in range(2)])
    idx2 = idx.append(new)
    assert idx2.n_docs == 5 and idx2.n_pad == idx.n_pad  # in-place, same shapes
    # appended rows searchable; equivalent to a full rebuild
    full = build_dense_index(np.concatenate([vecs, new]), cfg)
    q = truncate_matryoshka(new[:1], cfg.embedding_dim)[0]
    ids_a, s_a = idx2.search(q, top_k=5)
    ids_b, s_b = full.search(q, top_k=5)
    np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_b), rtol=1e-5)
    assert int(np.asarray(ids_a)[0]) == 3  # self-retrieval of first appended row
    # original index untouched (functional update)
    assert idx.n_docs == 3


def test_dense_append_grows_capacity(cfg, hash_embedder):
    vecs = np.stack([hash_embedder(f"d{i}", cfg.embedding_dim_full) for i in range(3)])
    idx = build_dense_index(vecs, cfg)
    big = np.stack([hash_embedder(f"n{i}", cfg.embedding_dim_full) for i in range(20)])
    idx2 = idx.append(big)
    assert idx2.n_docs == 23
    assert idx2.n_pad >= 23 and idx2.n_pad % cfg.capacity_round == 0
    assert bool(np.asarray(idx2.valid)[22]) and not bool(np.asarray(idx2.valid)[23])


def test_maxsim_append(cfg):
    emb = BowHashEmbedder(dim=64, config=cfg)
    idx = build_maxsim_index(["alpha beta", "gamma delta"], emb, cfg)
    new_toks = emb.token_embeddings(["epsilon zeta"])
    idx2 = idx.append(new_toks)
    assert idx2.n_parents == 3
    import jax.numpy as jnp

    q = emb.token_embeddings(["epsilon"], max_tokens=cfg.maxsim_query_tokens)[0]
    scores = np.asarray(
        idx2.score_candidates(
            jnp.asarray(np.array([0, 1, 2], np.int32)),
            jnp.asarray(q), jnp.asarray(np.any(q != 0, -1)),
        )
    )
    assert scores[2] > scores[0] and scores[2] > scores[1]


def test_ingestor_incremental_dense(cfg):
    ing = Ingestor(config=cfg)
    ing.ingest_text("First document about invoices and payments.", name="a.md")
    _, dense1, _ = ing.build_indexes()
    n1 = dense1.n_docs
    ing.ingest_text("Second document about foxes in forests.", name="b.md")
    _, dense2, _ = ing.build_indexes()
    assert dense2.n_docs > n1
    # incremental path reused the same capacity allocation when it fits
    if dense2.n_pad == dense1.n_pad:
        assert dense2.embeddings.shape == dense1.embeddings.shape
    # behaves identically to a full rebuild
    _, dense_full, _ = ing.build_indexes(incremental=False)
    np.testing.assert_allclose(
        np.asarray(dense2.embeddings[: dense2.n_docs]),
        np.asarray(dense_full.embeddings[: dense_full.n_docs]),
        atol=1e-6,
    )


def test_facade_query_batch(cfg):
    rag = RAG(config=cfg)
    rag.ingest_text("Invoices settle within thirty days of billing.", name="a.md")
    rag.ingest_text("Red foxes inhabit the northern forest.", name="b.md")
    results = rag.query_batch(["invoice settlement", "foxes forest"], top_k=2)
    assert len(results) == 2
    assert "Invoices" in results[0].results[0].text
    assert "foxes" in results[1].results[0].text
    assert rag.query_batch([]) == []
    # batch matches single-query engine results
    single = rag.query("invoice settlement", top_k=2)
    assert [r.chunk_id for r in results[0].results][:1] == [
        r.chunk_id for r in single.results
    ][:1]


def test_stage_timer():
    from triple_hybrid_rag_tpu.observability.profiling import StageTimer

    t = StageTimer()
    with t.stage("alpha"):
        pass
    assert "alpha_ms" in t.timings and t.timings["alpha_ms"] >= 0


def test_maxsim_store_appends_instead_of_rebuilding(small_config):
    """Adding one document must NOT re-run token_embeddings over every existing
    parent (the dominant encoder cost of a rebuild) — the MaxSim cache appends
    into spare capacity like the dense cache."""
    from triple_hybrid_rag_tpu.facade import RAG
    from triple_hybrid_rag_tpu.models.embedder import BowHashEmbedder

    cfg = small_config.replace(
        graph_enabled=False, embedding_dtype="float32", safety_threshold=0.0,
        capacity_round=64,  # spare parent capacity for in-place appends
    )

    class CountingEmbedder(BowHashEmbedder):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.token_calls = []

        def token_embeddings(self, texts, max_tokens=None, dim=None):
            self.token_calls.append(len(texts))
            return super().token_embeddings(texts, max_tokens=max_tokens, dim=dim)

    emb = CountingEmbedder(dim=cfg.embedding_dim_full, config=cfg)
    rag = RAG(config=cfg, embedder=emb)
    for i in range(6):
        rag.ingest_text(f"Document {i} about payment invoices item {i}.", name=f"d{i}.md")
    rag.query("payment invoices")  # builds indexes (full maxsim build: 6 parents)
    emb.token_calls.clear()

    rag.ingest_text("Fresh document about forest foxes.", name="new.md")
    r = rag.query("forest foxes")
    assert r.results and "fox" in r.results[0].text.lower()
    # doc-side token embedding ran ONLY for the new parent (query-side calls
    # embed 1 text and are indistinguishable — allow batches of size 1)
    assert all(n == 1 for n in emb.token_calls), emb.token_calls
    # old content still reranks correctly through the appended store
    r2 = rag.query("payment invoices item 3")
    assert r2.results and "payment" in r2.results[0].text.lower()
