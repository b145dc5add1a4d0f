"""End-to-end integration: the on-mesh trained encoder plugged into the retriever.

Proves the model layer composes with the index/query machinery: train the tiny encoder
contrastively on corpus (query, passage) pairs, embed the corpus with it, and verify the
dense channel retrieves trained associations the hash embedders cannot know."""

import hashlib

import numpy as np
import pytest
import jax.numpy as jnp

from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.corpus import CorpusStore
from triple_hybrid_rag_tpu.models.encoder import EncoderConfig, EncoderEmbedder
from triple_hybrid_rag_tpu.models.training import (
    TrainConfig,
    create_train_state,
    make_train_step,
    training_mesh,
)
from triple_hybrid_rag_tpu.retrieval import Retriever

TINY = EncoderConfig(
    vocab_buckets=2048, d_model=48, n_layers=2, n_heads=4, d_mlp=96,
    max_tokens=24, out_dim=48, token_dim=16, dtype="float32",
)

# synthetic language: query tokens and doc tokens are DISJOINT, so only a trained
# encoder can associate them (hash/BoW embedders see zero overlap)
PAIRS = [
    (f"qalpha{i} qbeta{i}", f"dgamma{i} ddelta{i} content") for i in range(8)
]


@pytest.fixture
def cfg(small_config):
    return small_config.replace(
        graph_enabled=False, lexical_enabled=False,  # isolate the dense channel
        embedding_dtype="float32", embedding_dim=32, embedding_dim_full=48,
        safety_threshold=0.0, rerank_enabled=False, denoise_enabled=False,
    )


def test_trained_encoder_drives_retrieval(cfg):
    mesh = training_mesh(tp=2)
    tc = TrainConfig(learning_rate=1e-2, warmup_steps=5)
    model, state = create_train_state(TINY, tc, mesh=mesh)
    step = make_train_step(model, tc, mesh)

    embedder = EncoderEmbedder(TINY, cfg)
    h = embedder.hasher
    from triple_hybrid_rag_tpu.models.training import encode_batch_with_anchors

    args = (*encode_batch_with_anchors(h, [q for q, _ in PAIRS], TINY),
            *encode_batch_with_anchors(h, [d for _, d in PAIRS], TINY))
    for _ in range(60):
        state, metrics = step(state, *args)
    assert float(metrics["accuracy"]) == 1.0
    embedder.params = state.params  # adopt trained weights

    # build a corpus of the passages; query with the (token-disjoint) query side
    store = CorpusStore()
    chunker = HierarchicalChunker(cfg)
    for i, (_, doc) in enumerate(PAIRS):
        parents, children = chunker.chunk_document(doc, hashlib.sha256(str(i).encode()).hexdigest())
        store.add_chunks(parents, children)

    retriever = Retriever(store, cfg, embedder=embedder)
    hits = 0
    for i, (q, d) in enumerate(PAIRS):
        r = retriever.retrieve(q, top_k=1)
        if r.results and f"dgamma{i}" in r.results[0].text:
            hits += 1
    assert hits >= 6  # trained cross-token association drives retrieval

    # control: an UNtrained encoder cannot do this reliably
    untrained = EncoderEmbedder(TINY, cfg)
    retriever_u = Retriever(store, cfg, embedder=untrained)
    hits_u = sum(
        1
        for i, (q, _) in enumerate(PAIRS)
        if retriever_u.retrieve(q, top_k=1).results
        and f"dgamma{i}" in retriever_u.retrieve(q, top_k=1).results[0].text
    )
    assert hits > hits_u
