"""Dense semantic channel tests (Matryoshka semantics + exact top-k)."""

import numpy as np
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.index.dense_index import (
    build_dense_index,
    dense_scores_batch,
    truncate_matryoshka,
)


@pytest.fixture
def cfg(small_config):
    return small_config.replace(embedding_dtype="float32")


def test_matryoshka_truncate_renormalize():
    v = np.random.default_rng(0).standard_normal((5, 64)).astype(np.float32)
    t = truncate_matryoshka(v, 32)
    assert t.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(t, axis=1), 1.0, rtol=1e-5)
    # prefix semantics: direction matches the raw prefix
    raw = v[:, :32]
    cos = (t * raw / np.linalg.norm(raw, axis=1, keepdims=True)).sum(1)
    np.testing.assert_allclose(cos, 1.0, rtol=1e-5)


def test_exact_search_matches_numpy(cfg, hash_embedder):
    texts = [f"document number {i} about topic {i % 4}" for i in range(20)]
    vecs = np.stack([hash_embedder(t, cfg.embedding_dim_full) for t in texts])
    idx = build_dense_index(vecs, cfg)

    q = hash_embedder(texts[7], cfg.embedding_dim_full)
    q1024 = truncate_matryoshka(q[None], cfg.embedding_dim)[0]
    ids, scores = idx.search(q1024, top_k=5)
    ids, scores = np.asarray(ids), np.asarray(scores)

    oracle = truncate_matryoshka(vecs, cfg.embedding_dim) @ q1024
    order = np.argsort(-oracle)[:5]
    np.testing.assert_array_equal(ids, order)
    np.testing.assert_allclose(scores, oracle[order], rtol=1e-4)
    assert ids[0] == 7  # self-similarity wins


def test_padding_rows_never_returned(cfg, hash_embedder):
    texts = [f"doc {i}" for i in range(3)]
    vecs = np.stack([hash_embedder(t, cfg.embedding_dim_full) for t in texts])
    idx = build_dense_index(vecs, cfg)
    assert idx.n_pad > idx.n_docs
    q = truncate_matryoshka(vecs[:1], cfg.embedding_dim)[0]
    ids, _ = idx.search(q, top_k=8)
    ids = np.asarray(ids)
    assert set(ids[ids >= 0]) <= {0, 1, 2}
    assert np.sum(ids >= 0) == 3


def test_bfloat16_storage_close_to_f32(small_config, hash_embedder):
    cfg32 = small_config.replace(embedding_dtype="float32")
    cfg16 = small_config.replace(embedding_dtype="bfloat16")
    texts = [f"document {i} content" for i in range(16)]
    vecs = np.stack([hash_embedder(t, cfg32.embedding_dim_full) for t in texts])
    q = truncate_matryoshka(vecs[:1], cfg32.embedding_dim)[0]
    s32 = np.asarray(build_dense_index(vecs, cfg32).score(q))
    s16 = np.asarray(build_dense_index(vecs, cfg16).score(q))
    np.testing.assert_allclose(s16, s32, atol=2e-2)


def test_batched_scores(cfg, hash_embedder):
    import jax.numpy as jnp

    texts = [f"doc {i}" for i in range(10)]
    vecs = np.stack([hash_embedder(t, cfg.embedding_dim_full) for t in texts])
    idx = build_dense_index(vecs, cfg)
    qs = truncate_matryoshka(vecs[:4], cfg.embedding_dim)
    batch = np.asarray(dense_scores_batch(idx.embeddings, jnp.asarray(qs)))
    for i in range(4):
        single = np.asarray(idx.score(jnp.asarray(qs[i])))
        np.testing.assert_allclose(batch[i], single, rtol=1e-5)
