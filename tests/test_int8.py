"""int8-quantized dense index tests (Pallas-guide quantization pattern)."""

import numpy as np
import pytest
import jax.numpy as jnp

from triple_hybrid_rag_tpu.index.dense_index import (
    build_dense_index,
    dense_scores_int8_batch,
    quantize_rows_int8,
    truncate_matryoshka,
)


@pytest.fixture
def cfg8(small_config):
    return small_config.replace(embedding_dtype="int8")


def test_quantize_roundtrip_accuracy(rng):
    mat = rng.standard_normal((32, 64)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    values, scale = quantize_rows_int8(mat)
    assert values.dtype == np.int8
    recon = values.astype(np.float32) * scale[:, None]
    np.testing.assert_allclose(recon, mat, atol=0.02)
    # zero row -> scale 1, values 0 (no NaN)
    v0, s0 = quantize_rows_int8(np.zeros((1, 8), np.float32))
    assert s0[0] == 1.0 and not v0.any()


def test_int8_scores_close_to_f32(cfg8, small_config, hash_embedder):
    texts = [f"document {i} content words" for i in range(24)]
    vecs = np.stack([hash_embedder(t, cfg8.embedding_dim_full) for t in texts])
    idx8 = build_dense_index(vecs, cfg8)
    idx32 = build_dense_index(vecs, small_config.replace(embedding_dtype="float32"))
    assert idx8.scales is not None and idx8.embeddings.dtype == jnp.int8

    q = truncate_matryoshka(vecs[:1], cfg8.embedding_dim)[0]
    s8 = np.asarray(idx8.score(jnp.asarray(q)))
    s32 = np.asarray(idx32.score(jnp.asarray(q)))
    np.testing.assert_allclose(s8, s32, atol=0.03)  # ~1% cosine error budget

    # rank agreement on top-k
    ids8, _ = idx8.search(jnp.asarray(q), top_k=5)
    ids32, _ = idx32.search(jnp.asarray(q), top_k=5)
    assert np.asarray(ids8)[0] == np.asarray(ids32)[0] == 0  # self-retrieval
    assert len(set(np.asarray(ids8).tolist()) & set(np.asarray(ids32).tolist())) >= 4


def test_int8_batch_matches_single(cfg8, hash_embedder):
    texts = [f"doc {i}" for i in range(10)]
    vecs = np.stack([hash_embedder(t, cfg8.embedding_dim_full) for t in texts])
    idx = build_dense_index(vecs, cfg8)
    qs = truncate_matryoshka(vecs[:3], cfg8.embedding_dim)
    batch = np.asarray(dense_scores_int8_batch(idx.embeddings, idx.scales, jnp.asarray(qs)))
    for i in range(3):
        single = np.asarray(idx.score(jnp.asarray(qs[i])))
        np.testing.assert_allclose(batch[i], single, atol=1e-5)


def test_int8_append(cfg8, hash_embedder):
    vecs = np.stack([hash_embedder(f"d{i}", cfg8.embedding_dim_full) for i in range(3)])
    idx = build_dense_index(vecs, cfg8)
    new = np.stack([hash_embedder(f"n{i}", cfg8.embedding_dim_full) for i in range(2)])
    idx2 = idx.append(new)
    assert idx2.n_docs == 5
    q = truncate_matryoshka(new[:1], cfg8.embedding_dim)[0]
    ids, _ = idx2.search(jnp.asarray(q), top_k=3)
    assert np.asarray(ids)[0] == 3  # appended row self-retrieves


def test_int8_end_to_end_retriever(cfg8):
    import hashlib

    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = cfg8.replace(graph_enabled=False, safety_threshold=0.2)
    store = CorpusStore()
    ck = HierarchicalChunker(cfg)
    for name, text in {
        "a.md": "Invoices settle within thirty days of billing.",
        "b.md": "Red foxes inhabit the northern forest.",
    }.items():
        p, c = ck.chunk_document(text, hashlib.sha256(name.encode()).hexdigest())
        store.add_chunks(p, c)
    ret = Retriever(store, cfg)
    r = ret.retrieve("invoice settlement billing")
    assert not r.refused and "Invoices" in r.results[0].text

    eng = ShardedEngine(ret, corpus_mesh())
    r2 = eng.retrieve("invoice settlement billing")
    assert [x.chunk_id for x in r.results] == [x.chunk_id for x in r2.results]
