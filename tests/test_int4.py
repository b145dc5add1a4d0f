"""int4 packed-nibble dense index: quantization, staged + engine integration.

Kernel-level parity lives in test_fused_topk.py; this file covers the index /
retriever / engine plumbing. int4 halves dense HBM again vs int8 (0.5 KB per
1024-d row), lifting the one-chip ceiling toward ~16M chunks (docs/SCALING.md).
"""

import hashlib

import numpy as np
import pytest
import jax.numpy as jnp

from triple_hybrid_rag_tpu.index.dense_index import (
    build_dense_index,
    dense_scores_int4_batch,
    quantize_rows_int4,
    truncate_matryoshka,
)


@pytest.fixture
def cfg4(small_config):
    return small_config.replace(embedding_dtype="int4")


def test_pack_halves_storage(rng):
    mat = rng.standard_normal((16, 64)).astype(np.float32)
    packed, scale = quantize_rows_int4(mat)
    assert packed.dtype == np.uint8 and packed.shape == (16, 32)
    # zero row -> scale 1, codes 0 (no NaN)
    p0, s0 = quantize_rows_int4(np.zeros((1, 8), np.float32))
    assert s0[0] == 1.0 and not p0.any()
    # odd dim rejected
    with pytest.raises(AssertionError):
        quantize_rows_int4(np.zeros((1, 7), np.float32))


def test_int4_scores_close_to_f32(cfg4, small_config, hash_embedder):
    texts = [f"document {i} content words" for i in range(24)]
    vecs = np.stack([hash_embedder(t, cfg4.embedding_dim_full) for t in texts])
    idx4 = build_dense_index(vecs, cfg4)
    idx32 = build_dense_index(vecs, small_config.replace(embedding_dtype="float32"))
    assert idx4.is_int4 and idx4.embeddings.dtype == jnp.uint8
    assert idx4.embeddings.shape[1] == cfg4.embedding_dim // 2

    q = truncate_matryoshka(vecs[:1], cfg4.embedding_dim)[0]
    s4 = np.asarray(idx4.score(jnp.asarray(q)))
    s32 = np.asarray(idx32.score(jnp.asarray(q)))
    np.testing.assert_allclose(s4, s32, atol=0.08)  # ~3% cosine error budget

    ids4, _ = idx4.search(jnp.asarray(q), top_k=5)
    ids32, _ = idx32.search(jnp.asarray(q), top_k=5)
    assert np.asarray(ids4)[0] == np.asarray(ids32)[0] == 0  # self-retrieval


def test_int4_batch_matches_single(cfg4, hash_embedder):
    texts = [f"doc {i}" for i in range(10)]
    vecs = np.stack([hash_embedder(t, cfg4.embedding_dim_full) for t in texts])
    idx = build_dense_index(vecs, cfg4)
    qs = truncate_matryoshka(vecs[:3], cfg4.embedding_dim)
    batch = np.asarray(
        dense_scores_int4_batch(idx.embeddings, idx.scales, jnp.asarray(qs))
    )
    for i in range(3):
        single = np.asarray(idx.score(jnp.asarray(qs[i])))
        np.testing.assert_allclose(batch[i], single, atol=1e-5)


def test_int4_append(cfg4, hash_embedder):
    vecs = np.stack([hash_embedder(f"d{i}", cfg4.embedding_dim_full) for i in range(3)])
    idx = build_dense_index(vecs, cfg4)
    new = np.stack([hash_embedder(f"n{i}", cfg4.embedding_dim_full) for i in range(2)])
    idx2 = idx.append(new)
    assert idx2.n_docs == 5 and idx2.is_int4
    q = truncate_matryoshka(new[:1], cfg4.embedding_dim)[0]
    ids, _ = idx2.search(jnp.asarray(q), top_k=3)
    assert np.asarray(ids)[0] == 3  # appended row self-retrieves


def test_int4_end_to_end_engine(cfg4):
    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = cfg4.replace(graph_enabled=False, safety_threshold=0.2)
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
    assert eng._use_int4 and not eng._use_int8
    r2 = eng.retrieve("invoice settlement billing")
    assert [x.chunk_id for x in r.results] == [x.chunk_id for x in r2.results]


def test_int4_engine_fused_matches_xla(cfg4):
    """Engine program with use_fused_topk forced on (interpret on CPU) equals
    the unpack-full XLA dense channel at int4."""
    from triple_hybrid_rag_tpu.chunker import HierarchicalChunker
    from triple_hybrid_rag_tpu.corpus import CorpusStore
    from triple_hybrid_rag_tpu.parallel import ShardedEngine, corpus_mesh
    from triple_hybrid_rag_tpu.retrieval import Retriever

    cfg = cfg4.replace(graph_enabled=False, safety_threshold=0.0)
    store = CorpusStore()
    ck = HierarchicalChunker(cfg)
    for i in range(12):
        text = f"Topic {i} report: item{i} alpha{i} detail{i} figure{i}."
        p, c = ck.chunk_document(text, hashlib.sha256(str(i).encode()).hexdigest())
        store.add_chunks(p, c)

    queries = ["item3 alpha3 report", "figure7 detail7"]
    eng_xla = ShardedEngine(
        Retriever(store, cfg.replace(use_fused_topk=False)), corpus_mesh()
    )
    eng_fused = ShardedEngine(
        Retriever(store, cfg.replace(use_fused_topk=True)), corpus_mesh()
    )
    for q in queries:
        a = eng_xla.retrieve(q)
        b = eng_fused.retrieve(q)
        assert [x.chunk_id for x in a.results] == [x.chunk_id for x in b.results]


def test_int4_topk_blocked_parity(rng):
    """int4_topk_blocked (blocked unpack + bucket top-k, the production int4
    path) == unpack-full scores + masked_top_k, bit-exact ids, incl. per-query
    collection scoping and multi-block corpora."""
    import jax
    import jax.numpy as jnp

    from triple_hybrid_rag_tpu.index.dense_index import int4_topk_blocked
    from triple_hybrid_rag_tpu.ops.topk import masked_top_k

    N, D, B, K = 5000, 128, 6, 32
    mat = rng.standard_normal((N, D)).astype(np.float32)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    packed, scales = quantize_rows_int4(mat)
    valid = np.ones(N, bool)
    valid[rng.integers(0, N, 100)] = False
    collection_of = rng.integers(0, 3, N).astype(np.int32)
    coll_cid = np.array([-1, 0, 1, 2, -2, 1], np.int32)
    q = mat[rng.integers(0, N, B)] + 0.1 * rng.standard_normal((B, D)).astype(np.float32)

    scores = dense_scores_int4_batch(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(q)
    )

    def ref_one(s, c):
        v = jnp.asarray(valid)
        v = jnp.where(c == -1, v, v & (jnp.asarray(collection_of) == c))
        return masked_top_k(s, K, valid=v, invalid_score_floor=-2.0)

    ref_ids, ref_vals = jax.vmap(ref_one)(scores, jnp.asarray(coll_cid))
    got_ids, got_vals = int4_topk_blocked(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(valid),
        jnp.asarray(q), K,
        collection_of=jnp.asarray(collection_of), coll_cid=jnp.asarray(coll_cid),
        block=1024,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    np.testing.assert_allclose(np.asarray(ref_vals), np.asarray(got_vals), rtol=2e-6)

    # unscoped variant
    ref_ids2, _ = jax.vmap(
        lambda s: masked_top_k(s, K, valid=jnp.asarray(valid), invalid_score_floor=-2.0)
    )(scores)
    got_ids2, _ = int4_topk_blocked(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(valid),
        jnp.asarray(q), K, block=2048,
    )
    np.testing.assert_array_equal(np.asarray(ref_ids2), np.asarray(got_ids2))
