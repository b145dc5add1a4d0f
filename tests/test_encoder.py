"""Encoder + contrastive training tests (on-mesh model; dp x tp sharding)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.config import RAGConfig
from triple_hybrid_rag_tpu.models.encoder import (
    EncoderConfig,
    EncoderEmbedder,
    TextHasher,
    hash_token,
    init_encoder,
)
from triple_hybrid_rag_tpu.models.training import (
    TrainConfig,
    create_train_state,
    make_train_step,
    shard_train_state,
    training_mesh,
)

TINY = EncoderConfig(
    vocab_buckets=512, d_model=32, n_layers=2, n_heads=4, d_mlp=64,
    max_tokens=16, out_dim=32, token_dim=16, dtype="float32",
)


def test_hash_token_stable_and_nonzero():
    assert hash_token("payment", 512) == hash_token("payment", 512)
    assert 1 <= hash_token("x", 512) < 512


def test_hasher_shapes_and_padding():
    h = TextHasher(TINY, RAGConfig())
    ids, mask = h.encode(["payment invoice", ""])
    assert ids.shape == (2, 16) and mask.shape == (2, 16)
    assert mask[0].sum() == 2 and mask[1].sum() == 0
    assert ids[0, 0] != 0 and ids[0, 2] == 0


def test_encoder_forward_shapes_and_norms():
    model, params = init_encoder(TINY, seed=0)
    h = TextHasher(TINY, RAGConfig())
    ids, mask = h.encode(["payment invoice billing", "contract termination"])
    pooled, tok = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert pooled.shape == (2, 32)
    assert tok.shape == (2, 16, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pooled), axis=1), 1.0, atol=1e-4)
    # padded token positions are zeroed
    assert np.allclose(np.asarray(tok)[0, 3:], 0.0)
    # valid token rows unit-normalized
    norms = np.linalg.norm(np.asarray(tok)[0, :3], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_encoder_deterministic():
    m1, p1 = init_encoder(TINY, seed=0)
    m2, p2 = init_encoder(TINY, seed=0)
    h = TextHasher(TINY, RAGConfig())
    ids, mask = h.encode(["hello world"])
    a, _ = m1.apply(p1, jnp.asarray(ids), jnp.asarray(mask))
    b, _ = m2.apply(p2, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_embedder_adapter_protocol():
    e = EncoderEmbedder(TINY, RAGConfig())
    out = e.embed_texts(["alpha beta", "gamma delta", "alpha beta"])
    assert out.shape == (3, 32)
    np.testing.assert_allclose(out[0], out[2], atol=1e-6)  # deterministic
    q = e.embed_query("alpha beta")
    np.testing.assert_allclose(q, out[0], atol=1e-5)
    with pytest.raises(ValueError):
        e.embed_query("the a of")  # stopwords only
    toks = e.token_embeddings(["alpha beta"])
    assert toks.shape == (1, 16, 16)


def test_train_step_reduces_loss():
    mesh = training_mesh(tp=2)
    tc = TrainConfig(learning_rate=1e-2, warmup_steps=5)
    model, state = create_train_state(TINY, tc, mesh=mesh)
    step = make_train_step(model, tc, mesh)
    h = TextHasher(TINY, RAGConfig())
    queries = [f"alpha{i} beta{i} question" for i in range(8)]
    docs = [f"alpha{i} beta{i} document text" for i in range(8)]
    from triple_hybrid_rag_tpu.models.training import encode_batch_with_anchors

    args = (*encode_batch_with_anchors(h, queries, TINY),
            *encode_batch_with_anchors(h, docs, TINY))
    state, m0 = step(state, *args)
    first = float(m0["loss"])
    for _ in range(40):
        state, m = step(state, *args)
    assert float(m["loss"]) < first  # learning happens
    assert float(m["accuracy"]) >= 0.9


def test_param_sharding_layout():
    mesh = training_mesh(tp=2)
    model, state = create_train_state(TINY, mesh=mesh)
    # mlp_in kernel sharded over tp on output dim
    k = state.params["params"]["block_0"]["mlp_in"]["kernel"]
    assert len(k.devices()) == len(jax.devices())
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert (32, 32) in shard_shapes  # 64-dim mlp split over 2-way tp


def test_train_step_multi_dp(small_config):
    """8 devices as dp=4 x tp=2: the full 2D training mesh executes."""
    mesh = training_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    model, state = create_train_state(TINY, mesh=mesh)
    step = make_train_step(model, TrainConfig(), mesh)
    h = TextHasher(TINY, RAGConfig())
    from triple_hybrid_rag_tpu.models.training import encode_batch_with_anchors

    state, m = step(
        state,
        *encode_batch_with_anchors(h, [f"q{i} term{i}" for i in range(8)], TINY),
        *encode_batch_with_anchors(h, [f"d{i} term{i} text" for i in range(8)], TINY),
    )
    assert np.isfinite(float(m["loss"]))


def test_encoder_params_save_load(tmp_path):
    from triple_hybrid_rag_tpu.models.encoder import (
        load_encoder_params,
        save_encoder_params,
    )

    model, params = init_encoder(TINY, seed=1)
    path = tmp_path / "enc.npz"
    save_encoder_params(params, path)
    _, fresh = init_encoder(TINY, seed=2)  # different init
    restored = load_encoder_params(fresh, path)
    h = TextHasher(TINY, RAGConfig())
    ids, mask = h.encode(["payment invoice"])
    a, _ = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    b, _ = model.apply(restored, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    # shape mismatch detected
    import pytest as _pytest

    bad_cfg = EncoderConfig(**{**TINY.__dict__, "d_model": 64})
    _, bad = init_encoder(bad_cfg, seed=0)
    with _pytest.raises((ValueError, KeyError)):
        load_encoder_params(bad, path)


def test_encode_queries_device_parity():
    """Device single-dispatch query encoding == numpy prep path (engine wire f16).

    prepare_queries feeds encode_queries_device outputs straight into the search
    program; this pins them to the embed_texts/token_embeddings reference within
    f16 rounding."""
    from triple_hybrid_rag_tpu.index.dense_index import truncate_matryoshka

    emb = EncoderEmbedder(TINY, RAGConfig())
    texts = ["payment invoice overdue", "the contract was terminated early", ""]
    out_dim, t_q, tdim = 24, 8, 8
    pooled_d, tok_d, mask = emb.encode_queries_device(
        texts, out_dim=out_dim, max_tokens=t_q, token_dim=tdim
    )
    assert pooled_d.dtype == jnp.float16 and tok_d.dtype == jnp.float16
    assert pooled_d.shape == (3, out_dim) and tok_d.shape == (3, t_q, tdim)

    ref_vec = truncate_matryoshka(emb.embed_texts(texts), out_dim)
    ref_tok = emb.token_embeddings(texts, max_tokens=t_q, dim=tdim)
    np.testing.assert_allclose(
        np.asarray(pooled_d, np.float32), ref_vec, atol=2e-3
    )
    np.testing.assert_allclose(np.asarray(tok_d, np.float32), ref_tok, atol=2e-3)
    np.testing.assert_array_equal(mask, np.any(ref_tok != 0, axis=-1))


def test_encode_queries_device_no_truncation_case():
    """out_dim == full dim / token_dim == full token dim: no-op truncation path."""
    emb = EncoderEmbedder(TINY, RAGConfig())
    texts = ["password reset security portal"]
    pooled_d, tok_d, mask = emb.encode_queries_device(
        texts, out_dim=TINY.out_dim, max_tokens=TINY.max_tokens, token_dim=TINY.token_dim
    )
    ref_vec = emb.embed_texts(texts)
    ref_tok = emb.token_embeddings(texts)
    np.testing.assert_allclose(np.asarray(pooled_d, np.float32), ref_vec, atol=2e-3)
    np.testing.assert_allclose(np.asarray(tok_d, np.float32), ref_tok, atol=2e-3)
    assert mask.shape == (1, TINY.max_tokens)
