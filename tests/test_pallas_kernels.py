"""Pallas kernel tests vs XLA reference ops (interpret mode on the CPU suite;
the same kernels compile natively on TPU — see bench/kernel smoke)."""

import numpy as np
import jax.numpy as jnp
import pytest

from triple_hybrid_rag_tpu.ops.bm25 import score_termtable
from triple_hybrid_rag_tpu.ops.maxsim import maxsim_scores
from triple_hybrid_rag_tpu.ops.pallas import (
    dense_scores_pallas,
    maxsim_scores_pallas,
    score_termtable_pallas,
)


@pytest.fixture
def maxsim_data(rng):
    K, Td, Tq, D = 4, 160, 8, 32  # Td > T_TILE -> exercises multi-tile streaming
    doc = rng.standard_normal((K, Td, D)).astype(np.float32)
    doc /= np.linalg.norm(doc, axis=-1, keepdims=True)
    q = rng.standard_normal((Tq, D)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    doc_mask = rng.random((K, Td)) > 0.2
    q_mask = np.array([True] * 6 + [False] * 2)
    valid = np.array([True, True, False, True])
    return doc, doc_mask, q, q_mask, valid


def test_maxsim_kernel_matches_xla(maxsim_data):
    doc, doc_mask, q, q_mask, valid = (jnp.asarray(x) for x in maxsim_data)
    want = np.asarray(maxsim_scores(doc, doc_mask, q, q_mask, valid))
    got = np.asarray(
        maxsim_scores_pallas(doc, doc_mask, q, q_mask, valid, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-2)  # bf16 einsum vs f32 kernel
    assert got[2] == 0.0  # invalid candidate


def test_maxsim_kernel_all_masked_doc(rng):
    K, Td, Tq, D = 2, 128, 4, 16
    doc = jnp.asarray(rng.standard_normal((K, Td, D)).astype(np.float32))
    doc_mask = jnp.asarray(np.zeros((K, Td), bool))  # no valid doc tokens
    q = jnp.asarray(rng.standard_normal((Tq, D)).astype(np.float32))
    q_mask = jnp.asarray(np.ones(Tq, bool))
    valid = jnp.asarray(np.ones(K, bool))
    got = np.asarray(maxsim_scores_pallas(doc, doc_mask, q, q_mask, valid, interpret=True))
    np.testing.assert_allclose(got, 0.0)


def test_lexical_kernel_matches_xla(rng):
    N, L, Q = 1000, 16, 8  # N not a multiple of the block -> exercises padding
    term_ids = rng.integers(0, 500, size=(N, L)).astype(np.int32)
    term_ids[rng.random((N, L)) < 0.3] = -2  # doc pads
    weights = rng.random((N, L)).astype(np.float32)
    query = np.array([3, 77, 200, 499, -1, -1, -1, -1], np.int32)

    want = np.asarray(score_termtable(jnp.asarray(term_ids), jnp.asarray(weights), jnp.asarray(query)))
    got = np.asarray(
        score_termtable_pallas(
            jnp.asarray(term_ids), jnp.asarray(weights), jnp.asarray(query), interpret=True
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_dense_kernel_matches_xla(rng):
    N, D, B = 3000, 64, 4  # N not a multiple of the block
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    q = rng.standard_normal((B, D)).astype(np.float32)
    want = q @ emb.T
    got = np.asarray(dense_scores_pallas(jnp.asarray(emb), jnp.asarray(q), interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
