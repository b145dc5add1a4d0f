"""Late-interaction MaxSim scoring (ColBERT-style) — the real thing.

The reference *documents* "Late Interaction Reranking" as complete but actually ships a
pointwise yes/no cross-encoder over chat logprobs
(``/root/reference/docs/RAG2.0/COMPLETION_REPORT.md:32`` vs
``retrieval/reranker.py:154-285``; SURVEY.md §5.7). Here it is implemented for real:
token-level embeddings are stored per parent chunk, and the rerank score is

    score(q, d) = mean over query tokens of max(0, max over doc tokens of cos(q_i, d_j))

The per-query-token max-cosine is clamped at 0 before averaging so the score lands in
[0, 1] with a meaningful floor: token matches push toward 1, while a document sharing
*nothing* with the query scores near 0 (random unit-vector cosines hover around 0), so
the downstream 0.6 safety threshold separates relevant from garbage the way the
reference's cross-encoder scores do. Mean (not ColBERT's sum) keeps scores
length-invariant across queries.

Shapes are rerank-stage small — K <= 50 candidates x T_doc x T_query x D — so one fused
einsum is already near speed-of-light; the Pallas variant (``ops/pallas/maxsim.py``)
blocks over document tokens to keep long documents resident in VMEM (SURVEY.md §5.7
blockwise requirement).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# int8 token stores hold round(x * 127) of unit-vector components (|x| <= 1, so the
# symmetric scale is static — no per-row scale array needed, unlike the dense index)
INT8_TOKEN_SCALE = 127.0


def calibrate_maxsim(scores: jax.Array, calibration: float) -> jax.Array:
    """Rescale anchored-encoder MaxSim scores so the reference's 0.6 gate holds.

    With identity anchors (``models/encoder.py``) a token pair sharing a lexeme
    scores ~``anchor_token_w2`` from the anchors alone, and a zero-overlap
    paraphrase pair is capped near ``1 - anchor_token_w2`` — the geometry
    compresses [0, 1]. Dividing by ``calibration`` (= ``anchor_token_w2``, the
    pure-exact-match score) renormalizes "full lexical match" back to 1.0 so the
    reference's 0.6 safety threshold keeps its meaning
    (``/root/reference/src/voice_agent/rag2/retrieval.py:461-495``). Monotone:
    rankings are unchanged; the clip only ties saturated top scorers at 1.0.
    Measured on the zero-overlap paraphrase holdout (models/pretrain.py):
    relevant p5 = 0.41/0.6 = 0.68 > 0.6 > irrelevant p95 = 0.28/0.6 = 0.46.
    """
    if calibration >= 1.0 or calibration <= 0.0:
        # <= 0 would divide by zero or invert the ordering (an embedder exposing
        # maxsim_calibration but leaving it uninitialized must mean "no rescale")
        return scores
    return jnp.clip(scores * (1.0 / calibration), 0.0, 1.0)


def dequantize_tokens(tokens: jax.Array) -> jax.Array:
    """int8 token rows -> bf16 unit-ish vectors; pass-through for float dtypes."""
    if tokens.dtype == jnp.int8:
        return tokens.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / INT8_TOKEN_SCALE)
    return tokens


@jax.jit
def maxsim_scores(
    doc_tokens: jax.Array,  # [K, Td, D] unit token embeddings (0-rows = padding)
    doc_mask: jax.Array,  # bool[K, Td]
    q_tokens: jax.Array,  # [Tq, D] unit token embeddings
    q_mask: jax.Array,  # bool[Tq]
    valid: jax.Array,  # bool[K] candidate validity (-1 ids masked upstream)
) -> jax.Array:
    """f32[K] MaxSim scores in [0, 1]; invalid candidates score 0."""
    # sim[k, t_d, t_q] on the MXU, f32 accumulation
    sim = jnp.einsum(
        "ktd,qd->ktq",
        dequantize_tokens(doc_tokens).astype(jnp.bfloat16),
        q_tokens.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    sim = jnp.where(doc_mask[:, :, None], sim, -jnp.inf)
    per_q = jnp.max(sim, axis=1)  # [K, Tq] best doc token per query token
    has_doc = doc_mask.any(axis=1)  # [K]
    per_q = jnp.where(has_doc[:, None], jnp.maximum(per_q, 0.0), 0.0)
    qm = q_mask.astype(jnp.float32)
    n_q = jnp.maximum(qm.sum(), 1.0)
    score01 = (per_q * qm[None, :]).sum(axis=1) / n_q  # [0, 1]
    return jnp.where(valid & has_doc, score01, 0.0)


@jax.jit
def maxsim_scores_batch(
    doc_tokens: jax.Array,  # [B, K, Td, D]
    doc_mask: jax.Array,  # bool[B, K, Td]
    q_tokens: jax.Array,  # [B, Tq, D]
    q_mask: jax.Array,  # bool[B, Tq]
    valid: jax.Array,  # bool[B, K]
) -> jax.Array:
    return jax.vmap(maxsim_scores)(doc_tokens, doc_mask, q_tokens, q_mask, valid)
