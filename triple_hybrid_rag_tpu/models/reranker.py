"""Rerankers: precision stage over the fused candidate set.

Reference behavior (``/root/reference/src/voice_agent/retrieval/reranker.py:34-797`` and
``rag2/retrieval.py:405-459``): cross-encoder relevance scores in [0, 1] over (query,
parent_text) pairs via a vLLM ``/rerank`` endpoint, with a chat+logprob fallback and a
"neutral scores, original order" last resort; candidates capped at 50; results sorted by
rerank score and fed to the safety gate.

TPU-native lineup:

- :class:`MaxSimReranker` (``ops/maxsim.py``) — true late-interaction MaxSim over stored
  token-level embeddings; the reference *claims* late interaction but implements pointwise
  yes/no scoring (SURVEY.md §5.7); here it is real, and the primary backend.
- :class:`DotReranker` — parent-embedding dot product with the query: a cheap cross-check
  backend mirroring the reference's ``LightweightReranker`` blend role (reranker.py:590).
- :class:`NoopReranker` — min-max-normalized fused scores, preserving candidate order:
  the "rerank unavailable" degradation rung (reranker.py:392-399). Normalization maps the
  top candidate to 1.0 so the downstream 0.6 safety threshold (tuned for [0, 1]
  cross-encoder scores) stays meaningful.

All rerankers are device ops: ``score(query_ctx, candidate_rows) -> f32[K]`` with -1 rows
masked. The host never sees intermediate scores.
"""

from __future__ import annotations

from typing import Optional, Protocol

import jax
import jax.numpy as jnp

from ..config import RAGConfig, get_settings
from ..ops.fusion import minmax_normalize


class Reranker(Protocol):
    def score(
        self,
        query_ctx: dict,
        ids: jax.Array,  # i32[K] candidate *parent* rows (-1 invalid)
        fused_scores: jax.Array,  # f32[K] fused RRF scores (fallback signal)
    ) -> jax.Array:
        """f32[K] relevance scores in [0, 1]-ish range; invalid slots 0."""
        ...


class NoopReranker:
    """Degradation rung: pass fused order through, min-max normalized to [0, 1]."""

    def __init__(self, config: Optional[RAGConfig] = None) -> None:
        self.config = config or get_settings()

    def score(self, query_ctx: dict, ids: jax.Array, fused_scores: jax.Array) -> jax.Array:
        return minmax_normalize(ids, fused_scores)


class DotReranker:
    """Query x parent-embedding cosine, rescaled from [-1, 1] to [0, 1]."""

    def __init__(self, parent_embeddings: jax.Array, config: Optional[RAGConfig] = None) -> None:
        self.parent_embeddings = parent_embeddings  # [P_pad, D] unit rows
        self.config = config or get_settings()

    def score(self, query_ctx: dict, ids: jax.Array, fused_scores: jax.Array) -> jax.Array:
        qv = query_ctx.get("query_vec")  # f32[D] unit
        if qv is None:
            # semantic channel unavailable (e.g. dead embedding server): degrade to
            # fused order, the reference's original-order rung (reranker.py:459-466)
            return minmax_normalize(ids, fused_scores)
        emb = self.parent_embeddings[jnp.clip(ids, 0, self.parent_embeddings.shape[0] - 1)]
        cos = jnp.dot(emb, qv.astype(emb.dtype), preferred_element_type=jnp.float32)
        return jnp.where(ids >= 0, (cos + 1.0) * 0.5, 0.0)


class CallableReranker:
    """Host-callable cross-encoder adapter with the reference's chat-scoring fallback
    semantics (reranker.py:154-285): ``fn(query, texts) -> [0,1] scores``; any failure
    degrades to the inner reranker (native /rerank -> chat -> original-order ladder).

    ``texts_of`` resolves candidate parent rows to their texts (host lookup — an LLM
    reranker is a host boundary by nature, exactly like the reference's vLLM call)."""

    def __init__(self, fn, texts_of, fallback: Reranker, config: Optional[RAGConfig] = None):
        self.fn = fn
        self.texts_of = texts_of
        self.fallback = fallback
        self.config = config or get_settings()

    def score(self, query_ctx: dict, ids: jax.Array, fused_scores: jax.Array) -> jax.Array:
        import numpy as np

        ids_np = np.asarray(ids)
        query = query_ctx.get("query_text", "")
        try:
            # compact to VALID candidates only: -1 pad slots would otherwise be
            # sent as empty-string documents — on the chat-scoring fallback each
            # one costs a full model round trip whose score is masked out anyway
            valid_pos = [j for j, i in enumerate(ids_np) if i >= 0]
            # cap the pool sent to the model (reference reranker.py:383 caps at
            # 50): ids arrive in fused-rank order, so truncating the tail keeps
            # the best candidates; uncapped slots keep score 0 = stay at the
            # bottom, exactly the reference's "unreranked tail" behavior
            valid_pos = valid_pos[: max(1, int(self.config.rerank_max_candidates))]
            scores = np.zeros(ids_np.shape, np.float32)
            if valid_pos:
                texts = [self.texts_of(int(ids_np[j])) for j in valid_pos]
                raw = np.asarray(self.fn(query, texts), dtype=np.float32)
                if raw.shape != (len(valid_pos),):
                    raise ValueError("reranker returned wrong shape")
                scores[valid_pos] = np.clip(raw, 0.0, 1.0)
            return jnp.asarray(scores)
        except Exception:
            return self.fallback.score(query_ctx, ids, fused_scores)


def get_reranker(
    config: Optional[RAGConfig] = None,
    parent_embeddings: Optional[jax.Array] = None,
    maxsim_index=None,
    llm_fn=None,
    texts_of=None,
    maxsim_calibration: float = 1.0,
) -> Reranker:
    """Factory with the reference's fallback ladder (reranker.py:768 get_reranker):
    llm -> maxsim -> dot -> noop, degrading on missing prerequisites."""
    config = config or get_settings()
    backend = config.rerank_backend if config.rerank_enabled else "none"
    inner: Reranker
    if backend == "maxsim" and maxsim_index is not None:
        from .maxsim_reranker import MaxSimReranker

        inner = MaxSimReranker(maxsim_index, config, calibration=maxsim_calibration)
    elif backend in ("maxsim", "dot") and parent_embeddings is not None:
        inner = DotReranker(parent_embeddings, config)
    else:
        inner = NoopReranker(config)
    if llm_fn is not None and texts_of is not None:
        return CallableReranker(llm_fn, texts_of, inner, config)
    return inner
