"""MaxSim index: stored token-level embeddings per parent chunk.

The storage the reference lacks ("no token-level embedding storage exists" — SURVEY.md
§5.7), enabling true late-interaction reranking. Token embeddings live in HBM as a
``[P_pad, T_doc, D]`` block — bf16 by default, int8 under ``embedding_dtype="int8"``
(unit-vector components quantize with a static x127 scale, 4x smaller than f32; scoring
dequantizes transparently in ``ops/maxsim``). The rerank stage gathers only its <= 50
candidates, so the gather cost is trivial while the store streams once at build time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAGConfig
from ..ops.maxsim import maxsim_scores


@dataclass
class MaxSimIndex:
    tokens: jax.Array  # bf16[P_pad, Td, D] unit token embeddings (zero rows = pad)
    mask: jax.Array  # bool[P_pad, Td]
    n_parents: int
    config: RAGConfig

    def append(self, new_tokens: np.ndarray) -> "MaxSimIndex":
        """Incremental row append into spare capacity (see DenseIndex.append)."""
        n_new = int(new_tokens.shape[0])
        if n_new == 0:
            return self
        new_total = self.n_parents + n_new
        toks, mask = self.tokens, self.mask
        p_pad = toks.shape[0]
        if new_total > p_pad:
            p_pad = self.config.round_capacity(new_total)
            toks = jnp.pad(toks, ((0, p_pad - toks.shape[0]), (0, 0), (0, 0)))
            mask = jnp.pad(mask, ((0, p_pad - mask.shape[0]), (0, 0)))
        td, d = toks.shape[1], toks.shape[2]
        rows = np.zeros((n_new, td, d), np.float32)
        t_avail = min(td, new_tokens.shape[1])
        d_avail = min(d, new_tokens.shape[2])
        rows[:, :t_avail, :d_avail] = new_tokens[:, :t_avail, :d_avail]
        row_mask = np.any(rows != 0, axis=-1)
        if toks.dtype == jnp.int8:
            rows = _pack_tokens(rows, "int8")
        toks = jax.lax.dynamic_update_slice(
            toks, jnp.asarray(rows, dtype=toks.dtype), (self.n_parents, 0, 0)
        )
        mask = jax.lax.dynamic_update_slice(
            mask, jnp.asarray(row_mask), (self.n_parents, 0)
        )
        return MaxSimIndex(tokens=toks, mask=mask, n_parents=new_total, config=self.config)

    def score_candidates(
        self,
        parent_rows: jax.Array,
        q_tokens: jax.Array,
        q_mask: jax.Array,
        use_pallas: bool = False,
        interpret: bool = False,
    ) -> jax.Array:
        """f32[K] MaxSim scores for candidate parent rows (-1 invalid).

        ``use_pallas`` switches the scoring backend; the candidate clip/gather/
        validity semantics live HERE for both rungs (the reranker previously
        re-implemented them inline for the Pallas path — the kind of drift the
        bf16-parity fix showed this code is sensitive to)."""
        p_pad = self.tokens.shape[0]
        safe = jnp.clip(parent_rows, 0, p_pad - 1)
        if use_pallas:
            from ..ops.maxsim import dequantize_tokens
            from ..ops.pallas import maxsim_scores_pallas

            return maxsim_scores_pallas(
                dequantize_tokens(self.tokens[safe]).astype(jnp.bfloat16),
                self.mask[safe], q_tokens, q_mask, parent_rows >= 0,
                interpret=interpret,
            )
        return maxsim_scores(
            self.tokens[safe], self.mask[safe], q_tokens, q_mask, parent_rows >= 0
        )


def build_maxsim_index(
    parent_texts: Sequence[str],
    token_embedder,  # object with token_embeddings(texts) -> f32[N, T, D]
    config: RAGConfig,
    batch_size: int = 64,
) -> MaxSimIndex:
    n = len(parent_texts)
    p_pad = config.round_capacity(max(n, 1))
    td = config.maxsim_doc_tokens
    d = config.maxsim_dim

    # stage directly in the STORAGE dtype, packing each embedder batch as it
    # arrives: a full-corpus f32 staging buffer peaked at 4-5x the final int8
    # store (~32 GB at 1M parents with the defaults — host OOM at exactly the
    # scale this repo benchmarks)
    store_dtype = _pack_tokens(np.zeros((1, 1, 1), np.float32), config.embedding_dtype).dtype
    toks = np.zeros((p_pad, td, d), store_dtype)
    mask = np.zeros((p_pad, td), bool)
    for i in range(0, n, batch_size):
        batch = list(parent_texts[i : i + batch_size])
        emb = token_embedder.token_embeddings(batch, dim=d)  # [b, T, <=d]
        t_avail = min(td, emb.shape[1])
        d_avail = min(d, emb.shape[2])
        block = np.zeros((len(batch), td, d), np.float32)
        block[:, :t_avail, :d_avail] = emb[:, :t_avail, :d_avail]
        toks[i : i + len(batch)] = _pack_tokens(block, config.embedding_dtype)
        mask[i : i + len(batch), :t_avail] = np.any(emb[:, :t_avail] != 0, axis=-1)

    return MaxSimIndex(
        tokens=jnp.asarray(toks),
        mask=jnp.asarray(mask),
        n_parents=n,
        config=config,
    )


def _pack_tokens(toks: np.ndarray, embedding_dtype: str) -> np.ndarray:
    """float token rows -> storage dtype. int8 uses the static unit-vector scale
    (ops/maxsim.INT8_TOKEN_SCALE); scoring dequantizes transparently."""
    if embedding_dtype in ("int8", "int4"):
        # int4 selects minimal-HBM storage for the DENSE rows; token rows have no
        # packed-nibble kernel, so they store int8 — the same pairing the 8M
        # one-chip bench uses (bench.py: "MaxSim tokens stay int8 under int4
        # dense"). Scoring dequantizes by dtype (ops/maxsim.py), so this is
        # transparent. Previously int4 silently kept f32 tokens, which both
        # contradicted the dtype's HBM intent and made quant_quality.py price a
        # config the bench never runs.
        from ..ops.maxsim import INT8_TOKEN_SCALE

        return np.clip(np.round(toks * INT8_TOKEN_SCALE), -127, 127).astype(np.int8)
    if embedding_dtype == "bfloat16":
        return np.asarray(jnp.asarray(toks, dtype=jnp.bfloat16))
    return toks.astype(np.float32)
