"""Dense semantic index: HBM-resident embedding matrix with exact matmul top-k.

Replaces pgvector's HNSW graph traversal (``rag2_semantic_search`` cosine ``<=>`` RPC,
``/root/reference/database/migrations/20260114_rag2_schema.sql:377-410``; HNSW params
``:176-179``). On TPU exact search *is* the right algorithm at this scale (SURVEY.md §7): a
(N, D) bf16 matrix at N=1M, D=1024 is 2 GB of HBM and one query is a single
bandwidth-bound matvec on the MXU — no approximate graph walk, no recall loss.

Matryoshka semantics are preserved exactly as the reference embedder does it: prefix-truncate
the full-dim embedding to ``embedding_dim`` then re-L2-normalize
(``/root/reference/src/voice_agent/rag2/embedder.py:40-68``: truncate_matryoshka + normalize_l2).
Scores are cosine similarity == dot product of unit vectors, matching ``1 - (a <=> b)``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import RAGConfig
from ..ops.topk import masked_top_k


def truncate_matryoshka(vectors: np.ndarray, dim: int) -> np.ndarray:
    """Prefix-truncate + re-L2-normalize (reference embedder.py:40-68 semantics)."""
    v = np.asarray(vectors, dtype=np.float32)[..., :dim]
    norms = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(norms, 1e-12)


@dataclass
class DenseIndex:
    """HBM-resident embedding matrix + static metadata."""

    embeddings: jax.Array  # bf16|f32[n_pad, D] row-unit-normalized
    valid: jax.Array  # bool[n_pad] occupancy mask (capacity padding)
    n_docs: int
    n_pad: int
    dim: int
    config: RAGConfig

    def score(self, query_vec: jax.Array) -> jax.Array:
        """Cosine scores f32[n_pad] for a unit query vector (single MXU matvec)."""
        return _dense_scores(self.embeddings, query_vec)

    def append(self, vectors: np.ndarray) -> "DenseIndex":
        """Incremental update: write new rows into spare capacity on device.

        The XLA static-shape answer to incremental indexing (SURVEY.md §7 hard part (c)):
        arrays are capacity-padded, so appends that fit are a single on-device
        ``dynamic_update_slice`` + occupancy-mask extension — no host round trip, no
        recompile (shapes unchanged). When capacity is exceeded the index grows to the
        next capacity multiple (one re-pad, then future appends are in-place again).
        Returns a new index (functionally updated arrays; the old one stays valid).
        """
        n_new = int(vectors.shape[0])
        if n_new == 0:
            return self
        new_total = self.n_docs + n_new
        emb = self.embeddings
        valid = self.valid
        n_pad = self.n_pad
        if new_total > n_pad:
            n_pad = self.config.round_capacity(new_total)
            emb = jnp.pad(emb, ((0, n_pad - emb.shape[0]), (0, 0)))
            valid = jnp.pad(valid, (0, n_pad - valid.shape[0]))
        rows = jnp.asarray(
            truncate_matryoshka(vectors, self.dim), dtype=emb.dtype
        )
        emb = jax.lax.dynamic_update_slice(emb, rows, (self.n_docs, 0))
        valid = jax.lax.dynamic_update_slice(
            valid, jnp.ones((n_new,), bool), (self.n_docs,)
        )
        return DenseIndex(
            embeddings=emb, valid=valid, n_docs=new_total, n_pad=n_pad,
            dim=self.dim, config=self.config,
        )

    def search(
        self,
        query_vec: np.ndarray | jax.Array,
        top_k: Optional[int] = None,
        row_mask: Optional[jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Semantic channel: query embedding -> (ids i32[k], scores f32[k]).

        Cosine similarity in [-1, 1]; invalid (padded) rows are zero vectors scoring 0,
        and are additionally masked out via the occupancy mask so a legitimate negative
        -score document can still be returned."""
        k = top_k or self.config.semantic_top_k
        q = jnp.asarray(query_vec)
        scores = self.score(q)
        valid = self.valid if row_mask is None else self.valid & row_mask
        return masked_top_k(scores, k, valid=valid, invalid_score_floor=-2.0)


@jax.jit
def _dense_scores(embeddings: jax.Array, query_vec: jax.Array) -> jax.Array:
    """One matvec over the corpus, f32 accumulation on the MXU."""
    return jnp.dot(
        embeddings, query_vec.astype(embeddings.dtype), preferred_element_type=jnp.float32
    )


@jax.jit
def dense_scores_batch(embeddings: jax.Array, query_vecs: jax.Array) -> jax.Array:
    """Batched scoring f32[B, n_pad] — one (B, D) x (D, N) MXU matmul."""
    return jnp.dot(
        query_vecs.astype(embeddings.dtype), embeddings.T, preferred_element_type=jnp.float32
    )


def build_dense_index(
    vectors: np.ndarray,  # f32[N, D_full] raw embeddings (any norm)
    config: RAGConfig,
) -> DenseIndex:
    """Matryoshka-truncate, renormalize, pad to capacity, place in HBM."""
    n_docs = int(vectors.shape[0])
    dim = config.embedding_dim
    n_pad = config.round_capacity(max(n_docs, 1))
    dtype = jnp.bfloat16 if config.embedding_dtype == "bfloat16" else jnp.float32

    mat = np.zeros((n_pad, dim), dtype=np.float32)
    if n_docs:
        mat[:n_docs] = truncate_matryoshka(vectors, dim)
    valid = np.zeros((n_pad,), dtype=bool)
    valid[:n_docs] = True

    return DenseIndex(
        embeddings=jnp.asarray(mat, dtype=dtype),
        valid=jnp.asarray(valid),
        n_docs=n_docs,
        n_pad=n_pad,
        dim=dim,
        config=config,
    )
