"""Tiled dense-scoring Pallas kernel: (B, D) x (D, N) bf16 matmul, f32 accumulation.

The semantic channel's hot op (see ``index/dense_index.py``). XLA's matmul is already
near the HBM roofline for this shape; the kernel exists to (a) guarantee the fusion and
layout on every backend, (b) serve as the substrate for fused scoring+pruning variants.
Grid tiles over corpus rows; the query block stays resident in VMEM across all tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 2048  # corpus rows per grid step


def _kernel(q_ref, e_ref, out_ref):
    # [B, D] x [Bn, D]^T -> [B, Bn] on the MXU
    out_ref[:] = jax.lax.dot_general(
        q_ref[:],
        e_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def dense_scores_pallas(
    embeddings: jax.Array,  # bf16|f32[N, D] unit rows
    query_vecs: jax.Array,  # f32[B, D]
    *,
    interpret: bool = False,
) -> jax.Array:
    """f32[B, N] cosine scores; matches index.dense_index.dense_scores_batch."""
    n, d = embeddings.shape
    b = query_vecs.shape[0]
    block = min(BLOCK_N, n)
    n_blocks = pl.cdiv(n, block)
    n_pad = n_blocks * block
    if n_pad != n:
        embeddings = jnp.pad(embeddings, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, n_pad), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(query_vecs.astype(embeddings.dtype), embeddings)
    return out[:, :n]
