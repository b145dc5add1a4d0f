"""Blockwise MaxSim Pallas kernel.

Late-interaction scoring (see ``ops/maxsim.py`` for semantics and the XLA reference):
``score(q, d) = mean over query tokens of max over doc tokens of cos(q_i, d_j)``,
rescaled to [0, 1].

Kernel layout: grid ``(K, n_doc_tiles)`` — one candidate per grid row, document tokens
streamed in ``T_TILE``-row tiles through VMEM. The output block ``[1, Tq, 1]`` holds the
running per-query-token max and is revisited across tiles (TPU grids execute
sequentially), so the full ``[Td, Tq]`` similarity matrix never exists — for a
4096-token document only ``T_TILE x D`` of it is resident at a time (the SURVEY.md §5.7
blockwise requirement). The trailing masked mean over ``Tq`` values per candidate is
left to XLA (tiny, fuses with the surrounding program).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 128  # doc-token tile rows per grid step


def _kernel(doc_ref, dmask_ref, q_ref, out_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        out_ref[:] = jnp.full_like(out_ref, -jnp.inf)

    # [Tq, T_TILE] similarity on the MXU, f32 accumulation
    sim = jax.lax.dot_general(
        q_ref[:],  # [Tq, D]
        doc_ref[0],  # [T_TILE, D]
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    sim = jnp.where(dmask_ref[0] != 0, sim, -jnp.inf)  # dmask block [1, T] broadcast
    tile_max = jnp.max(sim, axis=1, keepdims=True)  # [Tq, 1]
    out_ref[0] = jnp.maximum(out_ref[0], tile_max)


@functools.partial(jax.jit, static_argnames=("interpret",))
def maxsim_scores_pallas(
    doc_tokens: jax.Array,  # [K, Td, D]
    doc_mask: jax.Array,  # bool[K, Td]
    q_tokens: jax.Array,  # [Tq, D]
    q_mask: jax.Array,  # bool[Tq]
    valid: jax.Array,  # bool[K]
    *,
    interpret: bool = False,
) -> jax.Array:
    """f32[K] MaxSim scores; numerically matches ops.maxsim.maxsim_scores."""
    k, td, d = doc_tokens.shape
    tq = q_tokens.shape[0]
    tile = min(T_TILE, td)
    n_tiles = pl.cdiv(td, tile)
    td_pad = n_tiles * tile
    if td_pad != td:
        doc_tokens = jnp.pad(doc_tokens, ((0, 0), (0, td_pad - td), (0, 0)))
        doc_mask = jnp.pad(doc_mask, ((0, 0), (0, td_pad - td)))

    runmax = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((k, tq, 1), jnp.float32),
        grid=(k, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, d), lambda i, t: (i, t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda i, t: (i, 0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, d), lambda i, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, 1), lambda i, t: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        # round BOTH operands to bf16 exactly like the XLA reference
        # (ops/maxsim.maxsim_scores casts doc and query tokens to bf16 before
        # the f32-accumulating matmul): keeping q in f32 measured ~1e-3
        # divergence on [0,1] scores — enough to flip candidates sitting at the
        # 0.6 safety gate between the Pallas and XLA rungs
        doc_tokens.astype(jnp.bfloat16),
        doc_mask.astype(jnp.int32).reshape(k, 1, td_pad),
        q_tokens.astype(jnp.bfloat16),
    )

    # trailing reduction in XLA (tiny): clamped masked mean over query tokens
    per_q = runmax.reshape(k, tq)  # [K, Tq]
    has_doc = jnp.isfinite(per_q).any(axis=1)
    per_q = jnp.where(jnp.isfinite(per_q), jnp.maximum(per_q, 0.0), 0.0)
    qm = q_mask.astype(jnp.float32)
    n_q = jnp.maximum(qm.sum(), 1.0)
    score01 = (per_q * qm[None, :]).sum(axis=1) / n_q
    return jnp.where(valid & has_doc, score01, 0.0)
