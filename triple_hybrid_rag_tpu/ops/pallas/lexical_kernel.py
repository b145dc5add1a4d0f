"""Doc-major BM25 membership-scan Pallas kernel.

XLA's broadcast formulation of :func:`~triple_hybrid_rag_tpu.ops.bm25.score_termtable`
is compute-bound on the ``(N, L, Q)`` equality compare. This kernel streams the term
table block-by-block through VMEM and accumulates the match mask with a register loop
over the (few, static) query slots — one read of the table, no broadcast intermediate:

    for each block of docs:
        match[Bn, L] = OR over q of (term_ids_block == query[q])
        scores[Bn] = sum(where(match, weights_block, 0), axis=1)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_N = 1024  # doc rows per grid step


def _kernel(q_ref, ids_ref, w_ref, out_ref):
    ids = ids_ref[:]  # [Bn, L] i32
    q_slots = q_ref.shape[0]
    match = jnp.zeros(ids.shape, dtype=jnp.bool_)
    for j in range(q_slots):  # static unroll over query slots
        match = match | (ids == q_ref[j, 0])
    # cast per-block in VMEM: a host-side .astype(f32) materialized a full
    # f32 copy of a bf16 table in HBM on every query batch
    w = w_ref[:].astype(jnp.float32)
    out_ref[:, 0] = jnp.sum(jnp.where(match, w, 0.0), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def score_termtable_pallas(
    term_ids: jax.Array,  # i32[N, L] (DOC_PAD=-2 empty)
    term_weights: jax.Array,  # f32[N, L]
    query_terms: jax.Array,  # i32[Q] (QUERY_PAD=-1 empty; never equals DOC_PAD)
    *,
    interpret: bool = False,
) -> jax.Array:
    """f32[N] BM25 scores; matches ops.bm25.score_termtable."""
    n, l = term_ids.shape
    q = query_terms.shape[0]
    block = min(BLOCK_N, n)
    n_blocks = pl.cdiv(n, block)
    n_pad = n_blocks * block
    if n_pad != n:
        term_ids = jnp.pad(term_ids, ((0, n_pad - n), (0, 0)), constant_values=-2)
        term_weights = jnp.pad(term_weights, ((0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, l), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(query_terms.reshape(q, 1), term_ids, term_weights)
    return out.reshape(n_pad)[:n]
