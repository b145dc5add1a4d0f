"""Blocked-IVF approximate dense search: the TPU-native ANN backend.

The reference's semantic channel runs on a pgvector **HNSW** index — an
*approximate* nearest-neighbor structure (``m=16, ef_construction=64``,
``/root/reference/database/migrations/20260114_rag2_schema.sql:176-179``). This
framework's default is an exact MXU scan (faster than HNSW-over-Postgres at every
measured scale), but exactness costs O(N) compute per batch; for latency-critical
small-batch serving and very large corpora an ANN option belongs in the box.

Graph-walk ANN (HNSW's pointer chasing) is hostile to XLA: data-dependent
control flow, scalar gathers, unbounded loop trips. The TPU-native equivalent is
**IVF with balanced re-blocking**:

1. spherical k-means clusters the (unit-norm) rows — build-time MXU matmuls;
2. rows are *reordered cluster-major* so same-cluster rows are contiguous;
3. the reordered matrix is chopped into fixed ``w``-row blocks; each block's
   probe centroid is the mean of its rows. Fixed-width blocks sidestep the
   classic IVF imbalance pathology (one mega-cluster inflating every probe
   window): every probe reads exactly ``w`` contiguous rows — a static-shape,
   DMA-friendly ``dynamic_slice``, never a scatter/gather of scalars.
4. a query scores all block centroids (one tiny matvec), probes the top ``p``
   blocks, scores their rows exactly, and top-k's the candidates with the same
   (score desc, id asc) tie-break as the exact path — so ``p = n_blocks``
   reproduces exact-scan results bit-for-bit for f32 rows (tested end-to-end).
   Quantized dtypes score in *dequantized f32* here (the exact backends use
   bf16 matmuls / int8 MXU dots), so full-probe scores can differ in low bits
   — ids match the dequantized-oracle ranking exactly (tested).

Recall/compute trade: probing ``p`` of ``W`` blocks scans ``p*w`` of ``n`` rows
(compute and HBM reads drop by ``W/p``); k-means locality makes the probed rows
the right ones (measured recall on the independent docstring corpus in
``eval_results/``). Per-shard local clustering (each mesh shard clusters its own
rows) keeps the build embarrassingly parallel and the serve-path merge identical
to the exact path's all-gather top-k.

Supports every dense row dtype: f32/bf16, int8 + per-row scales, and packed
int4 (uint8 nibbles — probe windows unpack on the fly, w x D at a time, and
score in f32: *higher* precision than the exact int4 path's int8 MXU dots).
Scales reorder with their rows.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _dequant_f32(rows: jax.Array, scales: Optional[jax.Array]) -> jax.Array:
    """f32 dequantized view: f32/bf16 pass-through, int8 × row scale, packed
    int4 (uint8 nibbles) unpack-then-scale. Output width is the LOGICAL dim
    (2x the stored width for int4)."""
    if rows.dtype == jnp.uint8:  # packed int4 (dense_index.quantize_rows_int4)
        from .dense_index import unpack_int4

        lo, hi = unpack_int4(rows)
        r = jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)
    else:
        r = rows.astype(jnp.float32)
    if scales is not None and rows.dtype in (jnp.int8, jnp.uint8):
        r = r * scales[:, None]
    return r


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters", "block"))
def kmeans_assign(
    rows: jax.Array,  # f32|bf16|int8[n, D] (unit rows pre-quant)
    scales: Optional[jax.Array],  # f32[n] | None (int8 dequant)
    valid: jax.Array,  # bool[n]
    *,
    n_clusters: int,
    iters: int = 8,
    block: int = 16384,
) -> jax.Array:
    """Spherical k-means cluster assignment i32[n] (invalid rows -> n_clusters).

    Build-time only. Assignment is blocked matmuls (MXU); the centroid update is
    a one-hot-matmul accumulation (also MXU) instead of a scatter — the Pallas
    guide's 'never scatter when a matmul will do' rule applied to clustering.
    Deterministic: strided initialization, no RNG.
    """
    n, d = rows.shape
    d_logical = d * 2 if rows.dtype == jnp.uint8 else d  # int4 packs 2 cols/byte
    n_pad = ((n + block - 1) // block) * block
    rows_p = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    scales_p = (
        jnp.pad(scales, (0, n_pad - n)) if scales is not None else None
    )
    valid_p = jnp.pad(valid, (0, n_pad - n))
    n_blocks = n_pad // block

    # strided init over VALID rows only (a zero padding row would become a zero
    # centroid that never captures mass — silently fewer effective clusters on
    # corpora with a large padded tail); renormalized
    valid_pos = jnp.nonzero(valid, size=n, fill_value=0)[0]
    n_valid = jnp.maximum(valid.sum(), 1)
    stride = jnp.maximum(n_valid // n_clusters, 1)
    init_idx = valid_pos[(jnp.arange(n_clusters) * stride) % n_valid]
    cent = _dequant_f32(rows[init_idx], scales[init_idx] if scales is not None else None)
    cent = cent / jnp.maximum(jnp.linalg.norm(cent, axis=1, keepdims=True), 1e-9)

    def one_iter(_, cent):
        def body(i, acc_cnt):
            acc, cnt = acc_cnt
            r = jax.lax.dynamic_slice(rows_p, (i * block, 0), (block, d))
            s = (
                jax.lax.dynamic_slice(scales_p, (i * block,), (block,))
                if scales_p is not None
                else None
            )
            v = jax.lax.dynamic_slice(valid_p, (i * block,), (block,))
            rf = _dequant_f32(r, s)
            a = jnp.argmax(rf @ cent.T, axis=1)  # [block]
            # one-hot in bf16, f32 accumulate: the [block, C] transient at 8M-scale
            # shapes (block 16k x C 4k) stays ~128 MB instead of gigabytes
            onehot = (
                jax.nn.one_hot(a, n_clusters, dtype=jnp.bfloat16)
                * v[:, None].astype(jnp.bfloat16)
            )
            acc = acc + jnp.dot(
                onehot.T, rf.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc, cnt + onehot.astype(jnp.float32).sum(axis=0)

        acc, cnt = jax.lax.fori_loop(
            0, n_blocks, body,
            (
                jnp.zeros((n_clusters, d_logical), jnp.float32),
                jnp.zeros((n_clusters,), jnp.float32),
            ),
        )
        new = acc / jnp.maximum(cnt[:, None], 1.0)
        norm = jnp.linalg.norm(new, axis=1, keepdims=True)
        new = jnp.where(norm > 1e-9, new / jnp.maximum(norm, 1e-9), cent)
        return new

    cent = jax.lax.fori_loop(0, iters, one_iter, cent)

    def assign_block(i):
        r = jax.lax.dynamic_slice(rows_p, (i * block, 0), (block, d))
        s = (
            jax.lax.dynamic_slice(scales_p, (i * block,), (block,))
            if scales_p is not None
            else None
        )
        return jnp.argmax(_dequant_f32(r, s) @ cent.T, axis=1).astype(jnp.int32)

    assign = jax.lax.map(assign_block, jnp.arange(n_blocks)).reshape(-1)[:n]
    return jnp.where(valid, assign, jnp.int32(n_clusters))  # invalid sorts last


def ivf_build_local(
    rows: jax.Array,  # f32|bf16|int8[n, D]
    scales: Optional[jax.Array],  # f32[n] | None
    valid: jax.Array,  # bool[n]
    *,
    block_rows: int,
    n_clusters: int = 0,
    iters: int = 8,
) -> Tuple[jax.Array, Optional[jax.Array], jax.Array, jax.Array]:
    """Cluster-major reorder + fixed-width block centroids for ONE shard's rows.

    Returns (rows_reordered [n, D] same dtype, scales_reordered | None,
    perm i32[n] original local row per slot (n = invalid sentinel),
    centroids f32[W, D] block means, W = n // block_rows).

    ``n`` must be a multiple of ``block_rows`` (the engine's capacity rounding
    guarantees it after padding).
    """
    n, d = rows.shape
    w = block_rows
    assert n % w == 0, (n, w)
    # auto cluster count: one per block, capped at 4096 — beyond that the k-means
    # assign/update transients dominate build HBM while block centroids already
    # saturate probe granularity (several blocks per cluster share a mean)
    C = n_clusters or max(min(n // w, 4096), 1)
    assign = kmeans_assign(rows, scales, valid, n_clusters=C, iters=iters)
    # stable cluster-major order; within a cluster, ascending original row
    perm = jnp.argsort(assign, stable=True).astype(jnp.int32)
    rows_r = rows[perm]
    scales_r = scales[perm] if scales is not None else None
    perm = jnp.where(valid[perm], perm, jnp.int32(n))  # dead slots -> sentinel
    # block centroids computed BLOCKWISE: a full-matrix dequant materializes
    # ~10x the stored size in temps (AOT-measured 671 MB for a 64 MB int4
    # shard; ~40+ GB at the certified 8M one-chip scale) — lax.map bounds the
    # transient to one [w, D] block, matching kmeans_assign's discipline
    alive = (perm < n).reshape(n // w, w, 1).astype(jnp.float32)

    def block_centroid(args):
        r_blk, s_blk, a_blk = args  # [w, stored], [w] | dummy, [w, 1]
        deq = _dequant_f32(r_blk, s_blk if scales_r is not None else None)
        return (deq * a_blk).sum(axis=0) / jnp.maximum(a_blk.sum(), 1.0)

    s_blocks = (
        scales_r.reshape(n // w, w)
        if scales_r is not None
        else jnp.zeros((n // w, 1), jnp.float32)  # unused dummy
    )
    cent = jax.lax.map(
        block_centroid,
        (rows_r.reshape(n // w, w, d), s_blocks, alive),
    )
    return rows_r, scales_r, perm, cent


def ivf_topk_local(
    rows_r: jax.Array,  # f32|bf16|int8[n, D] cluster-major reordered rows
    scales_r: Optional[jax.Array],  # f32[n] | None
    perm: jax.Array,  # i32[n] original local row per slot (n = invalid)
    centroids: jax.Array,  # f32[W, D] block means
    q_vec: jax.Array,  # f32[B, D] unit queries
    *,
    probes: int,
    top_k: int,
    row_mask: Optional[jax.Array] = None,  # bool[B, n_local_rows] original-id mask
) -> Tuple[jax.Array, jax.Array]:
    """Probed top-k over block-IVF layout. Returns (ids i32[B, k] ORIGINAL local
    rows, scores f32[B, k]) with -1 / -inf invalid slots; tie-break
    (score desc, original id asc) — identical to the exact path, so
    ``probes >= W`` reproduces it bit-for-bit for f32 rows (see module
    docstring for the quantized-dtype score caveat)."""
    n, d = rows_r.shape
    wn = centroids.shape[0]
    w = n // wn
    p = min(probes, wn)
    neg = jnp.float32(-jnp.inf)

    def one(q, mask_q):
        cs = centroids @ q  # [W]
        _, probe = jax.lax.top_k(cs, p)  # block ids

        def score_block(c):
            start = c * w
            r = jax.lax.dynamic_slice(rows_r, (start, 0), (w, d))
            ids = jax.lax.dynamic_slice(perm, (start,), (w,))
            s = _dequant_f32(r, None) @ q  # int4 windows unpack here (w x D, tiny)
            if scales_r is not None and rows_r.dtype in (jnp.int8, jnp.uint8):
                sc = jax.lax.dynamic_slice(scales_r, (start,), (w,))
                s = s * sc
            ok = ids < n
            if mask_q is not None:
                ok = ok & mask_q[jnp.clip(ids, 0, mask_q.shape[0] - 1)]
            return jnp.where(ok, s, neg), jnp.where(ok, ids, jnp.int32(2**30))

        vals, ids = jax.lax.map(score_block, probe)  # [p, w] x2
        from ..ops.topk import sort_topk_desc

        return sort_topk_desc(vals.reshape(-1), ids.reshape(-1), top_k)

    if row_mask is None:
        ids, vals = jax.lax.map(lambda q: one(q, None), q_vec)
    else:
        ids, vals = jax.lax.map(lambda a: one(a[0], a[1]), (q_vec, row_mask))
    return ids, vals
