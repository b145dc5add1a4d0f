"""Fused dense scoring + exact top-k without materializing f32[B, N] scores.

SURVEY.md §7 hard part (b): the one retrieval op XLA cannot express as a single
fusion. The XLA path (``parallel/engine.py`` dense channel) computes a
(B, D) x (D, N) matmul whose f32[B, N] output round-trips through HBM before
``lax.top_k`` reads it back — at 8M rows x batch 64 that is a 2 GB score matrix
(write + read = 4 GB of extra HBM traffic and 2 GB of capacity pressure on a
16 GB chip). The reference never faces this because pgvector's HNSW walk is
host-side pointer chasing (``/root/reference/database/migrations/
20260114_rag2_schema.sql:377-410``); on TPU exact brute-force is the right
algorithm, so the fusion is the scaling lever instead.

Design — hierarchical *exact* top-k via in-kernel bucket maxima:

1. **Pallas kernel** (this file): grid over corpus row tiles. Each step computes
   the tile's scores on the MXU (int8 x int8 -> int32, or bf16 -> f32), applies
   validity / per-query collection masks on the VPU, reduces groups of
   ``bucket`` adjacent rows to their max (a sublane-group reduction; effective
   buckets larger than block/128 fold once more in XLA), and writes only the
   f32[B, N/bucket] bucket maxima. The f32[B, N] matrix never exists: HBM score
   traffic drops bucket-x and peak memory drops from O(B*N) to O(B*N/bucket).
   Measured on TPU v5e at 4M x 1024 int8, B=64, K=32: 21.4 ms vs 35.5 ms for
   the XLA path (1.66x, bucket=16), ids bit-identical.
2. **Bucket select (XLA)**: exact ``lax.top_k`` over the bucket maxima picks the
   top-k *buckets* per query.
3. **Rescore (XLA)**: gather the k*8 member rows of the winning buckets and
   rescore them (a tiny [B, k*8, D] einsum), then a lexicographic
   (score desc, id asc) sort yields the final (ids, scores).

Exactness proof: let v be the k-th highest masked score. Any bucket containing
a top-k element has max >= v. If such a bucket were *not* among the k
highest-max buckets, there would be >= k buckets with strictly larger maxima,
hence >= k elements scoring > v — contradicting v's rank. Ties: ``lax.top_k``
over buckets prefers the lowest bucket id, and bucket ids are ordered by row
id, so the k lowest-id tied elements are always inside (selected high-max
buckets) ∪ (k lowest-id tied buckets) — the final (score desc, id asc) sort
then reproduces ``masked_top_k``'s position-order tie-break exactly. On the
int8 path scores are *bit-identical* to ``dense_scores_int8_batch``: the
int32 accumulation is exact and the dequant multiply order is matched. On the
bf16/f32 path scores agree with the XLA channel up to f32 accumulation order
(measured ±2e-4 at D=1024 unit vectors on v5e) — near-exact-tie candidates can
swap ranks between the two lowerings, exactly as they can between any two XLA
partitionings of the same matmul.

The kernel computes scores tile-major ([rows, B]) so the bucket reduction is a
cheap sublane-group max, then transposes the small [rows/8, B] result in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BUCKET = 8  # kernel-level bucket == f32 sublane tile (Mosaic-legal minimum)
DEFAULT_BUCKET = 16  # effective bucket: best measured on v5e (1.66x vs XLA at 4M)
BLOCK_ROWS = 2048  # corpus rows per grid step (int8 tile: 2 MB VMEM at D=1024)
NEG_INF = float("-inf")  # plain float: jnp scalars would be captured consts in kernels


def _col(lane_ref):
    """[1, block] lane vector -> [block, 1] sublane column, in VMEM.

    The per-row aux operands (validity addmask, int8/int4 scales, collection
    ids) ship as [1, N] LANE vectors and are transposed per block here: XLA
    tiles an f32[N, 1] custom-call operand as T(8,128) — 512 BYTES per logical
    element, i.e. 2 x 4 GB of HBM temps at 8M rows, which is what broke the 8M
    one-chip compile. [1, N] tiles at 32 B/element (8-sublane waste only)."""
    return jnp.transpose(lane_ref[:], (1, 0))


def _mask_and_reduce(s, addmask_ref, coll_ref, cid_ref, bucket):
    """Apply validity + collection masks to f32[rows, B] scores, bucket-reduce."""
    rows, b = s.shape
    s = s + _col(addmask_ref)  # [rows, 1] additive 0 / -inf validity mask
    if coll_ref is not None:
        # per-query collection scoping: cid -1 = unscoped, -2 = match nothing
        cid = cid_ref[:]  # i32[1, B]
        ok = (cid == -1) | (_col(coll_ref) == cid)  # [rows, B]
        s = jnp.where(ok, s, NEG_INF)
    bucket_max = jnp.max(s.reshape(rows // bucket, bucket, b), axis=1)
    return bucket_max.T  # [B, rows/bucket]


def _kernel_int8(q_ref, qs_ref, e_ref, scale_ref, addmask_ref, out_ref, *, bucket):
    acc = jax.lax.dot_general(
        e_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # int32[rows, B]
    # dequant multiply order matches dense_scores_int8_batch: (acc*scale)*q_scale
    s = acc.astype(jnp.float32) * _col(scale_ref) * qs_ref[:]
    out_ref[:] = _mask_and_reduce(s, addmask_ref, None, None, bucket)


def _kernel_int8_scoped(q_ref, qs_ref, cid_ref, e_ref, scale_ref, addmask_ref,
                        coll_ref, out_ref, *, bucket):
    acc = jax.lax.dot_general(
        e_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    s = acc.astype(jnp.float32) * _col(scale_ref) * qs_ref[:]
    out_ref[:] = _mask_and_reduce(s, addmask_ref, coll_ref, cid_ref, bucket)


def _int4_acc(p_ref, q_ref):
    """int32[rows, B] scores from packed-nibble rows: unpack in VMEM (int32
    shifts, sign-extending), then two half-width int8 MXU matmuls. The pack
    layout (column j low nibble, column j+D/2 high nibble — see
    index/dense_index.quantize_rows_int4) makes the split interleave-free."""
    from ...index.dense_index import unpack_int4

    low, high = unpack_int4(p_ref[:])  # shared sign-extension (one pack layout)
    d2 = low.shape[1]
    dims = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(
        low, q_ref[:, :d2], dimension_numbers=dims,
        preferred_element_type=jnp.int32,
    )
    acc += jax.lax.dot_general(
        high, q_ref[:, d2:], dimension_numbers=dims,
        preferred_element_type=jnp.int32,
    )
    return acc


def _kernel_int4(q_ref, qs_ref, e_ref, scale_ref, addmask_ref, out_ref, *, bucket):
    s = _int4_acc(e_ref, q_ref).astype(jnp.float32) * _col(scale_ref) * qs_ref[:]
    out_ref[:] = _mask_and_reduce(s, addmask_ref, None, None, bucket)


def _kernel_int4_scoped(q_ref, qs_ref, cid_ref, e_ref, scale_ref, addmask_ref,
                        coll_ref, out_ref, *, bucket):
    s = _int4_acc(e_ref, q_ref).astype(jnp.float32) * _col(scale_ref) * qs_ref[:]
    out_ref[:] = _mask_and_reduce(s, addmask_ref, coll_ref, cid_ref, bucket)


def _kernel_float(qt_ref, e_ref, addmask_ref, out_ref, *, bucket):
    # standard [rows, D] @ [D, B] matmul: q ships pre-transposed. The dim1-dim1
    # contraction the int8 path uses trips a Mosaic bf16 lowering bug here
    # ('vector.broadcast' bf16 -> f32 verification failure on v5e).
    s = jax.lax.dot_general(
        e_ref[:], qt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # f32[rows, B]
    out_ref[:] = _mask_and_reduce(s, addmask_ref, None, None, bucket)


def _kernel_float_scoped(qt_ref, cid_ref, e_ref, addmask_ref, coll_ref, out_ref, *,
                         bucket):
    s = jax.lax.dot_general(
        e_ref[:], qt_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = _mask_and_reduce(s, addmask_ref, coll_ref, cid_ref, bucket)


def _pad_rows(n: int, block: int) -> int:
    return ((n + block - 1) // block) * block


def quantize_queries_int8(query_vecs: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-query symmetric absmax int8 — identical to dense_scores_int8_batch."""
    q = query_vecs.astype(jnp.float32)
    q_absmax = jnp.maximum(jnp.max(jnp.abs(q), axis=1, keepdims=True), 1e-12)
    q_scale = q_absmax / 127.0  # [B, 1]
    q_i8 = jnp.clip(jnp.round(q / q_scale), -127, 127).astype(jnp.int8)
    return q_i8, q_scale


@functools.partial(
    jax.jit,
    static_argnames=("block", "bucket", "interpret"),
)
def bucket_maxima_pallas(
    embeddings: jax.Array,   # int8|bf16|f32[N, D]
    query_vecs: jax.Array,   # f32[B, D] (or pre-quantized int8 if scales given)
    addmask: jax.Array,      # f32[1, N]: 0 valid / -inf invalid (lane vector)
    scales: Optional[jax.Array] = None,       # f32[1, N] int8 row scales
    q_scale: Optional[jax.Array] = None,      # f32[1, B] int8 query scales
    collection_of: Optional[jax.Array] = None,  # i32[1, N]
    coll_cid: Optional[jax.Array] = None,       # i32[1, B]
    *,
    block: int = BLOCK_ROWS,
    bucket: int = BUCKET,
    interpret: bool = False,
) -> jax.Array:
    """f32[B, N/bucket] per-bucket score maxima; the fused matmul+reduce pass.

    Per-row aux operands are [1, N] LANE vectors (see _mask_and_reduce: a
    [N, 1] f32 custom-call operand costs 512 B per element under TPU tiling)."""
    n, d = embeddings.shape  # d = D/2 packed bytes on the int4 path
    b, qd = query_vecs.shape
    assert n % block == 0 and block % bucket == 0, (n, block, bucket)
    n_blocks = n // block
    nb = block // bucket
    scoped = coll_cid is not None
    is_int8 = embeddings.dtype == jnp.int8
    is_int4 = embeddings.dtype == jnp.uint8

    row_spec = lambda width: pl.BlockSpec(  # noqa: E731
        (block, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, block), lambda i: (0, i), memory_space=pltpu.VMEM)
    qrow_spec = pl.BlockSpec((1, b), lambda i: (0, 0), memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((b, qd), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((b, nb), lambda i: (0, i), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, n_blocks * nb), jnp.float32)

    if is_int8 or is_int4:
        args = [query_vecs, q_scale]
        in_specs = [q_spec, qrow_spec]
        if scoped:
            args.append(coll_cid)
            in_specs.append(qrow_spec)
        args += [embeddings, scales, addmask]
        in_specs += [row_spec(d), lane_spec, lane_spec]
        if scoped:
            args.append(collection_of)
            in_specs.append(lane_spec)
        if is_int4:
            kernel = functools.partial(
                _kernel_int4_scoped if scoped else _kernel_int4, bucket=bucket)
        else:
            kernel = functools.partial(
                _kernel_int8_scoped if scoped else _kernel_int8, bucket=bucket)
    else:
        args = [query_vecs.astype(embeddings.dtype).T]  # [D, B] for standard matmul
        in_specs = [pl.BlockSpec((qd, b), lambda i: (0, 0), memory_space=pltpu.VMEM)]
        if scoped:
            args.append(coll_cid)
            in_specs.append(qrow_spec)
        args += [embeddings, addmask]
        in_specs += [row_spec(d), lane_spec]
        if scoped:
            args.append(collection_of)
            in_specs.append(lane_spec)
        kernel = functools.partial(
            _kernel_float_scoped if scoped else _kernel_float, bucket=bucket)

    # int4 packs two logical columns per stored byte: the kernel's two
    # half-width int8 matmuls total 2*n*(2d)*b MACs, so d must be the
    # LOGICAL width or the scheduler hint undercounts the work 2x
    d_logical = d * 2 if embeddings.dtype == jnp.uint8 else d
    flops = 2 * n * d_logical * b
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * d * embeddings.dtype.itemsize + 4 * b * n // bucket,
            transcendentals=0,
        ),
    )(*args)


def _final_candidates_topk(
    cand_ids: jax.Array,     # i32[B, C] global row ids
    cand_scores: jax.Array,  # f32[B, C]
    cand_valid: jax.Array,   # bool[B, C]
    k: int,
    invalid_score_floor: float,
) -> Tuple[jax.Array, jax.Array]:
    """Exact (score desc, id asc) selection via THE shared tie-break helper."""
    from ..topk import sort_topk_desc

    masked = jnp.where(
        cand_valid & (cand_scores > invalid_score_floor), cand_scores, NEG_INF
    )
    return sort_topk_desc(masked, cand_ids, k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "block", "bucket", "interpret", "invalid_score_floor"),
)
def fused_dense_topk(
    embeddings: jax.Array,   # int8|bf16|f32[n_pad, D]
    valid: jax.Array,        # bool[n_pad]
    query_vecs: jax.Array,   # f32[B, D]
    k: int,
    scales: Optional[jax.Array] = None,         # f32[n_pad] (int8 path)
    collection_of: Optional[jax.Array] = None,  # i32[n_pad]
    coll_cid: Optional[jax.Array] = None,       # i32[B]
    *,
    invalid_score_floor: float = -2.0,
    block: int = BLOCK_ROWS,
    bucket: int = DEFAULT_BUCKET,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact batched dense top-k: (ids i32[B, k], scores f32[B, k]).

    Drop-in replacement for the engine's dense channel
    (``dense_scores_*_batch`` + vmapped ``masked_top_k``) that never
    materializes the [B, N] score matrix. Invalid slots: id -1, score -inf.
    """
    n, d = embeddings.shape
    b = query_vecs.shape[0]
    is_int8 = embeddings.dtype == jnp.int8
    is_int4 = embeddings.dtype == jnp.uint8  # packed nibbles, d = D/2

    # shrink the block until it divides n: padding instead would COPY the whole
    # embedding matrix (a 4 GB temp at 8M int4; engine capacities are 1024-
    # multiples, so a block of 1024 always divides without padding)
    while block > 1024 and n % block:
        block //= 2

    # The Mosaic lowering needs the out-block lane dim (block/kernel_bucket) to be
    # a multiple of 128, which caps the in-kernel bucket at block/128. Larger
    # effective buckets fold the kernel's maxima once more in XLA (a cheap
    # [B, N/kb] -> [B, N/bucket] reduce) — exactness is partition-independent.
    kernel_bucket = min(bucket, max(block // 128, BUCKET))
    fold = bucket // kernel_bucket
    assert kernel_bucket * fold == bucket, (bucket, kernel_bucket)

    # pad rows to a block multiple (padded rows are masked invalid)
    n_pad = _pad_rows(max(n, block), block)
    if n_pad != n:
        embeddings = jnp.pad(embeddings, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad - n))
        if scales is not None:
            scales = jnp.pad(scales, (0, n_pad - n), constant_values=1.0)
        if collection_of is not None:
            collection_of = jnp.pad(collection_of, (0, n_pad - n), constant_values=-2)
    addmask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[None, :]

    if is_int8 or is_int4:
        q_i8, q_scale = quantize_queries_int8(query_vecs)
        bucket_max = bucket_maxima_pallas(
            embeddings, q_i8, addmask,
            scales=scales[None, :], q_scale=q_scale.T,
            collection_of=None if collection_of is None else collection_of[None, :],
            coll_cid=None if coll_cid is None else coll_cid[None, :],
            block=block, bucket=kernel_bucket, interpret=interpret,
        )
    else:
        q_i8, q_scale = None, None
        bucket_max = bucket_maxima_pallas(
            embeddings, query_vecs, addmask,
            collection_of=None if collection_of is None else collection_of[None, :],
            coll_cid=None if coll_cid is None else coll_cid[None, :],
            block=block, bucket=kernel_bucket, interpret=interpret,
        )
    if fold > 1:
        nb1 = bucket_max.shape[1]
        bucket_max = jnp.max(bucket_max.reshape(b, nb1 // fold, fold), axis=2)

    # ---- stage 2: exact top-k buckets (ties -> lowest bucket id) ----
    n_buckets = bucket_max.shape[1]
    kk = min(k, n_buckets)
    _, bucket_ids = jax.lax.top_k(bucket_max, kk)  # i32[B, kk]

    # ---- stage 3: rescore the k*BUCKET member rows, exact final selection ----
    member = (
        bucket_ids[:, :, None] * bucket
        + jnp.arange(bucket, dtype=bucket_ids.dtype)[None, None, :]
    ).reshape(b, kk * bucket)  # i32[B, C] global row ids
    cand_rows = jnp.clip(member, 0, n_pad - 1)
    cand_valid = valid[cand_rows]
    if collection_of is not None and coll_cid is not None:
        c_coll = collection_of[cand_rows]
        cand_valid = cand_valid & ((coll_cid[:, None] == -1) | (c_coll == coll_cid[:, None]))

    cand_emb = embeddings[cand_rows]  # [B, C, D] (packed [B, C, D/2] for int4)
    if is_int4:
        from ...index.dense_index import unpack_int4

        low, high = unpack_int4(cand_emb)  # i8[B, C, D/2] each
        acc = jnp.einsum("bcd,bd->bc", low.astype(jnp.int32),
                         q_i8[:, :d].astype(jnp.int32))
        acc += jnp.einsum("bcd,bd->bc", high.astype(jnp.int32),
                          q_i8[:, d:].astype(jnp.int32))
        cand_scores = acc.astype(jnp.float32) * scales[cand_rows] * q_scale
    elif is_int8:
        acc = jnp.einsum(
            "bcd,bd->bc", cand_emb.astype(jnp.int32), q_i8.astype(jnp.int32)
        )  # exact int32 accumulation == MXU int8 dot
        cand_scores = acc.astype(jnp.float32) * scales[cand_rows] * q_scale
    else:
        cand_scores = jnp.einsum(
            "bcd,bd->bc", cand_emb, query_vecs.astype(embeddings.dtype),
            preferred_element_type=jnp.float32,
        )
    return _final_candidates_topk(
        member, cand_scores, cand_valid, k, invalid_score_floor
    )
